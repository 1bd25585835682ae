"""Probe 2: BDIA resident-layout SpMV, chained-ladder timing (the
relay-proof protocol bench.py uses); plus the scalar-DIA fill A/B."""
import dataclasses, os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas_resident
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
ATTEMPTS = 3

def bench(nx, dof):
    plan = fem_bdia_device(nx, dof=dof)
    # spectral scale for stable chaining (diag ~4*dof dominates)
    plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0 / (8.0 * dof), jnp.float32))
    n = plan.shape[0]
    x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()
    x2 = jax.jit(lambda v: plan.to_resident(v))(x0)
    nnz_true = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
    streamed = plan.vals.size * 4
    useful = nnz_true * 4 + 2 * n * 4
    best = None
    t0 = time.time()
    for _ in range(ATTEMPTS):
        meas = measure_chained(lambda v: bdia_spmv_pallas_resident(plan, v), x2)
        if np.isfinite(meas.seconds_per_iter) and (
                best is None or meas.seconds_per_iter < best.seconds_per_iter):
            best = meas
    us = best.seconds_per_iter * 1e6
    log(f"PERF bdia-res nx={nx} dof={dof} n={n} nnz={nnz_true} ts={plan.ts} "
        f"pairs={plan.npairs}: {us:.1f} us/op "
        f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
        f"streamed_frac={(streamed + 2*n*4)/best.seconds_per_iter/HBM:.3f} "
        f"gnnz/s={nnz_true/best.seconds_per_iter/1e9:.1f} "
        f"sol={(streamed + 2*n*4)/HBM*1e6:.1f}us reliable={best.reliable} "
        f"(wall {time.time()-t0:.1f}s)")

for nx, dof in ((158, 4), (512, 4), (256, 8)):
    bench(nx, dof)

# scalar-DIA A/B (same matrix class, chained interleaved kernel)
from cask_tpu.ops.dia import DiaMatrix, _ROW_TILE, _round_up
from cask_tpu.ops.pallas import dia_kernels as dk

nx, dof = 512, 4
n = nx * nx * dof
m_pad = _round_up(n, _ROW_TILE)
offs = sorted({d * dof + (c - r) for d in (-nx, -1, 0, 1, nx)
               for c in range(dof) for r in range(dof)})
r = jnp.arange(m_pad)
vals = jax.random.normal(jax.random.PRNGKey(1), (len(offs), m_pad), jnp.float32)
masks = jnp.stack([(r < n) & (r + o >= 0) & (r + o < n) for o in offs])
sdia = DiaMatrix(vals=vals * masks * (1.0 / 16.0), rem_data=jnp.zeros((0,), jnp.float32),
                 rem_row=jnp.zeros((0,), jnp.int32), rem_col=jnp.zeros((0,), jnp.int32),
                 vals_t=None, offsets=tuple(int(o) for o in offs), shape=(n, n))
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(3), (n,), jnp.float32))()
xi = jax.jit(lambda v: dk.to_interleaved(sdia, v))(x0)
v_il = jax.jit(lambda: dk.pack_vals_interleaved(sdia))()
nnz_true = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
best = None
t0 = time.time()
for _ in range(ATTEMPTS):
    meas = measure_chained(lambda v: dk.dia_spmv_pallas_interleaved(sdia, v, v_il), xi)
    if np.isfinite(meas.seconds_per_iter) and (
            best is None or meas.seconds_per_iter < best.seconds_per_iter):
        best = meas
us = best.seconds_per_iter * 1e6
streamed = sdia.vals.size * 4
useful = nnz_true * 4 + 2 * n * 4
log(f"PERF scalar-dia-il {len(offs)}diag n={n}: {us:.1f} us/op "
    f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
    f"streamed_frac={(streamed + 2*n*4)/best.seconds_per_iter/HBM:.3f} "
    f"reliable={best.reliable} (wall {time.time()-t0:.1f}s)")
log("DONE")
