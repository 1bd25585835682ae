"""Probe: BDIA BSR SpMV on hardware — correctness, roofline at 100k and
1M rows, and the A/B vs scalar-DIA fill on the same matrix class."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

from cask_tpu.formats.device_gen import fem_bdia_device, banded_dia_device
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas
from cask_tpu.tune.timing import measure

HBM = 819e9

# 1) correctness on-device: pallas vs the XLA formulation
t0 = time.time()
ps = fem_bdia_device(40, dof=4)
xs = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(2), (ps.shape[1],), jnp.float32))()
@jax.jit
def err():
    y1 = ps.from_bdia(bdia_spmv_pallas(ps, ps.to_bdia(xs)))
    y2 = ps._spmv_xla(xs)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
log(f"CORRECTNESS bdia nx=40 dof=4 relerr={float(err()):.3e} ({time.time()-t0:.1f}s)")

# 2) perf sweep
for nx, dof in ((158, 4), (512, 4), (256, 8)):
    t0 = time.time()
    plan = fem_bdia_device(nx, dof=dof)
    n = plan.shape[0]
    x2 = jax.jit(lambda shp=None: jax.random.normal(
        jax.random.PRNGKey(0), (plan.blocksize[1] * plan.seg_rows, 128), jnp.float32))()
    nnz_true = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
    streamed = plan.vals.size * 4
    useful = nnz_true * 4 + 2 * n * 4
    meas = measure(lambda v: bdia_spmv_pallas(plan, v), x2, k1=4, k2=24)
    us = meas.seconds_per_iter * 1e6
    sol_us = (streamed + 2 * n * 4) / HBM * 1e6
    log(f"PERF bdia nx={nx} dof={dof} n={n} nnz={nnz_true} ts={plan.ts}: "
        f"{us:.1f} us/op  useful_frac={useful/meas.seconds_per_iter/HBM:.3f} "
        f"streamed_frac={(streamed + 2*n*4)/meas.seconds_per_iter/HBM:.3f} "
        f"gnnz/s={nnz_true/meas.seconds_per_iter/1e9:.1f} sol={sol_us:.1f}us "
        f"reliable={meas.reliable} (wall {time.time()-t0:.1f}s)")

# 3) scalar-DIA A/B on the same class: dof-expanded scalar diagonals
#    (35 offsets at 4/7 density -> DIA streams 1.75x the bytes)
from cask_tpu.ops.dia import DiaMatrix, _ROW_TILE, _round_up
from cask_tpu.ops.pallas import dia_kernels as dk

nx, dof = 512, 4
n = nx * nx * dof
m_pad = _round_up(n, _ROW_TILE)
offs = sorted({d * dof + (c - r) for d in (-nx, -1, 0, 1, nx)
               for c in range(dof) for r in range(dof)})
key = jax.random.PRNGKey(1)
r = jnp.arange(m_pad)
vals = jax.random.normal(key, (len(offs), m_pad), jnp.float32)
masks = jnp.stack([(r < n) & (r + o >= 0) & (r + o < n) for o in offs])
sdia = DiaMatrix(vals=vals * masks, rem_data=jnp.zeros((0,), jnp.float32),
                 rem_row=jnp.zeros((0,), jnp.int32), rem_col=jnp.zeros((0,), jnp.int32),
                 vals_t=None, offsets=tuple(int(o) for o in offs), shape=(n, n))
log(f"scalar-DIA comparison: {len(offs)} offsets, m_pad={m_pad}")
t0 = time.time()
v_il = dk.pack_vals_interleaved(sdia)
xi = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(3), (
    dk.to_interleaved(sdia, jnp.zeros((n,), jnp.float32)).shape), jnp.float32))()
meas = measure(lambda v: dk.dia_spmv_pallas_interleaved(sdia, v, v_il), xi, k1=4, k2=24)
us = meas.seconds_per_iter * 1e6
streamed = sdia.vals.size * 4
nnz_true = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
useful = nnz_true * 4 + 2 * n * 4
log(f"PERF scalar-dia-il 35diag n={n}: {us:.1f} us/op "
    f"useful_frac={useful/meas.seconds_per_iter/HBM:.3f} "
    f"streamed_frac={(streamed + 2*n*4)/meas.seconds_per_iter/HBM:.3f} "
    f"reliable={meas.reliable} (wall {time.time()-t0:.1f}s)")
log("DONE")
