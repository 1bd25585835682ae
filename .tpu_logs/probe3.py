"""Probe 3: (A) il_stream vs resident interleaved f32/bf16 at 1M rows;
(B) SpGEMM numeric: plain gather vs POH-class kernel at E≈6.4M slots;
(C) trisolve / ILU-PCG per-iteration at 262k rows (level-scan cost);
(D) SpMM k=128 chained re-check."""
import dataclasses, os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.ops.pallas import dia_kernels as dk
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
side = 1024
m = side * side
d = stencil2d_dia_device(side, dtype=jnp.float32)
d = dataclasses.replace(d, vals=d.vals * jnp.asarray(0.125, jnp.float32))
bytes_op = d.traffic_bytes + 2 * m * 4
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), jnp.float32))()

# (A) il_stream A/B
for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    dd = stencil2d_dia_device(side, dtype=dtype)
    dd = dataclasses.replace(dd, vals=dd.vals * jnp.asarray(0.125, dtype))
    bo = dd.traffic_bytes + 2 * m * 4
    xI = jax.jit(lambda v: dk.to_interleaved(dd, v))(x0)
    vI = jax.jit(lambda: dk.pack_vals_interleaved(dd))()
    for name, fn in (("il_stream", dk.dia_spmv_pallas_il_stream),
                     ("il_resident", dk.dia_spmv_pallas_interleaved)):
        t0 = time.time()
        best = None
        for _ in range(3):
            ms = measure_chained(lambda v: fn(dd, v, vI), xI)
            if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
                best = ms
        log(f"PERF {name}_{tag}: {best.seconds_per_iter*1e6:.2f} us/op "
            f"frac={bo/best.seconds_per_iter/HBM:.3f} reliable={best.reliable} "
            f"(wall {time.time()-t0:.1f}s)")

# (B) SpGEMM numeric A/B — device-synthesized index arrays at the
# power_law(100k, deg 8) A·A scale: E ≈ 6.4M, nnz_C ≈ 4M, nnz_B ≈ 800k
E, nnzC, nnzB = 6_400_000, 4_000_000, 800_000
k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
src_a = jax.random.randint(k1, (E,), 0, nnzB, jnp.int32)
src_b = jax.random.randint(k2, (E,), 0, nnzB, jnp.int32)
out_id = jnp.sort(jax.random.randint(k3, (E,), 0, nnzC, jnp.int32))
a_data = jax.random.normal(k4, (nnzB,), jnp.float32)

@jax.jit
def plain_numeric(b_data):
    prod = a_data[src_a] * b_data[src_b]
    return jax.ops.segment_sum(prod, out_id, num_segments=nnzC,
                               indices_are_sorted=True)

t0 = time.time()
ms = measure_chained(lambda v: plain_numeric(v)[:nnzB] * 1e-3, a_data,
                     k1=2, k2=12, points=3, repeats=2)
log(f"PERF spgemm plain numeric E={E}: {ms.seconds_per_iter*1e3:.2f} ms/op "
    f"Mprod/s={E/ms.seconds_per_iter/1e6:.1f} reliable={ms.reliable} "
    f"(wall {time.time()-t0:.1f}s)")

# POH-class numeric: synth POH pack with matching slot count
from cask_tpu.ops.pallas.poh_kernels import poh_synth_device
tiles = E // 8192
dp = poh_synth_device(n_panels=25, tile_slots=8192,
                      tiles_per_panel=max(tiles // 25, 1))
slots = dp.ntiles * 8192
xp0 = jax.jit(lambda n=dp.shape[1]: jax.random.normal(
    jax.random.PRNGKey(7), (n,), jnp.float32))()
t0 = time.time()
mp = measure_chained(lambda v: dp.spmv(v, precision="split"), xp0,
                     k1=5, k2=60, points=3, repeats=1)
log(f"PERF spgemm poh numeric slots={slots}: {mp.seconds_per_iter*1e3:.2f} ms/op "
    f"Mprod/s={slots/mp.seconds_per_iter/1e6:.1f} reliable={mp.reliable} "
    f"(wall {time.time()-t0:.1f}s)")

# (C) trisolve / ILU-PCG at side=512 (262k rows, 1023 levels)
import time as _t
sideT = 512
mT = sideT * sideT
from cask_tpu.formats.generate import stencil_2d
from cask_tpu.ops.ilu import ilu0
log("building ILU(0) factors on host...")
aT = stencil_2d(sideT, dtype=np.float32)
fac = ilu0(aT)
log(f"factors: nlevels lower={fac._lower_plan.nlevels} upper={fac._upper_plan.nlevels}")

b0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(2), (mT,), jnp.float32))()
t0 = time.time()
ms = measure_chained(lambda v: fac._lower_plan.solve(fac._lower_data, v), b0,
                     k1=2, k2=10, points=3, repeats=2)
log(f"PERF trisolve lower n={mT}: {ms.seconds_per_iter*1e3:.3f} ms/solve "
    f"reliable={ms.reliable} (wall {time.time()-t0:.1f}s)")
t0 = time.time()
ms2 = measure_chained(lambda v: fac.apply(v), b0, k1=2, k2=10, points=3, repeats=2)
log(f"PERF ilu_apply (L+U) n={mT}: {ms2.seconds_per_iter*1e3:.3f} ms/apply "
    f"reliable={ms2.reliable} (wall {time.time()-t0:.1f}s)")

# PCG per-iteration ladder: Jacobi vs ILU
from cask_tpu.ops.dia import DiaOperator
from cask_tpu.solvers import cg
from cask_tpu.solvers.precond import jacobi
dT = stencil2d_dia_device(sideT, dtype=jnp.float32)
op = DiaOperator(dT)
bp = jax.jit(lambda v: op.to_padded(v))(b0)
Mj = jacobi(aT)

def per_iter(M, pad):
    f = jax.jit(lambda bb, k: cg(op, bb, tol=0.0, maxiter=k, M=M).iterations)
    def run(k):
        t0 = _t.perf_counter()
        int(f(bp if pad else b0, jnp.asarray(k, jnp.int32)))
        return _t.perf_counter() - t0
    ks = (5, 50, 100)
    run(ks[0]); run(ks[-1])
    walls = {}
    for _ in range(2):
        for k in ks:
            walls[k] = min(walls.get(k, 1e9), run(k))
    slopes = sorted((walls[b2]-walls[a2])/(b2-a2) for a2 in ks for b2 in ks if b2 > a2)
    return slopes[len(slopes)//2]

# Jacobi on padded layout needs M in padded layout — use identity-layout op
class PadM:
    def __init__(self, M): self.M = M
    def __call__(self, r): return op.to_padded(self.M(op.from_padded(r)))

t0 = time.time()
pj = per_iter(PadM(Mj), True)
log(f"PERF jacobi-pcg per-iter n={mT}: {pj*1e6:.1f} us (wall {time.time()-t0:.1f}s)")
t0 = time.time()
pi = per_iter(PadM(fac.apply), True)
log(f"PERF ilu-pcg per-iter n={mT}: {pi*1e6:.1f} us (wall {time.time()-t0:.1f}s)")

log("DONE")
