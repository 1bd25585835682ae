"""Probe amg2: the routed AMG V-cycle on hardware (VERDICT r2 item 7
follow-through).  Same 1.05M-row isotropic stencil as probe_amg1's
262k run but at the full config size; compare route='auto' vs the
489.7 ms/cycle csr_xla result (262k) — routed should be sub-ms class.

AMG setup needs the host CSR (scipy triple products) — host build is
~25 s at 1M rows, fine for a one-time probe; apply operands live on
device after setup.
"""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

from cask_tpu.formats.generate import stencil_2d
from cask_tpu.solvers import cg, smoothed_aggregation_amg
from cask_tpu.solvers.precond import jacobi
from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.tune.timing import measure_chained

side = int(os.environ.get("PROBE_SIDE", "1024"))
t0 = time.time()
a = stencil_2d(side, dtype=np.float64)
n = a.shape[0]
log(f"host stencil {n} rows in {time.time()-t0:.1f}s")

t0 = time.time()
M = smoothed_aggregation_amg(a, dtype=jnp.float32)  # route='auto'
log(f"AMG setup (routed) {time.time()-t0:.1f}s; levels {M.level_sizes}")
kinds = [type(lv.a).__name__ for lv in M.levels]
log(f"level op kinds: {kinds}")

x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()

def vstep(v):
    y = M(v)
    return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)

best = None
t0 = time.time()
for _ in range(3):
    ms = measure_chained(vstep, x0, k1=3, k2=24, points=3, repeats=2)
    if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
        best = ms
log(f"routed AMG V-cycle: {best.seconds_per_iter*1e6:.1f} us/cycle reliable={best.reliable} "
    f"(vs 489,700 us csr_xla at 262k, probe_amg1) (wall {time.time()-t0:.1f}s)")

# AMG-PCG end-to-end vs jacobi-PCG on the device DIA operator
op = stencil2d_dia_device(side, dtype=jnp.float32)
b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32))()

t0 = time.time()
res_a = cg(op, b, tol=1e-6, maxiter=400, M=M)
it_a = int(res_a.iterations); ok_a = bool(res_a.converged)
wall_a = time.time() - t0
log(f"AMG-PCG: iters={it_a} converged={ok_a} wall={wall_a:.2f}s (incl. compile)")

t0 = time.time()
res_j = cg(op, b, tol=1e-6, maxiter=6000, M=jacobi(a))
it_j = int(res_j.iterations)
log(f"jacobi-PCG: iters={it_j} converged={bool(res_j.converged)} wall={time.time()-t0:.2f}s")
log("DONE")
