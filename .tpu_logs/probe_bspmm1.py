"""Probe bspmm1: BDIA ring SpMM k=128 at 1M rows (fem dof-4).

probe_fused3's mm section 413'd the remote-compile relay: errmm took no
traced arguments, so the 512 MB X0 became a jit CONSTANT serialized
into the compile request.  Here X is always a traced argument (plan
closure = 84 MB of vals, known to pass).  Perf first, then correctness
vs the resident SpMV (itself bit-exact vs XLA, probe_bdia1).
"""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import (bdia_spmm_pallas_ring,
                                              bdia_spmv_pallas_resident,
                                              bdia_mm_ok)
from cask_tpu.tune.timing import measure_chained
HBM = 819e9
import dataclasses

nx = 512
plan = fem_bdia_device(nx, dof=4)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0/32.0, jnp.float32))
n = plan.shape[0]
k = 128
nnz_true = (nx*nx + 4*nx*(nx-1)) * 16
useful_mm = nnz_true*4 + 2*n*k*4
log(f"n={n} k={k} bdia_mm_ok={bdia_mm_ok(plan, k)}")

X0 = jax.jit(lambda: 0.3 * jax.random.normal(jax.random.PRNGKey(1), (n, k), jnp.float32))()

# ---- perf first (X is the chained variable => traced arg) ----
def stepmm(V, plan=plan):
    Y = bdia_spmm_pallas_ring(plan, V)
    return (Y / (jnp.max(jnp.abs(Y)) + 1e-30)).astype(V.dtype)

best = None
t0 = time.time()
for _ in range(3):
    ms = measure_chained(stepmm, X0, k1=3, k2=24, points=3, repeats=2)
    if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
        best = ms
log(f"[mm1M] PERF bdia ring spmm k=128: {best.seconds_per_iter*1e6:.1f} us "
    f"useful_frac={useful_mm/best.seconds_per_iter/HBM:.3f} reliable={best.reliable} "
    f"(wall {time.time()-t0:.1f}s)")

# ---- correctness: ring SpMM columns vs resident SpMV (X traced) ----
@jax.jit
def errmm(X, plan=plan):
    Y1 = bdia_spmm_pallas_ring(plan, X)
    errs = []
    for j in (0, 17, 31, 64, 77, 100, 111, 127):
        x2 = plan.to_resident(X[:, j])
        y2 = plan.from_resident(bdia_spmv_pallas_resident(plan, x2))
        errs.append(jnp.max(jnp.abs(Y1[:, j] - y2)))
    return jnp.max(jnp.stack(errs)) / jnp.max(jnp.abs(Y1))

t0 = time.time()
log(f"[mm1M] CORRECTNESS ring spmm vs resident relerr={float(errmm(X0)):.3e} ({time.time()-t0:.1f}s)")
log("DONE")
