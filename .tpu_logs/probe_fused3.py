"""Probe fused3: (a) interleaved-slab fused SpMV at 1M (fix for the
probe_fused2 finding: prologue value-block re-fetches ~45 MB + serial
phase-1; expect ~209 -> ~140 us or better).  (b) BDIA ring SpMM k=128
with the legal full-br out block."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import (bdia_spmv_pallas_fused,
                                              bdia_spmm_pallas_ring)
from cask_tpu.tune.timing import measure_chained
HBM = 819e9
import dataclasses

for nx, tag in ((512, "1M"), (158, "100k")):
    plan = fem_bdia_device(nx, dof=4)
    plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0/32.0, jnp.float32))
    n = plan.shape[0]
    nnz_true = (nx*nx + 4*nx*(nx-1)) * 16
    useful = nnz_true*4 + 2*n*4
    x0 = jax.jit(lambda n=n: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()

    @jax.jit
    def err(x0=x0, plan=plan):
        y1 = bdia_spmv_pallas_fused(plan, x0)
        y2 = plan._spmv_xla(x0)
        return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
    t0 = time.time()
    log(f"[{tag}] CORRECTNESS interleaved-slab fused relerr={float(err()):.3e} ({time.time()-t0:.1f}s)")

    def step(v, plan=plan):
        y = bdia_spmv_pallas_fused(plan, v)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
    best = None
    t0 = time.time()
    for _ in range(3):
        ms = measure_chained(step, x0, k1=5, k2=60, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] PERF one-shot fused v3: {best.seconds_per_iter*1e6:.1f} us "
        f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} reliable={best.reliable} "
        f"(wall {time.time()-t0:.1f}s)")

# ---- BDIA ring SpMM ----
nx = 512
plan = fem_bdia_device(nx, dof=4)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0/32.0, jnp.float32))
n = plan.shape[0]
k = 128
nnz_true = (nx*nx + 4*nx*(nx-1)) * 16
useful_mm = nnz_true*4 + 2*n*k*4
X0 = jax.jit(lambda: 0.3 * jax.random.normal(jax.random.PRNGKey(1), (n, k), jnp.float32))()
try:
    @jax.jit
    def errmm(X0=X0, plan=plan):
        Y1 = bdia_spmm_pallas_ring(plan, X0)
        errs = []
        for j in (0, 17, 31, 64, 77, 100, 111, 127):
            errs.append(jnp.max(jnp.abs(Y1[:, j] - plan._spmv_xla(X0[:, j]))))
        return jnp.max(jnp.stack(errs)) / jnp.max(jnp.abs(Y1))
    t0 = time.time()
    log(f"[mm1M] CORRECTNESS ring spmm relerr={float(errmm()):.3e} ({time.time()-t0:.1f}s)")

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
except Exception as e:
    log(f"[mm1M] FAILED: {type(e).__name__}: {str(e)[:300]}")
log("DONE")
