"""Probe fused6: flat-grid fused BDIA (grid (1+T,), all components per
step) vs the 2-D schedule.  Expectation from probe_fused5's step-cost
decomposition: 100k rows 31.6 -> ~15 us (70 -> 14 grid steps at ~0.3
us/step fixed cost); 1M should stay 2-D (finer value pipelining) but
measure flat once for the cutover record."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas_fused
from cask_tpu.tune.timing import measure_chained
HBM = 819e9
import dataclasses

def run(nx, flat, k2=60, attempts=3):
    p = fem_bdia_device(nx, dof=4)
    plan = dataclasses.replace(p, vals=p.vals * jnp.asarray(1.0/32.0, jnp.float32))
    n = plan.shape[0]
    nnz_true = (nx*nx + 4*nx*(nx-1)) * 16
    useful = nnz_true*4 + 2*n*4
    x0 = jax.jit(lambda n=n: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()
    tag = f"{nx} flat={flat}"
    try:
        @jax.jit
        def err(x0=x0, plan=plan):
            y1 = bdia_spmv_pallas_fused(plan, x0, flat=flat)
            y2 = plan._spmv_xla(x0)
            return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
        t0 = time.time()
        e = float(err())
        log(f"[{tag}] relerr={e:.3e} ({time.time()-t0:.1f}s)")
        def step(v, plan=plan):
            y = bdia_spmv_pallas_fused(plan, v, flat=flat)
            return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
        rs = []
        t0 = time.time()
        for _ in range(attempts):
            ms = measure_chained(step, x0, k1=5, k2=k2, points=3, repeats=2)
            if np.isfinite(ms.seconds_per_iter):
                rs.append(ms)
        allv = [f"{m.seconds_per_iter*1e6:.1f}{'R' if m.reliable else 'u'}" for m in rs]
        ok = [m for m in rs if m.reliable and useful/m.seconds_per_iter/HBM <= 1.0]
        best = min(ok or rs, key=lambda m: m.seconds_per_iter)
        log(f"[{tag}] PERF {best.seconds_per_iter*1e6:.1f} us "
            f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} reliable={best.reliable} "
            f"all={allv} (wall {time.time()-t0:.1f}s)")
    except Exception as e:
        log(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}")

run(158, True, k2=400, attempts=4)
run(512, True)
log("DONE")
