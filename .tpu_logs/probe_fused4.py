"""Probe fused4: fused one-shot BDIA at 1M — sweep merge cadence and
slab size + the pad-only prologue zero (post-probe_fused3, 158.3 us /
0.711 useful; target >=0.80 = 140.6 us).  Also re-measure 100k with a
longer ladder (probe_fused3's k2=60 read 31.6 us UNRELIABLE vs
probe_fused2's 11.5 us reliable — too few steps for an 11 us op)."""
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

plans = {}
for nx in (512, 158):
    p = fem_bdia_device(nx, dof=4)
    plans[nx] = dataclasses.replace(p, vals=p.vals * jnp.asarray(1.0/32.0, jnp.float32))

def run(nx, mt, tbx, k2=60):
    plan = plans[nx]
    n = plan.shape[0]
    nnz_true = (nx*nx + 4*nx*(nx-1)) * 16
    useful = nnz_true*4 + 2*n*4
    x0 = jax.jit(lambda n=n: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()
    tag = f"{nx} mt={mt} tbx={tbx}"
    try:
        @jax.jit
        def err(x0=x0, plan=plan):
            y1 = bdia_spmv_pallas_fused(plan, x0, merge_tiles=mt, slab_rows=tbx)
            y2 = plan._spmv_xla(x0)
            return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
        t0 = time.time()
        e = float(err())
        log(f"[{tag}] relerr={e:.3e} ({time.time()-t0:.1f}s)")
        def step(v, plan=plan):
            y = bdia_spmv_pallas_fused(plan, v, merge_tiles=mt, slab_rows=tbx)
            return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
        best = None
        t0 = time.time()
        for _ in range(3):
            ms = measure_chained(step, x0, k1=5, k2=k2, points=3, repeats=2)
            if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
                best = ms
        log(f"[{tag}] PERF {best.seconds_per_iter*1e6:.1f} us "
            f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} reliable={best.reliable} "
            f"(wall {time.time()-t0:.1f}s)")
    except Exception as e:
        log(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}")

# 1M sweep: default (mt=2,tbx=128) now has the pad-only prologue zero
run(512, 2, 128)
run(512, 4, 128)
run(512, 2, 256)
run(512, 4, 256)
# 100k re-measure with a long ladder (default config)
run(158, 2, 128, k2=400)
log("DONE")
