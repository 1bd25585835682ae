"""Probe fused7: today's windows read the 2-D-grid fused kernel at
148-163 us (r3: 116.3) while every OTHER program is normal.  r3 also
measured the FLAT grid at 1M = 119.3 us (0.943) — if flat reads well
today, the one-shot cutover should move and the regression is a
2-D-grid-specific scheduling effect, not drift."""
import dataclasses
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas_fused
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx = 512
plan = fem_bdia_device(nx, dof=4)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1 / 32.0,
                                                              jnp.float32))
n = plan.shape[0]
nnz = (nx * nx + 4 * nx * (nx - 1)) * 16
useful = nnz * 4 + 2 * n * 4
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,),
                                       jnp.float32))()


def bench(tag, **kw):
    def step(v):
        y = bdia_spmv_pallas_fused(plan, v, **kw)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)

    best = None
    t0 = time.time()
    for _ in range(3):
        ms = measure_chained(step, x0, k1=5, k2=60, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us "
        f"frac={useful/best.seconds_per_iter/HBM:.3f} rel={best.reliable} "
        f"(wall {time.time()-t0:.1f}s)")


bench("2-D grid (current default)")        # baseline for this window
bench("flat grid", flat=True)              # r3: 119.3 us at 1M
log("DONE")
