"""Probe fchain1: isolate the bare-chain fused regression (157 us today
vs 116.3 in r3; the dist-wrapped program reads 120-129 both days).
Variants, all same window: (a) normalize chain (the r3/r4 protocol),
(b) raw chain (no normalize — vals are spectrally scaled, stable),
(c) resident-kernel normalize chain (did the DAY change, or the fused
program?).
"""
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
from cask_tpu.ops.pallas.bdia_kernels import (bdia_spmv_pallas_fused,
                                              bdia_spmv_pallas_resident)
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


def bench(tag, step, x, tries=3):
    best = None
    t0 = time.time()
    for _ in range(tries):
        ms = measure_chained(step, x, k1=5, k2=60, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us "
        f"frac={useful/best.seconds_per_iter/HBM:.3f} rel={best.reliable} "
        f"(wall {time.time()-t0:.1f}s)")


def norm(v):
    return lambda y: (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v)


bench("fused norm-chain",
      lambda v: norm(v.dtype)(bdia_spmv_pallas_fused(plan, v)), x0)
bench("fused raw-chain",
      lambda v: bdia_spmv_pallas_fused(plan, v), x0)
x2 = jax.jit(lambda v: plan.to_resident(v))(x0)
bench("resident norm-chain",
      lambda v: norm(v.dtype)(bdia_spmv_pallas_resident(plan, v)), x2)
bench("resident raw-chain",
      lambda v: bdia_spmv_pallas_resident(plan, v), x2)
log("DONE")
