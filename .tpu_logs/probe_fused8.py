"""Probe fused8: the DEFAULT one-shot call and the distributed fused
interior after the flat-grid cutover change."""
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
from cask_tpu.parallel import DistSpmv, fem_bdia_partition, row_mesh
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


def bench(tag, f, x):
    def step(v):
        y = f(v)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
    best = None
    t0 = time.time()
    for _ in range(3):
        ms = measure_chained(step, x, k1=5, k2=60, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us "
        f"frac={useful/best.seconds_per_iter/HBM:.3f} rel={best.reliable} "
        f"(wall {time.time()-t0:.1f}s)")


bench("default one-shot (now flat)", lambda v: bdia_spmv_pallas_fused(plan, v), x0)

pplan = fem_bdia_partition(nx, dof=4, nshards=1)
s = jnp.asarray(1 / 32.0, jnp.float32)
pplan = dataclasses.replace(pplan, vals=pplan.vals * s,
                            head_vals=pplan.head_vals * s,
                            tail_vals=pplan.tail_vals * s)
op = DistSpmv(pplan, row_mesh(1), interior="fused")
xp = jax.jit(op.padded)(x0)
bench("dist fused interior (now flat)", lambda v: op.padded_op(v), xp)


@jax.jit
def err(x):
    y1 = bdia_spmv_pallas_fused(plan, x)
    y2 = plan._spmv_xla(x)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))


log(f"default one-shot exactness vs XLA: {float(err(x0)):.3e}")
log("DONE")
