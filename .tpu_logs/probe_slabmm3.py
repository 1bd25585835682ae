"""Probe slabmm3: the all-bf16 NATURAL X-ring (the final wide-k point;
padded all-bf16 read 2.61 ms / 0.541 in probe_slabmm2)."""
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
from cask_tpu.ops.pallas.bdia_slab import bdia_slab_plan, bdia_spmm_slab_ring
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx, dof, k = 512, 4, 128
plan = fem_bdia_device(nx, dof=dof, dtype=jnp.float32)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1 / 64.0,
                                                              jnp.float32))
n = plan.shape[0]
nnz = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
useful = nnz * 4 + 2 * n * k * 4
sl = bdia_slab_plan(plan, 16, dtype=jnp.bfloat16)
jax.block_until_ready(sl.slabs)
X0 = jax.jit(lambda: jax.random.normal(
    jax.random.PRNGKey(0), (n, k), jnp.bfloat16))()


def step(V, SL):
    Y = bdia_spmm_slab_ring(SL, V, out_dtype=jnp.bfloat16)
    s = jnp.max(jnp.abs(Y).astype(jnp.float32)) + 1e-30
    return (Y.astype(jnp.float32) / s).astype(jnp.bfloat16)


best = None
t0 = time.time()
for _ in range(3):
    ms = measure_chained(step, X0, operands=sl, k1=2, k2=10, points=3,
                         repeats=2)
    if np.isfinite(ms.seconds_per_iter) and (
            best is None or ms.seconds_per_iter < best.seconds_per_iter):
        best = ms
log(f"[natural_allbf16_norm] {best.seconds_per_iter*1e6:.1f} us "
    f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
    f"rel={best.reliable} (wall {time.time()-t0:.1f}s)")
log("DONE")
