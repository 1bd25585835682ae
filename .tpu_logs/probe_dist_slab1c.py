"""Addendum: the XLA-interior distributed SpMM chained (the A/B
reference for probe_dist_slab1b's 8.9 ms slab-interior number)."""
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
from cask_tpu.parallel import DistSpmv, fem_bdia_partition, row_mesh
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx, dof, k = 512, 4, 128
n = nx * nx * dof
nnz = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
useful = nnz * 4 + 2 * n * k * 4

pplan = fem_bdia_partition(nx, dof=dof, nshards=1)
s = jnp.asarray(1 / 64.0, jnp.float32)
pplan = dataclasses.replace(pplan, vals=pplan.vals * s,
                            head_vals=pplan.head_vals * s,
                            tail_vals=pplan.tail_vals * s)
op_x = DistSpmv(pplan, row_mesh(1), mm_interior="xla")
X0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n, k),
                                       jnp.float32))()
Xp = jax.jit(op_x.padded)(X0)


def step(V, ops):
    Y = op_x.padded_op_with(ops, V)
    return (Y / (jnp.max(jnp.abs(Y)) + 1e-30)).astype(V.dtype)


best = None
t0 = time.time()
for _ in range(3):
    ms = measure_chained(step, Xp, operands=op_x.operands,
                         k1=2, k2=10, points=3, repeats=2)
    if np.isfinite(ms.seconds_per_iter) and (
            best is None or ms.seconds_per_iter < best.seconds_per_iter):
        best = ms
log(f"[dist_xla_mm_norm] {best.seconds_per_iter*1e6:.1f} us "
    f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
    f"rel={best.reliable} (wall {time.time()-t0:.1f}s)")
log("DONE")
