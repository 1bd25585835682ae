"""Probe dist_slab1: the slab X-ring kernel as the DISTRIBUTED wide-k
SpMM interior, measured on the full single-shard shard_map program
(halo ring + interior + fixups + padding) vs the bare kernel — the
probe_dist_fused1 protocol lifted to SpMM.
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
from cask_tpu.parallel import DistSpmv, fem_bdia_partition, row_mesh
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx, dof, k = 512, 4, 128
n = nx * nx * dof
nnz = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
useful = nnz * 4 + 2 * n * k * 4
log(f"n={n} useful={useful/1e9:.3f} GB floor={useful/HBM*1e3:.2f} ms")

pplan = fem_bdia_partition(nx, dof=dof, nshards=1)
s = jnp.asarray(1 / 64.0, jnp.float32)
pplan = dataclasses.replace(pplan, vals=pplan.vals * s,
                            head_vals=pplan.head_vals * s,
                            tail_vals=pplan.tail_vals * s)
op = DistSpmv(pplan, row_mesh(1), mm_interior="slab")
log(f"mm_interior={op.mm_interior} g={getattr(op, '_mm_slab_g', None)}")
X0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n, k),
                                       jnp.float32))()
Xp = jax.jit(op.padded)(X0)


# operands threaded as traced arguments: closing over the 840 MB shard
# slabs 413s the remote compile (first run of this probe died there)
def step(V, ops):
    Y = op.padded_op_with(ops, V)
    return (Y / (jnp.max(jnp.abs(Y)) + 1e-30)).astype(V.dtype)


best = None
t0 = time.time()
for _ in range(3):
    ms = measure_chained(step, Xp, operands=op.operands,
                         k1=2, k2=10, points=3, repeats=2)
    if np.isfinite(ms.seconds_per_iter) and (
            best is None or ms.seconds_per_iter < best.seconds_per_iter):
        best = ms
log(f"[dist_slab_mm_norm] {best.seconds_per_iter*1e6:.1f} us "
    f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
    f"rel={best.reliable} (wall {time.time()-t0:.1f}s)")

# exactness vs the XLA shard interior on device
op_x = DistSpmv(pplan, row_mesh(1), mm_interior="xla")


@jax.jit
def err(V, ops):
    y1 = op.padded_op_with(ops, V)
    y2 = op_x.padded_op(V)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))


log(f"dist slab vs xla interior relerr: {float(err(Xp, op.operands)):.3e}")
log("DONE")
