"""Probe dist_slab2: the dist slab interior on the NATURAL ring entry
(pad-embed copy eliminated) + the one-shot wrapper, same session."""
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
from cask_tpu.parallel import DistSpmv, fem_bdia_partition, row_mesh
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx, dof, k = 512, 4, 128
n = nx * nx * dof
nnz = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
useful = nnz * 4 + 2 * n * k * 4
log(f"floor={useful/HBM*1e3:.2f} ms")


def bench(tag, step, x, operands):
    best = None
    t0 = time.time()
    for _ in range(3):
        ms = measure_chained(step, x, operands=operands,
                             k1=2, k2=10, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us "
        f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
        f"rel={best.reliable} (wall {time.time()-t0:.1f}s)")


def norm(Y):
    return Y / (jnp.max(jnp.abs(Y)) + jnp.asarray(1e-30, jnp.float32))


# bare natural ring chain (endomorphic when body == n: nb_pad == nbr here)
plan = fem_bdia_device(nx, dof=dof, dtype=jnp.float32)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1 / 64.0,
                                                              jnp.float32))
sl = bdia_slab_plan(plan, 16)
jax.block_until_ready(sl.slabs)
X0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n, k),
                                       jnp.float32))()


def nat_bare(V, SL):
    return bdia_spmm_slab_ring(SL, V)


def nat_hi_norm(V, SL):
    return norm(bdia_spmm_slab_ring(SL, V,
                                    precision="highest")).astype(V.dtype)


bench("natural_f32_bare", nat_bare, X0, sl)
bench("natural_f32_highest_norm", nat_hi_norm, X0, sl)

# distributed single-shard wrap on the natural interior
pplan = fem_bdia_partition(nx, dof=dof, nshards=1)
s = jnp.asarray(1 / 64.0, jnp.float32)
pplan = dataclasses.replace(pplan, vals=pplan.vals * s,
                            head_vals=pplan.head_vals * s,
                            tail_vals=pplan.tail_vals * s)
op = DistSpmv(pplan, row_mesh(1), mm_interior="slab")
Xp = jax.jit(op.padded)(X0)


def dist_step(V, ops):
    Y = op.padded_op_with(ops, V)
    return norm(Y).astype(V.dtype)


bench("dist_slab_mm_norm(natural)", dist_step, Xp, op.operands)
log("DONE")
