"""Probe dist_fused1 (VERDICT r3 item 2 'Done' bar): time the
single-shard distributed BDIA program with each interior on hardware.

nshards=1 on the one real chip: the full shard_map program (ring halo
degenerates to self-sends but the ppermute/fixup structure compiles and
runs) with interior = fused / pallas(resident+wrappers) / xla.  The
shard is 262144 block rows = 16·16384 → the fused interior enters
zero-copy.  Expect 0.9-class for fused (the kernel alone measured
0.967, probe_fused4), and the resident-wrapper penalty to reappear in
'pallas'.
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
nx = 512
t0 = time.time()
plan = fem_bdia_partition(nx, dof=4, nshards=1)
s = jnp.asarray(1.0 / 32.0, jnp.float32)
plan = dataclasses.replace(plan, vals=plan.vals * s,
                           head_vals=plan.head_vals * s,
                           tail_vals=plan.tail_vals * s)
n = plan.shape[0]
nnz = (nx * nx + 4 * nx * (nx - 1)) * 16
useful = nnz * 4 + 2 * n * 4
log(f"plan built {time.time()-t0:.1f}s n={n} nbloc={plan.nbloc} "
    f"(zero-copy={plan.nbloc % 16384 == 0})")

mesh = row_mesh(1)
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,),
                                       jnp.float32))()

results = {}
for interior in ("fused", "pallas", "xla"):
    t0 = time.time()
    op = DistSpmv(plan, mesh, interior=interior)
    xp = jax.jit(op.padded)(x0)

    def step(v, op=op):
        y = op.padded_op(v)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)

    best = None
    for _ in range(3):
        ms = measure_chained(step, xp, k1=5, k2=60, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    results[interior] = best
    log(f"interior={interior}: {best.seconds_per_iter*1e6:.1f} us "
        f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
        f"reliable={best.reliable} (wall {time.time()-t0:.1f}s)")

# cross-interior parity on hardware (fused vs xla, f32)
opf = DistSpmv(plan, mesh, interior="fused")
opx = DistSpmv(plan, mesh, interior="xla")


@jax.jit
def relerr(x):
    yf = opf.padded_op(opf.padded(x))
    yx = opx.padded_op(opx.padded(x))
    return jnp.max(jnp.abs(yf - yx)) / jnp.max(jnp.abs(yx))


log(f"fused vs xla relerr on hardware: {float(relerr(x0)):.3e}")
log("DONE")
