"""Probe solvers4: block-CG s=128 per-iteration cost on the slab SpMM.

probe_solvers3 (r4) measured 19.3 ms/iter at s=128 on the VPU ring
bound (8.7 ms SpMM + O(s^2) recurrences).  The slab X-ring SpMM at
exact precision is ~3x faster; the slab plan rides as a jit ARGUMENT
(closure constants would 413 the relay at 840 MB).
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
from cask_tpu.ops.pallas.bdia_slab import bdia_slab_plan
from cask_tpu.ops.spmm import spmm
from cask_tpu.solvers import block_cg

nx, dof, s = 512, 4, 128
plan = fem_bdia_device(nx, dof=dof, dtype=jnp.float32)
n = plan.shape[0]
log(f"n={n} s={s}")
sl = bdia_slab_plan(plan, 16)
jax.block_until_ready(sl.slabs)
B = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n, s),
                                      jnp.float32))()


def make(maxiter):
    @jax.jit
    def solve(SL, BB):
        r = block_cg(lambda V: spmm(SL, V), BB, tol=0.0, maxiter=maxiter)
        return r.iterations, jnp.sum(r.x)

    return solve


f3, f13 = make(3), make(13)
for tag, f in (("k3", f3), ("k13", f13)):
    t0 = time.time()
    it, v = f(sl, B)
    log(f"[{tag} cold] {time.time()-t0:.1f}s iters={int(it)} v={float(v):.3e}")
walls = {}
for tag, f in (("k3", f3), ("k13", f13)):
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        it, v = f(sl, B)
        float(v)
        best = min(best, time.time() - t0)
    walls[tag] = best
    log(f"[{tag} warm] {best:.3f}s")
per_iter = (walls["k13"] - walls["k3"]) / 10
log(f"block_cg s=128 per-iter on slab SpMM: {per_iter*1e3:.2f} ms "
    f"(r4 ring-bound: 19.3 ms)")
log("DONE")
