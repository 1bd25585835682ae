"""BiCGStab per-iteration redo: probe_solvers3's tol=0 ladder exited on
post-stagnation NaN breakdown (walls flat).  Keep every ladder point
below the measured convergence point (716 iters)."""
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
from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.solvers import bicgstab

side_n = 512
mn = side_n * side_n
dia_n = stencil2d_dia_device(side_n, dtype=np.float32)
offs = dia_n.offsets
scale = np.ones((len(offs), 1), np.float32)
for i, o in enumerate(offs):
    if o == 1:
        scale[i] = 1.3
    elif o == -1:
        scale[i] = 0.7
nsym = dataclasses.replace(dia_n, vals=dia_n.vals * jnp.asarray(scale))
bn = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(3), (mn,),
                                       jnp.float32))()
fbi = jax.jit(lambda v, k: bicgstab(
    lambda x: nsym.spmv(x), v, tol=0.0, maxiter=k).iterations
    .astype(jnp.float32))


def run(k):
    t0 = time.perf_counter()
    it = float(fbi(bn, jnp.asarray(k, jnp.int32)))
    return time.perf_counter() - t0, it


ks = (50, 200, 400, 600)
t0 = time.time()
run(ks[0]); run(ks[-1])
log(f"compiled+warm {time.time()-t0:.1f}s")
walls = {}
for _ in range(2):
    for k in ks:
        w, it = run(k)
        walls[k] = min(walls.get(k, float("inf")), w)
        if it != k:
            log(f"  NOTE k={k} exited at iteration {it}")
slopes = sorted((walls[b2] - walls[a2]) / (b2 - a2)
                for a2 in ks for b2 in ks if b2 > a2)
log(f"bicgstab (262k nonsym banded): {slopes[len(slopes)//2]*1e6:.1f} us/iter "
    f"walls={ {k: round(v, 3) for k, v in walls.items()} }")
log("DONE")
