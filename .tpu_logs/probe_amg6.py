"""Probe amg6: AMG-PCG total-time verdict re-run on the factored
R=16384 hierarchy (probe_amg3's 30s-wall rows were measured on the
materialized hierarchy with ~4x the captured constants)."""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


log("devices:", jax.devices())
from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.formats.generate import stencil_2d
from cask_tpu.solvers import cg, smoothed_aggregation_amg

side = 1024
n = side * side
t0 = time.time()
a_iso = stencil_2d(side, dtype=np.float64)
M = smoothed_aggregation_amg(a_iso, dtype=jnp.float32)
log(f"setup {time.time()-t0:.1f}s")
op = stencil2d_dia_device(side, dtype=jnp.float32)
b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (n,),
                                      jnp.float32))()
for tag, Mp in (("AMG-PCG(split,R16384)", M),
                ("AMG-PCG(fast,R16384)",
                 dataclasses.replace(M, poh_precision="fast"))):
    t0 = time.time()
    r1 = cg(op, b, tol=1e-6, maxiter=400, M=Mp)
    w1 = time.time() - t0
    t0 = time.time()
    r2 = cg(op, b, tol=1e-6, maxiter=400, M=Mp)
    w2 = time.time() - t0
    log(f"{tag}: iters={int(r1.iterations)} conv={bool(r1.converged)} "
        f"wall_first={w1:.2f}s wall_warm={w2:.2f}s")
log("DONE")
