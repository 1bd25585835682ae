"""Probe 8: MXU-permutation resident layout wrappers — end-to-end
BDIA spmv() and the tuner at 1M-row fem after the wrapper fix."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.tune.timing import measure_chained
HBM = 819e9

import dataclasses
plan = fem_bdia_device(512, dof=4)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0/32.0, jnp.float32))
n = plan.shape[0]
nnz_true = (512*512 + 4*512*511) * 16
useful = nnz_true*4 + 2*n*4
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()

# on-device correctness of new wrappers vs the XLA path
@jax.jit
def err():
    y1 = plan.spmv(x0, method="pallas")
    y2 = plan._spmv_xla(x0)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
t0 = time.time()
log(f"CORRECTNESS spmv end-to-end relerr={float(err()):.3e} ({time.time()-t0:.1f}s)")

# end-to-end spmv (includes to/from_resident each call), chained via norm
def step(v):
    y = plan.spmv(v, method="pallas")
    return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
best = None
t0 = time.time()
for _ in range(3):
    ms = measure_chained(step, x0, k1=5, k2=60, points=3, repeats=2)
    if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
        best = ms
log(f"PERF bdia spmv end-to-end (MXU deint wrappers): {best.seconds_per_iter*1e6:.1f} us "
    f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} reliable={best.reliable} "
    f"(wall {time.time()-t0:.1f}s)")
log("DONE")
