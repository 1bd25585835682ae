"""Probe api2: the public one-shot `spmm(bsr, X)` promise on hardware.

End-to-end: host-built 1M-row fem BSR → device_put → spmm(bsr, X) at
k=128 — first call (plan shear + compiles), repeat-call wall (memoized
plan, cached compile), correctness vs the ring, and no re-plan on
repeat (the probe_api1 discipline lifted to wide-k SpMM).
"""
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
from cask_tpu.formats.generate import fem_blocks
from cask_tpu.ops.spmm import spmm

nx, dof, k = 360, 4, 128  # ~518k rows: keeps the host build + upload sane
t0 = time.time()
a = fem_blocks(nx, dof=dof, dtype=np.float32, return_bsr=True)
log(f"host build {time.time()-t0:.1f}s rows={a.shape[0]} nnz={a.nnz}")
t0 = time.time()
dev = a.device_put()
jax.block_until_ready(dev.data)
log(f"device_put {time.time()-t0:.1f}s")
X = jax.jit(lambda: 0.02 * jax.random.normal(
    jax.random.PRNGKey(0), (a.shape[0], k), jnp.float32))()

t0 = time.time()
Y1 = spmm(dev, X)
v = float(jnp.sum(jnp.abs(Y1)))
log(f"first spmm(bsr, X) {time.time()-t0:.1f}s (plan shear + compiles) "
    f"v={v:.3e}")
assert getattr(dev, "_bdia_auto_plan", None) is not None
plan = dev._bdia_auto_plan
sl = getattr(plan, "_slab_auto_plan", None)
log(f"memoized: bdia plan + slab plan={'yes' if sl is not None else 'NO'}")
walls = []
for _ in range(3):
    t0 = time.time()
    v = float(jnp.sum(jnp.abs(spmm(dev, X))))
    walls.append(time.time() - t0)
log(f"repeat walls: {['%.2f' % w for w in walls]} s (no re-plan)")
assert dev._bdia_auto_plan is plan and plan._slab_auto_plan is sl

# correctness vs the ring on device
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmm_pallas_ring


# eager (NOT jitted): a jitted comparison would embed the ~400 MB slab
# plan as closure constants and 413 the relay
y1 = spmm(dev, X)
y2 = bdia_spmm_pallas_ring(plan, X)
rel = float(jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2)))
log(f"one-shot vs ring relerr: {rel:.3e}")
log("DONE")
