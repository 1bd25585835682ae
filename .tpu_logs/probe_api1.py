"""Probe api1: the headline API claim on hardware — `spmv(bsr, x)` and
`spmm(bsr, X)` ride the cached BDIA plan by default on TPU (VERDICT r3
item 5 'Done' bar, hardware leg)."""
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
from cask_tpu.formats.convert import csr_to_bsr, to_scipy
from cask_tpu.formats.generate import fem_blocks
from cask_tpu.ops.spmm import spmm
from cask_tpu.ops.spmv import spmv

a = fem_blocks(160, dof=4, dtype=np.float32)  # 102,400 rows
b = csr_to_bsr(a, (4, 4))
x = jnp.asarray(np.random.default_rng(0).standard_normal(a.shape[1])
                .astype(np.float32))
t0 = time.time()
y = np.asarray(spmv(b, x))
log(f"spmv(bsr, x) first call (plan build + compile): {time.time()-t0:.1f}s")
plan = getattr(b, "_bdia_auto_plan", None)
log(f"plan cached: {plan is not None} "
    f"(type {type(plan).__name__ if plan is not None else '-'})")
ref = to_scipy(a) @ np.asarray(x)
log(f"correctness relerr={np.abs(y-ref).max()/np.abs(ref).max():.3e}")
y2 = np.asarray(plan.spmv(x))
log(f"bit-exact vs plan.spmv: {np.array_equal(y, y2)}")
t0 = time.time()
for _ in range(3):
    np.asarray(spmv(b, x))
log(f"3 repeat calls: {time.time()-t0:.2f}s (no re-plan, no re-compile)")

X = jnp.asarray(np.random.default_rng(1).standard_normal(
    (a.shape[1], 32)).astype(np.float32))
t0 = time.time()
Y = np.asarray(spmm(b, X))
log(f"spmm(bsr, X) k=32 first call: {time.time()-t0:.1f}s "
    f"(shares the plan: {b._bdia_auto_plan is plan})")
refM = to_scipy(a) @ np.asarray(X)
log(f"spmm correctness relerr={np.abs(Y-refM).max()/np.abs(refM).max():.3e}")
log("DONE")
