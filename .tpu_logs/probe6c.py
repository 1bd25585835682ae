"""Probe 6: the full tuner loop on hardware picks bsr_pallas:4 on a
fem_blocks-class matrix (VERDICT r1 item 1 'Done' criterion)."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

import logging
logging.basicConfig(level=logging.INFO)

from cask_tpu.formats.generate import fem_blocks
from cask_tpu.tune.cache import TunerCache
from cask_tpu.tune.tuner import tune

t0 = time.time()
a = fem_blocks(512, dof=4, dtype=np.float32)  # ~100k rows, config-2 class
log(f"matrix built: {a.shape} nnz={a.nnz} ({time.time()-t0:.1f}s)")
cache = TunerCache(path="/tmp/probe6_cache.json")
t0 = time.time()
tuned = tune(a, cache=cache, time_budget=3, force=True)
log(f"TUNER winner={tuned.variant} t={tuned.seconds_per_op:.3e} s/op "
    f"(wall {time.time()-t0:.1f}s)")
# correctness of the tuned callable on device
rng = np.random.default_rng(0)
x = rng.standard_normal(a.shape[1]).astype(np.float32)
y = np.asarray(tuned(x))
from cask_tpu.formats.convert import to_scipy
ref = to_scipy(a) @ x
log(f"tuned output relerr={np.abs(y-ref).max()/np.abs(ref).max():.2e}")
log("DONE")
