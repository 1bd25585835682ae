"""Probe tune4 (VERDICT r3 item 5 tail): tuner standings at 100k rows
re-checked now that one-shot BSR spmv rides the fused kernel, plus the
wall-budget cap live on hardware.
"""
import os
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import logging

import jax.numpy as jnp
import numpy as np

logging.basicConfig(level=logging.INFO)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


log("devices:", jax.devices())

from cask_tpu.formats.convert import to_scipy
from cask_tpu.formats.generate import fem_blocks
from cask_tpu.tune import tune
from cask_tpu.tune.cache import TunerCache

td = tempfile.mkdtemp()
t0 = time.time()
a = fem_blocks(160, dof=4, dtype=np.float32)  # 102,400 rows
log(f"host fem 100k in {time.time()-t0:.1f}s nnz={a.nnz}")

t0 = time.time()
t = tune(a, cache=TunerCache(path=os.path.join(td, "c.json")),
         include_pallas=True, time_budget=3, wall_budget_s=900)
log(f"TUNE 100k fem: variant={t.variant} t={t.seconds_per_op:.3e} s/op "
    f"({time.time()-t0:.1f}s wall)")
entry = TunerCache(path=os.path.join(td, "c.json")).get(t.signature_key)
log(f"truncated={entry['truncated']}")
for name, rec in entry["timings"].items():
    log(f"  {name}: {rec['seconds_per_op']*1e6:.1f}us reliable={rec['reliable']} "
        f"plausible={rec.get('plausible')}")

x = jnp.asarray(np.random.default_rng(0).standard_normal(a.shape[1])
                .astype(np.float32))
y = np.asarray(t(x))
ref = to_scipy(a) @ np.asarray(x)
log(f"correctness relerr={np.abs(y-ref).max()/np.abs(ref).max():.3e}")
log("DONE")
