"""Probe tune5: with the probe_poh7-derived seeds, tune() on a real
scattered matrix must rank + pick the small-tile POH config."""
import os
import tempfile
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
from cask_tpu.formats.convert import to_scipy
from cask_tpu.formats.generate import power_law
from cask_tpu.tune import tune
from cask_tpu.tune.cache import TunerCache

td = tempfile.mkdtemp()
a = power_law(50_000, avg_degree=12, dtype=np.float32, seed=3)
t0 = time.time()
t = tune(a, cache=TunerCache(path=os.path.join(td, "c.json")),
         include_pallas=True, time_budget=3, wall_budget_s=900)
log(f"TUNE 50k power-law: variant={t.variant} "
    f"t={t.seconds_per_op:.3e} s/op ({time.time()-t0:.1f}s wall)")
entry = TunerCache(path=os.path.join(td, "c.json")).get(t.signature_key)
for name, rec in entry["timings"].items():
    log(f"  {name}: {rec['seconds_per_op']*1e6:.1f}us "
        f"reliable={rec['reliable']} plausible={rec.get('plausible')}")
x = jnp.asarray(np.random.default_rng(0).standard_normal(a.shape[1])
                .astype(np.float32))
y = np.asarray(t(x))
ref = to_scipy(a) @ np.asarray(x)
log(f"correctness relerr={np.abs(y-ref).max()/np.abs(ref).max():.3e}")
log("DONE")
