"""Probe: full DSE loop on hardware — shuffled banded matrix should tune
back onto the banded kernel via RCM; power-law should pick a poh variant."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

import tempfile
from cask_tpu.formats.generate import banded, power_law
from cask_tpu.formats.convert import from_scipy, to_scipy
from cask_tpu.tune.tuner import tune
from cask_tpu.tune.cache import TunerCache

td = tempfile.mkdtemp()

# 1. shuffled banded 100k rows
a0 = banded(100_000, 3, dtype=np.float32, seed=2)
p = np.random.default_rng(0).permutation(100_000)
s = to_scipy(a0).tocsr()[p][:, p].tocsr()
a = from_scipy(s, format="csr")
t0 = time.time()
t = tune(a, cache=TunerCache(path=os.path.join(td, "c1.json")),
         include_pallas=True, time_budget=3)
log(f"TUNE shuffled-banded: variant={t.variant} t={t.seconds_per_op:.3e} s/op "
    f"({time.time()-t0:.1f}s wall)")
x = jnp.asarray(np.random.default_rng(1).standard_normal(a.shape[1]).astype(np.float32))
y = np.asarray(t(x))
ref = s @ np.asarray(x)
log(f"  correctness relerr={np.abs(y-ref).max()/np.abs(ref).max():.3e}")

# 2. power-law 50k rows
b = power_law(50_000, avg_degree=12, dtype=np.float32, seed=3)
t0 = time.time()
tb = tune(b, cache=TunerCache(path=os.path.join(td, "c2.json")),
          include_pallas=True, time_budget=3)
log(f"TUNE power-law: variant={tb.variant} t={tb.seconds_per_op:.3e} s/op "
    f"({time.time()-t0:.1f}s wall)")
xb = jnp.asarray(np.random.default_rng(2).standard_normal(b.shape[1]).astype(np.float32))
yb = np.asarray(tb(xb))
refb = to_scipy(b) @ np.asarray(xb)
log(f"  correctness relerr={np.abs(yb-refb).max()/np.abs(refb).max():.3e}")
