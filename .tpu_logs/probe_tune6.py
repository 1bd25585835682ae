"""Probe tune6 (VERDICT r5 item 4 spot-check): tune() end-to-end on the
50k power law with the WINDOW-AWARE analytic prefilter.

probe_tune5 (r4, per-variant constants) picked poh_fast:2048 at 409 µs;
the analytic model must reproduce that pick from structure (C=4096 at
T=2048 vs the 8192 cap at T=8192) and land the same performance class.
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
import tempfile

from cask_tpu.formats.generate import power_law
from cask_tpu.formats.signature import signature
from cask_tpu.tune import TunerCache, tune
from cask_tpu.tune.tuner import enumerate_variants

a = power_law(50_000, avg_degree=12, dtype=np.float32, seed=3)
log(f"matrix: 50k power law, nnz={a.nnz}")

vs = sorted(enumerate_variants(a, signature(a), None, include_pallas=True),
            key=lambda v: v.est_bytes)
log("prefilter ranking (top 6):")
for v in vs[:6]:
    log(f"  {v.name}: {v.est_bytes/a.nnz:.1f} eq-B/nnz")

with tempfile.TemporaryDirectory() as td:
    cache = TunerCache(path=os.path.join(td, "c.json"))
    t0 = time.time()
    f = tune(a, cache=cache, time_budget=3)
    log(f"tune() wall {time.time()-t0:.1f}s -> winner {f.variant}")

x = jnp.asarray(np.random.default_rng(0).standard_normal(50_000)
                .astype(np.float32))
from cask_tpu.tune.timing import measure_chained


def step(v):
    y = f(v)
    return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)


ms = measure_chained(step, x, k1=5, k2=60, points=3, repeats=2)
log(f"winner chained: {ms.seconds_per_iter*1e6:.1f} us "
    f"({a.nnz/ms.seconds_per_iter/1e9:.2f} Gnnz/s) rel={ms.reliable}")

# correctness
from cask_tpu.formats.convert import to_scipy

y = np.asarray(f(x))
ref = to_scipy(a) @ np.asarray(x)
log(f"winner relerr: {np.abs(y-ref).max()/np.abs(ref).max():.2e}")
log("DONE")
