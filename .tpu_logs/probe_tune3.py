"""Probe tune3: tuner on fem_blocks(158, dof=4) (100k rows) end-to-end
after the fused one-shot kernel landed (VERDICT r2 item 2 'Done'
criterion: does bsr_pallas:4 now beat dia_pallas at 100k through the
per-call spmv interface?).  r2 result: bsr_pallas:4 46.4 us (XLA
relayout wrappers) vs dia_pallas 21.9 us; fused one-shot measured
11.5 us raw at this size."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

import tempfile
from cask_tpu.formats.generate import fem_blocks
from cask_tpu.formats.convert import to_scipy
from cask_tpu.tune.tuner import tune
from cask_tpu.tune.cache import TunerCache

td = tempfile.mkdtemp()
a = fem_blocks(158, dof=4, dtype=np.float32)
t0 = time.time()
t = tune(a, cache=TunerCache(path=os.path.join(td, "c.json")),
         include_pallas=True, time_budget=4)
log(f"TUNE fem100k: variant={t.variant} t={t.seconds_per_op:.3e} s/op "
    f"({time.time()-t0:.1f}s wall)")
import json
entry = json.load(open(os.path.join(td, "c.json")))
for key, rec in entry.items():
    for name, m in sorted(rec.get("timings", {}).items(),
                          key=lambda kv: kv[1]["seconds_per_op"]):
        log(f"  timed {name}: {m['seconds_per_op']*1e6:.1f} us reliable={m['reliable']}")
x = jnp.asarray(np.random.default_rng(1).standard_normal(a.shape[1]).astype(np.float32))
y = np.asarray(t(x))
ref = to_scipy(a) @ np.asarray(x)
log(f"  correctness relerr={np.abs(y-ref).max()/np.abs(ref).max():.3e}")
log("DONE")
