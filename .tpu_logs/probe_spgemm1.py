"""Probe: SpGEMM device numeric phase on hardware (config 4 record)."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

from cask_tpu.formats.generate import random_uniform
from cask_tpu.formats.convert import to_scipy
from cask_tpu.ops.spgemm import spgemm_plan
from cask_tpu.tune.timing import measure

a = random_uniform(20000, 20000, density=4e-4, dtype=np.float32, seed=1)
t0 = time.time()
plan = spgemm_plan(a, a)
log(f"plan: nnz(A)={a.nnz} expansion={plan.expansion} nnz(C)={plan.nnz} "
    f"(host symbolic {time.time()-t0:.1f}s)")

# host scipy baseline
s = to_scipy(a).astype(np.float32)
t0 = time.time(); _ = s @ s; t_scipy = time.time() - t0

a0 = jnp.asarray(np.asarray(a.data, np.float32))
t0 = time.time()
meas = measure(lambda av: plan.numeric(av, av).data, a0, k1=3, k2=15)
log(f"PERF spgemm numeric: {meas.seconds_per_iter*1e3:.2f} ms/op "
    f"({plan.expansion/meas.seconds_per_iter/1e6:.1f} Mpairs/s)  "
    f"scipy host A@A: {t_scipy*1e3:.2f} ms  reliable={meas.reliable} "
    f"(wall {time.time()-t0:.1f}s)")
