"""Probe 2: POH with precision=HIGHEST — correctness + perf of 3 variants."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

log("devices:", jax.devices())
from cask_tpu.formats.generate import power_law
from cask_tpu.ops.spmv import spmv
from cask_tpu.ops.pallas.poh_kernels import poh_plan, poh_synth_device
from cask_tpu.tune.timing import measure_chained

a = power_law(20000, avg_degree=15, dtype=np.float32, seed=1)
pd = poh_plan(a).device_put()
ad = a.device_put()
x = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (a.shape[1],), jnp.float32))()

@jax.jit
def relerr(x):
    y1 = pd.spmv(x)            # exact mode
    yf = pd.spmv(x, fast=True)
    y2 = spmv(ad, x, method="xla")
    d = jnp.max(jnp.abs(y2))
    return jnp.max(jnp.abs(y1 - y2)) / d, jnp.max(jnp.abs(yf - y2)) / d

t0 = time.time()
e, ef = (float(v) for v in relerr(x))
log(f"CORRECTNESS exact={e:.3e} fast={ef:.3e} ({time.time()-t0:.1f}s)")

for name, kw in [("T2048", dict(tile_slots=2048, tiles_per_panel=60)),
                 ("T4096", dict(tile_slots=4096, tiles_per_panel=30))]:
    d = poh_synth_device(n_panels=25, **kw)
    x0 = jax.jit(lambda n=d.shape[1]: jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32))()
    slots = d.ntiles * kw["tile_slots"]
    for mode, fast in [("exact", False), ("fast", True)]:
        t0 = time.time()
        meas = measure_chained(lambda v, d=d, fast=fast: d.spmv(v, fast=fast),
                               x0, k1=5, k2=80, points=4, repeats=2)
        log(f"PERF {name}/{mode}: {meas.seconds_per_iter*1e6:.1f} us/op  "
            f"{slots/meas.seconds_per_iter/1e9:.3f} Gslot/s  reliable={meas.reliable} "
            f"(wall {time.time()-t0:.1f}s)")
