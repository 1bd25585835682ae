"""Probe 3: POH split-precision mode — accuracy + perf on hardware."""
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
    ys = pd.spmv(x, precision="split")
    y2 = spmv(ad, x, method="xla")
    return jnp.max(jnp.abs(ys - y2)) / jnp.max(jnp.abs(y2))

t0 = time.time()
log(f"CORRECTNESS split={float(relerr(x)):.3e} ({time.time()-t0:.1f}s)")

d = poh_synth_device(n_panels=25, tile_slots=4096, tiles_per_panel=30)
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (d.shape[1],), jnp.float32))()
slots = d.ntiles * 4096
t0 = time.time()
meas = measure_chained(lambda v: d.spmv(v, precision="split"), x0, k1=5, k2=80, points=4, repeats=2)
log(f"PERF T4096/split: {meas.seconds_per_iter*1e6:.1f} us/op  "
    f"{slots/meas.seconds_per_iter/1e9:.3f} Gslot/s  reliable={meas.reliable} "
    f"(wall {time.time()-t0:.1f}s)")
