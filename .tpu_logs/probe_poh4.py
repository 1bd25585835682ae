"""Probe 4: POH v2 (single-dot gather, concat window) — T2048/4096/8192."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
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
    yf = pd.spmv(x, precision="fast")
    y2 = spmv(ad, x, method="xla")
    d = jnp.max(jnp.abs(y2))
    return jnp.max(jnp.abs(ys - y2)) / d, jnp.max(jnp.abs(yf - y2)) / d

t0 = time.time()
es, ef = (float(v) for v in relerr(x))
log(f"CORRECTNESS v2 split={es:.3e} fast={ef:.3e} ({time.time()-t0:.1f}s)")

for ts, tpp in [(2048, 60), (4096, 30), (8192, 15)]:
    d = poh_synth_device(n_panels=25, tile_slots=ts, tiles_per_panel=tpp)
    x0 = jax.jit(lambda n=d.shape[1]: jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32))()
    slots = d.ntiles * ts
    for mode in ("split", "fast"):
        t0 = time.time()
        meas = measure_chained(lambda v, d=d, m=mode: d.spmv(v, precision=m),
                               x0, k1=5, k2=80, points=4, repeats=2)
        log(f"PERF T{ts}/{mode}: {meas.seconds_per_iter*1e6:.1f} us/op  "
            f"{slots/meas.seconds_per_iter/1e9:.3f} Gslot/s  reliable={meas.reliable} "
            f"(wall {time.time()-t0:.1f}s)")
