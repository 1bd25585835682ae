"""Probe: POH one-hot SpMV kernel on the axon v5e — Mosaic lowering +
correctness vs XLA + chained perf. Run with default (axon) env."""
import os, sys, time
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

# ---- correctness: real power-law, host-packed (small: ~5MB transfer) ----
t0 = time.time()
a = power_law(20000, avg_degree=15, dtype=np.float32, seed=1)
log(f"matrix built: nnz={a.nnz}")
p = poh_plan(a)
log(f"plan: ntiles={p.ntiles} fill={p.fill():.3f}")
pd = p.device_put()
ad = a.device_put()
log(f"device_put done ({time.time()-t0:.1f}s)")
x = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (a.shape[1],), jnp.float32))()

@jax.jit
def relerr(x):
    y1 = pd.spmv(x)
    y2 = spmv(ad, x, method="xla")
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))

t0 = time.time()
e = float(relerr(x))
log(f"CORRECTNESS relerr={e:.3e} (compile+run {time.time()-t0:.1f}s)")

# ---- perf: device-generated synth, 102400^2, ~3.07M slots ----
d = poh_synth_device(n_panels=25, tiles_per_panel=60, tile_slots=2048)
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (d.shape[1],), jnp.float32))()
slots = d.ntiles * 2048
log(f"synth: m={d.shape[0]} ntiles={d.ntiles} slots={slots}")
t0 = time.time()
meas = measure_chained(lambda v: d.spmv(v), x0, k1=5, k2=80, points=4, repeats=2)
us = meas.seconds_per_iter * 1e6
log(f"PERF: {us:.1f} us/op  {slots/meas.seconds_per_iter/1e9:.3f} Gslot/s  "
    f"reliable={meas.reliable} checksum={meas.checksum} (wall {time.time()-t0:.1f}s)")
