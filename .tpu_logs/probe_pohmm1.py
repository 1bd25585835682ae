"""Probe: POH SpMM (k=8/32) correctness + perf vs XLA gather SpMM."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.generate import power_law
from cask_tpu.ops.spmm import spmm
from cask_tpu.ops.pallas.poh_kernels import poh_plan, poh_synth_device
from cask_tpu.tune.timing import measure

a = power_law(20000, avg_degree=15, dtype=np.float32, seed=1)
pd = poh_plan(a).device_put()
ad = a.device_put()
X = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (a.shape[1], 8), jnp.float32))()

@jax.jit
def relerr(X):
    ys = pd.spmm(X, precision="split")
    y2 = spmm(ad, X, method="xla")
    return jnp.max(jnp.abs(ys - y2)) / jnp.max(jnp.abs(y2))

t0 = time.time()
log(f"CORRECTNESS spmm split k=8: {float(relerr(X)):.3e} ({time.time()-t0:.1f}s)")

d = poh_synth_device(n_panels=25, tile_slots=4096, tiles_per_panel=30)
slots = d.ntiles * 4096
for k in (8, 32):
    X0 = jax.jit(lambda kk=k: jax.random.normal(jax.random.PRNGKey(1), (d.shape[1], kk), jnp.float32))()
    for mode in ("split", "fast"):
        t0 = time.time()
        meas = measure(lambda v, m=mode: d.spmm(v, precision=m), X0, k1=3, k2=15)
        us = meas.seconds_per_iter * 1e6
        log(f"PERF spmm k={k}/{mode}: {us:.1f} us/op  {slots/meas.seconds_per_iter/1e9:.3f} Gnnz/s  "
            f"({slots*k/meas.seconds_per_iter/1e9:.1f} G(nnz.k)/s)  reliable={meas.reliable} "
            f"(wall {time.time()-t0:.1f}s)")
# XLA baseline k=8 on the real matrix (csr gather spmm)
Xr = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(2), (a.shape[1], 8), jnp.float32))()
t0 = time.time()
meas = measure(lambda v: spmm(ad, v, method="xla"), Xr, k1=3, k2=15)
log(f"PERF xla spmm k=8 (574894 nnz): {meas.seconds_per_iter*1e6:.1f} us/op  "
    f"{a.nnz/meas.seconds_per_iter/1e6:.1f} Mnnz/s  reliable={meas.reliable} (wall {time.time()-t0:.1f}s)")
