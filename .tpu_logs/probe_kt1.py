"""Probe: transposed-k SpMM (k=32) vs lane-padded kernel, stencil 1M rows."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.ops.pallas import dia_kernels as dk
from cask_tpu.tune.timing import measure

side = 1024
d = stencil2d_dia_device(side, dtype=jnp.float32)
m = side * side
k = 32
kp_s = dk._kt_kp(k)
tl, lo, hi = dk._kt_geometry(d, kp_s, 4)
T = d.m_pad // tl
W = -(-(T * tl + lo + hi) // 128) * 128
log(f"kt geometry: tl={tl} lo={lo} hi={hi} W={W}")

# correctness cross-check vs XLA spmm on a small slice (device-only compare)
ds = stencil2d_dia_device(120, dtype=jnp.float32)
xs = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(2), (ds.shape[1], k), jnp.float32))()
@jax.jit
def err():
    y1 = dk.dia_spmm_pallas_kt(ds, xs)
    y2 = ds._spmm_xla(xs)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
t0 = time.time()
log(f"CORRECTNESS kt relerr={float(err()):.3e} ({time.time()-t0:.1f}s)")

xt0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (kp_s, W), jnp.float32))()
ideal_kt = (5 * d.m_pad + 2 * kp_s * d.m_pad) * 4
t0 = time.time()
meas = measure(lambda v: dk.dia_spmm_pallas_kt_padded(d, v), xt0, k1=4, k2=24)
us = meas.seconds_per_iter * 1e6
log(f"PERF kt k=32: {us:.1f} us/op  useful {ideal_kt/meas.seconds_per_iter/1e9:.1f} GB/s  "
    f"reliable={meas.reliable} (wall {time.time()-t0:.1f}s)")

# lane-padded baseline
xp0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1),
      (dk.pad_x_spmm(d, jnp.zeros((d.shape[1], k), jnp.float32)).shape), jnp.float32))()
log(f"padded baseline operand: {xp0.shape}")
t0 = time.time()
meas2 = measure(lambda v: dk.dia_spmm_pallas_padded(d, v), xp0, k1=4, k2=24)
us2 = meas2.seconds_per_iter * 1e6
log(f"PERF padded k=32(kp=128): {us2:.1f} us/op  reliable={meas2.reliable} "
    f"speedup={us2/us:.2f}x (wall {time.time()-t0:.1f}s)")
