"""Probe bf16mm: ring SpMM k=128 with fully-bf16 streams (values, X, Y)
— the remaining SpMM lever documented in PERF.md.  Accumulate stays f32
in-kernel; out_dtype=bf16 keeps the pipeline endomorphic for chaining."""
import dataclasses, os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.ops.pallas import dia_kernels as dk
from cask_tpu.tune.timing import measure_chained
HBM = 819e9
side = 1024; m = side * side
k = 128

# correctness on a small instance: bf16 pipeline vs f32 XLA
ds = stencil2d_dia_device(120, dtype=jnp.float32)
dsb = dataclasses.replace(ds, vals=ds.vals.astype(jnp.bfloat16),
                          rem_data=ds.rem_data.astype(jnp.bfloat16))
xs = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(2), (ds.shape[1], k), jnp.float32))()
@jax.jit
def err():
    xpb = dk.to_spmm_ring(dsb, xs.astype(jnp.bfloat16))
    yb = dk.from_spmm_ring(dsb, dk.dia_spmm_pallas_ring_padded(dsb, xpb, out_dtype=jnp.bfloat16), k)
    ref = ds._spmm_xla(xs)
    return jnp.max(jnp.abs(yb.astype(jnp.float32) - ref)) / jnp.max(jnp.abs(ref))
t0 = time.time()
log(f"CORRECTNESS ring-bf16 relerr={float(err()):.3e} ({time.time()-t0:.1f}s)")

d = stencil2d_dia_device(side, dtype=jnp.float32)
d = dataclasses.replace(d, vals=(d.vals * jnp.asarray(0.125, jnp.float32)).astype(jnp.bfloat16),
                        rem_data=d.rem_data.astype(jnp.bfloat16))
x0 = jax.jit(lambda: (0.1 * jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)).astype(jnp.bfloat16))()
xp = jax.jit(lambda v: dk.to_spmm_ring(d, v))(x0)
useful = d.traffic_bytes + 2 * m * k * 2  # bf16 X and Y
best = None
t0 = time.time()
for _ in range(3):
    ms = measure_chained(lambda v: dk.dia_spmm_pallas_ring_padded(d, v, out_dtype=jnp.bfloat16), xp)
    if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
        best = ms
log(f"PERF spmm-ring-bf16 k={k}: {best.seconds_per_iter*1e3:.3f} ms/op "
    f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
    f"GBs={useful/best.seconds_per_iter/1e9:.0f} reliable={best.reliable} "
    f"(wall {time.time()-t0:.1f}s)")
log("DONE")
