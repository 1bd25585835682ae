"""Probe 4: ring SpMM at k=128/32 vs windowed; clean il_stream A/B
(probe3's A ran concurrently with another bench — re-measure alone)."""
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
side = 1024
m = side * side
nnz = 5 * m - 4 * side

def best_of(fn, n=3, **kw):
    best = None
    for _ in range(n):
        ms = measure_chained(fn, **kw)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    return best

# correctness first (small, on-device): ring vs xla
ds = stencil2d_dia_device(120, dtype=jnp.float32)
xs = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(2), (ds.shape[1], 128), jnp.float32))()
@jax.jit
def err():
    y1 = dk.dia_spmm_pallas_ring(ds, xs)
    y2 = ds._spmm_xla(xs)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
t0 = time.time()
log(f"CORRECTNESS ring k=128 relerr={float(err()):.3e} ({time.time()-t0:.1f}s)")

d = stencil2d_dia_device(side, dtype=jnp.float32)
d = dataclasses.replace(d, vals=d.vals * jnp.asarray(0.125, jnp.float32))

for k in (128, 32):
    kp = max(128, -(-k // 128) * 128)
    x0 = jax.jit(lambda: 0.1 * jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32))()
    xp = jax.jit(lambda v: dk.to_spmm_ring(d, v))(x0)
    useful = d.traffic_bytes + 2 * m * k * 4
    moved = d.traffic_bytes + 2 * m * kp * 4
    t0 = time.time()
    # the padded op is endomorphic and a contraction (scaled vals)
    best = best_of(lambda v: dk.dia_spmm_pallas_ring_padded(d, v), x0=xp)
    log(f"PERF spmm-ring k={k}: {best.seconds_per_iter*1e3:.3f} ms/op "
        f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
        f"moved_frac={moved/best.seconds_per_iter/HBM:.3f} "
        f"GBs={useful/best.seconds_per_iter/1e9:.0f} reliable={best.reliable} "
        f"(wall {time.time()-t0:.1f}s)")

# windowed baseline at k=128 (not endo; 2-call composition trick: pad
# output back via the ring layout is unfair — instead measure via the
# plan's own padded form with a y->x embed whose cost we report too)
# Simpler honest baseline: the kt kernel at k=32 is already in PERF.md;
# for k=128 compare against the r1 number (294 GB/s useful).

# clean il_stream A/B
x1 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (m,), jnp.float32))()
for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    dd = stencil2d_dia_device(side, dtype=dtype)
    dd = dataclasses.replace(dd, vals=dd.vals * jnp.asarray(0.125, dtype))
    bo = dd.traffic_bytes + 2 * m * 4
    xI = jax.jit(lambda v: dk.to_interleaved(dd, v))(x1)
    vI = jax.jit(lambda: dk.pack_vals_interleaved(dd))()
    for name, fn in (("il_stream", dk.dia_spmv_pallas_il_stream),
                     ("il_resident", dk.dia_spmv_pallas_interleaved)):
        t0 = time.time()
        best = best_of(lambda v: fn(dd, v, vI), x0=xI)
        log(f"PERF {name}_{tag}: {best.seconds_per_iter*1e6:.2f} us/op "
            f"frac={bo/best.seconds_per_iter/HBM:.3f} reliable={best.reliable} "
            f"(wall {time.time()-t0:.1f}s)")
log("DONE")
