"""Probe bdia-bf16: the north-star BDIA resident kernel with bf16 VALUES
(x/y stay f32 in the solver layout, so iterations still chain zero-copy).
The value stream is the dominant traffic at dof=4/1M rows: expect the
wall clock to drop ~1.8x at similar roofline fraction."""
import dataclasses, os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas_resident
from cask_tpu.tune.timing import measure_chained
HBM = 819e9

plan = fem_bdia_device(512, dof=4)
plan = dataclasses.replace(plan, vals=(plan.vals * jnp.asarray(1.0 / 32.0, jnp.float32)).astype(jnp.bfloat16))
n = plan.shape[0]
nnz_true = (512 * 512 + 4 * 512 * 511) * 16
useful = nnz_true * 2 + 2 * n * 4  # bf16 values, f32 x/y
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()
x2 = jax.jit(lambda v: plan.to_resident(v))(x0)

# correctness vs the XLA formulation with identical bf16 values
@jax.jit
def err():
    y1 = plan.from_resident(bdia_spmv_pallas_resident(plan, x2))
    y2 = plan._spmv_xla(x0)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
t0 = time.time()
log(f"CORRECTNESS bdia-bf16v relerr={float(err()):.3e} ({time.time()-t0:.1f}s)")

def step(v):
    y = bdia_spmv_pallas_resident(plan, v)
    s = jnp.max(jnp.abs(y)) + jnp.asarray(1e-30, y.dtype)
    return (y / s).astype(v.dtype)

t0 = time.time()
for i in range(4):
    ms = measure_chained(step, x2, k1=5, k2=60, points=3, repeats=2)
    us = ms.seconds_per_iter * 1e6
    log(f"ATTEMPT {i}: {us:.1f} us useful_frac={useful/ms.seconds_per_iter/HBM:.3f} "
        f"gnnz={nnz_true/ms.seconds_per_iter/1e9:.0f} reliable={ms.reliable}")
log(f"(wall {time.time()-t0:.1f}s)")
log("DONE")
