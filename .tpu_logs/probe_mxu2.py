"""Probe mxu2: MXU-hybrid ring SpMM retry after the scatter-add fix
(probe_spmm_mxu (b) failed to lower: value .at[].add -> Mosaic
scatter-add unimplemented; now a concat of statically-unrolled
sub-tiles).  Near band {-1,0,1} as banded-dense bf16 MXU contractions,
far +-1024 on the VPU.  Correctness gate first (bf16 near band ->
~1e-3 class), then the ladder, plus a plain-ring A/B in the same
session (same relay window)."""
import os, time, dataclasses
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.ops.pallas.dia_kernels import (
    dia_spmm_pallas_ring_padded, dia_spmm_pallas_ring_mxu_padded,
    to_spmm_ring)
from cask_tpu.tune.timing import measure_chained
HBM = 819e9

side = 1024
plan = stencil2d_dia_device(side, dtype=jnp.float32)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0/8.0, jnp.float32))
n = plan.shape[0]
k = 128
nnz = int(np.sum([n - abs(o) for o in plan.offsets]))
useful = nnz*4 + 2*n*k*4

X0 = jax.jit(lambda: 0.1 * jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.float32))()
xp0 = jax.jit(lambda X: to_spmm_ring(plan, X))(X0)

# correctness: hybrid vs plain ring on the same strip (one scalar fetch)
@jax.jit
def err(v):
    y1 = dia_spmm_pallas_ring_mxu_padded(plan, v, tmx=256)
    y2 = dia_spmm_pallas_ring_padded(plan, v)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
t0 = time.time()
log(f"[hybrid tmx=256] relerr vs ring = {float(err(xp0)):.3e} ({time.time()-t0:.1f}s)")

def run(tag, fn):
    def step(v):
        y = fn(v)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
    best = None
    t0 = time.time()
    for _ in range(3):
        ms = measure_chained(step, xp0, k1=3, k2=24, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
        f"reliable={best.reliable} (wall {time.time()-t0:.1f}s)")

run("ring plain (A/B)", lambda v: dia_spmm_pallas_ring_padded(plan, v))
for tmx in (256, 512):
    try:
        run(f"mxu-hybrid tmx={tmx}",
            lambda v, tmx=tmx: dia_spmm_pallas_ring_mxu_padded(plan, v, tmx=tmx))
    except Exception as e:
        log(f"[mxu-hybrid tmx={tmx}] FAILED: {type(e).__name__}: {str(e)[:250]}")
log("DONE")
