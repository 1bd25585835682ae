"""Probe spmm_mxu (VERDICT r2 item 5): one honest MXU attempt at the
ring SpMM 0.385 wall, plus a realignment diagnostic.

(a) diagnostic: the same ring kernel on 5-diagonal value sets whose
    offsets differ only in alignment —
      real stencil {-1024, -1, 0, 1, 1024}   (±1: sub-sublane shifts)
      sublane-aligned {-1024, -8, 0, 8, 1024}
      vreg-aligned {-1024, -512, 0, 512, 1024}
    identical traffic and piece count; the deltas attribute the wall.
    (timing-only: offsets are swapped on the same value arrays, results
    are finite but not a real matrix product)
(b) the MXU-hybrid kernel on the real stencil: near band {-1,0,1} as a
    per-sub-tile banded-dense bf16 MXU contraction, far ±1024 on VPU.
"""
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

def run(tag, p, fn):
    def step(v):
        y = fn(p, v)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
    best = None
    t0 = time.time()
    for _ in range(3):
        ms = measure_chained(step, xp0, k1=3, k2=24, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
        f"reliable={best.reliable} (wall {time.time()-t0:.1f}s)")

# (a) alignment ladder — identical kernel, offsets swapped
for tag, offs in (("real ±1", (-1024, -1, 0, 1, 1024)),
                  ("sublane ±8", (-1024, -8, 0, 8, 1024)),
                  ("vreg ±512", (-1024, -512, 0, 512, 1024))):
    p = dataclasses.replace(plan, offsets=offs)
    run(f"ring {tag}", p, lambda p_, v: dia_spmm_pallas_ring_padded(p_, v))

# (b) MXU-hybrid on the real stencil
for tmx in (256, 512):
    try:
        run(f"mxu-hybrid tmx={tmx}", plan,
            lambda p_, v, tmx=tmx: dia_spmm_pallas_ring_mxu_padded(p_, v, tmx=tmx))
    except Exception as e:
        log(f"[mxu-hybrid tmx={tmx}] FAILED: {type(e).__name__}: {str(e)[:250]}")
log("DONE")
