"""Probe slabmm1 (VERDICT r5 item 3): the MXU attempt at wide-k SpMM.

A/B in one session on the 1M-row fem dof-4 matrix at k=128:
- ring (the shipped VPU kernel, r3/r4 reference ~8.7 ms, 0.163 useful)
- slab MXU kernel, f32 slabs, G=16 (traffic floor ~3.7 ms)
- slab MXU kernel, bf16 slabs + f32 X/Y (floor ~3.1 ms)
- slab MXU kernel, f32, G=8 (smaller slab stream, smaller DMAs)

All chained max-normalized like probe_bspmm1/2 (comparable numbers).
Also: bare chain (scaled matrix, no normalize) for the slab default,
and exactness vs the ring on device.
"""
import dataclasses
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmm_pallas_ring
from cask_tpu.ops.pallas.bdia_slab import (
    bdia_slab_plan,
    bdia_spmm_slab_padded,
)
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx = int(os.environ.get("SLAB_NX", "512"))  # CPU smoke: SLAB_NX=32
dof, k = 4, 128
plan = fem_bdia_device(nx, dof=dof, dtype=jnp.float32)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1 / 64.0,
                                                              jnp.float32))
n = plan.shape[0]
nnz = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
useful = nnz * 4 + 2 * n * k * 4
log(f"n={n} nnz={nnz} useful={useful/1e9:.3f} GB floor={useful/HBM*1e3:.2f} ms")

X0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n, k),
                                       jnp.float32))()


def bench(tag, step, x, attempts=3, operands=None):
    best = None
    t0 = time.time()
    for _ in range(attempts):
        ms = measure_chained(step, x, operands=operands,
                             k1=2, k2=10, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    us = best.seconds_per_iter * 1e6
    log(f"[{tag}] {us:.1f} us useful_frac={useful/best.seconds_per_iter/HBM:.3f} "
        f"rel={best.reliable} (wall {time.time()-t0:.1f}s)")
    return best


def norm(Y):
    return (Y / (jnp.max(jnp.abs(Y)) + jnp.asarray(1e-30, jnp.float32)))


# --- ring reference (A/B) -------------------------------------------------
def ring_step(V):
    return norm(bdia_spmm_pallas_ring(plan, V)).astype(V.dtype)


t0 = time.time()
ring = bench("ring_vpu_norm", ring_step, X0)

# --- slab G=16 f32 --------------------------------------------------------
log("building slab plan G=16 f32...")
sl16 = bdia_slab_plan(plan, 16)
jax.block_until_ready(sl16.slabs)
Xp0 = jax.jit(sl16.to_padded)(X0)


# slabs ride as TRACED operands: 840 MB of closed-over constants kills
# the remote compile with HTTP 413 (first probe run died exactly there)
def slab_norm(V, sl):
    return norm(bdia_spmm_slab_padded(sl, V)).astype(V.dtype)


def slab_bare(V, sl):
    return bdia_spmm_slab_padded(sl, V)


s16 = bench("slab16_f32_norm", slab_norm, Xp0, operands=sl16)
s16b = bench("slab16_f32_bare", slab_bare, Xp0, operands=sl16)

# --- exactness vs ring (device) ------------------------------------------
@jax.jit
def err16(X, sl):
    y1 = sl.from_padded(bdia_spmm_slab_padded(sl, sl.to_padded(X)), k)
    y2 = bdia_spmm_pallas_ring(plan, X)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))


log(f"slab16 default-precision relerr vs ring: {float(err16(X0, sl16)):.3e}")

# --- slab G=16 f32 HIGHEST (exact-class; 6-pass MXU) ----------------------
def slab_hi_norm(V, sl):
    return norm(bdia_spmm_slab_padded(sl, V,
                                      precision="highest")).astype(V.dtype)


try:
    s16h = bench("slab16_f32_highest_norm", slab_hi_norm, Xp0, operands=sl16)

    @jax.jit
    def err16h(X, sl):
        y1 = sl.from_padded(
            bdia_spmm_slab_padded(sl, sl.to_padded(X),
                                  precision="highest"), k)
        y2 = bdia_spmm_pallas_ring(plan, X)
        return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))

    log(f"slab16 HIGHEST relerr vs ring: {float(err16h(X0, sl16)):.3e}")
except Exception as e:  # noqa: BLE001
    log(f"highest-precision slab variant failed: {type(e).__name__}: {e}")

# --- slab G=16 bf16 slabs -------------------------------------------------
log("building slab plan G=16 bf16...")
sl16b = bdia_slab_plan(plan, 16, dtype=jnp.bfloat16)
jax.block_until_ready(sl16b.slabs)


def slab_bf_norm(V, sl):
    return norm(bdia_spmm_slab_padded(sl, V,
                                      out_dtype=jnp.float32)).astype(V.dtype)


bench("slab16_bf16slab_norm", slab_bf_norm, Xp0, operands=sl16b)

# --- slab G=8 f32 ---------------------------------------------------------
log("building slab plan G=8 f32...")
sl8 = bdia_slab_plan(plan, 8)
jax.block_until_ready(sl8.slabs)
Xp8 = jax.jit(sl8.to_padded)(X0)


bench("slab8_f32_norm", slab_norm, Xp8, operands=sl8)

log("DONE")

# --- fully-bf16 streams (slab + X + Y bf16; the MXU already computes at
# bf16 default precision, so the stream halving is ~free accuracy-wise) ---
Xpb = jax.jit(lambda v: sl16b.to_padded(v.astype(jnp.bfloat16)))(X0)


def slab_bf16chain(V, sl):
    Y = bdia_spmm_slab_padded(sl, V, out_dtype=jnp.bfloat16)
    s = jnp.max(jnp.abs(Y).astype(jnp.float32)) + 1e-30
    return (Y.astype(jnp.float32) / s).astype(jnp.bfloat16)


bench("slab16_allbf16_norm", slab_bf16chain, Xpb, operands=sl16b)
log("DONE2")
