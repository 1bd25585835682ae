"""Probe slabmm2: the X-ring slab variant on hardware.

Same-session A/B vs the shipped BlockSpec slab kernel (whose X traffic
is (1+nfar)x).  Expected floors (1M fem dof-4, k=128, G=16):
BlockSpec f32 3.65 ms vs ring f32 2.34 ms; all-bf16 1.17 ms.
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
from cask_tpu.ops.pallas.bdia_slab import (
    bdia_slab_plan,
    bdia_spmm_slab_padded,
    bdia_spmm_slab_ring_padded,
)
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx, dof, k = 512, 4, 128
plan = fem_bdia_device(nx, dof=dof, dtype=jnp.float32)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1 / 64.0,
                                                              jnp.float32))
n = plan.shape[0]
nnz = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
useful = nnz * 4 + 2 * n * k * 4
log(f"n={n} useful={useful/1e9:.3f} GB floor={useful/HBM*1e3:.2f} ms")

X0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n, k),
                                       jnp.float32))()
sl16 = bdia_slab_plan(plan, 16)
jax.block_until_ready(sl16.slabs)
Xp0 = jax.jit(sl16.to_padded)(X0)


def bench(tag, step, x, operands, attempts=3):
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
    return Y / (jnp.max(jnp.abs(Y)) + jnp.asarray(1e-30, jnp.float32))


def bs_bare(V, sl):
    return bdia_spmm_slab_padded(sl, V)


def ring_bare(V, sl):
    return bdia_spmm_slab_ring_padded(sl, V)


def ring_norm(V, sl):
    return norm(bdia_spmm_slab_ring_padded(sl, V)).astype(V.dtype)


def ring_hi_norm(V, sl):
    return norm(bdia_spmm_slab_ring_padded(sl, V,
                                           precision="highest")).astype(V.dtype)


bench("blockspec_f32_bare(anchor)", bs_bare, Xp0, sl16)
bench("ring_f32_bare", ring_bare, Xp0, sl16)
bench("ring_f32_norm", ring_norm, Xp0, sl16)


@jax.jit
def err(X, sl):
    y1 = bdia_spmm_slab_ring_padded(sl, X)
    y2 = bdia_spmm_slab_padded(sl, X)
    return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))


log(f"ring vs blockspec relerr (expect 0): {float(err(Xp0, sl16)):.3e}")

bench("ring_f32_highest_norm", ring_hi_norm, Xp0, sl16)

log("building bf16 slab plan...")
sl16b = bdia_slab_plan(plan, 16, dtype=jnp.bfloat16)
jax.block_until_ready(sl16b.slabs)
Xpb = jax.jit(lambda v: sl16b.to_padded(v.astype(jnp.bfloat16)))(X0)


def ring_bf16chain(V, sl):
    Y = bdia_spmm_slab_ring_padded(sl, V, out_dtype=jnp.bfloat16)
    s = jnp.max(jnp.abs(Y).astype(jnp.float32)) + 1e-30
    return (Y.astype(jnp.float32) / s).astype(jnp.bfloat16)


bench("ring_allbf16_norm", ring_bf16chain, Xpb, sl16b)
log("DONE")
