"""Probe bmm1 (VERDICT r5 item 3, the literal formulation): per-offset
batched dot_general SpMM — einsum('iab,ibk->iak') over shifted X strips
per block diagonal, pure XLA (no Pallas).

Expectation from the traffic model: each of the 5 einsums materializes
its (nbr, b, k) partial and re-reads X shifted, so XLA pays ~5 X-reads
+ ~4 partial-sum round trips ≈ 6 GB; plus batched (4,4)@(4,128) matmuls
are far below MXU tile size.  Measured here so the formulation space is
recorded, not guessed.
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
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx, dof, k = 512, 4, 128
plan = fem_bdia_device(nx, dof=dof, dtype=jnp.float32)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1 / 64.0,
                                                              jnp.float32))
n = plan.shape[0]
nbr = n // dof
nnz = (nx * nx + 4 * nx * (nx - 1)) * dof * dof
useful = nnz * 4 + 2 * n * k * 4
log(f"n={n} useful={useful/1e9:.3f} GB floor={useful/HBM*1e3:.2f} ms")

# natural per-offset blocks (nbr, b, b) from the plan layout
br = dof
npairs = plan.npairs
v_nat = plan.vals.transpose(0, 1, 3, 4, 2).reshape(br, plan.nb_pad, npairs)
offs = plan.block_offsets
blocks = {}
for dpos, d in enumerate(offs):
    bd = v_nat[:, :nbr, dpos * dof : (dpos + 1) * dof]  # (br, i, c)
    blocks[d] = jnp.moveaxis(bd, 0, 1)  # (nbr, br, bc)
blocks = jax.device_put(blocks)

X0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n, k),
                                       jnp.float32))()


def bmm_step(X, ops):
    Xb = X.reshape(nbr, dof, k)
    Y = jnp.zeros((nbr, dof, k), jnp.float32)
    for d in offs:
        # shift X by d block rows (zero padding discipline)
        if d == 0:
            Xs = Xb
        elif d > 0:
            Xs = jnp.concatenate(
                [Xb[d:], jnp.zeros((d, dof, k), jnp.float32)], axis=0)
        else:
            Xs = jnp.concatenate(
                [jnp.zeros((-d, dof, k), jnp.float32), Xb[:d]], axis=0)
        Y = Y + jnp.einsum("iab,ibk->iak", ops[d], Xs,
                           preferred_element_type=jnp.float32)
    Y = Y.reshape(n, k)
    return (Y / (jnp.max(jnp.abs(Y)) + 1e-30)).astype(X.dtype)


t0 = time.time()
ms = None
for _ in range(3):
    m = measure_chained(bmm_step, X0, operands=blocks,
                        k1=2, k2=10, points=3, repeats=2)
    if np.isfinite(m.seconds_per_iter) and (
            ms is None or m.seconds_per_iter < ms.seconds_per_iter):
        ms = m
log(f"[xla_bmm_per_offset] {ms.seconds_per_iter*1e6:.1f} us "
    f"useful_frac={useful/ms.seconds_per_iter/HBM:.3f} rel={ms.reliable} "
    f"(wall {time.time()-t0:.1f}s)")

# correctness vs the plan's XLA reference
@jax.jit
def err(X, ops):
    Xb = X.reshape(nbr, dof, k)
    Y = jnp.zeros((nbr, dof, k), jnp.float32)
    for d in offs:
        if d == 0:
            Xs = Xb
        elif d > 0:
            Xs = jnp.concatenate(
                [Xb[d:], jnp.zeros((d, dof, k), jnp.float32)], axis=0)
        else:
            Xs = jnp.concatenate(
                [jnp.zeros((-d, dof, k), jnp.float32), Xb[:d]], axis=0)
        Y = Y + jnp.einsum("iab,ibk->iak", ops[d], Xs,
                           preferred_element_type=jnp.float32)
    y2 = plan._spmv_xla(X[:, 0])
    return jnp.max(jnp.abs(Y.reshape(n, k)[:, 0] - y2)) / jnp.max(jnp.abs(y2))


log(f"bmm relerr vs plan xla (col 0): {float(err(X0, blocks)):.3e}")
log("DONE")
