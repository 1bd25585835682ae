"""Probe solvers3 (VERDICT r3 item 7): block-solver and nonsymmetric
solver hardware numbers.

(a) block_cg per-iteration on the 1M-row fem dof-4 BDIA matrix over the
    spmm dispatch: s=8 (scalar-DIA kt path) and s=128 (BDIA ring) —
    where the T3 SpMM work earns or loses its keep.
(b) LOBPCG(s=8) per-iteration on the SPD 1M stencil (block path twin).
(c) BiCGStab per-iteration on the 262k nonsymmetric banded system
    (probe_amg1's GMRES system), plus one real solve.
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

from cask_tpu.formats.device_gen import fem_bdia_device, stencil2d_dia_device
from cask_tpu.ops.spmm import spmm
from cask_tpu.solvers import bicgstab, block_cg
from cask_tpu.solvers.eig import lobpcg


def ladder(f, arg, ks):
    def run(k):
        t0 = time.perf_counter()
        float(f(arg, jnp.asarray(k, jnp.int32)))
        return time.perf_counter() - t0

    t0 = time.time()
    run(ks[0]); run(ks[-1])
    log(f"  compiled+warm in {time.time()-t0:.1f}s")
    walls = {}
    for _ in range(2):
        for k in ks:
            walls[k] = min(walls.get(k, float("inf")), run(k))
    slopes = sorted((walls[b2] - walls[a2]) / (b2 - a2)
                    for a2 in ks for b2 in ks if b2 > a2)
    return slopes[len(slopes) // 2], walls


# ---- (a) block_cg on the 1M fem BDIA matrix ---------------------------
plan = fem_bdia_device(512, dof=4)
plan = dataclasses.replace(plan,
                           vals=plan.vals * jnp.asarray(1.0 / 32.0, jnp.float32))
n = plan.shape[0]
nnz = (512 * 512 + 4 * 512 * 511) * 16
log(f"fem bdia n={n} nnz={nnz}")

for S, ks in ((8, (5, 25, 50, 75)), (128, (3, 9, 15, 21))):
    B = jax.jit(lambda S=S: jax.random.normal(
        jax.random.PRNGKey(1), (n, S), jnp.float32))()
    fb = jax.jit(lambda v, k: block_cg(
        lambda V: spmm(plan, V), v, tol=0.0, maxiter=k).iterations
        .astype(jnp.float32))
    per, walls = ladder(fb, B, ks)
    log(f"block_cg s={S} (fem-1M, spmm dispatch): {per*1e6:.1f} us/iter = "
        f"{per*1e6/S:.2f} us/iter/rhs  "
        f"walls={ {k: round(v, 3) for k, v in walls.items()} }")

# ---- (b) LOBPCG s=8 on the SPD 1M stencil -----------------------------
side = 1024
m = side * side
dia = stencil2d_dia_device(side, dtype=np.float32)
X0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(2), (m, 8),
                                       jnp.float32))()
fl = jax.jit(lambda v, k: lobpcg(
    lambda V: spmm(dia, V), v, tol=0.0, maxiter=k).iterations
    .astype(jnp.float32))
per, walls = ladder(fl, X0, ks=(3, 9, 15, 21))
log(f"lobpcg s=8 (stencil-1M): {per*1e6:.1f} us/iter  "
    f"walls={ {k: round(v, 3) for k, v in walls.items()} }")

# ---- (c) BiCGStab on the 262k nonsymmetric banded system --------------
side_n = 512
mn = side_n * side_n
dia_n = stencil2d_dia_device(side_n, dtype=np.float32)
offs = dia_n.offsets
scale = np.ones((len(offs), 1), np.float32)
for i, o in enumerate(offs):
    if o == 1:
        scale[i] = 1.3
    elif o == -1:
        scale[i] = 0.7
nsym = dataclasses.replace(dia_n, vals=dia_n.vals * jnp.asarray(scale))
bn = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(3), (mn,),
                                       jnp.float32))()
fbi = jax.jit(lambda v, k: bicgstab(
    lambda x: nsym.spmv(x), v, tol=0.0, maxiter=k).iterations
    .astype(jnp.float32))
per, walls = ladder(fbi, bn, ks=(10, 60, 120, 180))
log(f"bicgstab (262k nonsym banded): {per*1e6:.1f} us/iter "
    f"(2 SpMV + 4 dots/iter)  "
    f"walls={ {k: round(v, 3) for k, v in walls.items()} }")

t0 = time.time()
res = bicgstab(lambda x: nsym.spmv(x), bn, tol=1e-6, maxiter=2000)
log(f"bicgstab real solve: iters={int(res.iterations)} "
    f"conv={bool(res.converged)} resid={float(res.residual_norm):.2e} "
    f"wall={time.time()-t0:.1f}s")
log("DONE")
