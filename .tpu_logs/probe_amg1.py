"""VERDICT r2 item 7: hardware numbers for AMG apply + a non-CG solver.

(a) smoothed_aggregation_amg V-cycle apply per-application and AMG-PCG
    per-iteration on the 262k-row stencil (current implementation: level
    operators are CSR -> csr_xla gathers; the question is whether the
    apply is gather-dominated the way ILU apply was scan-dominated).
(b) GMRES(m=32) per-restart on a nonsymmetric banded system (DIA op).

Ladder protocol throughout (median pairwise slope over iteration-count
walls); operands built on device where possible, AMG levels are
host-built by necessity (Galerkin products) and uploaded once.
"""
import os
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

side = 512
m = side * side


def ladder(f, arg, ks, repeats=2):
    def run(k):
        t0 = time.perf_counter()
        float(f(arg, jnp.asarray(k, jnp.int32)))
        return time.perf_counter() - t0

    t0 = time.time()
    run(ks[0]); run(ks[-1])
    print(f"  compiled+warm in {time.time()-t0:.1f} s", flush=True)
    walls = {}
    for _ in range(repeats):
        for k in ks:
            walls[k] = min(walls.get(k, float("inf")), run(k))
    slopes = sorted((walls[b2] - walls[a2]) / (b2 - a2)
                    for a2 in ks for b2 in ks if b2 > a2)
    mid = len(slopes) // 2
    med = slopes[mid] if len(slopes) % 2 else 0.5 * (slopes[mid - 1] + slopes[mid])
    return med, walls


# ---------------------------------------------------------------- (b) GMRES
# nonsymmetric banded system from the device-generated stencil: scale the
# +/-1 diagonals asymmetrically (convection-like), diagonally dominant.
import dataclasses
from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.solvers import gmres

dia = stencil2d_dia_device(side, dtype=np.float32)
offs = dia.offsets
scale = np.ones((len(offs), 1), np.float32)
for i, o in enumerate(offs):
    if o == 1:
        scale[i] = 1.3
    elif o == -1:
        scale[i] = 0.7
nsym = dataclasses.replace(dia, vals=dia.vals * jnp.asarray(scale))
b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), jnp.float32))()

print("GMRES(32) per-restart ladder (262k-row nonsymmetric banded, DIA op):",
      flush=True)
fg = jax.jit(lambda v, k: gmres(lambda x: nsym.spmv(x), v, tol=0.0,
                                restart=32, maxiter=k).iterations.astype(jnp.float32))
per, walls = ladder(fg, b, ks=(2, 8, 16, 24))
print(f"gmres(m=32): {per*1e3:.2f} ms/restart ({per*1e6/32:.1f} us/inner-iter) "
      f"walls={ {k: round(v, 3) for k, v in walls.items()} }", flush=True)

# one real solve for convergence sanity
t0 = time.time()
res = jax.jit(lambda v: gmres(lambda x: nsym.spmv(x), v, tol=1e-6,
                              restart=32, maxiter=60).residual_norm)(b)
print(f"gmres solve relres={float(res)/float(jnp.linalg.norm(b)):.2e} "
      f"wall={time.time()-t0:.1f}s", flush=True)

# ---------------------------------------------------------------- (a) AMG
from cask_tpu.formats.generate import stencil_2d
from cask_tpu.solvers import cg
from cask_tpu.solvers.amg import smoothed_aggregation_amg

t0 = time.time()
a_host = stencil_2d(side, dtype=np.float32)
amg = smoothed_aggregation_amg(a_host, dtype=jnp.float32)
print(f"AMG setup (host) {time.time()-t0:.1f} s; level sizes:",
      amg.level_sizes, flush=True)

# chained V-cycle apply with per-step normalization (linear operator)
def vstep(v):
    y = amg.apply(v)
    s = jnp.max(jnp.abs(y)) + jnp.asarray(1e-30, y.dtype)
    return (y / s).astype(v.dtype)


def chain(v, k):
    def body(i, x):
        return vstep(x)
    xk = jax.lax.fori_loop(0, k, body, v)
    return jnp.mean(jnp.abs(xk[:128]))


print("AMG V-cycle apply ladder (csr_xla level operators):", flush=True)
t0 = time.time()
per, walls = ladder(jax.jit(chain), b, ks=(2, 8, 16, 24))
print(f"amg apply: {per*1e3:.2f} ms/cycle "
      f"walls={ {k: round(v, 3) for k, v in walls.items()} }", flush=True)

print("AMG-PCG per-iteration ladder:", flush=True)
op = dia  # SPD stencil via the DIA device plan (fast operator; M is the cost)
fc = jax.jit(lambda v, k: cg(lambda x: op.spmv(x), v, tol=0.0, maxiter=k,
                             M=amg.apply).iterations.astype(jnp.float32))
per, walls = ladder(fc, b, ks=(2, 8, 16, 24))
print(f"amg-pcg: {per*1e3:.2f} ms/iter "
      f"walls={ {k: round(v, 3) for k, v in walls.items()} }", flush=True)

# convergence benefit: iterations to 1e-6 with AMG vs Jacobi
from cask_tpu.solvers.precond import jacobi

fj = jax.jit(lambda v: cg(lambda x: op.spmv(x), v, tol=1e-6, maxiter=3000,
                          M=jacobi(a_host)).iterations)
fa = jax.jit(lambda v: cg(lambda x: op.spmv(x), v, tol=1e-6, maxiter=300,
                          M=amg.apply).iterations)
print(f"iters to 1e-6: jacobi-pcg={int(fj(b))}  amg-pcg={int(fa(b))}", flush=True)
print("DONE", flush=True)
