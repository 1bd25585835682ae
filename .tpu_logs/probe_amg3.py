"""Probe amg3 (VERDICT r3 item 3): decompose the routed AMG V-cycle and
finish the verdict table.

(a) per-level term timing on the 1.05M isotropic stencil: chained
    A-apply per level, chained P∘R composite per level, full cycle in
    split vs fast POH precision — where do the 11 ms go?
(b) total-time verdict: jacobi-PCG vs ILU-jac(s=2)-PCG vs AMG-PCG on
    the isotropic AND an anisotropic (eps=0.01) 1M stencil.
"""
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

import scipy.sparse as sp

from cask_tpu.formats.convert import from_scipy
from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.formats.generate import stencil_2d
from cask_tpu.ops.dia import dia_plan
from cask_tpu.ops.ilu import ilu0
from cask_tpu.solvers import cg, smoothed_aggregation_amg
from cask_tpu.solvers.precond import jacobi
from cask_tpu.tune.timing import measure_chained

side = int(os.environ.get("PROBE_SIDE", "1024"))
n = side * side


def aniso_stencil(side, eps=0.01):
    """-(u_xx + eps*u_yy) 5-point: strong x-coupling, weak y."""
    tx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(side, side))
    ty = sp.diags([-eps, 2.0 * eps, -eps], [-1, 0, 1], shape=(side, side))
    return (sp.kron(sp.identity(side), tx)
            + sp.kron(ty, sp.identity(side))).tocsr()


def norm_step(f):
    def step(v):
        y = f(v)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
    return step


class _Nan:
    seconds_per_iter = float("nan")
    reliable = False


def best_of(f, x0, tries=2, **kw):
    best = None
    for _ in range(tries):
        m = measure_chained(norm_step(f), x0, **kw)
        if np.isfinite(m.seconds_per_iter) and (
                best is None or m.seconds_per_iter < best.seconds_per_iter):
            best = m
    return best if best is not None else _Nan()


# ---------------- (a) isotropic decomposition --------------------------
t0 = time.time()
a_iso = stencil_2d(side, dtype=np.float64)
log(f"host iso stencil {n} rows in {time.time()-t0:.1f}s")

t0 = time.time()
M = smoothed_aggregation_amg(a_iso, dtype=jnp.float32)
log(f"AMG setup {time.time()-t0:.1f}s; levels {M.level_sizes}; "
    f"ops {[type(lv.a).__name__ for lv in M.levels]}; "
    f"P/R {[type(lv.p).__name__ for lv in M.levels]}")

from cask_tpu.ops.pallas.poh_kernels import PohMatrix

for li, lv in enumerate(M.levels):
  try:
    nf = lv.a.shape[0] if not isinstance(lv.a, jax.Array) else lv.a.shape[0]
    xf = jax.jit(lambda nf=nf: jax.random.normal(
        jax.random.PRNGKey(li), (nf,), jnp.float32))()
    from cask_tpu.solvers.amg import _apply_op

    mA = best_of(lambda v, lv=lv: _apply_op(lv.a, v), xf,
                 k1=3, k2=24, points=3, repeats=2)
    # P∘R composite: xf -> P(R(xf)) is endomorphic at the fine size
    mPR = best_of(lambda v, lv=lv: _apply_op(lv.p, _apply_op(lv.r, v)), xf,
                  k1=3, k2=24, points=3, repeats=2)
    # smoother vector work alone (dinv*, axpy-shaped): x + w d (b - y)
    mS = best_of(lambda v, lv=lv: v + 0.66 * lv.dinv * (v - 0.5 * v), xf,
                 k1=5, k2=40, points=3, repeats=2)
    pn = lv.p.vals.size if isinstance(lv.p, PohMatrix) else -1
    log(f"level {li} n={nf}: A={type(lv.a).__name__} "
        f"{mA.seconds_per_iter*1e6:.1f}us (rel={mA.reliable}) | "
        f"P∘R={type(lv.p).__name__} {mPR.seconds_per_iter*1e6:.1f}us "
        f"(rel={mPR.reliable}, P slots={pn}) | "
        f"smoother-vec {mS.seconds_per_iter*1e6:.1f}us")
  except Exception as e:
    log(f"level {li} measurement failed: {type(e).__name__}: {e}")

x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(99), (n,),
                                       jnp.float32))()
mV = best_of(M, x0, tries=3, k1=3, k2=24, points=3, repeats=2)
log(f"V-cycle split: {mV.seconds_per_iter*1e6:.1f} us/cycle rel={mV.reliable}")

import dataclasses

Mf = dataclasses.replace(M, poh_precision="fast")
mVf = best_of(Mf, x0, tries=3, k1=3, k2=24, points=3, repeats=2)
log(f"V-cycle fast:  {mVf.seconds_per_iter*1e6:.1f} us/cycle rel={mVf.reliable}")

# ---------------- (b) verdict table ------------------------------------
op_iso = stencil2d_dia_device(side, dtype=jnp.float32)
b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (n,),
                                      jnp.float32))()


def solve_row(tag, opfn, Mpre, maxiter):
    t0 = time.time()
    r1 = cg(opfn, b, tol=1e-6, maxiter=maxiter, M=Mpre)
    w1 = time.time() - t0
    t0 = time.time()
    r2 = cg(opfn, b, tol=1e-6, maxiter=maxiter, M=Mpre)
    w2 = time.time() - t0
    log(f"  {tag}: iters={int(r1.iterations)} conv={bool(r1.converged)} "
        f"wall_first={w1:.2f}s wall_warm={w2:.2f}s")


log("verdict: ISOTROPIC 1M")
t0 = time.time()
f_iso = ilu0(a_iso)
log(f"  (ilu0 host {time.time()-t0:.1f}s)")
solve_row("jacobi-PCG", op_iso, jacobi(a_iso), 6000)
solve_row("ilu-jac(2)-PCG", op_iso, f_iso.jacobi_applier(sweeps=2), 4000)
solve_row("AMG-PCG(split)", op_iso, M, 400)
solve_row("AMG-PCG(fast)", op_iso, Mf, 400)

log("verdict: ANISOTROPIC 1M (eps=0.01)")
t0 = time.time()
s_an = aniso_stencil(side)
a_an = from_scipy(s_an, format="csr")
op_an = dia_plan(a_an.astype(jnp.float32)).device_put()
log(f"  (host build {time.time()-t0:.1f}s)")
t0 = time.time()
Man = smoothed_aggregation_amg(a_an, dtype=jnp.float32,
                               poh_precision="fast")
log(f"  (AMG setup {time.time()-t0:.1f}s; levels {Man.level_sizes})")
t0 = time.time()
f_an = ilu0(a_an)
log(f"  (ilu0 host {time.time()-t0:.1f}s)")
opfn_an = lambda x: op_an.spmv(x)  # noqa: E731
solve_row("jacobi-PCG", opfn_an, jacobi(a_an), 30000)
solve_row("ilu-jac(2)-PCG", opfn_an, f_an.jacobi_applier(sweeps=2), 20000)
solve_row("AMG-PCG(fast)", opfn_an, Man, 1000)
log("DONE")
