"""Probe solvers2 (VERDICT r2 weak-6 completion): per-iteration cost of
bicgstab / minres / chebyshev on the 1M-unknown Poisson system with the
solver-resident DIA interleaved operator, plus LOBPCG (block-8) per
iteration.  Same ladder protocol as probe_solvers1 (cg 52.0, pipelined
40.5 us/iter reference)."""
import time
import os
import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.ops.dia import DiaOperator, spmm_dia
from cask_tpu.solvers import bicgstab, chebyshev, minres

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

side = 1024
m = side * side
log("devices:", jax.devices())
t0 = time.time()
dia = stencil2d_dia_device(side, dtype=np.float32)
op = DiaOperator(dia)
log("operator mode:", op.mode, "build", round(time.time() - t0, 1), "s")

b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), jnp.float32))()
bp = op.to_padded(b)


def ladder(f, arg, ks=(10, 200, 400, 600)):
    def run(k):
        t0 = time.perf_counter()
        int(f(arg, jnp.asarray(k, jnp.int32)))
        return time.perf_counter() - t0

    tcomp = time.time()
    run(ks[0]); run(ks[-1])
    log("  compiled in", round(time.time() - tcomp, 1), "s")
    walls = {}
    for _ in range(2):
        for k in ks:
            walls[k] = min(walls.get(k, float("inf")), run(k))
    slopes = sorted((walls[b2] - walls[a2]) / (b2 - a2)
                    for a2 in ks for b2 in ks if b2 > a2)
    return slopes[len(slopes) // 2], walls


for name, mk in (
    ("bicgstab", lambda v, k: bicgstab(op, v, tol=0.0, maxiter=k).iterations),
    ("minres", lambda v, k: minres(op, v, tol=0.0, maxiter=k).iterations),
    ("chebyshev", lambda v, k: chebyshev(op, v, lmin=7.5e-6, lmax=1.999,
                                         tol=0.0, maxiter=k).iterations),
):
    try:
        f = jax.jit(mk)
        per, walls = ladder(f, bp)
        log(f"{name}: {per*1e6:.1f} us/iter  walls={ {k: round(v,4) for k,v in walls.items()} }")
    except Exception as e:
        log(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}")

# LOBPCG block-8 per-iteration (block SpMM + Rayleigh-Ritz on device)
try:
    from cask_tpu.solvers import lobpcg

    S = 8
    X0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(2), (m, S),
                                           jnp.float32))()
    fe = jax.jit(lambda v, k: lobpcg(lambda V: spmm_dia(dia, V), v,
                                     tol=0.0, maxiter=k).iterations)
    per, walls = ladder(fe, X0, ks=(3, 10, 20, 30))
    log(f"lobpcg s={S}: {per*1e6:.1f} us/iter  walls={ {k: round(v,4) for k,v in walls.items()} }")
except Exception as e:
    log(f"lobpcg FAILED: {type(e).__name__}: {str(e)[:250]}")

# Mixed-precision refinement vs emulated-f64 CG: wall to ||r|| <= 1e-10||b||
# on a 262k Poisson system (f64 ops are emulated on v5e — the dtype-story
# measurement, SURVEY §7(e)).
try:
    import jax.numpy as jnp
    from cask_tpu.solvers import ir_solve, cg as _cg
    from cask_tpu.formats.device_gen import stencil2d_dia_device

    jax.config.update("jax_enable_x64", True)
    side2 = 512
    d64 = stencil2d_dia_device(side2, dtype=jnp.float64)
    b64 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(3),
                                            (side2 * side2,), jnp.float64))()
    fir = jax.jit(lambda v: ir_solve(d64, v, work_dtype=jnp.float32,
                                     tol=1e-10, inner_tol=1e-6,
                                     inner_maxiter=400,
                                     maxiter=8).residual_norm)
    f64 = jax.jit(lambda v: _cg(d64, v, tol=1e-10, maxiter=3000).residual_norm)
    for name, f in (("ir_solve(f32 inner)", fir), ("cg pure f64", f64)):
        t0 = time.time(); r = float(f(b64)); tc = time.time() - t0
        walls = []
        for _ in range(3):
            t0 = time.time(); r = float(f(b64)); walls.append(time.time() - t0)
        log(f"{name}: wall={min(walls)*1e3:.1f} ms (compile {tc:.1f}s) "
            f"resid/bnorm={r/float(jnp.linalg.norm(b64)):.2e}")
except Exception as e:
    log(f"ir_solve A/B FAILED: {type(e).__name__}: {str(e)[:250]}")
log("DONE")
