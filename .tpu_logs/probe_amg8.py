"""Probe amg8: anisotropic verdict rows on the SHIPPED hierarchy
(factored P/R, R=16384/T=8192 tent packs) — probe_amg3's aniso AMG row
was measured pre-factoring."""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


log("devices:", jax.devices())
from cask_tpu.formats.convert import from_scipy
from cask_tpu.ops.dia import dia_plan
from cask_tpu.solvers import cg, smoothed_aggregation_amg
from cask_tpu.tune.timing import measure_chained

side = 1024
n = side * side
eps = 0.01
tx = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(side, side))
ty = sp.diags([-eps, 2 * eps, -eps], [-1, 0, 1], shape=(side, side))
s_an = (sp.kron(sp.identity(side), tx)
        + sp.kron(ty, sp.identity(side))).tocsr()
a_an = from_scipy(s_an, format="csr")
t0 = time.time()
M = smoothed_aggregation_amg(a_an, dtype=jnp.float32)
log(f"aniso AMG setup {time.time()-t0:.1f}s levels {M.level_sizes}; "
    f"P kinds {[type(lv.p).__name__ for lv in M.levels]}")

x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(9), (n,),
                                       jnp.float32))()


def step(v):
    y = M(v)
    return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)


best = None
for _ in range(3):
    m = measure_chained(step, x0, k1=3, k2=24, points=3, repeats=2)
    if np.isfinite(m.seconds_per_iter) and (
            best is None or m.seconds_per_iter < best.seconds_per_iter):
        best = m
log(f"aniso V-cycle (shipped): {best.seconds_per_iter*1e6:.1f} us/cycle "
    f"rel={best.reliable}")

op_an = dia_plan(a_an.astype(jnp.float32)).device_put()
b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (n,),
                                      jnp.float32))()
t0 = time.time()
r1 = cg(lambda x: op_an.spmv(x), b, tol=1e-6, maxiter=1000, M=M)
w1 = time.time() - t0
t0 = time.time()
r2 = cg(lambda x: op_an.spmv(x), b, tol=1e-6, maxiter=1000, M=M)
log(f"aniso AMG-PCG (shipped): iters={int(r1.iterations)} "
    f"conv={bool(r1.converged)} wall_first={w1:.2f}s "
    f"wall_warm={time.time()-t0:.2f}s")
log("DONE")
