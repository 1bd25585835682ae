"""Probe: end-to-end unstructured PCG on hardware — POH SpMV operator +
Jacobi preconditioner, SPD system A = sym(power_law) + shift."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

import scipy.sparse as sp
from cask_tpu.formats.convert import from_scipy, to_scipy
from cask_tpu.formats.generate import power_law
from cask_tpu.ops.pallas.poh_kernels import poh_plan
from cask_tpu.solvers.krylov import cg
from cask_tpu.solvers.precond import jacobi

n = 50_000
s0 = to_scipy(power_law(n, avg_degree=12, dtype=np.float32, seed=3))
s = (s0 + s0.T).tocsr()
absrow = np.abs(s).sum(axis=1).A.ravel() if hasattr(np.abs(s).sum(axis=1), "A") else np.asarray(np.abs(s).sum(axis=1)).ravel()
s = (s + sp.diags(absrow + 1.0)).tocsr().astype(np.float32)  # strictly diag-dominant SPD
a = from_scipy(s, format="csr")
log(f"matrix: n={n} nnz={a.nnz}")

t0 = time.time()
p = poh_plan(a, tile_slots=8192).device_put()
log(f"poh pack: ntiles={p.ntiles} fill={p.fill():.3f} device_put {time.time()-t0:.1f}s")
M = jacobi(a)
b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()

@jax.jit
def solve(b, iters):
    return cg(lambda v: p.spmv(v, precision="split"), b, tol=0.0, maxiter=iters, M=M)

t0 = time.time()
r1 = solve(b, jnp.int32(10))
float(r1.residual_norm)
log(f"compile+10 iters: {time.time()-t0:.1f}s")
# k-differenced iteration timing
t0 = time.time(); float(solve(b, jnp.int32(50)).residual_norm); t50 = time.time() - t0
t0 = time.time(); float(solve(b, jnp.int32(250)).residual_norm); t250 = time.time() - t0
per_iter = (t250 - t50) / 200
log(f"PCG per-iteration: {per_iter*1e6:.1f} us ({a.nnz/per_iter/1e9:.2f} Gnnz/s in SpMV terms)")

@jax.jit
def solve_tol(b):
    return cg(lambda v: p.spmv(v, precision="split"), b, tol=1e-6, maxiter=2000, M=M)
res = solve_tol(b)
it = int(res.iterations); rn = float(res.residual_norm)
x = res.x
relres = float(jnp.linalg.norm(p.spmv(x) - b) / jnp.linalg.norm(b))
log(f"SOLVE tol=1e-6: iters={it} resid={rn:.3e} true_relres={relres:.3e} converged={bool(res.converged)}")
