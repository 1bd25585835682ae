"""Probe: unstructured PCG iteration rate (ladder timing) + fill vs col_window."""
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
absrow = np.asarray(np.abs(s).sum(axis=1)).ravel()
s = (s + sp.diags(0.3 * absrow + 1.0)).tocsr().astype(np.float32)
a = from_scipy(s, format="csr")

for cw in (1024, 2048, 4096):
    pt = poh_plan(a, tile_slots=8192, col_window=cw)
    log(f"fill @ col_window={cw}: {pt.fill():.3f} ntiles={pt.ntiles}")
p = poh_plan(a, tile_slots=8192, col_window=4096).device_put()
M = jacobi(a)
b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()

@jax.jit
def solve(b, iters):
    return cg(lambda v: p.spmv(v, precision="split"), b, tol=0.0, maxiter=iters, M=M)

float(solve(b, jnp.int32(10)).residual_norm)  # compile
walls = {}
ks = [50, 150, 300, 500]
for rep in range(3):
    for k in ks:
        t0 = time.time()
        float(solve(b, jnp.int32(k)).residual_norm)
        walls[k] = min(walls.get(k, 1e9), time.time() - t0)
slopes = sorted((walls[b_] - walls[a_]) / (b_ - a_)
                for i, a_ in enumerate(ks) for b_ in ks[i+1:]
                if (walls[b_] - walls[a_]) > 0)
per = slopes[len(slopes)//2]
log(f"PCG per-iteration (median slope): {per*1e6:.1f} us "
    f"({a.nnz/per/1e9:.2f} Gnnz/s SpMV-equivalent; nnz={a.nnz})")

@jax.jit
def solve_tol(b):
    return cg(lambda v: p.spmv(v, precision="split"), b, tol=1e-6, maxiter=2000, M=M)
res = solve_tol(b)
relres = float(jnp.linalg.norm(p.spmv(res.x) - b) / jnp.linalg.norm(b))
log(f"SOLVE tol=1e-6: iters={int(res.iterations)} true_relres={relres:.3e}")
