"""Per-iteration cost of cg vs pipelined_cg vs block_cg(s=8) on the
1M-unknown Poisson system, solver-resident DIA interleaved operator.
Ladder protocol (bench_solve): median pairwise slope over maxiter walls.
"""
import time
import os
import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.ops.dia import DiaOperator, spmm_dia
from cask_tpu.solvers import block_cg, cg, pipelined_cg

side = 1024
m = side * side
print("devices:", jax.devices(), flush=True)
t0 = time.time()
dia = stencil2d_dia_device(side, dtype=np.float32)
op = DiaOperator(dia)
print("operator mode:", op.mode, "build", round(time.time() - t0, 1), "s", flush=True)

b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), jnp.float32))()
bp = op.to_padded(b)


def ladder(f, arg, ks=(10, 200, 400, 600)):
    def run(k):
        t0 = time.perf_counter()
        int(f(arg, jnp.asarray(k, jnp.int32)))
        return time.perf_counter() - t0

    print("  warm compile...", flush=True)
    tcomp = time.time()
    run(ks[0]); run(ks[-1])
    print("  compiled in", round(time.time() - tcomp, 1), "s", flush=True)
    walls = {}
    for _ in range(2):
        for k in ks:
            walls[k] = min(walls.get(k, float("inf")), run(k))
    slopes = sorted((walls[b2] - walls[a2]) / (b2 - a2)
                    for a2 in ks for b2 in ks if b2 > a2)
    return slopes[len(slopes) // 2], walls


for name, solver in (("cg", cg), ("pipelined_cg", pipelined_cg)):
    f = jax.jit(lambda v, k, s=solver: s(op, v, tol=0.0, maxiter=k).iterations)
    per, walls = ladder(f, bp)
    print(f"{name}: {per*1e6:.1f} us/iter  walls={ {k: round(v,4) for k,v in walls.items()} }", flush=True)

S = 8
B = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (m, S), jnp.float32))()
fb = jax.jit(lambda v, k: block_cg(lambda V: spmm_dia(dia, V), v, tol=0.0,
                                   maxiter=k).iterations)
per, walls = ladder(fb, B, ks=(5, 50, 100, 150))
print(f"block_cg s={S}: {per*1e6:.1f} us/iter = {per*1e6/S:.1f} us/iter/rhs  "
      f"walls={ {k: round(v,4) for k,v in walls.items()} }", flush=True)
print("DONE", flush=True)
