"""Probe amg10 (VERDICT r5 item 5, the confirmation): the AMG per-solve
wall is per-call RE-TRACING with the hierarchy as inline constants, not
device dispatch.

probe_amg9 (synthetic): warm calls of a HELD jitted callable cost
0.03-0.08 s even with 16 distinct closed-over operators; compile cost
scales with call-site count; args-passing compiles 11x faster.  Here:
the real 1M-row AMG-PCG of probe_amg6, measured three ways in one
session:

  (a) the r4 protocol — cg(op, b, M=M) called twice, un-jitted
      (re-traces the hierarchy-constant program per call): expect the
      ~25 s "warm" wall to reproduce;
  (b) ONE jitted solve with the hierarchy passed as a pytree ARGUMENT,
      called repeatedly: expect warm ≈ iteration compute + dispatch.
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
from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.formats.generate import stencil_2d
from cask_tpu.solvers import cg, smoothed_aggregation_amg

side = 1024
n = side * side
t0 = time.time()
a_iso = stencil_2d(side, dtype=np.float64)
M = smoothed_aggregation_amg(a_iso, dtype=jnp.float32)
log(f"setup {time.time()-t0:.1f}s; levels={M.level_sizes}")
op = stencil2d_dia_device(side, dtype=jnp.float32)
b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(1), (n,),
                                      jnp.float32))()

# (a) the r4 protocol: un-jitted, hierarchy closed over, per call
for rep in range(2):
    t0 = time.time()
    r = cg(op, b, tol=1e-6, maxiter=400, M=M)
    it, conv = int(r.iterations), bool(r.converged)
    log(f"[unjitted call {rep}] wall={time.time()-t0:.2f}s "
        f"iters={it} conv={conv}")

# (b) ONE jitted solve, hierarchy as pytree argument, held and re-called
@jax.jit
def solve(bb, Mp):
    r = cg(op, bb, tol=1e-6, maxiter=400, M=Mp)
    return r.iterations, r.residual_norm, r.converged

t0 = time.time()
it, rn, conv = solve(b, M)
it = int(it)
log(f"[jitted-arg cold] wall={time.time()-t0:.2f}s iters={it} "
    f"conv={bool(conv)} relres={float(rn)/np.sqrt(n):.2e}")
walls = []
for rep in range(4):
    t0 = time.time()
    it, rn, conv = solve(b, M)
    it = int(it)
    walls.append(time.time() - t0)
log(f"[jitted-arg warm] walls={['%.2f' % w for w in walls]}s "
    f"iters={it} conv={bool(conv)}")
log("DONE")
