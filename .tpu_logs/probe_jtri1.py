"""VERDICT r2 item 4: iterative (Jacobi-Richardson) triangular solve on
hardware — does it make ILU-PCG usable on TPU?

(a) ILU(0) sweep-apply cost vs sweeps on the 1M-row stencil.
(b) PCG A/B on the isotropic 1M stencil: diag-Jacobi vs ILU-jacobi(s).
(c) The same A/B on an ANISOTROPIC Poisson (eps=0.01: strong x-coupling)
    where diagonal scaling is weak and ILU(0) captures the line coupling.

Operator = device DIA plan (il/pallas path); preconditioner factors are
host-ILU'd then ride DIA-planned strict triangles (zero-gather sweeps).
"""
import dataclasses
import os
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from cask_tpu.formats.device_gen import stencil2d_dia_device
from cask_tpu.formats.generate import stencil_2d
from cask_tpu.ops.ilu import ilu0
from cask_tpu.solvers import cg
from cask_tpu.solvers.precond import jacobi

side = int(os.environ.get("PROBE_SIDE", "1024"))
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


def run_case(tag, scale_of_offset):
    """scale_of_offset: diag-offset -> multiplier on the isotropic stencil."""
    print(f"== case {tag} ==", flush=True)
    dia = stencil2d_dia_device(side, dtype=np.float32)
    sc = np.array([[scale_of_offset(o)] for o in dia.offsets], np.float32)
    op = dataclasses.replace(dia, vals=dia.vals * jnp.asarray(sc))

    t0 = time.time()
    a_host = stencil_2d(side, dtype=np.float32)
    # apply the same per-offset scaling on the host CSR
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(a_host.indptr))
    offs = np.asarray(a_host.indices, np.int64) - rows
    hsc = np.ones(len(offs), np.float32)
    for o in np.unique(offs):
        hsc[offs == o] = scale_of_offset(int(o))
    a_host = dataclasses.replace(a_host, data=np.asarray(a_host.data) * hsc)
    f = ilu0(a_host)
    print(f"  host gen+ilu0 {time.time()-t0:.1f} s", flush=True)

    b = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), jnp.float32))()

    # (a) sweep-apply cost (normalized chained ladder)
    for s in (2, 4):
        ap = f.jacobi_applier(sweeps=s)

        def chain(v, k, ap=ap):
            def body(i, x):
                y = ap(x)
                return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
            return jnp.mean(jnp.abs(jax.lax.fori_loop(0, k, body, v)[:128]))

        per, walls = ladder(jax.jit(chain), b, ks=(5, 40, 80, 120))
        print(f"  ilu jacobi-apply s={s}: {per*1e6:.1f} us/apply "
              f"walls={ {k: round(v,3) for k,v in walls.items()} }", flush=True)

    # (b/c) PCG A/B: per-iteration cost + iterations to 1e-6
    Ms = [("diag-jacobi", jacobi(a_host)),
          ("ilu-jac s=2", f.jacobi_applier(sweeps=2)),
          ("ilu-jac s=4", f.jacobi_applier(sweeps=4))]
    for name, M in Ms:
        fi = jax.jit(lambda v, M=M: cg(lambda x: op.spmv(x), v, tol=1e-6,
                                       maxiter=4000, M=M).iterations)
        fcm = jax.jit(lambda v, k, M=M: cg(lambda x: op.spmv(x), v, tol=0.0,
                                           maxiter=k, M=M).iterations.astype(jnp.float32))
        perm, wallsm = ladder(fcm, b, ks=(5, 40, 80, 120))
        t0 = time.time()
        iters = int(fi(b))
        wall = time.time() - t0
        print(f"  {name}: {perm*1e6:.1f} us/iter, iters-to-1e-6={iters}, "
              f"solve wall~{wall:.2f}s, est total={perm*iters*1e3:.1f} ms",
              flush=True)


run_case("isotropic", lambda o: 1.0)
eps = 0.01
run_case(f"anisotropic eps={eps}",
         lambda o: (2 + 2 * eps) / 4.0 if o == 0 else (eps if abs(o) > 1 else 1.0))
print("DONE", flush=True)
