"""Probe bspmm2 (VERDICT r3 item 4): the two named BDIA ring SpMM levers.

(a) grid-aligned tm geometry (d % tm == 0 pieces skip the two-slice
    concat: for the fem dof-4 stencil at tm=512, 12/20 pieces align vs
    4/20 at the old tm=1024 pick) — f32 re-measure vs r3's 0.163.
(b) bf16 value/X streams (f32 accumulate): scalar ring measured 1.94x
    from halved stream bytes — expect ~0.3-class useful fraction.
Plus correctness checks for both vs the resident SpMV.
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
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import (_bdia_mm_geometry, bdia_mm_ok,
                                              bdia_spmm_pallas_ring,
                                              bdia_spmv_pallas_resident)
from cask_tpu.tune.timing import measure_chained

HBM = 819e9

nx = 512
plan = fem_bdia_device(nx, dof=4)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0 / 32.0,
                                                              jnp.float32))
plan_bf = dataclasses.replace(plan, vals=plan.vals.astype(jnp.bfloat16))
n = plan.shape[0]
k = 128
nnz_true = (nx * nx + 4 * nx * (nx - 1)) * 16
tm_f32 = _bdia_mm_geometry(plan, 128, 4, 4)
aligned = sum(1 for (_, d) in plan.pairs if d % tm_f32 == 0)
log(f"n={n} k={k} ok={bdia_mm_ok(plan, k)} tm={tm_f32} "
    f"aligned_pieces={aligned}/{plan.npairs}")

X0 = jax.jit(lambda: 0.3 * jax.random.normal(
    jax.random.PRNGKey(1), (n, k), jnp.float32))()
X0b = jax.jit(lambda: 0.3 * jax.random.normal(
    jax.random.PRNGKey(1), (n, k), jnp.bfloat16))()


def bench(tag, plan_, X, out_dtype, useful_bytes, tries=3):
    def stepmm(V):
        Y = bdia_spmm_pallas_ring(plan_, V, out_dtype=out_dtype)
        return (Y / (jnp.max(jnp.abs(Y).astype(jnp.float32))
                     + 1e-30).astype(Y.dtype)).astype(V.dtype)

    best = None
    t0 = time.time()
    for _ in range(tries):
        ms = measure_chained(stepmm, X, k1=3, k2=24, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us "
        f"useful_frac={useful_bytes/best.seconds_per_iter/HBM:.3f} "
        f"reliable={best.reliable} (wall {time.time()-t0:.1f}s)")
    return best


# (a) f32 with grid-aligned tm
useful_f32 = nnz_true * 4 + 2 * n * k * 4
if os.environ.get("PROBE_F32", "1") == "1":
    bench("f32 aligned-tm", plan, X0, None, useful_f32)

# (b) bf16 value+X streams, f32 out (accumulate policy)
useful_b16_f32out = nnz_true * 2 + n * k * 2 + n * k * 4
bench("bf16v+X f32out", plan_bf, X0b, None, useful_b16_f32out)

# fully-bf16 chained pipeline (out bf16): halves Y write too
useful_b16 = nnz_true * 2 + 2 * n * k * 2
bench("bf16 chained", plan_bf, X0b, jnp.bfloat16, useful_b16)


# correctness vs resident SpMV columns
@jax.jit
def errmm(X):
    Y1 = bdia_spmm_pallas_ring(plan, X)
    Yb = bdia_spmm_pallas_ring(plan_bf, X.astype(jnp.bfloat16))
    errs, errsb = [], []
    for j in (0, 31, 77, 127):
        x2 = plan.to_resident(X[:, j])
        y2 = plan.from_resident(bdia_spmv_pallas_resident(plan, x2))
        errs.append(jnp.max(jnp.abs(Y1[:, j] - y2)))
        errsb.append(jnp.max(jnp.abs(Yb[:, j] - y2)))
    sc = jnp.max(jnp.abs(Y1))
    return jnp.max(jnp.stack(errs)) / sc, jnp.max(jnp.stack(errsb)) / sc


t0 = time.time()
e32, eb16 = errmm(X0)
log(f"CORRECTNESS f32 relerr={float(e32):.3e} bf16 relerr={float(eb16):.3e} "
    f"({time.time()-t0:.1f}s)")
log("DONE")
