"""Probe amg9 (VERDICT r5 item 5): attribute the ~30 s AMG per-solve
dispatch wall.

probe_amg6/8 established: cycle compute 2.85-6 ms, iterations 11-17,
warm wall 25-47 s, NOT constants-volume-bound (4x constants cut changed
nothing), wall grows with hierarchy depth (8-level aniso: 46.7 s).
Hypothesis left standing: the wall scales with EXECUTABLE SIZE (number
of distinct sub-programs inside the data-dependent solve loop).

Synthetic isolation at fixed compute: a PCG-shaped while_loop (17
data-dependent iterations) whose body applies K DISTINCT closed-over
POH operators (same shapes -> one Mosaic kernel compile, K distinct
constant sets, K pallas-call sites):

- K in {1, 4, 16}: if warm wall grows ~linearly with K -> program-size
  bound (AMG's fix is structural); if flat -> relay dispatch overhead.
- scan16: ONE operator applied 16x via lax.scan in the same loop (the
  padded-uniform-levels restructure) -> if its wall matches K=1, the
  scan restructure is the fix; if it matches K=16, depth itself (loop
  trip count) is the cost and uniformity doesn't help.
- args16: the K=16 program with operators passed as ARGUMENTS instead
  of closure constants -> separates captured-constant dispatch from
  call-site count.
"""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


log("devices:", jax.devices())
from cask_tpu.formats.generate import power_law
from cask_tpu.ops.pallas.poh_kernels import poh_plan

N = 32_768
K_MAX = 16
ITERS = 17

log(f"packing {K_MAX} distinct POH plans (n={N})...")
t0 = time.time()
plans = []
for s in range(K_MAX):
    a = power_law(N, avg_degree=8, dtype=np.float32, seed=s)
    plans.append(poh_plan(a, tile_slots=2048).device_put())
log(f"packed+uploaded in {time.time()-t0:.1f}s "
    f"(~{sum(int(p.vals.size) for p in plans)*12/1e6:.0f} MB of plan arrays)")

b0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (N,),
                                       jnp.float32))()


def norm(y):
    return y / (jnp.max(jnp.abs(y)) + jnp.asarray(1e-30, jnp.float32))


def make_solve(k):
    sub = plans[:k]

    @jax.jit
    def solve(b):
        def body(st):
            i, x = st
            y = x
            for p in sub:  # k distinct closed-over operators
                y = norm(p.spmv(y, precision="split"))
            return i + 1, y

        def cond(st):
            return (st[0] < ITERS) & (jnp.max(jnp.abs(st[1])) > 0)

        _, y = lax.while_loop(cond, body, (jnp.int32(0), b))
        return jnp.sum(y)

    return solve


def make_scan16():
    p = plans[0]

    @jax.jit
    def solve(b):
        def body(st):
            i, x = st

            def step(c, _):
                return norm(p.spmv(c, precision="split")), None

            y, _ = lax.scan(step, x, None, length=K_MAX)
            return i + 1, y

        def cond(st):
            return (st[0] < ITERS) & (jnp.max(jnp.abs(st[1])) > 0)

        _, y = lax.while_loop(cond, body, (jnp.int32(0), b))
        return jnp.sum(y)

    return solve


def make_args16():
    @jax.jit
    def solve(b, ps):
        def body(st):
            i, x = st
            y = x
            for p in ps:
                y = norm(p.spmv(y, precision="split"))
            return i + 1, y

        def cond(st):
            return (st[0] < ITERS) & (jnp.max(jnp.abs(st[1])) > 0)

        _, y = lax.while_loop(cond, body, (jnp.int32(0), b))
        return jnp.sum(y)

    return solve


def timeit(tag, fn, *args):
    t0 = time.time()
    v = float(fn(*args))
    t_cold = time.time() - t0
    warms = []
    for _ in range(3):
        t0 = time.time()
        v = float(fn(*args))
        warms.append(time.time() - t0)
    log(f"[{tag}] cold={t_cold:.1f}s warm={min(warms):.2f}/"
        f"{np.median(warms):.2f}/{max(warms):.2f}s (min/med/max) "
        f"val={v:.3e}")


for k in (1, 4, 16):
    timeit(f"distinct_k{k}", make_solve(k), b0)
timeit("scan16_uniform", make_scan16(), b0)
timeit("args16", make_args16(), b0, tuple(plans))
# re-run the K sweep warm once more to check drift symmetry
for k in (1, 16):
    timeit(f"recheck_k{k}", make_solve(k), b0)
log("DONE")
