"""Probe fused1 (VERDICT r2 item 2): in-kernel de-interleave BDIA SpMV.

(a) on-device correctness: fused (natural in/out) vs the XLA formulation
    at 1M rows f32 — the 3-pass bf16-split relayout must be exact.
(b) perf: one-shot spmv end-to-end at 1M rows (target >=0.80 useful
    roofline vs the MXU-wrapper path's 0.640 / 175.7 us, probe8c).
(c) perf at 100k rows (fem 158 dof-4): vs record dia_pallas 21.9 us /
    bsr-wrapper 46.4 us end-to-end (probe6b).
"""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.tune.timing import measure_chained
HBM = 819e9

import dataclasses

for nx, tag in ((512, "1M"), (158, "100k")):
    plan = fem_bdia_device(nx, dof=4)
    plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0/32.0, jnp.float32))
    n = plan.shape[0]
    nnz_true = (nx*nx + 4*nx*(nx-1)) * 16
    useful = nnz_true*4 + 2*n*4
    x0 = jax.jit(lambda n=n: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()

    @jax.jit
    def err(x0=x0, plan=plan):
        y1 = plan.spmv(x0, method="fused")
        y2 = plan._spmv_xla(x0)
        return jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y2))
    t0 = time.time()
    log(f"[{tag}] CORRECTNESS fused vs xla relerr={float(err()):.3e} ({time.time()-t0:.1f}s)")

    def step(v, plan=plan):
        y = plan.spmv(v, method="fused")
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
    best = None
    t0 = time.time()
    for _ in range(3):
        ms = measure_chained(step, x0, k1=5, k2=60, points=3, repeats=2)
        if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    log(f"[{tag}] PERF bdia spmv one-shot FUSED: {best.seconds_per_iter*1e6:.1f} us "
        f"useful_frac={useful/best.seconds_per_iter/HBM:.3f} reliable={best.reliable} "
        f"(wall {time.time()-t0:.1f}s)")
log("DONE")
