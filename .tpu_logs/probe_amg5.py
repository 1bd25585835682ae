"""Probe amg5: (a) factored V-cycle with 16384-row tentative panels
(tile-fill lever from probe_amg4's floor analysis); (b) fused-kernel
bench-chain vs distributed-chain in ONE window (bench read 148-163 us
while the dist program read 120.4 us the same afternoon — same kernel,
different program shape; settle it without window confounds).
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
from cask_tpu.tune.timing import measure_chained


def norm_step(f):
    def step(v):
        y = f(v)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
    return step


def best_of(f, x0, tries=3, **kw):
    best = None
    for _ in range(tries):
        m = measure_chained(norm_step(f), x0, **kw)
        if np.isfinite(m.seconds_per_iter) and (
                best is None or m.seconds_per_iter < best.seconds_per_iter):
            best = m
    return best


# ---------------- (b) first: fused chain shapes, one window ------------
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas_fused
from cask_tpu.parallel import DistSpmv, fem_bdia_partition, row_mesh

HBM = 819e9
nx = 512
plan1 = fem_bdia_device(nx, dof=4)
plan1 = dataclasses.replace(plan1,
                            vals=plan1.vals * jnp.asarray(1 / 32.0, jnp.float32))
nB = plan1.shape[0]
nnzB = (nx * nx + 4 * nx * (nx - 1)) * 16
useful = nnzB * 4 + 2 * nB * 4
xB = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(3), (nB,),
                                       jnp.float32))()
m_bare = best_of(lambda v: bdia_spmv_pallas_fused(plan1, v), xB,
                 k1=5, k2=60, points=3, repeats=2)
log(f"bare fused chain: {m_bare.seconds_per_iter*1e6:.1f} us "
    f"frac={useful/m_bare.seconds_per_iter/HBM:.3f} rel={m_bare.reliable}")

pplan = fem_bdia_partition(nx, dof=4, nshards=1)
s = jnp.asarray(1 / 32.0, jnp.float32)
pplan = dataclasses.replace(pplan, vals=pplan.vals * s,
                            head_vals=pplan.head_vals * s,
                            tail_vals=pplan.tail_vals * s)
op = DistSpmv(pplan, row_mesh(1), interior="fused")
xp = jax.jit(op.padded)(xB)
m_dist = best_of(lambda v: op.padded_op(v), xp, k1=5, k2=60, points=3,
                 repeats=2)
log(f"dist fused chain: {m_dist.seconds_per_iter*1e6:.1f} us "
    f"frac={useful/m_dist.seconds_per_iter/HBM:.3f} rel={m_dist.reliable}")

# ---------------- (a) factored cycle with 16384-row tent panels --------
from cask_tpu.formats.generate import stencil_2d
from cask_tpu.solvers import smoothed_aggregation_amg

side = 1024
n = side * side
t0 = time.time()
a_iso = stencil_2d(side, dtype=np.float64)
M = smoothed_aggregation_amg(a_iso, dtype=jnp.float32)
tp = M.levels[0].p.tent
log(f"setup {time.time()-t0:.1f}s; tent pack slots={tp.vals.size} "
    f"(row_panel={tp.row_panel})")
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(99), (n,),
                                       jnp.float32))()
mV = best_of(M, x0, tries=3, k1=3, k2=24, points=3, repeats=2)
log(f"V-cycle factored split R=16384: {mV.seconds_per_iter*1e6:.1f} us/cycle "
    f"rel={mV.reliable}  (R=4096 was 7188.7-7214.5)")
log("DONE")
