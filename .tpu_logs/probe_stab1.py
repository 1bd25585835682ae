"""Probe stab1 (VERDICT r5 item 2): close the bare-chain drift question.

Runs the fused one-shot chain (flat default), the fused 2-D-grid chain
(the schedule that swung 128-163 us across r4 windows), the resident
chain, and the distributed fused-interior wrap BACK-TO-BACK in the same
relay window, then repeats across several windows (~3 min apart) in ONE
process (compiles paid once).  Records the per-variant cross-window
spread: if the 2-D chain regression reproduces while flat/resident/dist
stay put, the mechanism is the 2-D grid schedule x relay window
interaction; if all four move together, it is relay drift.
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
from cask_tpu.ops.pallas.bdia_kernels import (
    bdia_spmv_pallas_fused,
    bdia_spmv_pallas_resident,
)
from cask_tpu.parallel import DistSpmv, fem_bdia_partition, row_mesh
from cask_tpu.tune.timing import measure_chained

HBM = 819e9
nx = 512
plan = fem_bdia_device(nx, dof=4)
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1 / 32.0,
                                                              jnp.float32))
n = plan.shape[0]
nnz = (nx * nx + 4 * nx * (nx - 1)) * 16
useful = nnz * 4 + 2 * n * 4
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,),
                                       jnp.float32))()
x2 = jax.jit(lambda v: plan.to_resident(v))(x0)

pplan = fem_bdia_partition(nx, dof=4, nshards=1)
s = jnp.asarray(1 / 32.0, jnp.float32)
pplan = dataclasses.replace(pplan, vals=pplan.vals * s,
                            head_vals=pplan.head_vals * s,
                            tail_vals=pplan.tail_vals * s)
op = DistSpmv(pplan, row_mesh(1), interior="fused")
xp = jax.jit(op.padded)(x0)

VARIANTS = [
    ("fused_flat", lambda v: bdia_spmv_pallas_fused(plan, v), x0),
    ("fused_2d", lambda v: bdia_spmv_pallas_fused(plan, v, flat=False), x0),
    ("resident", lambda v: bdia_spmv_pallas_resident(plan, v), x2),
    ("dist_fused", lambda v: op.padded_op(v), xp),
]


def norm_step(f):
    def step(v):
        y = f(v)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
    return step


results = {name: [] for name, _, _ in VARIANTS}

# warm every compile first (one slow pass) so window 0 onward measures
# only execution; measure_chained itself compiles its ladder wrappers
log("compiling all variants (cold Mosaic passes)...")
for name, f, x in VARIANTS:
    t0 = time.time()
    ms = measure_chained(norm_step(f), x, k1=5, k2=60, points=3, repeats=1)
    log(f"  {name}: compile+first measure {time.time()-t0:.1f}s "
        f"({ms.seconds_per_iter*1e6:.1f} us)")

N_WINDOWS = int(os.environ.get("STAB_WINDOWS", "9"))
SLEEP_S = float(os.environ.get("STAB_SLEEP", "150"))
for w in range(N_WINDOWS):
    log(f"--- window {w} ---")
    for name, f, x in VARIANTS:
        ms = measure_chained(norm_step(f), x, k1=5, k2=60, points=3,
                             repeats=2)
        us = ms.seconds_per_iter * 1e6
        frac = useful / ms.seconds_per_iter / HBM
        results[name].append((us, frac, ms.reliable))
        log(f"  [{name}] {us:.1f} us frac={frac:.4f} rel={ms.reliable}")
    if w < N_WINDOWS - 1:
        time.sleep(SLEEP_S)

log("=== spread summary (us per op across windows) ===")
for name in results:
    us = np.array([r[0] for r in results[name]])
    fr = np.array([r[1] for r in results[name]])
    rel = sum(1 for r in results[name] if r[2])
    log(f"{name}: min={us.min():.1f} med={np.median(us):.1f} "
        f"max={us.max():.1f} spread={(us.max()-us.min())/us.min()*100:.1f}% "
        f"frac_med={np.median(fr):.4f} reliable {rel}/{len(results[name])}")
log("DONE")
