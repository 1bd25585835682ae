"""Probe poh6 (VERDICT r2 item 6): POH utilization decomposition + the
cheapest lever.

Analytic cost per nnz (kernel structure, poh_kernels.py): gather dot =
2C MACs, scatter dot = R MACs, x{2,1} passes for split/fast — so
MACs/nnz = (2C + R) * passes.  Base config (R=4096, C=1024, split):
12,288 MACs/nnz; measured 3.63 Gnnz/s => 44.6 TMAC/s ~ 45% of the MXU's
98.5 Tmac bf16 peak.  If the kernel is MXU-bound, shrinking (R, C)
should scale throughput ~linearly; if VPU-bound (one-hot builds ~
O(128 + 2C/128 + R/128) vreg ops per slot-row), it should not.

Sweep: synth packs (constant ~3.1-3.3M slots, fill-independent kernel
ceiling) over (R, C, precision).  Real-matrix fill at small R/C is a
separate (plan-quality) question — noted in PERF.md with the result.
"""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())

from cask_tpu.ops.pallas.poh_kernels import poh_synth_device
from cask_tpu.tune.timing import measure_chained

CONFIGS = [
    # (tag, R, C, n_panels, tiles_per_panel, precision)
    ("base R4096 C1024 split", 4096, 1024, 25, 15, "split"),
    ("base R4096 C1024 fast",  4096, 1024, 25, 15, "fast"),
    ("R2048 C1024 split",      2048, 1024, 50, 8,  "split"),
    ("R1024 C1024 split",      1024, 1024, 100, 4, "split"),
    ("R1024 C512 split",       1024, 512, 100, 4,  "split"),
]

for tag, R, C, npan, tpp, prec in CONFIGS:
    try:
        dp = poh_synth_device(row_panel=R, col_window=C, tile_slots=8192,
                              n_panels=npan, tiles_per_panel=tpp)
        slots = dp.ntiles * 8192
        macs_per_nnz = (2 * C + R) * (2 if prec == "split" else 1)
        x0 = jax.jit(lambda n=dp.shape[1]: jax.random.normal(
            jax.random.PRNGKey(7), (n,), jnp.float32))()
        def step(v, dp=dp, prec=prec):
            y = dp.spmv(v, precision=prec)
            return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)
        best = None
        t0 = time.time()
        for _ in range(3):
            ms = measure_chained(step, x0, k1=5, k2=60, points=3, repeats=2)
            if np.isfinite(ms.seconds_per_iter) and (best is None or ms.seconds_per_iter < best.seconds_per_iter):
                best = ms
        g = slots / best.seconds_per_iter / 1e9
        tmac = g * macs_per_nnz / 1e3
        log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us  {g:.2f} Gnnz/s  "
            f"{macs_per_nnz} MACs/nnz  {tmac:.1f} TMAC/s ({tmac/98.5*100:.0f}% peak)  "
            f"reliable={best.reliable} (wall {time.time()-t0:.1f}s)")
    except Exception as e:
        log(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:250]}")
log("DONE")
