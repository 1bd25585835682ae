"""Probe poh7: real-pattern POH throughput sweep — the driver bench's
50k power-law split record (0.57-0.60 Gslots/s) sits well below the
synth/100k numbers (3.4-3.6).  Same window: T in {2048, 8192} x
precision {split, fast} on the same matrix, plus the 100k power-law
for scale comparison."""
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
from cask_tpu.formats.generate import power_law
from cask_tpu.ops.pallas.poh_kernels import poh_plan
from cask_tpu.tune.timing import measure_chained


def bench(tag, dp, prec, tries=2):
    xp0 = jax.jit(lambda n=dp.shape[1]: jax.random.normal(
        jax.random.PRNGKey(7), (n,), jnp.float32))()

    def step(v):
        y = dp.spmv(v, precision=prec)
        return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(v.dtype)

    best = None
    t0 = time.time()
    for _ in range(tries):
        ms = measure_chained(step, xp0, k1=5, k2=60, points=3, repeats=1)
        if np.isfinite(ms.seconds_per_iter) and (
                best is None or ms.seconds_per_iter < best.seconds_per_iter):
            best = ms
    slots = dp.vals.size
    log(f"[{tag}] {best.seconds_per_iter*1e6:.1f} us "
        f"{slots/best.seconds_per_iter/1e9:.2f} Gslots/s "
        f"(slots={slots}, ntiles={dp.ntiles}) rel={best.reliable} "
        f"(wall {time.time()-t0:.1f}s)")


a50 = power_law(50_000, avg_degree=12, dtype=np.float32, seed=3)
for ts in (2048, 8192):
    dp = poh_plan(a50, tile_slots=ts).device_put()
    for prec in ("split", "fast"):
        bench(f"50k T{ts} {prec}", dp, prec)

a100 = power_law(102_400, avg_degree=30, dtype=np.float32, seed=5)
dp = poh_plan(a100, tile_slots=8192).device_put()
bench("100k-d30 T8192 split", dp, "split")
log("DONE")
