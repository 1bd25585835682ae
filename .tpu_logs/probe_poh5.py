"""Probe 5: POH v3 (chunked wide dots) synth perf, T8192/T4096."""
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

for ts, tpp in [(8192, 15), (4096, 30)]:
    d = poh_synth_device(n_panels=25, tile_slots=ts, tiles_per_panel=tpp)
    x0 = jax.jit(lambda n=d.shape[1]: jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32))()
    slots = d.ntiles * ts
    for mode in ("split", "fast"):
        t0 = time.time()
        meas = measure_chained(lambda v, d=d, m=mode: d.spmv(v, precision=m),
                               x0, k1=5, k2=80, points=4, repeats=2)
        log(f"PERF v3 T{ts}/{mode}: {meas.seconds_per_iter*1e6:.1f} us/op  "
            f"{slots/meas.seconds_per_iter/1e9:.3f} Gslot/s  reliable={meas.reliable} "
            f"(wall {time.time()-t0:.1f}s)")
