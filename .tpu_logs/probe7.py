"""Probe 7: fast (nbc, bc) -> (bc, nbc) de-interleave formulations on
TPU (the BDIA per-call wrapper: reshape.T measured ~1.4 ms at 1M)."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.tune.timing import measure_chained

n, bc = 1048576, 4
nbc = n // bc
L = 128 * bc
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()

P = np.zeros((L, L), np.float32)
for j in range(L):
    c, i = j % bc, j // bc
    P[j, c * 128 + i] = 1.0
Pd = jnp.asarray(P)

def a_reshape_T(v):
    return v.reshape(nbc, bc).T.reshape(-1)

def b_strided(v):
    return jnp.stack([jax.lax.slice(v, (c,), (n,), (bc,)) for c in range(bc)]).reshape(-1)

def c_tiled(v):
    return v.reshape(nbc // 128, 128, bc).transpose(2, 0, 1).reshape(-1)

def d_lanestride(v):
    w = v.reshape(-1, L)
    return jnp.stack([w[:, c::bc] for c in range(bc)], axis=1).reshape(-1)

def e_onehot(v):
    # MXU: one permutation matmul; out[:, c*128:(c+1)*128] is component
    # c as lane-aligned (R, 128) rows — exactly the BDIA segment layout
    w = v.reshape(-1, L)
    return (w @ Pd).reshape(-1)

ref = np.asarray(x0).reshape(nbc, bc).T.reshape(-1)
for name, fn in (("a_reshape_T", a_reshape_T), ("b_strided", b_strided),
                 ("c_tiled", c_tiled), ("d_lanestride", d_lanestride),
                 ("e_onehot", e_onehot)):
    t0 = time.time()
    try:
        if name != "e_onehot":
            got = np.asarray(jax.jit(fn)(x0))
            ok = bool((got == ref).all())
        else:
            got = np.asarray(jax.jit(fn)(x0)).reshape(-1, bc, 128)
            ok = bool((got.transpose(1, 0, 2).reshape(bc, -1)[:, :nbc].reshape(-1)
                       == ref.reshape(bc, nbc).reshape(-1)).all()) if nbc % 128 == 0 else True
        ms = measure_chained(fn, x0, k1=5, k2=60, points=3, repeats=2)
        log(f"PERF {name}: {ms.seconds_per_iter*1e6:.1f} us correct={ok} "
            f"reliable={ms.reliable} (wall {time.time()-t0:.1f}s)")
    except Exception as e:
        log(f"{name} failed: {type(e).__name__}: {e}")
log("DONE")
