"""Probe 9: isolate WHERE the 2.9e-3 error in the BDIA spmv() wrapper
path comes from.  Stages: to_resident (matmul) vs reshape-transpose
reference, kernel on identical input, from_resident vs reference.
Also: _perm_mm in isolation vs precision='highest'."""
import dataclasses, os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("devices:", jax.devices())
from cask_tpu.formats.device_gen import fem_bdia_device
from cask_tpu.ops.bdia import _deint_perm, _perm_mm
from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas_resident

_LANE = 128
plan = fem_bdia_device(128, dof=4)  # 65k rows: fast compiles
plan = dataclasses.replace(plan, vals=plan.vals * jnp.asarray(1.0/32.0, jnp.float32))
n = plan.shape[0]
x0 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()

bc = plan.blocksize[1]
seg = plan.resident_seg_rows
p0t, _ = plan.resident_pads
off = p0t * plan.ts * _LANE

def to_res_ref(x):  # the pre-probe8 reshape-transpose route (exact)
    xc = jnp.zeros((plan.nbc * bc,), x.dtype).at[:n].set(x).reshape(plan.nbc, bc).T
    x2 = jnp.zeros((bc, seg * _LANE), x.dtype)
    x2 = x2.at[:, off : off + plan.nbc].set(xc)
    return x2.reshape(bc * seg, _LANE)

def from_res_ref(y2):
    br = plan.blocksize[0]
    y = y2.reshape(br, seg * _LANE)[:, off : off + plan.nbr]
    return y.T.reshape(-1)[:plan.shape[0]]

@jax.jit
def stage_errs():
    xr = to_res_ref(x0)
    xm = plan.to_resident(x0)
    e_to = jnp.max(jnp.abs(xr - xm)) / jnp.max(jnp.abs(xr))
    y2 = bdia_spmv_pallas_resident(plan, xr)
    y_ref_path = from_res_ref(y2)
    y_mix = plan.from_resident(y2)
    e_from = jnp.max(jnp.abs(y_mix - y_ref_path)) / jnp.max(jnp.abs(y_ref_path))
    y_xla = plan._spmv_xla(x0)
    e_kernel = jnp.max(jnp.abs(y_ref_path - y_xla)) / jnp.max(jnp.abs(y_xla))
    return e_to, e_from, e_kernel

t0 = time.time()
e_to, e_from, e_kernel = [float(v) for v in stage_errs()]
log(f"STAGES to_resident={e_to:.3e} from_resident={e_from:.3e} kernel_vs_xla={e_kernel:.3e} ({time.time()-t0:.1f}s)")

# _perm_mm in isolation vs highest-precision matmul
@jax.jit
def perm_err():
    rt = -(-plan.nbc // _LANE)
    L = _LANE * bc
    w = jax.random.normal(jax.random.PRNGKey(1), (rt, L), jnp.float32)
    p = jnp.asarray(_deint_perm(bc), jnp.float32)
    a = _perm_mm(w, _deint_perm(bc))
    b = jnp.matmul(w, p, precision="highest")
    return jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b))
log(f"PERM_MM split-vs-highest relerr={float(perm_err()):.3e}")
log("DONE")
