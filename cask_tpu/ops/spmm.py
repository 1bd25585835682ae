"""Sparse × dense matrix product  Y = A @ X  with tall-skinny X (n, k).

BASELINE config 3: k ∈ {32, 128}, CSR + BSR, bandwidth-roofline bench.
The XLA paths here are the reference; the MXU-friendly Pallas BSR kernel
lives in :mod:`cask_tpu.ops.pallas.bsr_kernels` and is selected by the
autotuner.  cask analog: dense-multiple SpMV in the Spmv frontend
(SURVEY.md §2 R2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cask_tpu.formats.matrix import BSR, COO, CSR
from cask_tpu.ops.spmv import _accum_dtype, row_ids_from_indptr

_PLAN_MISS = object()
# don't silently allocate more than this for a memoized slab plan (the
# shear inflates values ~(W/avg block diags)x; 1M-row fem dof-4 at g=16
# is ~840 MB f32)
_SLAB_MAX_BYTES = 2 << 30


def _slab_auto_plan(a):
    """Instance-memoized MXU slab plan for wide-k BDIA SpMM (same cache
    policy as ``spmv._bdia_auto_plan``: built once per instance, misses
    memoized, never built under a trace — a traced build would re-shear
    every call)."""
    cached = getattr(a, "_slab_auto_plan", _PLAN_MISS)
    if cached is not _PLAN_MISS:
        return cached
    if isinstance(a.vals, jax.core.Tracer):
        return None
    from cask_tpu.ops.pallas.bdia_slab import bdia_slab_ok, bdia_slab_plan

    plan = None
    try:
        br, bc = a.blocksize
        nfar = sum(1 for d in a.block_offsets if abs(d) > 1)
        db = jnp.dtype(a.vals.dtype).itemsize
        for g in (16, 8, 4):
            if not bdia_slab_ok(a, g):
                continue
            width = 2 * bc + g * bc * (1 + nfar)
            if a.nb_pad * br * width * db > _SLAB_MAX_BYTES:
                continue  # smaller g shrinks the far-segment fill
            plan = bdia_slab_plan(a, g)
            break
    except Exception:  # shear failure = not profitable, use the ring
        plan = None
    object.__setattr__(a, "_slab_auto_plan", plan)
    return plan


def _spmm_xla_csr(a: CSR, x, transpose, accum_dtype):
    acc = _accum_dtype(a.dtype, accum_dtype)
    data = jnp.asarray(a.data)
    indices = jnp.asarray(a.indices)
    rows = row_ids_from_indptr(jnp.asarray(a.indptr), a.nnz)
    if not transpose:
        prod = (data[:, None] * x[indices]).astype(acc)  # (nnz, k)
        return jax.ops.segment_sum(prod, rows, num_segments=a.shape[0], indices_are_sorted=True)
    else:
        prod = (data[:, None] * x[rows]).astype(acc)
        return jax.ops.segment_sum(prod, indices, num_segments=a.shape[1])


def _spmm_xla_coo(a: COO, x, transpose, accum_dtype):
    acc = _accum_dtype(a.dtype, accum_dtype)
    data = jnp.asarray(a.data)
    row, col = jnp.asarray(a.row), jnp.asarray(a.col)
    if transpose:
        row, col, m = col, row, a.shape[1]
    else:
        m = a.shape[0]
    prod = (data[:, None] * x[col]).astype(acc)
    return jax.ops.segment_sum(prod, row, num_segments=m)


def _spmm_xla_bsr(a: BSR, x, transpose, accum_dtype):
    acc = _accum_dtype(a.dtype, accum_dtype)
    br, bc = a.blocksize
    pm, pn = a.padded_shape
    k = x.shape[1]
    data = jnp.asarray(a.data)
    indices = jnp.asarray(a.indices)
    brow = row_ids_from_indptr(jnp.asarray(a.indptr), a.n_blocks)
    if not transpose:
        xp = jnp.zeros((pn, k), dtype=x.dtype).at[: a.shape[1]].set(x)
        xb = xp.reshape(a.n_block_cols, bc, k)[indices]  # (nb, bc, k)
        part = jnp.einsum("kij,kjl->kil", data, xb, preferred_element_type=acc)
        yb = jax.ops.segment_sum(part, brow, num_segments=a.n_block_rows, indices_are_sorted=True)
        return yb.reshape(pm, k)[: a.shape[0]]
    else:
        xp = jnp.zeros((pm, k), dtype=x.dtype).at[: a.shape[0]].set(x)
        xb = xp.reshape(a.n_block_rows, br, k)[brow]
        part = jnp.einsum("kij,kil->kjl", data, xb, preferred_element_type=acc)
        yb = jax.ops.segment_sum(part, indices, num_segments=a.n_block_cols)
        return yb.reshape(pn, k)[: a.shape[1]]


def spmm(a, x, *, transpose: bool = False, method: str = "auto",
         accum_dtype: Optional[object] = None):
    """``Y = a @ X`` (or ``aᵀ @ X``) with dense ``X`` of shape (n, k)."""
    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError(f"X must be 2-D, got shape {x.shape}")
    n_expect = a.shape[0] if transpose else a.shape[1]
    if x.shape[0] != n_expect:
        raise ValueError(f"dimension mismatch: A {a.shape} (transpose={transpose}) vs X {x.shape}")

    if method == "pallas_bsr":
        from cask_tpu.ops.pallas.bsr_kernels import bsr_spmm_pallas

        return bsr_spmm_pallas(a, x, transpose=transpose)
    if method == "dia":
        from cask_tpu.ops.dia import spmm_dia

        return spmm_dia(a, x, transpose=transpose, accum_dtype=accum_dtype)
    if method not in ("auto", "xla", "pallas_bdia", "slab"):
        raise ValueError(f"unknown spmm method {method!r}")

    if isinstance(a, CSR):
        if method == "auto" and not transpose and accum_dtype is None:
            # banded CSR rides the same cached DIA plan as spmv(csr, x)
            # (one plan per instance serves both ops); the DIA dispatch
            # picks the kt kernel at k <= 64 on TPU
            import importlib

            spmv_mod = importlib.import_module("cask_tpu.ops.spmv")
            from cask_tpu.utils.platform import on_tpu

            if on_tpu() or spmv_mod._AUTO_BSR_PLAN_FORCE:
                plan = spmv_mod._dia_auto_plan(a)
                if plan is not None:
                    return spmm(plan, x)
        return _spmm_xla_csr(a, x, transpose, accum_dtype)
    if isinstance(a, COO):
        return _spmm_xla_coo(a, x, transpose, accum_dtype)
    if isinstance(a, BSR):
        if method == "auto" and not transpose and accum_dtype is None:
            # same cached-plan fast path as spmv(bsr, x): one BDIA plan
            # per instance serves both ops; the inner dispatch picks the
            # kt kernel (k <= 64) or the ring (k > 64) on TPU
            import importlib

            spmv_mod = importlib.import_module("cask_tpu.ops.spmv")
            from cask_tpu.utils.platform import on_tpu

            if on_tpu() or spmv_mod._AUTO_BSR_PLAN_FORCE:
                plan = spmv_mod._bdia_auto_plan(a)
                if plan is not None:
                    return spmm(plan, x)
        return _spmm_xla_bsr(a, x, transpose, accum_dtype)
    from cask_tpu.ops.dia import DiaMatrix, spmm_dia

    if isinstance(a, DiaMatrix):
        return spmm_dia(a, x, transpose=transpose, accum_dtype=accum_dtype)
    from cask_tpu.ops.pallas.bdia_slab import BdiaSlabs

    if isinstance(a, BdiaSlabs):
        # a held slab plan IS the operator: jitted solver loops pass it
        # as a pytree ARGUMENT (a closure-captured plan becomes compile
        # constants — slow compiles, and beyond ~100 MB the remote
        # relay rejects the request; PERF.md probe_dist_slab1).  Note a
        # BdiaSlabs holds only the sheared band — spilled COO remainder
        # entries stay with the source BdiaMatrix (the BdiaMatrix auto
        # route adds them itself; direct BdiaSlabs callers must).
        if transpose:
            raise ValueError("BdiaSlabs has no transpose plan; shear "
                             "transpose_plan(bdia) instead")
        from cask_tpu.ops.pallas.bdia_slab import bdia_spmm_pallas_slab

        return bdia_spmm_pallas_slab(a, x, precision="highest",
                                     out_dtype=accum_dtype)
    from cask_tpu.ops.pallas.poh_kernels import PohMatrix

    if isinstance(a, PohMatrix):
        if transpose:
            from cask_tpu.ops.pallas.poh_kernels import poh_transpose_plan

            a = poh_transpose_plan(a)  # one-time host repack; hold to reuse
        return a.spmm(x)
    from cask_tpu.ops.bdia import BdiaMatrix, transpose_plan as _bdia_t

    if isinstance(a, BdiaMatrix):
        if transpose:
            a = _bdia_t(a)
        from cask_tpu.ops.pallas.bdia_kernels import (bdia_mm_ok,
                                                      bdia_spmm_pallas_ring)
        from cask_tpu.utils.platform import on_tpu

        k = int(x.shape[1])
        if k > 64 and (on_tpu() or method in ("pallas_bdia", "slab")):
            # wide k: the MXU slab kernel at exact precision beats the
            # VPU ring 1.5x measured (probe_slabmm1f: 6.8 vs 10.2 ms at
            # 1M rows k=128, relerr 3.9e-7); plan memoized per instance.
            # method='pallas_bdia' keeps forcing the ring explicitly.
            sl = _slab_auto_plan(a) if method != "pallas_bdia" else None
            if sl is not None:
                from cask_tpu.ops.pallas.bdia_slab import (
                    bdia_spmm_pallas_slab,
                )

                y = bdia_spmm_pallas_slab(sl, x, precision="highest",
                                          out_dtype=accum_dtype)
            elif bdia_mm_ok(a, k):
                # block ring SpMM fallback: exactly-nnz value stream,
                # X/Y cross HBM once in natural layout (VERDICT r2 it.3)
                y = bdia_spmm_pallas_ring(a, x, out_dtype=accum_dtype)
            else:
                y = None
            if y is not None:
                if a.rem_data.shape[0]:
                    prod = a.rem_data[:, None].astype(y.dtype) * \
                        x[a.rem_col].astype(y.dtype)
                    y = y + jax.ops.segment_sum(prod, a.rem_row,
                                                num_segments=a.shape[0])
                return y
        from cask_tpu.ops.bdia import bdia_scalar_dia

        # scalar-DIA SpMM on the expanded structure; the host-side plan
        # conversion is memoized on the BdiaMatrix so repeated spmm calls
        # (solver loops) pay it once, not per call (ADVICE r2)
        return bdia_scalar_dia(a).spmm(x)
    raise TypeError(f"unsupported matrix type {type(a)}")
