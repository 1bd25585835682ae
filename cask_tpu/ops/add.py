"""Sparse + sparse addition and diagonal shifts.

Same architecture as SpGEMM (host symbolic / device numeric): the union
structure of two patterns is computed once on the host; the value
combination ``α·a + β·b`` is a jittable scatter-free segment sum, so
shifted operators (A − σI for eigen/Helmholtz-style solves) and operator
sums rebuild values on device without re-planning.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cask_tpu.formats.convert import coo_from_arrays, coo_to_csr
from cask_tpu.formats.matrix import CSR

_INT = np.int32


@dataclasses.dataclass(frozen=True)
class AddPlan:
    """Union structure of two CSR patterns with source maps."""

    shape: Tuple[int, int]
    c_indices: np.ndarray  # (nnz_C,) int32
    c_indptr: np.ndarray  # (m+1,) int32
    a_dst: np.ndarray  # (nnz_A,) int32 → C slot of each A entry
    b_dst: np.ndarray  # (nnz_B,) int32 → C slot of each B entry

    @property
    def nnz(self) -> int:
        return int(self.c_indices.shape[0])

    def numeric(self, a_data, b_data, *, alpha=1.0, beta=1.0) -> CSR:
        a_data = jnp.asarray(a_data)
        b_data = jnp.asarray(b_data)
        dt = jnp.result_type(a_data.dtype, b_data.dtype)
        c = jax.ops.segment_sum(
            (alpha * a_data).astype(dt), jnp.asarray(self.a_dst), num_segments=self.nnz
        )
        c = c + jax.ops.segment_sum(
            (beta * b_data).astype(dt), jnp.asarray(self.b_dst), num_segments=self.nnz
        )
        return CSR(data=c, indices=jnp.asarray(self.c_indices),
                   indptr=jnp.asarray(self.c_indptr), shape=self.shape)


def add_plan(a: CSR, b: CSR) -> AddPlan:
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    m, n = a.shape

    def expand(x):
        ip = np.asarray(x.indptr, dtype=np.int64)
        rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(ip))
        return rows * n + np.asarray(x.indices, dtype=np.int64)

    ka = expand(a)
    kb = expand(b)
    keys = np.concatenate([ka, kb])
    uniq, inv = np.unique(keys, return_inverse=True)
    a_dst = inv[: ka.shape[0]]
    b_dst = inv[ka.shape[0] :]
    c_rows = uniq // n
    c_indptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(c_indptr, c_rows + 1, 1)
    return AddPlan(
        shape=(m, n),
        c_indices=(uniq % n).astype(_INT),
        c_indptr=np.cumsum(c_indptr).astype(_INT),
        a_dst=a_dst.astype(_INT),
        b_dst=b_dst.astype(_INT),
    )


def sp_add(a: CSR, b: CSR, *, alpha=1.0, beta=1.0,
           plan: Optional[AddPlan] = None) -> CSR:
    """``C = α·A + β·B`` on the union pattern."""
    if plan is None:
        plan = add_plan(a, b)
    return plan.numeric(a.data, b.data, alpha=alpha, beta=beta)


def shift_identity(a: CSR, sigma) -> CSR:
    """``A + σ·I`` (host structure extension, device-ready values)."""
    n = min(a.shape)
    eye = coo_to_csr(coo_from_arrays(
        np.ones(n, dtype=np.asarray(a.data).dtype),
        np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64), a.shape,
    ))
    return sp_add(a, eye, alpha=1.0, beta=sigma)
