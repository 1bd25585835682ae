"""ILU(0): incomplete LU factorization with zero fill-in (BASELINE T5).

The factorization is inherently sequential row recurrence, so it runs on
the host once per matrix (numpy reference here; the native C++ core
provides the fast path for large matrices) — the preconditioner *apply*
(two triangular solves) runs on device via cached
:class:`~cask_tpu.ops.trisolve.TriSolvePlan`s, keeping solver iterations
device-resident (SURVEY.md §3.3 boundary lesson).

Storage follows the classic convention: one CSR on A's pattern holding
strict-lower = L (unit diagonal implied) and diag+upper = U.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from cask_tpu.formats.matrix import CSR
from cask_tpu.ops.trisolve import TriSolvePlan, trisolve_plan


def _ilu0_numpy(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Reference IKJ ILU(0) on a CSR pattern with sorted column indices."""
    n = indptr.shape[0] - 1
    lu = data.astype(np.float64, copy=True)
    # position of the diagonal entry in each row
    diag_pos = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        s, e = indptr[i], indptr[i + 1]
        cols_i = indices[s:e]
        dp = np.searchsorted(cols_i, i)
        if dp < cols_i.shape[0] and cols_i[dp] == i:
            diag_pos[i] = s + dp
        else:
            raise ValueError(f"ILU(0): missing diagonal in row {i}")

    for i in range(n):
        s, e = indptr[i], indptr[i + 1]
        cols_i = indices[s:e]
        row_i = lu[s:e]
        for t in range(e - s):
            k = cols_i[t]
            if k >= i:
                break
            dk = lu[diag_pos[k]]
            lik = row_i[t] / dk
            row_i[t] = lik
            # subtract lik * U-row(k) restricted to row i's pattern
            ks, ke = diag_pos[k] + 1, indptr[k + 1]
            if ks < ke:
                cols_k = indices[ks:ke]
                # merge: positions of cols_k within cols_i (both sorted)
                pos = np.searchsorted(cols_i, cols_k)
                ok = (pos < cols_i.shape[0])
                ok &= cols_i[np.minimum(pos, cols_i.shape[0] - 1)] == cols_k
                row_i[pos[ok]] -= lik * lu[ks:ke][ok]
        if lu[diag_pos[i]] == 0.0:
            raise ZeroDivisionError(f"ILU(0): zero pivot at row {i}")
    return lu


@dataclasses.dataclass(frozen=True)
class ILU0Factors:
    """Combined LU values on A's pattern, plus cached device solve plans."""

    lu: CSR  # values = factorization, pattern = A's
    _lower_plan: TriSolvePlan
    _upper_plan: TriSolvePlan
    _lower_data: np.ndarray  # values rearranged for each plan's pattern
    _upper_data: np.ndarray

    def apply(self, b):
        """Preconditioner solve  x = U⁻¹ L⁻¹ b  (jittable)."""
        y = self._lower_plan.solve(self._lower_data, b)
        return self._upper_plan.solve(self._upper_data, y)

    def split(self):
        """Return (L with unit diag, U) as separate host CSRs."""
        return _split_lu(self.lu)


def _split_lu(lu: CSR):
    indptr = np.asarray(lu.indptr, dtype=np.int64)
    indices = np.asarray(lu.indices, dtype=np.int64)
    data = np.asarray(lu.data)
    n = lu.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))

    def build(mask, extra_diag):
        r = rows[mask]
        c = indices[mask]
        d = data[mask]
        if extra_diag:
            r = np.concatenate([r, np.arange(n, dtype=np.int64)])
            c = np.concatenate([c, np.arange(n, dtype=np.int64)])
            d = np.concatenate([d, np.ones(n, dtype=data.dtype)])
        from cask_tpu.formats.convert import coo_from_arrays, coo_to_csr

        return coo_to_csr(coo_from_arrays(d, r, c, lu.shape), sum_duplicates=False)

    low = build(indices < rows, extra_diag=True)
    up = build(indices >= rows, extra_diag=False)
    return low, up


def ilu0(a: CSR, *, use_native: Optional[bool] = None) -> ILU0Factors:
    """Factor ``A ≈ L U`` on A's own sparsity pattern."""
    if not isinstance(a, CSR):
        raise TypeError("ilu0 requires a CSR matrix")
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)

    lu_vals = None
    if use_native is not False:
        try:
            from cask_tpu.native import binding as nat

            lu_vals = nat.ilu0(indptr, indices, data)
        except Exception:
            if use_native:
                raise
    if lu_vals is None:
        lu_vals = _ilu0_numpy(indptr, indices, data)

    lu = CSR(
        data=lu_vals.astype(data.dtype),
        indices=indices.astype(np.int32),
        indptr=indptr.astype(np.int32),
        shape=a.shape,
    )
    low, up = _split_lu(lu)
    lp = trisolve_plan(low, lower=True, unit_diag=True)
    upl = trisolve_plan(up, lower=False, unit_diag=False)
    return ILU0Factors(
        lu=lu,
        _lower_plan=lp,
        _upper_plan=upl,
        _lower_data=np.asarray(low.data),
        _upper_data=np.asarray(up.data),
    )
