"""Preconditioners beyond ILU(0).

All device-resident callables ``r → M⁻¹r`` compatible with the Krylov
solvers.  ILU(0) (the strongest of these) lives in
:mod:`cask_tpu.ops.ilu`; these lighter ones need no factorization and
work distributed (Jacobi is embarrassingly parallel; block-Jacobi's
blocks live within shards).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cask_tpu.formats.matrix import CSR


def extract_diagonal(a: CSR) -> np.ndarray:
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    n = min(a.shape)
    rows = np.repeat(np.arange(a.shape[0], dtype=np.int64), np.diff(indptr))
    on = (rows == indices) & (rows < n)
    d = np.zeros(n, dtype=data.dtype)
    d[rows[on]] = data[on]
    return d


def jacobi(a: CSR):
    """Diagonal (Jacobi) preconditioner: ``r → r / diag(A)``."""
    d = extract_diagonal(a)
    if np.any(d == 0):
        raise ValueError("Jacobi preconditioner requires a nonzero diagonal")
    inv = jnp.asarray(1.0 / d)

    def apply(r):
        if r.ndim == 1:
            return r * inv
        return r * inv[:, None]

    return apply


def block_jacobi(a: CSR, block: int = 64):
    """Dense-inverted diagonal blocks: ``r → blkdiag(A)⁻¹ r``.

    Blocks are inverted once on the host (LU), applied as a batched
    matmul on device — MXU-friendly and shard-local when ``block``
    divides the partition size.
    """
    n = a.shape[0]
    nb = -(-n // block)
    dense = np.zeros((nb, block, block), dtype=np.asarray(a.data).dtype)
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    inblk = rows // block == indices // block
    r, c, v = rows[inblk], indices[inblk], data[inblk]
    dense[r // block, r % block, c % block] = v
    for b in range(nb):
        hi = min(block, n - b * block)
        blk = dense[b, :hi, :hi]
        if np.any(np.diag(blk) == 0):
            np.fill_diagonal(blk, np.where(np.diag(blk) == 0, 1.0, np.diag(blk)))
        dense[b, :hi, :hi] = np.linalg.inv(blk)
        if hi < block:  # identity on padding
            for i in range(hi, block):
                dense[b, i, i] = 1.0
    inv = jnp.asarray(dense)

    def apply(r):
        vec = r.ndim == 1
        r2 = r[:, None] if vec else r
        pad = nb * block - n
        rp = jnp.pad(r2, ((0, pad), (0, 0)))
        out = jnp.einsum("bij,bjk->bik", inv, rp.reshape(nb, block, -1))
        out = out.reshape(nb * block, -1)[:n]
        return out[:, 0] if vec else out

    return apply
