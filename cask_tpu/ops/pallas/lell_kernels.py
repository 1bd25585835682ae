"""Lane-bucketed ELL ("LELL") SpMV — the unstructured-matrix Pallas path.

TPUs have no scatter/gather hardware for arbitrary indices, but Mosaic
*does* lower a 2-D ``take_along_axis(x2, idx, axis=0)``: each lane
gathers independently within its own column.  LELL exploits that:

- x is stored 2-D as ``x2[r, l] = x[r·128 + l]`` — lane ``l`` owns the
  elements congruent to ``l`` (mod 128).
- Every matrix entry ``(i, c)`` lives in lane ``c % 128`` with in-lane
  row ``c // 128``.  Entries of output row ``i`` are packed into *layers*:
  layer ``ℓ`` holds at most one entry per (row, lane) pair.
- Per output-row tile: for each layer, one lane-local gather + FMA; a
  final lane-sum folds the 128 lane accumulators into y.

Traffic = (vals + idx) over padded slots; the padding factor is
``128·L / avg_nnz_per_row`` — heavy-tailed rows blow up ``L``, so rows
needing more than ``max_layers`` spill to a COO remainder (HYB again).
This targets graph-class matrices where the DIA split leaves ~everything
in the remainder (measured 65 Mnnz/s on the XLA gather path).

cask analog: SURVEY.md §2 R5 — the "vector cache + streamed nnz" idea,
with lane-binning standing in for cask's banked BRAM access.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cask_tpu.formats.matrix import CSR

_LANE = 128
_ROWS = 64  # output rows per tile

# VMEM budget for the resident x2 (same reasoning as dia kernels)
_X_VMEM_BUDGET = 8 * 1024 * 1024


def _interpret() -> bool:
    from cask_tpu.utils.platform import on_tpu

    return not on_tpu()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LellMatrix:
    """Layered lane-bucketed ELL + COO remainder."""

    vals: jax.Array  # (L, m_pad, 128)
    idx: jax.Array  # (L, m_pad, 128) int32 in-lane row of x (pad → 0, val 0)
    rem_data: jax.Array  # remainder (heavy rows / overflow)
    rem_row: jax.Array
    rem_col: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def layers(self) -> int:
        return int(self.vals.shape[0])

    @property
    def m_pad(self) -> int:
        return int(self.vals.shape[1])

    @property
    def traffic_bytes(self) -> int:
        db = jnp.dtype(self.vals.dtype).itemsize
        return int(self.vals.size * (db + 4) + self.rem_data.shape[0] * (db + 8))

    def device_put(self, device=None) -> "LellMatrix":
        return jax.tree.map(lambda t: jax.device_put(t, device), self)

    def spmv(self, x):
        y = lell_spmv_pallas(self, x)
        if self.rem_data.shape[0]:
            prod = self.rem_data * x[self.rem_col]
            y = y + jax.ops.segment_sum(prod, self.rem_row, num_segments=self.shape[0])
        return y


def lell_plan(a: CSR, *, max_layers: int = 4) -> LellMatrix:
    """Pack a CSR into lane-bucketed layers; overflow spills to COO."""
    m, n = a.shape
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))

    lanes = indices % _LANE
    inlane = (indices // _LANE).astype(np.int32)

    # layer of each entry = its ordinal among same (row, lane) entries
    order = np.lexsort((inlane, lanes, rows))
    r_s, l_s = rows[order], lanes[order]
    key = r_s * _LANE + l_s
    new_grp = np.empty(key.shape, dtype=bool)
    if key.size:
        new_grp[0] = True
        np.not_equal(key[1:], key[:-1], out=new_grp[1:])
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(key.size), 0))
    layer = np.arange(key.size) - grp_start

    keep = layer < max_layers
    L = int(layer[keep].max()) + 1 if np.any(keep) else 1
    m_pad = -(-max(m, 1) // _ROWS) * _ROWS

    vals = np.zeros((L, m_pad, _LANE), dtype=data.dtype)
    idx = np.zeros((L, m_pad, _LANE), dtype=np.int32)
    vk = data[order][keep]
    vals[layer[keep], r_s[keep], l_s[keep]] = vk
    idx[layer[keep], r_s[keep], l_s[keep]] = inlane[order][keep]

    spill = ~keep
    return LellMatrix(
        vals=jnp.asarray(vals),
        idx=jnp.asarray(idx),
        rem_data=jnp.asarray(data[order][spill]),
        rem_row=jnp.asarray(r_s[spill].astype(np.int32)),
        rem_col=jnp.asarray(indices[order][spill].astype(np.int32)),
        shape=(m, n),
    )


def _lell_kernel(L, interpret, x_ref, v_ref, i_ref, o_ref):
    # v_ref/i_ref blocks: (L, _ROWS, _LANE); x_ref resident (C, 128);
    # o_ref block: (1, _ROWS) — the per-row lane sums
    acc = jnp.zeros((_ROWS, _LANE), dtype=o_ref.dtype)
    for ell in range(L):
        g = jnp.take_along_axis(x_ref[...], i_ref[ell], axis=0)
        acc = acc + v_ref[ell] * g
    o_ref[0, :] = jnp.sum(acc, axis=1)


def lell_spmv_pallas(a: LellMatrix, x):
    m, n = a.shape
    L = a.layers
    C = -(-n // _LANE)
    db = jnp.dtype(x.dtype).itemsize
    if C * _LANE * db > _X_VMEM_BUDGET:
        raise ValueError("LELL needs x resident in VMEM")
    x2 = jnp.zeros((C * _LANE,), x.dtype).at[:n].set(x).reshape(C, _LANE)
    T = a.m_pad // _ROWS

    out_dtype = jnp.promote_types(jnp.promote_types(a.vals.dtype, x.dtype), jnp.float32) \
        if jnp.bfloat16 in (a.vals.dtype, x.dtype) \
        else jnp.promote_types(a.vals.dtype, x.dtype)
    kernel = lambda x_ref, v_ref, i_ref, o_ref: _lell_kernel(  # noqa: E731
        L, _interpret(), x_ref, v_ref, i_ref, o_ref
    )
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((L, _ROWS, _LANE), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, _ROWS, _LANE), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, _ROWS), out_dtype),
        interpret=_interpret(),
    )(x2, a.vals, a.idx)
    return out.reshape(-1)[:m]
