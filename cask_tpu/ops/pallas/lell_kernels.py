"""Grouped lane-bucketed ELL ("LELL") SpMV — the unstructured-matrix path.

TPUs have no scatter/gather hardware for arbitrary indices, but Mosaic
lowers a 2-D ``take_along_axis(x2, idx, axis=0)``: each lane gathers
independently within its own column.  LELL exploits that with a *dual
role* for the 128 lanes — lane ``l = g·B + b`` serves

- output-row group ``g``  (rows ``i`` with ``i % G == g``), and
- x bucket ``b``          (columns ``c`` with ``c % B == b``),

where ``G·B = 128``.  x is stored bucket-replicated: ``x2[r, l] =
x[r·B + (l % B)]`` (each bucket appears in G lanes), so an entry
``(i, c)`` has exactly one home lane ``(i % G)·B + (c % B)`` and slot
row ``i // G``; colliding entries stack into *layers*, and rows whose
collisions exceed ``max_layers`` spill to a COO remainder (HYB).

Per output tile the kernel does L gathers + FMAs and one reshape-sum
(the fixed lane→group mapping replaces per-slot row tags), so compute
is light; traffic is ``(vals+idx) ≈ 8·G·L/avg_nnz`` bytes per nonzero —
G=8 brings typical graph matrices to ~20–40% slot fill.

cask analog: SURVEY.md §2 R5's banked BRAM vector cache, with lane
binning as the bank-conflict-avoidance scheme.

STATUS — experimental / interpret-validated only.  Hardware probes
(.tpu_logs/probe11*.log) established that Mosaic's ``tpu.dynamic_gather``
only shuffles within a *single vreg* along the gather dimension
("Multiple source vregs along gather dimension" is unimplemented on
v5e), so gathers deeper than 8 sublanes cannot lower and this kernel
cannot run compiled.  It is kept as the ready-made design for when
Mosaic grows deep gathers (or for SparseCore-class backends); the tuner
does not enumerate it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cask_tpu.formats.matrix import CSR

_LANE = 128
_ROWS = 64  # slot rows per tile

_X_VMEM_BUDGET = 8 * 1024 * 1024


def _interpret() -> bool:
    from cask_tpu.utils.platform import on_tpu

    return not on_tpu()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LellMatrix:
    """Layered grouped lane-bucketed ELL + COO remainder."""

    vals: jax.Array  # (L, S_pad, 128) — S_pad slot rows (= ceil(m/G) padded)
    idx: jax.Array  # (L, S_pad, 128) int32 in-lane row into x2 (pad → 0/val 0)
    rem_data: jax.Array
    rem_row: jax.Array
    rem_col: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    groups: int = dataclasses.field(metadata=dict(static=True))

    @property
    def layers(self) -> int:
        return int(self.vals.shape[0])

    @property
    def s_pad(self) -> int:
        return int(self.vals.shape[1])

    @property
    def bucket(self) -> int:
        return _LANE // self.groups

    @property
    def traffic_bytes(self) -> int:
        db = jnp.dtype(self.vals.dtype).itemsize
        return int(self.vals.size * (db + 4) + self.rem_data.shape[0] * (db + 8))

    def fill(self) -> float:
        true_nnz = int(np.count_nonzero(np.asarray(self.vals)))
        return true_nnz / max(self.vals.size, 1)

    def device_put(self, device=None) -> "LellMatrix":
        return jax.tree.map(lambda t: jax.device_put(t, device), self)

    def spmv(self, x):
        y = lell_spmv_pallas(self, x)
        if self.rem_data.shape[0]:
            prod = self.rem_data * x[self.rem_col]
            y = y + jax.ops.segment_sum(prod, self.rem_row, num_segments=self.shape[0])
        return y


def lell_plan(a: CSR, *, max_layers: int = 6, groups: int = 8) -> LellMatrix:
    """Pack a CSR into grouped lane-bucketed layers; overflow → COO."""
    if _LANE % groups:
        raise ValueError("groups must divide 128")
    B = _LANE // groups
    m, n = a.shape
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))

    lane = (rows % groups) * B + indices % B
    srow = rows // groups
    inlane = (indices // B).astype(np.int32)

    order = np.lexsort((inlane, lane, srow))
    s_s, l_s = srow[order], lane[order]
    key = s_s * _LANE + l_s
    new_grp = np.empty(key.shape, dtype=bool)
    if key.size:
        new_grp[0] = True
        np.not_equal(key[1:], key[:-1], out=new_grp[1:])
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(key.size), 0))
    layer = np.arange(key.size) - grp_start

    keep = layer < max_layers
    L = int(layer[keep].max()) + 1 if np.any(keep) else 1
    s_pad = -(-max(int(srow.max(initial=0)) + 1, 1) // _ROWS) * _ROWS

    vals = np.zeros((L, s_pad, _LANE), dtype=data.dtype)
    idx = np.zeros((L, s_pad, _LANE), dtype=np.int32)
    vals[layer[keep], s_s[keep], l_s[keep]] = data[order][keep]
    idx[layer[keep], s_s[keep], l_s[keep]] = inlane[order][keep]

    spill = ~keep
    return LellMatrix(
        vals=jnp.asarray(vals),
        idx=jnp.asarray(idx),
        rem_data=jnp.asarray(data[order][spill]),
        rem_row=jnp.asarray(rows[order][spill].astype(np.int32)),
        rem_col=jnp.asarray(indices[order][spill].astype(np.int32)),
        shape=(m, n),
        groups=groups,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ChunkedLell:
    """Hub-row tier: each heavy row owns degree-proportional *chunk*
    slot rows (all 128 lanes feed one output row), folded by a tiny
    segment sum.  Fill tracks the row's lane-load skew, not the heaviest
    row in the tier."""

    vals: jax.Array  # (L, S_pad, 128)
    idx: jax.Array  # (L, S_pad, 128) int32
    slot2row: jax.Array  # (S_pad,) int32 original row id (pad → m)
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def layers(self) -> int:
        return int(self.vals.shape[0])

    @property
    def traffic_bytes(self) -> int:
        db = jnp.dtype(self.vals.dtype).itemsize
        return int(self.vals.size * (db + 4))

    def fill(self) -> float:
        true_nnz = int(np.count_nonzero(np.asarray(self.vals)))
        return true_nnz / max(self.vals.size, 1)

    def spmv_partial(self, x):
        """Per-row partial sums (length m, zeros for non-hub rows)."""
        sums = _lell_lane_sums(self, x)  # (S_pad,)
        return jax.ops.segment_sum(
            sums, self.slot2row, num_segments=self.shape[0] + 1
        )[: self.shape[0]]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybLell:
    """Degree-tiered pack: grouped LELL for the bulk, chunked tier for
    hub rows, COO for residual overflow.  Heavy-tailed graphs put much
    of their nnz in a few hub rows; routed through the grouped pack
    those overflow straight to the slow COO path, hence the tiering."""

    main: LellMatrix
    hub: ChunkedLell

    @property
    def shape(self):
        return self.main.shape

    @property
    def traffic_bytes(self) -> int:
        return self.main.traffic_bytes + self.hub.traffic_bytes

    def device_put(self, device=None) -> "HybLell":
        return jax.tree.map(lambda t: jax.device_put(t, device), self)

    def spmv(self, x):
        y = self.main.spmv(x)
        if self.hub.vals.shape[1] > 0:
            y = y + self.hub.spmv_partial(x)
        return y


def _pack_chunked_arrays(m, rows, indices, data, chunk_layers: int, dtype):
    """Chunk-pack hub entries: slot row = (row, chunk); every lane feeds
    that one output row.  Returns (vals, idx, slot2row) numpy arrays."""
    lane = indices % _LANE
    inlane = (indices // _LANE).astype(np.int32)
    if rows.size == 0:
        return (np.zeros((1, 0, _LANE), dtype=dtype),
                np.zeros((1, 0, _LANE), np.int32),
                np.zeros(0, np.int32))
    order = np.lexsort((inlane, lane, rows))
    r_s, l_s = rows[order], lane[order]
    key = r_s * _LANE + l_s
    new_grp = np.empty(key.shape, dtype=bool)
    new_grp[0] = True
    np.not_equal(key[1:], key[:-1], out=new_grp[1:])
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(key.size), 0))
    k_in_lane = np.arange(key.size) - grp_start  # ordinal within (row, lane)
    chunk = k_in_lane // chunk_layers
    layer = k_in_lane % chunk_layers

    uniq_rows, row_comp = np.unique(r_s, return_inverse=True)
    nchunks = np.zeros(uniq_rows.shape[0], dtype=np.int64)
    np.maximum.at(nchunks, row_comp, chunk + 1)
    chunk_base = np.zeros(uniq_rows.shape[0] + 1, dtype=np.int64)
    np.cumsum(nchunks, out=chunk_base[1:])
    S = int(chunk_base[-1])
    S_pad = -(-max(S, 1) // _ROWS) * _ROWS

    slot = chunk_base[row_comp] + chunk
    L = int(layer.max()) + 1
    vals = np.zeros((L, S_pad, _LANE), dtype=dtype)
    idx = np.zeros((L, S_pad, _LANE), dtype=np.int32)
    vals[layer, slot, l_s] = data[order]
    idx[layer, slot, l_s] = inlane[order]
    slot2row = np.full(S_pad, m, dtype=np.int32)  # pad slots → dropped segment
    slot2row[:S] = np.repeat(uniq_rows, nchunks).astype(np.int32)
    return vals, idx, slot2row


def lell_plan_hyb(a: CSR, *, groups: int = 8, max_layers: int = 6,
                  chunk_layers: int = 4) -> HybLell:
    """Tiered pack.  A row goes to the hub tier when its expected
    per-lane load in the grouped pack exceeds the layer budget."""
    m, n = a.shape
    lens = np.diff(np.asarray(a.indptr, dtype=np.int64))
    B = _LANE // groups
    hub_mask = lens > (max_layers * B) // 2

    all_rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    sel_hub = hub_mask[all_rows]

    from cask_tpu.formats.convert import coo_from_arrays, coo_to_csr

    main_csr = coo_to_csr(
        coo_from_arrays(data[~sel_hub], all_rows[~sel_hub], indices[~sel_hub], (m, n)),
        sum_duplicates=False,
    )
    main = lell_plan(main_csr, max_layers=max_layers, groups=groups)

    h_rows = all_rows[sel_hub]
    h_idx = indices[sel_hub]
    h_dat = data[sel_hub]
    vals, idx, slot2row = _pack_chunked_arrays(m, h_rows, h_idx, h_dat, chunk_layers,
                                               dtype=data.dtype)
    hub = ChunkedLell(
        vals=jnp.asarray(vals), idx=jnp.asarray(idx),
        slot2row=jnp.asarray(slot2row), shape=(m, n),
    )
    return HybLell(main=main, hub=hub)


def _lell_kernel(L, G, SB, interpret, x_ref, v_ref, i_ref, o_ref, acc_ref):
    # Mosaic's gather lowering requires operand.shape == indices.shape,
    # so x is padded to the slot-chunk shape (SB, 128) and each grid step
    # gathers one whole layer of one chunk.  Grid: (chunks, L); the acc
    # scratch persists across the layer dimension.
    ell = pl.program_id(1)

    @pl.when(ell == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = jnp.take_along_axis(x_ref[...], i_ref[0], axis=0)
    acc_ref[...] += (v_ref[0] * g).astype(acc_ref.dtype)

    @pl.when(ell == L - 1)
    def _():
        # per-group lane reductions: Mosaic cannot shape-cast lanes into
        # (G, B), but lane-slice + reduce lowers fine
        B = _LANE // G
        for g in range(G):
            seg = acc_ref[:, g * B : (g + 1) * B]
            o_ref[:, g : g + 1] = jnp.sum(seg, axis=1, keepdims=True).astype(
                o_ref.dtype
            )


# slot-chunk rows: must hold all of x2 (C rows) and bound VMEM; the
# gather's shape-equality rule makes this also the per-step block height.
_SB_CAP = 4096


def _lell_call(vals, idx, x2, G, out_dtype, interpret):
    """Shared driver: grid (chunks, L), scratch accumulator, in-kernel
    group reduce.  x2 is (C, 128); returns (S_pad, G) group sums."""
    L, s_pad, _ = vals.shape
    C = int(x2.shape[0])
    SB = max(-(-C // _ROWS) * _ROWS, _ROWS)
    if SB > _SB_CAP:
        raise ValueError(
            f"LELL: x bucket rows ({C}) exceed the slot-chunk cap {_SB_CAP} "
            "(matrix too wide for this group count)"
        )
    # slot rows pad to a multiple of SB so every chunk is full
    s_pad2 = -(-max(s_pad, 1) // SB) * SB
    if s_pad2 != s_pad:
        pad = s_pad2 - s_pad
        vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
    x2p = jnp.pad(x2, ((0, SB - C), (0, 0))) if SB != C else x2
    chunks = s_pad2 // SB

    kernel = functools.partial(_lell_kernel, L, G, SB, interpret)
    out = pl.pallas_call(
        kernel,
        grid=(chunks, L),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SB, _LANE), lambda c, ell: (ell, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SB, _LANE), lambda c, ell: (ell, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SB, G), lambda c, ell: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunks * SB, G), out_dtype),
        scratch_shapes=[pltpu.VMEM((SB, _LANE), out_dtype)],
        interpret=interpret,
    )(x2p, vals, idx)
    return out  # (>= s_pad, G)


def _out_dtype(vdt, xdt):
    if jnp.bfloat16 in (vdt, xdt):
        return jnp.promote_types(jnp.promote_types(vdt, xdt), jnp.float32)
    return jnp.promote_types(vdt, xdt)


def _lell_lane_sums(a: ChunkedLell, x):
    """Per-slot-row lane sums for the chunked hub tier (G=1)."""
    m, n = a.shape
    if int(a.vals.shape[1]) == 0:
        return jnp.zeros((0,), x.dtype)
    C = -(-n // _LANE)
    x2 = jnp.zeros((C * _LANE,), x.dtype).at[:n].set(x).reshape(C, _LANE)
    out = _lell_call(a.vals, a.idx, x2, 1, _out_dtype(a.vals.dtype, x.dtype),
                     _interpret())
    return out.reshape(-1)[: int(a.vals.shape[1])]


def lell_spmv_pallas(a: LellMatrix, x):
    m, n = a.shape
    G = a.groups
    B = a.bucket
    C = -(-n // B)
    # bucket-replicated layout: x2[r, l] = x[r*B + (l % B)]
    xp = jnp.zeros((C * B,), x.dtype).at[:n].set(x)
    x2 = jnp.tile(xp.reshape(C, B), (1, G))
    out = _lell_call(a.vals, a.idx, x2, G, _out_dtype(a.vals.dtype, x.dtype),
                     _interpret())
    # slot row s, group g → real row s*G + g: row-major flatten
    return out[: a.s_pad].reshape(-1)[:m]
