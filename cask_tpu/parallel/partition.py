"""Host-side matrix partitioning for multi-chip execution (BASELINE T7).

cask had no multi-accelerator story (single DFE); the distribution layer
is specified by BASELINE.json: row/block-partition across chips, halo
vector segments exchanged with ``jax.lax`` collectives overlapped with
local compute.

Partitioning contract (shape-uniform so one ``shard_map`` program serves
every shard): ``P`` contiguous row blocks of identical padded size
``mloc``; per-shard index arrays padded to the max across shards with
structural zeros (row 0 / col 0 / value 0 — harmless in segment sums).

Two plans are built here:

- :class:`CooPartition` — any matrix.  Entries are split per shard into
  *interior* (column owned locally) and *exterior* (column elsewhere);
  the exterior part indexes an all-gathered x.  Interior compute has no
  data dependence on the collective, which is what lets XLA overlap the
  all-gather with it.
- :class:`DiaPartition` — banded matrices (the ≥10M-row config-5 class).
  Each shard holds its slice of every packed diagonal; only ``lo``/``hi``
  edge elements are needed from the ring neighbors (`ppermute`), and the
  big diagonal FMA work depends only on local x — the halo fix-up
  touches just the first/last rows.  This is SpMV's ring-exchange analog
  of sequence parallelism (SURVEY.md §2 parallelism inventory).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np

from cask_tpu.formats.matrix import CSR

_INT = np.int32


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CooPartition:
    """Row-partitioned COO with interior/exterior split (general matrices)."""

    # interior: columns local to the shard (remapped to local indices)
    int_data: jax.Array  # (P, Ei)
    int_row: jax.Array  # (P, Ei) local row
    int_col: jax.Array  # (P, Ei) local col
    # exterior: columns owned by other shards (global indices into
    # the padded gathered vector of length P*mloc)
    ext_data: jax.Array  # (P, Ee)
    ext_row: jax.Array  # (P, Ee) local row
    ext_col: jax.Array  # (P, Ee) padded-global col
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nshards: int = dataclasses.field(metadata=dict(static=True))
    mloc: int = dataclasses.field(metadata=dict(static=True))

    def device_put(self, device=None) -> "CooPartition":
        return jax.tree.map(lambda x: jax.device_put(x, device), self)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiaPartition:
    """Row-partitioned diagonal pack + ring halo (banded matrices).

    ``vals[p, d, r]`` is ``A[p*mloc + r, p*mloc + r + offsets[d]]``.
    Entries outside the band go into an embedded :class:`CooPartition`
    remainder (may be empty).
    """

    vals: jax.Array  # (P, D, mloc)
    remainder: Optional[CooPartition]  # exterior-style COO or None
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nshards: int = dataclasses.field(metadata=dict(static=True))
    mloc: int = dataclasses.field(metadata=dict(static=True))

    @property
    def halo_lo(self) -> int:
        return -min(min(self.offsets), 0)

    @property
    def halo_hi(self) -> int:
        return max(max(self.offsets), 0)

    def device_put(self, device=None) -> "DiaPartition":
        return jax.tree.map(lambda x: jax.device_put(x, device), self)


def _pad_rows(groups, P, width, fill=0, dtype=_INT):
    out = np.full((P, width), fill, dtype=dtype)
    for p, g in enumerate(groups):
        out[p, : g.shape[0]] = g
    return out


def partition_coo(a: CSR, nshards: int) -> CooPartition:
    """Row-partition any CSR into the interior/exterior COO plan."""
    m, n = a.shape
    P = nshards
    mloc = _ceil_div(m, P)
    if n > P * mloc:
        # x is partitioned like the rows; a wider matrix would index the
        # gathered vector out of range
        raise ValueError(
            f"partition_coo requires n ({n}) <= nshards*mloc ({P * mloc}); "
            "pad the matrix columns or partition the transpose"
        )
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))

    owner_row = rows // mloc
    owner_col = indices // mloc  # x is partitioned identically (square-ish)
    interior = owner_row == owner_col

    gi = [None] * P
    ge = [None] * P
    for p in range(P):
        mine = owner_row == p
        mi = mine & interior
        me = mine & ~interior
        gi[p] = (data[mi], rows[mi] - p * mloc, indices[mi] - p * mloc)
        # exterior columns as *padded global* index: shard q, local c →
        # q*mloc + c (identity here since x layout is contiguous padded)
        ge[p] = (data[me], rows[me] - p * mloc, indices[me])

    Ei = max((g[0].shape[0] for g in gi), default=0) or 1
    Ee = max((g[0].shape[0] for g in ge), default=0) or 1
    return CooPartition(
        int_data=jax.numpy.asarray(_pad_rows([g[0] for g in gi], P, Ei, 0.0, data.dtype)),
        int_row=jax.numpy.asarray(_pad_rows([g[1] for g in gi], P, Ei)),
        int_col=jax.numpy.asarray(_pad_rows([g[2] for g in gi], P, Ei)),
        ext_data=jax.numpy.asarray(_pad_rows([g[0] for g in ge], P, Ee, 0.0, data.dtype)),
        ext_row=jax.numpy.asarray(_pad_rows([g[1] for g in ge], P, Ee)),
        ext_col=jax.numpy.asarray(_pad_rows([g[2] for g in ge], P, Ee)),
        shape=(m, n),
        nshards=P,
        mloc=mloc,
    )


def partition_dia(a: CSR, nshards: int, *, min_density: float = 0.10,
                  max_diags: int = 256, max_halo: Optional[int] = None,
                  align: int = 1) -> DiaPartition:
    """Row-partition a banded CSR into per-shard diagonal slices.

    Diagonals whose |offset| exceeds ``max_halo`` (default ``mloc``) spill
    to the remainder — a halo wider than a whole shard would need
    multi-hop exchange, which the all-gather remainder already covers.

    ``align``: round the per-shard row count up to this multiple (the
    Pallas interior kernel needs 8192-row alignment).
    """
    m, n = a.shape
    if m != n:
        raise ValueError("DiaPartition requires a square matrix")
    P = nshards
    mloc = _ceil_div(_ceil_div(m, P), align) * align
    max_halo = max_halo if max_halo is not None else mloc

    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    offs = indices - rows

    uniq, counts = np.unique(offs, return_counts=True)
    diag_len = np.minimum(np.minimum(m, n - uniq), np.minimum(n, m + uniq))
    density = counts / np.maximum(diag_len, 1)
    keep = (density >= min_density) & (np.abs(uniq) <= max_halo)
    if keep.sum() > max_diags:
        keep &= counts >= np.sort(counts[keep])[-max_diags]
    kept = uniq[keep]
    if kept.size == 0:
        kept = np.array([0], dtype=np.int64)

    in_dia = np.isin(offs, kept)
    D = kept.size
    vals = np.zeros((P, D, mloc), dtype=data.dtype)
    d_ids = np.searchsorted(kept, offs[in_dia])
    r = rows[in_dia]
    vals[r // mloc, d_ids, r % mloc] = data[in_dia]

    rem = None
    n_rem = int((~in_dia).sum())
    if n_rem:
        from cask_tpu.formats.convert import coo_from_arrays, coo_to_csr

        rem_csr = coo_to_csr(
            coo_from_arrays(data[~in_dia], rows[~in_dia], indices[~in_dia], (m, n))
        )
        rem = partition_coo(rem_csr, P)

    return DiaPartition(
        vals=jax.numpy.asarray(vals),
        remainder=rem,
        offsets=tuple(int(o) for o in kept),
        shape=(m, n),
        nshards=P,
        mloc=mloc,
    )


def stencil_dia_partition(nx: int, ny: Optional[int] = None, *, nshards: int,
                          align: int = 8192, dtype=np.float32) -> DiaPartition:
    """Formulaic DiaPartition of the 5-point Laplacian — no CSR build.

    The ≥10M-row config-5 class needs a partition plan every CI round
    (VERDICT r1 item 7), but materializing the 50M-entry CSR first costs
    a minute of numpy; the stencil's diagonals are formulaic, so the
    sharded pack is written directly (bit-identical to
    ``partition_dia(generate.stencil_2d(nx, ny), nshards, align=align)``,
    covered by a small-size parity test)."""
    ny = ny or nx
    n = nx * ny
    P = nshards
    mloc = _ceil_div(_ceil_div(n, P), align) * align
    offsets = tuple(sorted({-ny, -1, 0, 1, ny}))
    g = np.arange(P * mloc, dtype=np.int64)  # global row ids (padded)
    in_range = g < n
    col_in_row = g % ny
    vals = np.zeros((len(offsets), P * mloc), dtype=dtype)
    for d, off in enumerate(offsets):
        if off == 0:
            ok = in_range
            v = 4.0
        elif off == 1:
            ok = in_range & (g + 1 < n) & (col_in_row != ny - 1)
            v = -1.0
        elif off == -1:
            ok = in_range & (g >= 1) & (col_in_row != 0)
            v = -1.0
        elif off == ny:
            ok = in_range & (g + ny < n)
            v = -1.0
        else:
            ok = in_range & (g >= ny)
            v = -1.0
        vals[d, ok] = v
    return DiaPartition(
        vals=jax.numpy.asarray(
            np.ascontiguousarray(vals.reshape(len(offsets), P, mloc).transpose(1, 0, 2))
        ),
        remainder=None,
        offsets=offsets,
        shape=(n, n),
        nshards=P,
        mloc=mloc,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PohPartition:
    """Row-partitioned panel one-hot packs (unstructured matrices).

    Per shard, two :class:`~cask_tpu.ops.pallas.poh_kernels.PohMatrix`
    packs stacked over the leading mesh axis: *interior* (columns local
    to the shard — computable before any collective lands) and
    *exterior* (columns indexed into the all-gathered padded-global x).
    Shards with fewer tiles are padded with zero tiles assigned to the
    last row panel (structural-zero discipline: they accumulate 0).
    """

    int_vals: jax.Array  # (P, T_i, S, 128)
    int_cloc: jax.Array
    int_rloc: jax.Array
    int_rloc_t: jax.Array  # (P, T_i, 128, S)
    int_wlo: jax.Array  # (P, T_i)
    int_whi: jax.Array
    int_panel: jax.Array
    int_first: jax.Array
    int_last: jax.Array
    ext_vals: jax.Array  # (P, T_e, S, 128)
    ext_cloc: jax.Array
    ext_rloc: jax.Array
    ext_rloc_t: jax.Array
    ext_wlo: jax.Array
    ext_whi: jax.Array
    ext_panel: jax.Array
    ext_first: jax.Array
    ext_last: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nshards: int = dataclasses.field(metadata=dict(static=True))
    mloc: int = dataclasses.field(metadata=dict(static=True))
    row_panel: int = dataclasses.field(metadata=dict(static=True))
    col_window: int = dataclasses.field(metadata=dict(static=True))

    def device_put(self, device=None) -> "PohPartition":
        return jax.tree.map(lambda x: jax.device_put(x, device), self)


def _stack_poh(plans):
    """Stack same-geometry PohMatrix packs, padding tile counts."""
    import numpy as _np

    ntmax = max(p.ntiles for p in plans)
    npanels = plans[0].n_panels

    def pad(get, fill, dtype=None):
        outs = []
        for p in plans:
            a = _np.asarray(get(p))
            w = ntmax - a.shape[0]
            if w:
                padding = _np.full((w,) + a.shape[1:], fill,
                                   dtype=dtype or a.dtype)
                a = _np.concatenate([a, padding])
            outs.append(a)
        return jax.numpy.asarray(_np.stack(outs))

    return dict(
        vals=pad(lambda p: p.vals, 0),
        cloc=pad(lambda p: p.cloc, 0),
        rloc=pad(lambda p: p.rloc, 0),
        rloc_t=pad(lambda p: p.rloc_t, 0),
        wlo=pad(lambda p: p.wlo, 0),
        whi=pad(lambda p: p.whi, 0),
        panel=pad(lambda p: p.panel, npanels - 1),
        first=pad(lambda p: p.first, 0),
        last=pad(lambda p: p.last, 0),
    )


def partition_poh(a: CSR, nshards: int, *, row_panel: int = 4096,
                  col_window: int = 1024,
                  tile_slots: int = 4096) -> PohPartition:
    """Row-partition an unstructured CSR into per-shard POH packs."""
    from cask_tpu.formats.convert import coo_from_arrays, coo_to_csr
    from cask_tpu.ops.pallas.poh_kernels import poh_plan

    m, n = a.shape
    P = nshards
    mloc = _ceil_div(m, P)
    if n > P * mloc:
        raise ValueError(
            f"partition_poh requires n ({n}) <= nshards*mloc ({P * mloc})")
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    owner_row = rows // mloc
    interior = (indices // mloc) == owner_row

    ints, exts = [], []
    for p in range(P):
        mine = owner_row == p
        mi = mine & interior
        me = mine & ~interior
        int_csr = coo_to_csr(coo_from_arrays(
            data[mi], rows[mi] - p * mloc, indices[mi] - p * mloc,
            (mloc, mloc)), sum_duplicates=False)
        ext_csr = coo_to_csr(coo_from_arrays(
            data[me], rows[me] - p * mloc, indices[me],
            (mloc, P * mloc)), sum_duplicates=False)
        kw = dict(row_panel=row_panel, col_window=col_window,
                  tile_slots=tile_slots)
        ints.append(poh_plan(int_csr, **kw))
        exts.append(poh_plan(ext_csr, **kw))

    si = _stack_poh(ints)
    se = _stack_poh(exts)
    return PohPartition(
        **{f"int_{k}": v for k, v in si.items()},
        **{f"ext_{k}": v for k, v in se.items()},
        shape=(m, n), nshards=P, mloc=mloc,
        row_panel=ints[0].row_panel, col_window=ints[0].col_window,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Coo2DPartition:
    """2-D block partition over a (rows, cols) mesh — SUMMA-style SpMV.

    Device (i, j) of a ``pr × pc`` mesh owns block ``A[i·mr:(i+1)·mr,
    j·mc:(j+1)·mc]`` as local COO.  x is sharded over the *cols* axis
    (each chip holds n/pc entries, vs the full gathered n of the 1-D
    plans), partial products ``A_ij @ x_j`` are summed with a ``psum``
    over the cols axis, and y lands sharded over the rows axis.  This is
    the scaling-book 2-D recipe: per-chip vector memory and collective
    payload shrink with the mesh's second dimension.
    """

    data: jax.Array  # (pr*pc, E)
    row: jax.Array  # (pr*pc, E) block-local row
    col: jax.Array  # (pr*pc, E) block-local col
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    pr: int = dataclasses.field(metadata=dict(static=True))
    pc: int = dataclasses.field(metadata=dict(static=True))
    mr: int = dataclasses.field(metadata=dict(static=True))
    mc: int = dataclasses.field(metadata=dict(static=True))

    def device_put(self, device=None) -> "Coo2DPartition":
        return jax.tree.map(lambda x: jax.device_put(x, device), self)


def partition_2d(a: CSR, pr: int, pc: int) -> Coo2DPartition:
    """Block-partition a CSR over a pr × pc device grid."""
    m, n = a.shape
    mr = _ceil_div(m, pr)
    mc = _ceil_div(n, pc)
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    bi = rows // mr
    bj = indices // mc

    groups_d, groups_r, groups_c = [], [], []
    for i in range(pr):
        for j in range(pc):
            sel = (bi == i) & (bj == j)
            groups_d.append(data[sel])
            groups_r.append(rows[sel] - i * mr)
            groups_c.append(indices[sel] - j * mc)
    E = max((g.shape[0] for g in groups_d), default=0) or 1
    P = pr * pc
    return Coo2DPartition(
        data=jax.numpy.asarray(_pad_rows(groups_d, P, E, 0.0, data.dtype)),
        row=jax.numpy.asarray(_pad_rows(groups_r, P, E)),
        col=jax.numpy.asarray(_pad_rows(groups_c, P, E)),
        shape=(m, n), pr=pr, pc=pc, mr=mr, mc=mc,
    )
