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


def partition_coo(a: CSR, nshards: int, *, mloc: Optional[int] = None) -> CooPartition:
    """Row-partition any CSR into the interior/exterior COO plan.

    ``mloc`` overrides the per-shard row count (callers embedding the
    remainder of a block partition must match the block plan's scalar
    row split)."""
    m, n = a.shape
    P = nshards
    mloc = mloc if mloc is not None else _ceil_div(m, P)
    if mloc * P < m:
        raise ValueError(f"mloc ({mloc}) too small for {m} rows / {P} shards")
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
class BdiaPartition:
    """Block-row-partitioned BDIA pack + ring halo (the flagship
    0.94-roofline block kernel running config 5, VERDICT r2 item 1).

    Shard ``p`` owns block rows ``[p·nbloc, (p+1)·nbloc)`` of the global
    block matrix as a shape-uniform BDIA pack (shared kept offsets, tile
    geometry ``ts``/``T`` across shards; trailing shards zero-padded).
    The halo is ``lo_b``/``hi_b`` *block* offsets of x exchanged with
    ring neighbors (``lo_b·bc`` / ``hi_b·bc`` scalar entries); interior
    compute reads only local x (structural-zero pads), so it has no data
    dependence on the collective — the overlap invariant.

    ``head_vals``/``tail_vals`` are host-extracted edge value windows
    (zeroed where the term is interior) that make the post-halo fixups
    regular component-plane FMAs: for pair ``j = (c, d)``

        head[r, i]  += head_vals[r, j, i] · left_c[i + d + lo_b]   (d < 0)
        tail[r, ih] += tail_vals[r, j, ih] · right_c[ih − (hi_b − d)] (d > 0)

    with ``i`` over the first ``lo_b`` block rows and ``ih`` over the
    last ``hi_b``.  Block diagonals wider than one shard (|d| > nbloc)
    spill to the embedded :class:`CooPartition` remainder (single-hop
    ring discipline, same as :func:`partition_dia`'s ``max_halo``).
    """

    vals: jax.Array  # (P, br, T, npairs, TS, 128)
    head_vals: jax.Array  # (P, br, npairs, max(lo_b, 1))
    tail_vals: jax.Array  # (P, br, npairs, max(hi_b, 1))
    remainder: Optional[CooPartition]
    block_offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    blocksize: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    ts: int = dataclasses.field(metadata=dict(static=True))
    nshards: int = dataclasses.field(metadata=dict(static=True))
    mloc: int = dataclasses.field(metadata=dict(static=True))  # scalar rows/shard
    nbloc: int = dataclasses.field(metadata=dict(static=True))  # block rows/shard

    @property
    def halo_lo_b(self) -> int:
        return -min(min(self.block_offsets), 0)

    @property
    def halo_hi_b(self) -> int:
        return max(max(self.block_offsets), 0)

    @property
    def npairs(self) -> int:
        return int(self.vals.shape[3])

    @property
    def pairs(self) -> Tuple[Tuple[int, int], ...]:
        bc = self.blocksize[1]
        return tuple((c, d) for d in self.block_offsets for c in range(bc))

    def device_put(self, device=None) -> "BdiaPartition":
        return jax.tree.map(lambda x: jax.device_put(x, device), self)


def _bdia_edge_windows(vals: np.ndarray, kept: np.ndarray, bc: int,
                       nbloc: int, ts: int, T: int):
    """Host-extract the (head_vals, tail_vals) fixup windows from a
    packed ``(P, br, T, npairs, TS, 128)`` vals array (zeroed where the
    term is interior — see :class:`BdiaPartition`)."""
    P, br = vals.shape[0], vals.shape[1]
    npairs = vals.shape[3]
    dtype = vals.dtype
    lo_b = int(-min(kept.min(), 0))
    hi_b = int(max(kept.max(), 0))
    offs_per_pair = np.repeat(kept, bc)  # d of pair j
    wl, wh = max(lo_b, 1), max(hi_b, 1)
    t_head = min(_ceil_div(max(lo_b, 1), ts * 128), T)
    head_flat = np.ascontiguousarray(
        vals[:, :, :t_head].transpose(0, 1, 3, 2, 4, 5)
    ).reshape(P, br, npairs, -1)
    head_vals = np.zeros((P, br, npairs, wl), dtype=dtype)
    head_vals[..., :min(lo_b, head_flat.shape[-1])] = \
        head_flat[..., :min(lo_b, head_flat.shape[-1])]
    i_rng = np.arange(wl)
    head_vals *= (i_rng[None, :] < -offs_per_pair[:, None]).astype(dtype)

    t0_tail = max((nbloc - hi_b) // (ts * 128), 0) if hi_b else T - 1
    tail_flat = np.ascontiguousarray(
        vals[:, :, t0_tail:].transpose(0, 1, 3, 2, 4, 5)
    ).reshape(P, br, npairs, -1)
    tail_vals = np.zeros((P, br, npairs, wh), dtype=dtype)
    if hi_b:
        off0 = (nbloc - hi_b) - t0_tail * ts * 128
        tail_vals[:] = tail_flat[..., off0 : off0 + hi_b]
        ih_rng = np.arange(wh)
        tail_vals *= (ih_rng[None, :] >= (hi_b - offs_per_pair)[:, None]
                      ).astype(dtype)
    return head_vals, tail_vals


def partition_bdia(a, nshards: int, blocksize: Optional[Tuple[int, int]] = None,
                   *, min_density: float = 0.10,
                   max_block_diags: int = 64,
                   align_b: int = 1) -> BdiaPartition:
    """Block-row-partition a BSR/CSR matrix into per-shard BDIA packs.

    Square blocks only (x is partitioned like the rows).  Kept block
    diagonals are chosen *globally* (one shape-uniform shard program);
    everything else — sparse block diagonals, blocks beyond the
    single-hop halo — spills to the scalar COO remainder.

    ``align_b``: round the per-shard *block*-row count up to this
    multiple (the BDIA mirror of ``partition_dia(align=8192)``).  The
    fused Pallas interior (``DistSpmv(..., interior='fused')``) accepts
    any shard size, but enters zero-copy — the shard's natural-order x
    reshapes straight into the kernel with no pad pass — only when
    ``nbloc`` is a multiple of its slab span, 128·slab_rows = **16384**
    block rows; pass ``align_b=16384`` on configs-5-scale jobs.

    Shard-size ceiling: the fused/resident interiors keep the shard's x
    component segments resident in VMEM (~``4·bc·nbloc·br`` bytes at
    f32), so shards beyond ~3M scalar rows (dof-4) fail
    ``bdia_fused_ok`` and ``interior='auto'`` falls back to the slow
    XLA interior — size the mesh so ``rows/nshards ≲ 3M``, not the
    other way around.
    """
    from cask_tpu.formats.matrix import BSR
    from cask_tpu.ops.bdia import _pick_ts

    if isinstance(a, CSR):
        if blocksize is None:
            raise ValueError("partition_bdia on CSR needs an explicit blocksize")
        from cask_tpu.formats.convert import csr_to_bsr

        a = csr_to_bsr(a, blocksize)
    assert isinstance(a, BSR)
    br, bc = a.blocksize
    if br != bc:
        raise ValueError("partition_bdia needs square blocks (row partition "
                         "owns x like the rows)")
    m, n = a.shape
    if m != n:
        raise ValueError("partition_bdia requires a square matrix")
    P = nshards
    nbr = a.n_block_rows
    nbloc = _ceil_div(_ceil_div(nbr, P), align_b) * align_b
    if (P - 1) * nbloc >= nbr:
        # align_b rounding left at least one shard 100% padding; the
        # halo/fixup/remainder paths are untested for empty shards
        # (ADVICE r4) — refuse with actionable guidance instead
        raise ValueError(
            f"align_b={align_b} rounds the shard size to {nbloc} block "
            f"rows, but the matrix has only {nbr} block rows across "
            f"{P} shards — shard {P - 1} would hold no real rows. "
            f"Use a smaller align_b or fewer shards "
            f"(need (P-1)*nbloc < nbr).")
    mloc = nbloc * br

    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    ib = np.repeat(np.arange(nbr, dtype=np.int64), np.diff(indptr))
    d = indices - ib

    # global kept-offset choice (same rule as bdia_plan) + halo guard
    uniq, counts = np.unique(d, return_counts=True)
    diag_len = np.minimum(np.minimum(nbr, nbr - uniq), np.minimum(nbr, nbr + uniq))
    density = counts / np.maximum(diag_len, 1)
    keep = (density >= min_density) & (np.abs(uniq) <= nbloc)
    if keep.sum() > max_block_diags:
        keep &= counts >= np.sort(counts[keep])[-max_block_diags]
    kept = uniq[keep]
    if kept.size == 0:
        kept = np.array([0], dtype=np.int64)
    in_dia = np.isin(d, kept)

    lo_b = int(-min(kept.min(), 0))
    hi_b = int(max(kept.max(), 0))
    ts = _pick_ts(nbloc)
    nb_pad = _ceil_div(nbloc, ts * 128) * ts * 128
    T = nb_pad // (ts * 128)
    nd = kept.size
    npairs = nd * bc

    vals = np.zeros((P, br, T, npairs, ts, 128), dtype=data.dtype)
    kb = np.nonzero(in_dia)[0]
    if kb.size:
        i = ib[kb]
        p_idx = i // nbloc
        iloc = i % nbloc
        dpos = np.searchsorted(kept, d[kb])
        t_idx = iloc // (ts * 128)
        rem_i = iloc % (ts * 128)
        s_idx, l_idx = rem_i // 128, rem_i % 128
        c_rng = np.arange(bc)
        vals[
            p_idx[:, None],
            :,
            t_idx[:, None],
            dpos[:, None] * bc + c_rng[None, :],
            s_idx[:, None],
            l_idx[:, None],
        ] = data[kb].transpose(0, 2, 1)

    head_vals, tail_vals = _bdia_edge_windows(vals, kept, bc, nbloc, ts, T)

    # remainder: spilled blocks as scalar COO over the same row split
    rem = None
    rb = np.nonzero(~in_dia)[0]
    if rb.size:
        from cask_tpu.formats.convert import coo_from_arrays, coo_to_csr

        ri, rj = ib[rb], indices[rb]
        rr = (ri[:, None, None] * br + np.arange(br)[None, :, None])
        rc = (rj[:, None, None] * bc + np.arange(bc)[None, None, :])
        rr = np.broadcast_to(rr, (rb.size, br, bc)).ravel()
        rc = np.broadcast_to(rc, (rb.size, br, bc)).ravel()
        rv = data[rb].ravel()
        inside = (rr < m) & (rc < n) & (rv != 0)
        rem_csr = coo_to_csr(coo_from_arrays(rv[inside], rr[inside],
                                             rc[inside], (m, n)))
        rem = partition_coo(rem_csr, P, mloc=mloc)

    return BdiaPartition(
        vals=jax.numpy.asarray(vals),
        head_vals=jax.numpy.asarray(head_vals),
        tail_vals=jax.numpy.asarray(tail_vals),
        remainder=rem,
        block_offsets=tuple(int(o) for o in kept),
        shape=(m, n),
        blocksize=(br, bc),
        ts=ts,
        nshards=P,
        mloc=mloc,
        nbloc=nbloc,
    )


def _fem_formula_val(i, dpos, r, c, dof: int):
    """Deterministic pseudo-values for the formulaic FEM builder —
    cheap, vectorized over block rows ``i``, identical in the direct
    pack and the small-size reference BSR (parity-tested)."""
    h = (i.astype(np.int64) * 1000003 + int(dpos) * 7919
         + int(r) * 211 + int(c) * 37) % 2003
    return h.astype(np.float64) / 2003.0 - 0.5


def _fem_offset_mask(g, off: int, ny: int, nbr: int):
    """Which block rows carry a neighbor at block offset ``off`` in the
    5-point grid (mirrors :func:`stencil_dia_partition`'s edge rules)."""
    in_range = g < nbr
    col = g % ny
    if off == 0:
        return in_range
    if off == 1:
        return in_range & (g + 1 < nbr) & (col != ny - 1)
    if off == -1:
        return in_range & (g >= 1) & (col != 0)
    if off == ny:
        return in_range & (g + ny < nbr)
    return in_range & (g >= ny)


def fem_bdia_partition(nx: int, ny: Optional[int] = None, *, dof: int = 4,
                       nshards: int, dtype=np.float32,
                       align_b: int = 1) -> BdiaPartition:
    """Formulaic BdiaPartition of the dof-block 5-point FEM matrix — no
    CSR/BSR materialization (the BDIA analog of
    :func:`stencil_dia_partition`; config-5 CI and the scaling job need
    a ≥10M-row block plan every round without minutes of numpy).

    Structurally identical to ``partition_bdia(fem_blocks-like BSR,
    nshards)`` with deterministic pseudo-values (parity-tested at small
    sizes in ``tests/distributed/test_bdia_dist.py``); each diagonal
    block gets ``+4·dof`` on its main diagonal so CG-class solves are
    well conditioned.
    """
    from cask_tpu.ops.bdia import _pick_ts

    ny = ny or nx
    nbr = nx * ny
    P = nshards
    # align_b=16384 makes the fused Pallas interior zero-copy (see
    # partition_bdia's contract note)
    nbloc = _ceil_div(_ceil_div(nbr, P), align_b) * align_b
    offsets = tuple(sorted({-ny, -1, 0, 1, ny}))
    kept = np.asarray(offsets, dtype=np.int64)
    if np.abs(kept).max() > nbloc:
        raise ValueError(
            f"grid row length {ny} exceeds the {nbloc}-block shard — "
            "halo would be multi-hop; use partition_bdia for this shape")
    ts = _pick_ts(nbloc)
    T = _ceil_div(nbloc, ts * 128)
    npairs = len(offsets) * dof

    g = np.arange(P * nbloc, dtype=np.int64)
    nb_pad = T * ts * 128  # per-shard padded block rows (tile aligned)
    vflat = np.zeros((dof, npairs, P, nb_pad), dtype=dtype)
    for dpos, off in enumerate(offsets):
        ok = _fem_offset_mask(g, off, ny, nbr)
        for r in range(dof):
            for c in range(dof):
                v = _fem_formula_val(g, dpos, r, c, dof)
                if off == 0 and r == c:
                    v = v + 4.0 * dof
                plane = np.where(ok, v, 0.0).astype(dtype)
                vflat[r, dpos * dof + c, :, :nbloc] = plane.reshape(P, nbloc)
    vals = np.ascontiguousarray(
        vflat.reshape(dof, npairs, P, T, ts, 128).transpose(2, 0, 3, 1, 4, 5))
    head_vals, tail_vals = _bdia_edge_windows(vals, kept, dof, nbloc, ts, T)
    n = nbr * dof
    return BdiaPartition(
        vals=jax.numpy.asarray(vals),
        head_vals=jax.numpy.asarray(head_vals),
        tail_vals=jax.numpy.asarray(tail_vals),
        remainder=None,
        block_offsets=offsets,
        shape=(n, n),
        blocksize=(dof, dof),
        ts=ts,
        nshards=P,
        mloc=nbloc * dof,
        nbloc=nbloc,
    )


def fem_formula_bsr(nx: int, ny: Optional[int] = None, *, dof: int = 4,
                    dtype=np.float64):
    """The same matrix :func:`fem_bdia_partition` encodes, as a host BSR
    (small-size parity reference — build cost O(nnz))."""
    from cask_tpu.formats.convert import coo_from_arrays, coo_to_csr, csr_to_bsr

    ny = ny or nx
    nbr = nx * ny
    offsets = tuple(sorted({-ny, -1, 0, 1, ny}))
    g = np.arange(nbr, dtype=np.int64)
    rows, cols, vals = [], [], []
    for dpos, off in enumerate(offsets):
        ok = _fem_offset_mask(g, off, ny, nbr)
        gi = g[ok]
        for r in range(dof):
            for c in range(dof):
                v = _fem_formula_val(gi, dpos, r, c, dof)
                if off == 0 and r == c:
                    v = v + 4.0 * dof
                rows.append(gi * dof + r)
                cols.append((gi + off) * dof + c)
                vals.append(v.astype(dtype))
    n = nbr * dof
    csr = coo_to_csr(coo_from_arrays(
        np.concatenate(vals), np.concatenate(rows), np.concatenate(cols),
        (n, n)))
    return csr_to_bsr(csr, (dof, dof))


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
