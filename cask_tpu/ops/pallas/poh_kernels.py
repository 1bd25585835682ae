"""Panel one-hot ("POH") SpMV — the gather-free unstructured-matrix kernel.

TPU v5e has no usable deep gather (Mosaic's ``tpu.dynamic_gather`` is
single-vreg-deep, see :mod:`cask_tpu.ops.pallas.lell_kernels`), so this
kernel expresses *both* halves of unstructured SpMV — the x-gather and
the y-scatter — as dense MXU matmuls against one-hot matrices built
on-the-fly from iota compares.  No gather/scatter primitive appears
anywhere; every contraction is a plain NN ``dot_general``.

Layout (host-packed by :func:`poh_plan`):

- rows are grouped into **row panels** of ``R`` rows; within a panel all
  nnz are sorted by column and packed densely into fixed-size tiles of
  ``S × 128`` slots (fill is ~nnz/slots, typically >85% — column sorting
  keeps a tile's column span tiny, so tiles are only cut at window
  boundaries or when full);
- each tile is assigned a ``2C``-wide x *window* (two C-aligned segments
  ``wlo, wlo+1``), DMA'd to VMEM by the Pallas grid machinery via
  scalar-prefetched block indices (cask analog: the BRAM vector cache of
  SURVEY.md §2 R5, but software-windowed);
- column/row ids are stored window/panel-relative; padding slots carry
  value 0 at local coordinate 0 (structural-zero discipline).

Per slot-row ``s`` (one vreg of 128 slots) the kernel computes::

    OLT[l, t] = (clo[t] == l)                 # one-hot, lanes-natural
    G[h, t]   = X_window[h] @ OLT             # MXU: gather all 128 slots
    gathered  = Σ_h (chi[t] == h) · G[h, t]   # pick the right 128-segment
    prod      = vals · gathered
    PH[h, t]  = (rhi[t] == h) · prod          # scatter, same trick
    acc[h, l] += PH @ ORLO                    # ORLO[t, l] = (rlo[t] == l)

``ORLO`` needs the slot index in *sublanes*, so the host stores the
row-lo array pre-transposed — every one-hot is then built in its natural
vreg orientation and every dot is NN (no Mosaic transposes).

Arithmetic cost ≈ 6k MXU MACs + ~500 VPU ops per nnz → compute-bound at
roughly 2–8 Gnnz/s on v5e, vs ~65 Mnnz/s for the XLA gather+segment_sum
path this replaces (PERF.md "Unstructured").

cask analog: SURVEY.md §2 R5 — the dataflow SpMV kernel for matrices
with no exploitable structure; the DSE parameters (pipes, cache size)
map to (tile_slots, col_window, row_panel) here and are tuner-visible.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cask_tpu.formats.matrix import CSR

_LANE = 128


def _interpret() -> bool:
    from cask_tpu.utils.platform import on_tpu

    return not on_tpu()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PohMatrix:
    """Panel one-hot packed sparse matrix (see module docstring)."""

    vals: jax.Array  # (ntiles, S, 128)
    cloc: jax.Array  # (ntiles, S, 128) int32, col - wlo*C  ∈ [0, 2C)
    rloc: jax.Array  # (ntiles, S, 128) int32, row - panel*R ∈ [0, R)
    rloc_t: jax.Array  # (ntiles, 128, S) int32 — rloc transposed per tile
    wlo: jax.Array  # (ntiles,) int32 x-window segment index
    whi: jax.Array  # (ntiles,) int32 min(wlo+1, nseg-1)
    panel: jax.Array  # (ntiles,) int32 row-panel index, non-decreasing
    first: jax.Array  # (ntiles,) int32 1 = first tile of its panel
    last: jax.Array  # (ntiles,) int32 1 = last tile of its panel
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    row_panel: int = dataclasses.field(metadata=dict(static=True))
    col_window: int = dataclasses.field(metadata=dict(static=True))

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def slot_rows(self) -> int:
        return int(self.vals.shape[1])

    @property
    def n_panels(self) -> int:
        return -(-max(self.shape[0], 1) // self.row_panel)

    @property
    def nseg(self) -> int:
        return -(-max(self.shape[1], 1) // self.col_window)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def traffic_bytes(self) -> int:
        """HBM bytes streamed per SpMV application."""
        db = jnp.dtype(self.vals.dtype).itemsize
        slot_bytes = self.vals.size * (db + 12)  # vals + cloc + rloc + rloc_t
        m, n = self.shape
        return int(slot_bytes + (n + m) * 4)

    def fill(self) -> float:
        true_nnz = int(np.count_nonzero(np.asarray(self.vals)))
        return true_nnz / max(self.vals.size, 1)

    def device_put(self, device=None) -> "PohMatrix":
        return jax.tree.map(lambda t: jax.device_put(t, device), self)

    def spmv(self, x, *, precision: str = "split"):
        return poh_spmv_pallas(self, x, precision=precision)

    def spmm(self, x, *, precision: str = "split"):
        k = int(x.shape[1])
        if k <= _POH_SPMM_MAX_K:
            return poh_spmm_pallas(self, x, precision=precision)
        # wide RHS: chunk k (each chunk re-streams the slot arrays, but
        # the kernel is compute-bound so the extra HBM reads are cheap)
        outs = [poh_spmm_pallas(self, x[:, c : c + _POH_SPMM_MAX_K],
                                precision=precision)
                for c in range(0, k, _POH_SPMM_MAX_K)]
        return jnp.concatenate(outs, axis=1)


def poh_plan(a: CSR, *, row_panel: int = 4096, col_window=\
             "auto", tile_slots: int = 2048) -> PohMatrix:
    """Pack a CSR matrix into panel one-hot tiles (host, numpy).

    ``row_panel`` (R): rows per output accumulator window — larger panels
    give denser column packing but a taller scatter one-hot.
    ``col_window`` (C): x window granularity; the effective window is 2C.
    ``"auto"`` sizes C to the expected column span of one tile's
    col-sorted slots (too-small windows force tile cuts and crater fill:
    measured 0.46 → 0.93 on a symmetrized power-law, probe_pohcg2).
    ``tile_slots`` (T): nnz slots per grid step, multiple of 128.
    """
    m, n = a.shape
    if tile_slots % _LANE:
        raise ValueError("tile_slots must be a multiple of 128")
    # Mosaic legality floor: the x-window and accumulator blocks are
    # (C/128, 128) and (R/128, 128) VMEM tiles, and hardware lowering
    # needs >= 8 sublanes per block — so R, C >= 1024 always (interpret
    # mode accepts less and silently diverges from what the chip can
    # run; probe_amg2 hit this via an auto-sized coarse-level plan).
    _MINW = 8 * _LANE
    R = max(-(-row_panel // _LANE) * _LANE, _LANE)
    R = max(min(R, max(-(-m // _LANE) * _LANE, _LANE)), _MINW)
    if col_window == "auto":
        nnz_per_panel = max(a.nnz * R / max(m, 1), 1.0)
        span = tile_slots * max(n, 1) / nnz_per_panel
        col_window = 128
        while col_window < min(span, 8192):
            col_window *= 2
    C = max(-(-int(col_window) // _LANE) * _LANE, _MINW)
    S = tile_slots // _LANE
    T = tile_slots
    nseg = -(-max(n, 1) // C)
    npanels = -(-max(m, 1) // R)

    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    data = np.asarray(a.data)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))

    tiles = []  # (panel, wlo, vals_slots, cloc_slots, rloc_slots)
    for I in range(npanels):
        lo, hi = I * R, min((I + 1) * R, m)
        s, e = int(indptr[lo]), int(indptr[hi])
        cols_p = indices[s:e]
        order = np.argsort(cols_p, kind="stable")
        cols_s = cols_p[order]
        vals_s = data[s:e][order]
        rows_s = rows[s:e][order] - lo
        P = cols_s.shape[0]
        start = 0
        emitted = 0
        while start < P:
            w0 = int(cols_s[start] // C)
            end_w = int(np.searchsorted(cols_s, (w0 + 2) * C, side="left"))
            end = min(start + T, end_w)
            tiles.append((I, w0, vals_s[start:end],
                          (cols_s[start:end] - w0 * C).astype(np.int32),
                          rows_s[start:end].astype(np.int32)))
            start = end
            emitted += 1
        if emitted == 0:  # empty panel still needs its output block written
            tiles.append((I, 0, data[:0],
                          np.zeros(0, np.int32), np.zeros(0, np.int32)))

    ntiles = len(tiles)
    vals = np.zeros((ntiles, S, _LANE), dtype=data.dtype)
    cloc = np.zeros((ntiles, S, _LANE), dtype=np.int32)
    rloc = np.zeros((ntiles, S, _LANE), dtype=np.int32)
    wlo = np.zeros(ntiles, np.int32)
    panel = np.zeros(ntiles, np.int32)
    for t, (I, w0, v, c, r) in enumerate(tiles):
        k = v.shape[0]
        vals[t].reshape(-1)[:k] = v
        cloc[t].reshape(-1)[:k] = c
        rloc[t].reshape(-1)[:k] = r
        wlo[t] = w0
        panel[t] = I
    rloc_t = np.ascontiguousarray(rloc.transpose(0, 2, 1))
    first = np.ones(ntiles, np.int32)
    first[1:] = (panel[1:] != panel[:-1]).astype(np.int32)
    last = np.ones(ntiles, np.int32)
    last[:-1] = (panel[1:] != panel[:-1]).astype(np.int32)

    return PohMatrix(
        vals=jnp.asarray(vals), cloc=jnp.asarray(cloc),
        rloc=jnp.asarray(rloc), rloc_t=jnp.asarray(rloc_t),
        wlo=jnp.asarray(wlo),
        whi=jnp.asarray(np.minimum(wlo + 1, nseg - 1).astype(np.int32)),
        panel=jnp.asarray(panel),
        first=jnp.asarray(first), last=jnp.asarray(last),
        shape=(m, n), row_panel=R, col_window=C,
    )


def poh_to_coo(p: PohMatrix):
    """Host-side scalar triples recovered from a pack (zero slots are
    structural padding and drop out)."""
    from cask_tpu.formats.matrix import COO

    v = np.asarray(p.vals).reshape(p.ntiles, -1)
    r = np.asarray(p.rloc).reshape(p.ntiles, -1)
    c = np.asarray(p.cloc).reshape(p.ntiles, -1)
    ti, si = np.nonzero(v)
    rows = np.asarray(p.panel, dtype=np.int64)[ti] * p.row_panel + r[ti, si]
    cols = np.asarray(p.wlo, dtype=np.int64)[ti] * p.col_window + c[ti, si]
    return COO(data=v[ti, si], row=rows.astype(np.int32),
               col=cols.astype(np.int32), shape=p.shape)


def poh_transpose_plan(p: PohMatrix, **plan_kw) -> PohMatrix:
    """Pack for ``Aᵀ``: a host-side one-time repack (the one-hot slot
    layout has no cheap in-place transpose).  Build once and reuse;
    per-op transposition would pay the full pack each call."""
    from cask_tpu.formats.convert import coo_to_csr
    from cask_tpu.formats.matrix import COO

    coo = poh_to_coo(p)
    coo_t = COO(data=coo.data, row=coo.col, col=coo.row,
                shape=(p.shape[1], p.shape[0]))
    plan_kw.setdefault("tile_slots", p.slot_rows * _LANE)
    return poh_plan(coo_to_csr(coo_t), **plan_kw)


def poh_synth_device(*, row_panel: int = 4096, col_window: int = 1024,
                     tile_slots: int = 2048, n_panels: int = 25,
                     tiles_per_panel: int = 60, dtype=jnp.float32,
                     seed: int = 0) -> PohMatrix:
    """Synthetic pre-packed POH matrix built ON DEVICE (jnp only).

    For hardware perf probes: host↔device transfers through the axon
    relay cost seconds/MB (SURVEY.md §8.2), so bench operands must be
    generated device-side.  Slot coordinates are uniform random — the
    kernel's work is data-independent, so timing matches a real pack of
    the same tile count.  Values are scaled so chained application is a
    contraction (stable under ``measure_chained``).
    """
    R, C, S = row_panel, col_window, tile_slots // _LANE
    m = n_panels * R
    nseg = m // C
    ntiles = n_panels * tiles_per_panel
    avg_per_row = ntiles * tile_slots / m
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 4)
    vals = jax.random.normal(k0, (ntiles, S, _LANE), dtype) * jnp.asarray(
        0.9 / np.sqrt(avg_per_row), dtype)
    cloc = jax.random.randint(k1, (ntiles, S, _LANE), 0, 2 * C, jnp.int32)
    rloc = jax.random.randint(k2, (ntiles, S, _LANE), 0, R, jnp.int32)
    wlo = jax.random.randint(k3, (ntiles,), 0, max(nseg - 1, 1), jnp.int32)
    panel = np.repeat(np.arange(n_panels, dtype=np.int32), tiles_per_panel)
    first = np.zeros(ntiles, np.int32)
    first[::tiles_per_panel] = 1
    last = np.zeros(ntiles, np.int32)
    last[tiles_per_panel - 1 :: tiles_per_panel] = 1
    return PohMatrix(
        vals=vals, cloc=cloc, rloc=rloc,
        rloc_t=jnp.transpose(rloc, (0, 2, 1)),
        wlo=wlo, whi=jnp.minimum(wlo + 1, nseg - 1),
        panel=jnp.asarray(panel), first=jnp.asarray(first),
        last=jnp.asarray(last),
        shape=(m, m), row_panel=R, col_window=C,
    )


def _split_bf16(v):
    """Split an f32 array into (hi, lo) bf16 parts with hi+lo ≈ v to
    ~2⁻¹⁷ relative — so a one-hot (exactly representable in bf16) matmul
    against both parts reproduces near-f32 selection on the native
    single-pass MXU pipeline."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _poh_kernel(S, C, nhy, cdt, pdt, mode,
                wlo_ref, whi_ref, rp_ref, first_ref, last_ref,
                xlo_ref, xhi_ref, v_ref, cloc_ref, rloc_ref, rlot_ref,
                o_ref, acc_ref):
    t = pl.program_id(0)
    nhx = C // _LANE
    odt = jnp.bfloat16 if mode == "split" else cdt  # one-hot dtype
    prec = lax.Precision.HIGHEST if mode == "highest" else None

    def nn_dot(lhs, rhs):
        if mode == "split":
            h, l = _split_bf16(lhs)
            return (lax.dot_general(h, rhs, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pdt)
                    + lax.dot_general(l, rhs, (((1,), (0,)), ((), ())),
                                      preferred_element_type=pdt))
        return lax.dot_general(lhs.astype(cdt), rhs, (((1,), (0,)), ((), ())),
                               preferred_element_type=pdt, precision=prec)

    @pl.when(first_ref[t] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # one (2C/128, 128) window: a single gather dot + a single pick per s
    xw = jnp.concatenate([xlo_ref[...], xhi_ref[...]], axis=0).astype(pdt)
    if mode == "split":  # loop-invariant hi/lo split of the x window
        xw_h, xw_l = _split_bf16(xw)

        def gather_dot(olt):
            return (lax.dot_general(xw_h, olt, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pdt)
                    + lax.dot_general(xw_l, olt, (((1,), (0,)), ((), ())),
                                      preferred_element_type=pdt))
    else:
        def gather_dot(olt):
            return lax.dot_general(xw.astype(cdt), olt, (((1,), (0,)), ((), ())),
                                   preferred_element_type=pdt, precision=prec)
    V = v_ref[0]
    CLOC = cloc_ref[0]
    RLOC = rloc_ref[0]
    RLOT = rlot_ref[0]  # (128, S)

    iota_ll = lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    iota_hx = lax.broadcasted_iota(jnp.int32, (2 * nhx, _LANE), 0)
    iota_hy = lax.broadcasted_iota(jnp.int32, (nhy, _LANE), 0)
    iota_tl = lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)

    # NOTE: chunking slot-rows into wide concatenated dots (one N=512
    # gather dot + one K=512 scatter dot per 4 rows) was measured SLOWER
    # (probe_poh5: 844 → 1141 µs split) — the one-hot concat copies cost
    # more than the extra dot issues save.  Keep the per-row small dots.
    local = jnp.zeros((nhy, _LANE), pdt)
    for s in range(S):
        clo = jnp.broadcast_to(CLOC[s : s + 1] & (_LANE - 1), (_LANE, _LANE))
        olt = (iota_ll == clo).astype(odt)  # OLT[l, t]
        # gather all 128 slots from the 2C window in one NN matmul
        g = gather_dot(olt)  # (2C/128, 128)
        chi = jnp.broadcast_to(CLOC[s : s + 1] >> 7, (2 * nhx, _LANE))
        pick = jnp.where(iota_hx == chi, g, 0.0)
        gathered = jnp.sum(pick, axis=0, keepdims=True)  # (1, 128)
        prod = V[s : s + 1].astype(pdt) * gathered

        rhi = jnp.broadcast_to(RLOC[s : s + 1] >> 7, (nhy, _LANE))
        ph = jnp.where(iota_hy == rhi, jnp.broadcast_to(prod, (nhy, _LANE)),
                       jnp.zeros((), pdt))
        rlo_t = jnp.broadcast_to(RLOT[:, s : s + 1] & (_LANE - 1),
                                 (_LANE, _LANE))
        orlo = (rlo_t == iota_tl).astype(odt)  # ORLO[t, l]
        local = local + nn_dot(ph, orlo)

    acc_ref[...] += local

    @pl.when(last_ref[t] == 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def poh_spmv_pallas(a: PohMatrix, x, *, precision: str = "split"):
    """``y = A @ x`` on the panel one-hot pack.

    ``precision`` (f32 data only; bf16 is always single-pass):
    - ``"split"`` (default): x and the products are split into hi/lo
      bf16 pairs and the (exactly-bf16) one-hots multiply both — two
      native-pipeline MXU passes per dot, ~2e-6 relative error
      (measured on v5e, PERF.md);
    - ``"fast"``: single pass, ~2e-3 error from bf16 input rounding;
    - ``"highest"``: XLA's f32-on-MXU multi-pass (both operands split —
      slower than "split" for no extra accuracy here).
    """
    if precision not in ("split", "fast", "highest"):
        raise ValueError(f"unknown precision {precision!r}")
    m, n = a.shape
    R, C = a.row_panel, a.col_window
    S = a.slot_rows
    nhy = R // _LANE
    nseg = a.nseg
    ntiles = a.ntiles
    cdt = jnp.promote_types(a.vals.dtype, x.dtype)
    if jnp.dtype(cdt) == jnp.dtype(jnp.float64):
        cdt = jnp.dtype(jnp.float64) if _interpret() else jnp.dtype(jnp.float32)
    out_dt = jnp.promote_types(cdt, jnp.float32)

    xp = jnp.zeros((nseg * C,), x.dtype).at[:n].set(x)
    x2 = xp.reshape(nseg * (C // _LANE), _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((C // _LANE, _LANE),
                         lambda t, wlo, whi, rp, fi, la: (wlo[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C // _LANE, _LANE),
                         lambda t, wlo, whi, rp, fi, la: (whi[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, _LANE),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, _LANE),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, _LANE),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE, S),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nhy, _LANE),
                               lambda t, wlo, whi, rp, fi, la: (rp[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nhy, _LANE), out_dt)],
    )
    if jnp.dtype(cdt) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)):
        mode = "fast"  # inputs already half-width: single pass is exact-in-kind
    elif jnp.dtype(cdt) == jnp.dtype(jnp.float64):
        mode = "highest"  # interpret-mode / CPU path: plain f64 dots
    else:
        mode = precision
    kernel = functools.partial(_poh_kernel, S, C, nhy, cdt, out_dt, mode)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a.n_panels * nhy, _LANE), out_dt),
        interpret=_interpret(),
    )(a.wlo, a.whi, a.panel, a.first, a.last,
      x2, x2, a.vals, a.cloc, a.rloc, a.rloc_t)
    return out.reshape(-1)[:m]


# ---------------------------------------------------------------------------
# SpMM on the same pack: one-hots amortize over the k dense columns
# ---------------------------------------------------------------------------


def _poh_spmm_kernel(S, C, nhy, k, cdt, pdt, mode,
                     wlo_ref, whi_ref, rp_ref, first_ref, last_ref,
                     xlo_ref, xhi_ref, v_ref, cloc_ref, rloc_ref, rlot_ref,
                     o_ref, acc_ref):
    t = pl.program_id(0)
    nhx = C // _LANE
    odt = jnp.bfloat16 if mode == "split" else cdt
    prec = lax.Precision.HIGHEST if mode == "highest" else None

    def nn_dot(lhs, rhs):
        if mode == "split":
            h, l = _split_bf16(lhs)
            return (lax.dot_general(h, rhs, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pdt)
                    + lax.dot_general(l, rhs, (((1,), (0,)), ((), ())),
                                      preferred_element_type=pdt))
        return lax.dot_general(lhs.astype(cdt), rhs, (((1,), (0,)), ((), ())),
                               preferred_element_type=pdt, precision=prec)

    @pl.when(first_ref[t] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # (k, 2C/128, 128) window, flattened to one (k·2nhx, 128) dot operand
    xw = jnp.concatenate([xlo_ref[...], xhi_ref[...]], axis=1).astype(pdt)
    xw2 = xw.reshape(k * 2 * nhx, _LANE)
    if mode == "split":
        xw_h, xw_l = _split_bf16(xw2)

        def gather_dot(olt):
            return (lax.dot_general(xw_h, olt, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pdt)
                    + lax.dot_general(xw_l, olt, (((1,), (0,)), ((), ())),
                                      preferred_element_type=pdt))
    else:
        def gather_dot(olt):
            return lax.dot_general(xw2.astype(cdt), olt, (((1,), (0,)), ((), ())),
                                   preferred_element_type=pdt, precision=prec)

    V = v_ref[0]
    CLOC = cloc_ref[0]
    RLOC = rloc_ref[0]
    RLOT = rlot_ref[0]

    iota_ll = lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    iota_hx3 = lax.broadcasted_iota(jnp.int32, (k, 2 * nhx, _LANE), 1)
    iota_hy3 = lax.broadcasted_iota(jnp.int32, (k, nhy, _LANE), 1)
    iota_tl = lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)

    local = jnp.zeros((k * nhy, _LANE), pdt)
    for s in range(S):
        clo = jnp.broadcast_to(CLOC[s : s + 1] & (_LANE - 1), (_LANE, _LANE))
        olt = (iota_ll == clo).astype(odt)
        g = gather_dot(olt).reshape(k, 2 * nhx, _LANE)
        chi = jnp.broadcast_to(CLOC[s : s + 1] >> 7, (k, 2 * nhx, _LANE))
        gathered = jnp.sum(jnp.where(iota_hx3 == chi, g, 0.0), axis=1)  # (k,128)
        prod = V[s : s + 1].astype(pdt) * gathered

        rhi = jnp.broadcast_to(RLOC[s : s + 1] >> 7, (k, nhy, _LANE))
        ph = jnp.where(iota_hy3 == rhi, prod[:, None, :],
                       jnp.zeros((), pdt)).reshape(k * nhy, _LANE)
        rlo_t = jnp.broadcast_to(RLOT[:, s : s + 1] & (_LANE - 1),
                                 (_LANE, _LANE))
        orlo = (rlo_t == iota_tl).astype(odt)
        local = local + nn_dot(ph, orlo)

    acc_ref[...] += local

    @pl.when(last_ref[t] == 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


_POH_SPMM_MAX_K = 64


def poh_spmm_pallas(a: PohMatrix, x, *, precision: str = "split"):
    """``Y = A @ X`` on the panel one-hot pack, k ≤ 64 dense columns.

    Same gather/scatter-as-matmul trick as :func:`poh_spmv_pallas`; the
    one-hot builds amortize over all k columns and the dots gain a k×
    taller M dimension, so per-(nnz·k) cost drops well below the SpMV
    kernel's.  X is windowed as (k, 2C) tiles via the same
    scalar-prefetched indices.
    """
    if precision not in ("split", "fast", "highest"):
        raise ValueError(f"unknown precision {precision!r}")
    m, n = a.shape
    k = int(x.shape[1])
    if k > _POH_SPMM_MAX_K:
        raise ValueError(f"poh spmm supports k ≤ {_POH_SPMM_MAX_K}, got {k}")
    R, C = a.row_panel, a.col_window
    S = a.slot_rows
    nhy = R // _LANE
    nseg = a.nseg
    ntiles = a.ntiles
    cdt = jnp.promote_types(a.vals.dtype, x.dtype)
    if jnp.dtype(cdt) == jnp.dtype(jnp.float64):
        cdt = jnp.dtype(jnp.float64) if _interpret() else jnp.dtype(jnp.float32)
    out_dt = jnp.promote_types(cdt, jnp.float32)
    if jnp.dtype(cdt) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)):
        mode = "fast"
    elif jnp.dtype(cdt) == jnp.dtype(jnp.float64):
        mode = "highest"
    else:
        mode = precision

    # X → (k, nseg·C/128, 128): xk[c, h, l] = X[h·128 + l, c]
    xp = jnp.zeros((nseg * C, k), x.dtype).at[:n].set(x)
    xk = xp.reshape(nseg * (C // _LANE), _LANE, k).transpose(2, 0, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((k, C // _LANE, _LANE),
                         lambda t, wlo, whi, rp, fi, la: (0, wlo[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C // _LANE, _LANE),
                         lambda t, wlo, whi, rp, fi, la: (0, whi[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, _LANE),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, _LANE),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, _LANE),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE, S),
                         lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * nhy, _LANE),
                               lambda t, wlo, whi, rp, fi, la: (rp[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k * nhy, _LANE), out_dt)],
    )
    kernel = functools.partial(_poh_spmm_kernel, S, C, nhy, k, cdt, out_dt, mode)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a.n_panels * k * nhy, _LANE), out_dt),
        interpret=_interpret(),
    )(a.wlo, a.whi, a.panel, a.first, a.last,
      xk, xk, a.vals, a.cloc, a.rloc, a.rloc_t)
    y = out.reshape(a.n_panels, k, nhy * _LANE).transpose(0, 2, 1)
    return y.reshape(-1, k)[:m]
