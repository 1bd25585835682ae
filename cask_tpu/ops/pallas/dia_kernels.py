"""Pallas TPU kernels for diagonal-packed (DIA) SpMV / SpMM.

Design (see :mod:`cask_tpu.ops.dia` for the format): the value array is
the dominant HBM traffic and streams tile-by-tile through the Pallas
pipeline (cask's nnz-stream analog); x sits on-chip (cask's BRAM vector
cache).  All shift amounts come from the static ``offsets`` tuple, so
diagonal loops fully unroll at trace time.  Grid: row tiles of
64×128 = 8192 elements (matching the pack-time padding — no partial
blocks exist).

Kernel family (each measured on hardware, see PERF.md):

- ``dia_spmv_pallas[_padded]`` — row-major (rows, 128) x; each diagonal
  shift is a sublane slice + a lane roll/select pair.  Variants:
  VMEM-resident x, or double-buffered HBM windows for large x.
- ``dia_spmv_pallas_layout`` — same math in a self-padding layout whose
  output chains directly as the next input (zero-copy solver loops).
- ``dia_spmv_pallas_interleaved`` — lanes hold contiguous vector
  segments, so every shift is a *pure sublane slice*; rare pl.when-gated
  lane-carry corrections at segment boundaries.  Removes the roll/select
  VPU work that bounds the row-major kernels (~40 µs floor at 1M rows).
- ``dia_spmm_pallas[_padded]`` — X (n, k) dense: shifts are row slices;
  resident or double-buffered windowed X with span-amortizing tiles.

SpMV edge discipline everywhere: padded/out-of-range positions carry
structural zero *values*, so no runtime masks exist in the main loops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cask_tpu.ops import dia as _dia

_LANE = 128
_SUBL = 64  # sublane rows per value tile -> tile = (_SUBL, _LANE) elements
_TM = _SUBL * _LANE  # rows of y per grid step

# VMEM budget for the resident x copy (v5e has ~16 MB more or less; leave
# room for the streamed value tiles and the output tile).
_X_VMEM_BUDGET = 8 * 1024 * 1024
_MAX_UNROLL_DIAGS = 80


def _interpret() -> bool:
    from cask_tpu.utils.platform import on_tpu

    return not on_tpu()


def pallas_ok(a: "_dia.DiaMatrix", k: Optional[int]) -> bool:
    """Can the Pallas path handle this plan (vs. the XLA formulation)?"""
    if a.ndiags > _MAX_UNROLL_DIAGS:
        return False
    if a.m_pad % _TM:
        return False
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    db = jnp.dtype(a.vals.dtype).itemsize
    if k is None:
        # resident x, or the windowed variant (x stays in HBM; only a
        # (tile + span) window lives in VMEM per grid step)
        wrows = _SUBL + (lo + hi) // _LANE + 2
        return 2 * wrows * _LANE * db <= _X_VMEM_BUDGET
    else:
        kp = -(-max(k, _LANE) // _LANE) * _LANE
        # windowed variant viable if even the smallest tile fits
        span = lo + hi
        window_bytes = (2 * (_SUBL + span) + 3 * _SUBL) * kp * db
        return k <= 512 and window_bytes <= _X_VMEM_BUDGET


def _roll_lanes(x, s: int, interpret: bool):
    """roll left by s lanes (static s) — np.roll(x, -s, axis=last).

    ``pltpu.roll`` requires a positive axis index and non-negative shift;
    it matches np.roll semantics (verified in interpret mode, which runs
    the same primitive so CPU tests cover the TPU path)."""
    if s == 0:
        return x
    return pltpu.roll(x, (_LANE - s) % _LANE, axis=x.ndim - 1)


def _shifted_window(x_ref, row0, s: int, tm: int, interpret: bool):
    """Read tm×128 elements of the flattened x starting at flat offset
    ``row0*128 + s`` from a (rows, 128) VMEM ref, s < 128 static.

    One roll serves both halves of the select: rows are independent under
    a lane roll, so R = roll(window) gives row r's left part at R[r] and
    its wrap-in from the next row at R[r+1]."""
    if s == 0:
        return x_ref[pl.ds(row0, tm), :]
    xw = x_ref[pl.ds(row0, tm + 1), :]
    rolled = _roll_lanes(xw, s, interpret)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tm, _LANE), 1)
    return jnp.where(lane < _LANE - s, rolled[:tm, :], rolled[1 : tm + 1, :])


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------


def _spmv_kernel(offsets, lo, interpret, x_ref, v_ref, o_ref):
    # v_ref block: (D, 1, _SUBL, _LANE) — one row tile of every diagonal
    t = pl.program_id(0)
    acc = jnp.zeros((_SUBL, _LANE), dtype=o_ref.dtype)
    for d, off in enumerate(offsets):
        start = off + lo  # static, >= 0
        q, s = divmod(start, _LANE)
        row0 = t * _SUBL + q
        sh = _shifted_window(x_ref, row0, s, _SUBL, interpret)
        acc = acc + v_ref[d, 0] * sh
    o_ref[...] = acc


def _spmv_window_kernel(offsets, lo, hi, interpret, x_hbm, v_ref, o_ref, xw_ref, sems):
    # x window DMA'd from HBM, double-buffered: tile t+1's window is in
    # flight while tile t computes (scratch persists across grid steps).
    t = pl.program_id(0)
    T = pl.num_programs(0)
    wrows = _SUBL + (lo + hi) // _LANE + 2

    def dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * _SUBL, wrows), :], xw_ref.at[slot], sems.at[slot]
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < T)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    cur = t % 2
    acc = jnp.zeros((_SUBL, _LANE), dtype=o_ref.dtype)
    for d, off in enumerate(offsets):
        q, s = divmod(off + lo, _LANE)
        sh = _shifted_window(xw_ref.at[cur], q, s, _SUBL, interpret)
        acc = acc + v_ref[d, 0] * sh
    o_ref[...] = acc


def spmv_pad_rows(a: "_dia.DiaMatrix") -> int:
    """Rows of the (rows, 128) padded-x layout for `dia_spmv_pallas_padded`."""
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    return a.m_pad // _LANE + (lo + hi) // _LANE + 2


def pad_x_spmv(a: "_dia.DiaMatrix", x):
    """Build the padded 2-D x layout once (amortize across many SpMVs —
    the wrapper pad/copy otherwise costs ~40% of a roofline SpMV)."""
    lo = -min(min(a.offsets), 0)
    n = a.shape[1]
    xrows = spmv_pad_rows(a)
    xp = jnp.zeros((xrows * _LANE,), x.dtype).at[lo : lo + n].set(x)
    return xp.reshape(xrows, _LANE)


def dia_spmv_pallas(a: "_dia.DiaMatrix", x):
    m = a.shape[0]
    out = dia_spmv_pallas_padded(a, pad_x_spmv(a, x))
    return out.reshape(-1)[:m]


def dia_spmv_pallas_padded(a: "_dia.DiaMatrix", x2):
    """SpMV on the pre-padded (rows, 128) x layout; returns (m_pad/128, 128)."""
    D = a.ndiags
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    T = a.m_pad // _TM
    db = jnp.dtype(x2.dtype).itemsize
    x = x2  # for dtype promotion below
    v3 = a.vals.reshape(D, T, _SUBL, _LANE)

    # accumulate at ≥f32 even for bf16 value streams
    out_dtype = jnp.promote_types(jnp.promote_types(a.vals.dtype, x.dtype), jnp.float32) \
        if a.vals.dtype == jnp.bfloat16 or x.dtype == jnp.bfloat16 \
        else jnp.promote_types(a.vals.dtype, x.dtype)
    common = dict(
        grid=(T,),
        out_specs=pl.BlockSpec((_SUBL, _LANE), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * _SUBL, _LANE), out_dtype),
        interpret=_interpret(),
    )
    v_spec = pl.BlockSpec((D, 1, _SUBL, _LANE), lambda t: (0, t, 0, 0),
                          memory_space=pltpu.VMEM)
    resident = x2.size * db <= _X_VMEM_BUDGET
    if resident:
        kernel = functools.partial(_spmv_kernel, a.offsets, lo, _interpret())
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), v_spec],
            **common,
        )(x2, v3)
    else:
        wrows = _SUBL + (lo + hi) // _LANE + 2
        kernel = functools.partial(_spmv_window_kernel, a.offsets, lo, hi, _interpret())
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), v_spec],
            scratch_shapes=[
                pltpu.VMEM((2, wrows, _LANE), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            **common,
        )(x2, v3)
    return out


# ---------------------------------------------------------------------------
# Solver-resident layout: input and output share one padded flat layout
# [ lo_pad zeros | vector | hi_pad zeros ] with lo_pad/hi_pad multiples of
# the 8192-element row tile, so y from one SpMV feeds the next SpMV (or
# any CG axpy) with no re-padding copy — the whole Krylov iteration stays
# in this layout (cask lesson §3.3: never pay a boundary per iteration).
# ---------------------------------------------------------------------------


def _layout_pads(a: "_dia.DiaMatrix"):
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    lo_pad = -(-max(lo, 1) // _TM) * _TM
    hi_pad = -(-max(hi + _LANE, 1) // _TM) * _TM
    return lo_pad, hi_pad


def layout_rows(a: "_dia.DiaMatrix") -> int:
    lo_pad, hi_pad = _layout_pads(a)
    return (lo_pad + a.m_pad + hi_pad) // _LANE


def to_layout(a: "_dia.DiaMatrix", v):
    """Embed an (n,) vector into the solver layout (rows, 128)."""
    lo_pad, hi_pad = _layout_pads(a)
    n = a.shape[1]
    L = lo_pad + a.m_pad + hi_pad
    out = jnp.zeros((L,), v.dtype).at[lo_pad : lo_pad + n].set(v)
    return out.reshape(L // _LANE, _LANE)


def from_layout(a: "_dia.DiaMatrix", v2):
    lo_pad, _ = _layout_pads(a)
    return v2.reshape(-1)[lo_pad : lo_pad + a.shape[0]]


def _spmv_layout_kernel(offsets, lo_pad, pad_tiles, T, tiled, interpret,
                        x_ref, v_ref, o_ref):
    tt = pl.program_id(0)
    in_body = (tt >= pad_tiles) & (tt < pad_tiles + T)

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(in_body)
    def _():
        acc = jnp.zeros((_SUBL, _LANE), dtype=o_ref.dtype)
        for d, off in enumerate(offsets):
            q, s = divmod(off, _LANE)  # floor division: q may be negative
            sh = _shifted_window(x_ref, tt * _SUBL + q, s, _SUBL, interpret)
            v = v_ref[0, d] if tiled else v_ref[d, 0]
            acc = acc + v * sh
        o_ref[...] = acc


def _spmv_layout_window_kernel(offsets, pad_tiles, T, total_rows, tiled, interpret,
                               x_hbm, v_ref, o_ref, xw_ref, sems):
    # layout kernel with x in HBM: per-tile window double-buffered, so
    # the x stream overlaps compute instead of one serial whole-array
    # VMEM copy per call.
    tt = pl.program_id(0)
    TT = pl.num_programs(0)
    q_min = min(off // _LANE for off in offsets)
    q_max = max(off // _LANE for off in offsets)
    wrows = _SUBL + (q_max - q_min) + 1

    def start_of(step):
        s0 = step * _SUBL + q_min
        return jnp.clip(s0, 0, total_rows - wrows)

    def dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_of(step), wrows), :], xw_ref.at[slot], sems.at[slot]
        )

    @pl.when(tt == 0)
    def _():
        dma(0, 0).start()

    @pl.when(tt + 1 < TT)
    def _():
        dma((tt + 1) % 2, tt + 1).start()

    dma(tt % 2, tt).wait()
    cur = tt % 2
    in_body = (tt >= pad_tiles) & (tt < pad_tiles + T)

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(in_body)
    def _():
        # body tiles never hit the clamp: start == tt*_SUBL + q_min
        acc = jnp.zeros((_SUBL, _LANE), dtype=o_ref.dtype)
        for d, off in enumerate(offsets):
            q, s = divmod(off, _LANE)
            sh = _shifted_window(xw_ref.at[cur], q - q_min, s, _SUBL, interpret)
            v = v_ref[0, d] if tiled else v_ref[d, 0]
            acc = acc + v * sh
        o_ref[...] = acc


def pack_vals_tiled(a: "_dia.DiaMatrix"):
    """One-time repack of the diagonal values to (T, D, 64, 128): every
    grid step's whole value block is contiguous in HBM — one large DMA
    burst per tile instead of D strided slices (D separate streams at
    m_pad·4-byte stride measurably underuse the DMA engine)."""
    D = a.ndiags
    T = a.m_pad // _TM
    return jnp.transpose(a.vals.reshape(D, T, _SUBL, _LANE), (1, 0, 2, 3))


def dia_spmv_pallas_layout(a: "_dia.DiaMatrix", x2, *, variant: str = "auto",
                           v_tiled=None):
    """SpMV in the solver layout: x2 and the result share shape/layout.

    ``variant``: 'windowed' streams x from HBM with double-buffered
    per-tile windows (overlaps the x fetch with compute — measured
    faster when the diagonal span is narrow); 'resident' copies x to
    VMEM up front; 'auto' picks windowed for narrow spans.
    """
    D = a.ndiags
    lo_pad, hi_pad = _layout_pads(a)
    T = a.m_pad // _TM
    pad_tiles = lo_pad // _TM
    total_tiles = (lo_pad + a.m_pad + hi_pad) // _TM
    db = jnp.dtype(x2.dtype).itemsize

    q_min = min(off // _LANE for off in a.offsets)
    q_max = max(off // _LANE for off in a.offsets)
    wrows = _SUBL + (q_max - q_min) + 1
    if variant == "auto":
        # windowed re-reads x by wrows/_SUBL; prefer it while that factor
        # stays small or x simply cannot fit VMEM
        if wrows <= 2 * _SUBL or x2.size * db > _X_VMEM_BUDGET:
            variant = "windowed"
        else:
            variant = "resident"
    if variant == "resident" and x2.size * db > _X_VMEM_BUDGET:
        raise ValueError("resident layout variant needs x to fit VMEM")

    # value tiles must be fetched for body tiles only; map pad tiles to
    # tile 0 (their values are never read)
    tiled = v_tiled is not None
    v3 = v_tiled if tiled else a.vals.reshape(D, T, _SUBL, _LANE)
    out_dtype = jnp.promote_types(jnp.promote_types(a.vals.dtype, x2.dtype), jnp.float32) \
        if jnp.bfloat16 in (a.vals.dtype, x2.dtype) \
        else jnp.promote_types(a.vals.dtype, x2.dtype)

    if tiled:
        def v_index(tt):
            t = jnp.clip(tt - pad_tiles, 0, T - 1)
            return (t, 0, 0, 0)
    else:
        def v_index(tt):
            t = jnp.clip(tt - pad_tiles, 0, T - 1)
            return (0, t, 0, 0)

    common = dict(
        grid=(total_tiles,),
        out_specs=pl.BlockSpec((_SUBL, _LANE), lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_tiles * _SUBL, _LANE), out_dtype),
        interpret=_interpret(),
    )
    v_block = (1, D, _SUBL, _LANE) if tiled else (D, 1, _SUBL, _LANE)
    v_spec = pl.BlockSpec(v_block, v_index, memory_space=pltpu.VMEM)
    if variant == "resident":
        kernel = functools.partial(
            _spmv_layout_kernel, a.offsets, lo_pad, pad_tiles, T, tiled, _interpret()
        )
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), v_spec],
            **common,
        )(x2, v3)
    else:
        kernel = functools.partial(
            _spmv_layout_window_kernel, a.offsets, pad_tiles, T,
            int(x2.shape[0]), tiled, _interpret(),
        )
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), v_spec],
            scratch_shapes=[
                pltpu.VMEM((2, wrows, _LANE), x2.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            **common,
        )(x2, v3)
    return out


# ---------------------------------------------------------------------------
# Interleaved layout: lane l holds the contiguous vector segment
# x[l·C : (l+1)·C] down its column, so a diagonal shift by ANY offset is a
# plain sublane (row) slice — no lane rolls in the hot loop at all.  The
# only lane work is a *carry correction* where a shift crosses a segment
# boundary, which touches ceil(|off|/64) of the C/64 tiles per diagonal
# (≈12% for off=1024, one tile for off=±1) and is gated with pl.when.
# Structural zeros again absorb the vector's global edges (vals are zero
# wherever i+off falls outside the matrix).  x must be VMEM-resident.
# ---------------------------------------------------------------------------


def _il_geometry(a: "_dia.DiaMatrix"):
    C = a.m_pad // _LANE  # rows per lane segment
    max_neg = max((-off for off in a.offsets if off < 0), default=0)
    max_pos = max((off for off in a.offsets if off > 0), default=0)
    P0 = -(-max(max_neg, 1) // _SUBL) * _SUBL
    P1 = -(-max(max_pos + _SUBL, 1) // _SUBL) * _SUBL
    return C, P0, P1


def interleaved_ok(a: "_dia.DiaMatrix", dtype) -> bool:
    if a.ndiags > _MAX_UNROLL_DIAGS or a.m_pad % _TM:
        return False
    C, P0, P1 = _il_geometry(a)
    if C % _SUBL:
        return False
    if max(abs(o) for o in a.offsets) >= C:  # shift farther than a segment
        return False
    db = jnp.dtype(dtype).itemsize
    return (P0 + C + P1) * _LANE * db <= _X_VMEM_BUDGET


def to_interleaved(a: "_dia.DiaMatrix", v):
    C, P0, P1 = _il_geometry(a)
    n = a.shape[1]
    flat = jnp.zeros((a.m_pad,), v.dtype).at[:n].set(v)
    il = flat.reshape(_LANE, C).T  # (C, 128)
    return jnp.pad(il, ((P0, P1), (0, 0)))


def from_interleaved(a: "_dia.DiaMatrix", v2):
    C, P0, P1 = _il_geometry(a)
    return v2[P0 : P0 + C, :].T.reshape(-1)[: a.shape[0]]


def pack_vals_interleaved(a: "_dia.DiaMatrix"):
    """(T2, D, 64, 128) value tiles in the interleaved element order."""
    C, _, _ = _il_geometry(a)
    D = a.ndiags
    vt = a.vals.reshape(D, _LANE, C).transpose(2, 0, 1)  # (C, D, 128)
    return vt.reshape(C // _SUBL, _SUBL, D, _LANE).transpose(0, 2, 1, 3)


def _spmv_il_kernel(offsets, C, p0t, T2, interpret, x_ref, v_ref, o_ref):
    tt = pl.program_id(0)
    in_body = (tt >= p0t) & (tt < p0t + T2)

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(in_body)
    def _():
        acc = jnp.zeros((_SUBL, _LANE), dtype=o_ref.dtype)
        for d, off in enumerate(offsets):
            acc = acc + v_ref[0, d] * x_ref[pl.ds(tt * _SUBL + off, _SUBL), :]
        o_ref[...] = acc

    # segment-boundary carry corrections (rare, gated per diagonal)
    rowg = (tt - p0t) * _SUBL + jax.lax.broadcasted_iota(
        jnp.int32, (_SUBL, _LANE), 0
    )
    for d, off in enumerate(offsets):
        if off > 0:
            tt_hi = p0t + max(0, (C - off - (_SUBL - 1))) // _SUBL

            @pl.when(in_body & (tt >= tt_hi))
            def _(d=d, off=off):
                read = x_ref[pl.ds(tt * _SUBL + off - C, _SUBL), :]
                corr = _roll_lanes(read, 1, interpret)  # lane l ← l+1
                mask = rowg + off >= C
                o_ref[...] += v_ref[0, d] * jnp.where(mask, corr, 0)
        elif off < 0:
            tt_lo = p0t + (-off - 1) // _SUBL

            @pl.when(in_body & (tt <= tt_lo))
            def _(d=d, off=off):
                read = x_ref[pl.ds(tt * _SUBL + off + C, _SUBL), :]
                corr = _roll_lanes(read, _LANE - 1, interpret)  # lane l ← l-1
                mask = rowg + off < 0
                o_ref[...] += v_ref[0, d] * jnp.where(mask, corr, 0)


def dia_spmv_pallas_interleaved(a: "_dia.DiaMatrix", x2, v_il):
    """SpMV in the interleaved layout (input/output share it)."""
    D = a.ndiags
    C, P0, P1 = _il_geometry(a)
    T2 = C // _SUBL
    p0t = P0 // _SUBL
    total_tiles = (P0 + C + P1) // _SUBL
    out_dtype = jnp.promote_types(jnp.promote_types(a.vals.dtype, x2.dtype), jnp.float32) \
        if jnp.bfloat16 in (a.vals.dtype, x2.dtype) \
        else jnp.promote_types(a.vals.dtype, x2.dtype)

    def v_index(tt):
        return (jnp.clip(tt - p0t, 0, T2 - 1), 0, 0, 0)

    kernel = functools.partial(_spmv_il_kernel, a.offsets, C, p0t, T2, _interpret())
    return pl.pallas_call(
        kernel,
        grid=(total_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, _SUBL, _LANE), v_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SUBL, _LANE), lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_tiles * _SUBL, _LANE), out_dtype),
        interpret=_interpret(),
    )(x2, v_il)


# Streamed interleaved variant: identical math to _spmv_il_kernel, but x
# lives in HBM and arrives in VMEM through *progressive chunk prefetch* —
# chunk c is DMA-started LEAD chunks before the tile cursor needs it, so
# the x load rides concurrently with the value stream instead of the
# serial whole-array VMEM copy the resident variant pays per call
# (~n·db/819GB/s of dead time; the measured f32 roofline gap, VERDICT r1
# item 2).  Negative-offset carry corrections read the far END of x from
# early tiles — those rows come from a small resident rim operand so the
# chunk schedule stays strictly forward.

_IL_CHUNK = 512  # rows per prefetch chunk (512·128·4B = 256 KB at f32)


def _il_stream_geometry(offsets, C, P0, P1):
    total_rows = P0 + C + P1
    max_off = max(max(offsets), 0)
    min_off = min(min(offsets), 0)
    # main-loop + positive-carry reads reach (tt+1)·64 + max_off rows
    last_need = total_rows - 1
    nchunks = -(-total_rows // _IL_CHUNK)
    lead = -(-(_SUBL + max_off) // _IL_CHUNK) + 1
    rim_start = max(P0 + C + min_off - 8, 0)
    rim_rows = total_rows - rim_start
    return total_rows, nchunks, lead, rim_start, rim_rows, max_off, min_off


def _spmv_il_stream_kernel(offsets, C, p0t, T2, nchunks, lead, rim_start,
                           interpret, x_hbm, v_ref, xrim_v, o_ref, xv, sems):
    tt = pl.program_id(0)
    max_off = max(max(offsets), 0)

    def chunk_dma(c):
        rows = xv.shape[0]
        start = c * _IL_CHUNK
        size = min(_IL_CHUNK, rows - start) if start + _IL_CHUNK > rows else _IL_CHUNK
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, size), :], xv.at[pl.ds(start, size), :],
            sems.at[c],
        )

    # W(tt): highest chunk index the tile's reads touch
    def W(t):
        return jnp.minimum(((t + 1) * _SUBL + max_off) // _IL_CHUNK, nchunks - 1)

    w0 = int(min((_SUBL + max_off) // _IL_CHUNK, nchunks - 1))

    @pl.when(tt == 0)
    def _():
        for c in range(min(w0 + lead + 1, nchunks)):
            chunk_dma(c).start()
        for c in range(w0 + 1):
            chunk_dma(c).wait()

    @pl.when((tt > 0) & (W(tt) > W(tt - 1)))
    def _():
        # one new chunk becomes needed (chunk >= 64-row tile step);
        # start its lead partner and wait on it
        w = W(tt)

        @pl.when(w + lead < nchunks)
        def _():
            # static unrolled dispatch on the dynamic chunk id
            for c in range(w0 + lead + 1, nchunks):
                @pl.when(w + lead == c)
                def _(c=c):
                    chunk_dma(c).start()

        for c in range(w0 + 1, nchunks):
            @pl.when(w == c)
            def _(c=c):
                chunk_dma(c).wait()

    in_body = (tt >= p0t) & (tt < p0t + T2)

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(in_body)
    def _():
        acc = jnp.zeros((_SUBL, _LANE), dtype=o_ref.dtype)
        for d, off in enumerate(offsets):
            acc = acc + v_ref[0, d] * xv[pl.ds(tt * _SUBL + off, _SUBL), :]
        o_ref[...] = acc

    rowg = (tt - p0t) * _SUBL + jax.lax.broadcasted_iota(
        jnp.int32, (_SUBL, _LANE), 0
    )
    for d, off in enumerate(offsets):
        if off > 0:
            tt_hi = p0t + max(0, (C - off - (_SUBL - 1))) // _SUBL

            @pl.when(in_body & (tt >= tt_hi))
            def _(d=d, off=off):
                read = xv[pl.ds(tt * _SUBL + off - C, _SUBL), :]
                corr = _roll_lanes(read, 1, interpret)
                mask = rowg + off >= C
                o_ref[...] += v_ref[0, d] * jnp.where(mask, corr, 0)
        elif off < 0:
            tt_lo = p0t + (-off - 1) // _SUBL

            @pl.when(in_body & (tt <= tt_lo))
            def _(d=d, off=off):
                # far-end rows from the resident rim (not yet prefetched)
                read = xrim_v[pl.ds(tt * _SUBL + off + C - rim_start, _SUBL), :]
                corr = _roll_lanes(read, _LANE - 1, interpret)
                mask = rowg + off < 0
                o_ref[...] += v_ref[0, d] * jnp.where(mask, corr, 0)


def dia_spmv_pallas_il_stream(a: "_dia.DiaMatrix", x2, v_il):
    """Interleaved SpMV with HBM-streamed x (chunk prefetch): same layout
    contract as :func:`dia_spmv_pallas_interleaved`."""
    D = a.ndiags
    C, P0, P1 = _il_geometry(a)
    T2 = C // _SUBL
    p0t = P0 // _SUBL
    total_tiles = (P0 + C + P1) // _SUBL
    total_rows, nchunks, lead, rim_start, rim_rows, max_off, min_off = \
        _il_stream_geometry(a.offsets, C, P0, P1)
    out_dtype = jnp.promote_types(jnp.promote_types(a.vals.dtype, x2.dtype), jnp.float32) \
        if jnp.bfloat16 in (a.vals.dtype, x2.dtype) \
        else jnp.promote_types(a.vals.dtype, x2.dtype)

    xrim = jax.lax.slice(x2, (rim_start, 0), (total_rows, _LANE))

    def v_index(tt):
        return (jnp.clip(tt - p0t, 0, T2 - 1), 0, 0, 0)

    kernel = functools.partial(
        _spmv_il_stream_kernel, a.offsets, C, p0t, T2, nchunks, lead,
        rim_start, _interpret(),
    )
    return pl.pallas_call(
        kernel,
        grid=(total_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, D, _SUBL, _LANE), v_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SUBL, _LANE), lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_tiles * _SUBL, _LANE), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((total_rows, _LANE), x2.dtype),
            pltpu.SemaphoreType.DMA((nchunks,)),
        ],
        interpret=_interpret(),
    )(x2, v_il, xrim)


# ---------------------------------------------------------------------------
# SpMM
# ---------------------------------------------------------------------------


def _spmm_resident_kernel(offsets, lo, tm, kp, pretransposed, x_ref, v_ref, o_ref):
    t = pl.program_id(0)
    # v_ref: (tm, D) pre-transposed value tile when available (streaming
    # vals_t moves the same bytes without an in-kernel relayout),
    # else (D, tm) transposed here
    vt = v_ref[...] if pretransposed else v_ref[...].T  # (tm, D)
    # accumulate into o_ref: an `acc` temporary makes Mosaic keep every
    # unrolled diagonal's (tm, kp) product live at once → VMEM stack OOM
    o_ref[...] = jnp.zeros((tm, kp), dtype=o_ref.dtype)
    for d, off in enumerate(offsets):
        start = off + lo  # static row shift
        xw = x_ref[pl.ds(t * tm + start, tm), :]  # (tm, kp)
        o_ref[...] += vt[:, d : d + 1] * xw


def _spmm_window_kernel(offsets, lo, hi, tm, kp, pretransposed, x_hbm, v_ref, o_ref, xw_ref, sems):
    # X lives in HBM; (tm + span, kp) windows double-buffered so tile
    # t+1's DMA overlaps tile t's compute.  All diagonal shifts inside a
    # window are *static* row slices.
    t = pl.program_id(0)
    T = pl.num_programs(0)
    ws = tm + lo + hi

    def dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * tm, ws), :], xw_ref.at[slot], sems.at[slot]
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < T)
    def _():
        dma((t + 1) % 2, t + 1).start()

    vt = v_ref[...] if pretransposed else v_ref[...].T  # (tm, D)
    dma(t % 2, t).wait()
    cur = t % 2
    o_ref[...] = jnp.zeros((tm, kp), dtype=o_ref.dtype)
    for d, off in enumerate(offsets):
        start = off + lo  # static
        o_ref[...] += vt[:, d : d + 1] * xw_ref[cur, start : start + tm, :]


_SPMM_TM = 256  # minimum rows of y per grid step


# SpMM windows may use more VMEM than the resident-x budget: the window
# chooser accounts for every buffer it allocates, so it can push closer
# to the 16 MB scoped limit (the out tile + temps terms below).
_SPMM_VMEM_BUDGET = 12 * 1024 * 1024


def _spmm_tile(a: "_dia.DiaMatrix", kp: int, db: int) -> int:
    """Pick the y-tile row count: large enough that the window's span
    overhead amortizes (window = tm + span re-read per tile), small
    enough that two windows fit the VMEM budget."""
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    span = lo + hi
    for tm in (8192, 4096, 2048, 1024, 512, 256, 64):
        if a.m_pad % tm:
            continue
        # VMEM: 2 window buffers + double-buffered out tile + one temp
        need = (2 * (tm + span) + 3 * tm) * kp * db
        if need <= _SPMM_VMEM_BUDGET:
            return tm
    return _SUBL


def pad_x_spmm(a: "_dia.DiaMatrix", x):
    """Pre-padded X layout for repeated SpMMs with one plan."""
    n = a.shape[1]
    k = int(x.shape[1])
    kp = max(_LANE, -(-k // _LANE) * _LANE)
    db = jnp.dtype(x.dtype).itemsize
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    tm = _spmm_tile(a, kp, db)
    T = a.m_pad // tm
    xp = jnp.zeros((T * tm + lo + hi + tm, kp), x.dtype)
    return xp.at[lo : lo + n, :k].set(x)


def dia_spmm_pallas(a: "_dia.DiaMatrix", x):
    m = a.shape[0]
    k = int(x.shape[1])
    out = dia_spmm_pallas_padded(a, pad_x_spmm(a, x))
    return out[:m, :k]


def dia_spmm_pallas_padded(a: "_dia.DiaMatrix", xp):
    kp = int(xp.shape[1])
    D = a.ndiags
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    db = jnp.dtype(xp.dtype).itemsize
    tm = _spmm_tile(a, kp, db)
    T = a.m_pad // tm
    x = xp  # dtype promotion below

    resident = xp.shape[0] * kp * db <= _X_VMEM_BUDGET
    out_dtype = jnp.promote_types(jnp.promote_types(a.vals.dtype, x.dtype), jnp.float32) \
        if jnp.bfloat16 in (a.vals.dtype, x.dtype) \
        else jnp.promote_types(a.vals.dtype, x.dtype)
    common = dict(
        grid=(T,),
        out_specs=pl.BlockSpec((tm, kp), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * tm, kp), out_dtype),
        interpret=_interpret(),
    )
    pret = a.vals_t is not None
    if pret:
        v_spec = pl.BlockSpec((tm, D), lambda t: (t, 0), memory_space=pltpu.VMEM)
        v_operand = a.vals_t
    else:
        v_spec = pl.BlockSpec((D, tm), lambda t: (0, t), memory_space=pltpu.VMEM)
        v_operand = a.vals
    if resident:
        kernel = functools.partial(_spmm_resident_kernel, a.offsets, lo, tm, kp, pret)
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), v_spec],
            **common,
        )(xp, v_operand)
    else:
        ws = tm + lo + hi
        kernel = functools.partial(_spmm_window_kernel, a.offsets, lo, hi, tm, kp, pret)
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), v_spec],
            scratch_shapes=[
                pltpu.VMEM((2, ws, kp), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            **common,
        )(xp, v_operand)
    return out


# ---------------------------------------------------------------------------
# SpMM, transposed-k layout (k in sublanes) — the k≤64 path
# ---------------------------------------------------------------------------
#
# The standard SpMM kernel lays X out as (rows, kp) with kp lane-padded to
# 128, so k=32 moves 4x the useful X and Y bytes.  Here the dense axis
# lives in SUBLANES (k=32 -> exactly 4 vregs, no padding) and matrix rows
# live in LANES, so diagonal shifts become static lane slices of a
# double-buffered (kp_s, tl+span) window — the transposed twin of the
# windowed kernel above.  Y is produced in the same (k, rows) layout;
# chained/multi-RHS users stay in it and pay the transpose only at the
# boundary (same discipline as the SpMV solver layout).

# ---------------------------------------------------------------------------
# Ring-buffered SpMM: X read exactly once.
#
# The windowed SpMM kernel re-reads X by (tm+span)/tm per tile (1.5x at
# tm=4096 for the 1M stencil) and that re-read is pure waste at k=128
# where X/Y dominate traffic.  Here X strips of tm rows live in a 4-bank
# VMEM ring; each grid step DMAs ONLY the newly-needed strip, so every X
# row crosses HBM once.  A diagonal shift reads at most two adjacent
# banks (requires |off| <= tm), each a static intra-bank slice — two FMA
# pieces per diagonal.  Input and output share one strip-aligned padded
# layout, so chained solver iterations (and honest chained timing) pay
# no relayout.
# ---------------------------------------------------------------------------


def _ring_out_dtype(a: "_dia.DiaMatrix", in_dtype):
    """The library-wide accumulate policy: bf16 streams promote to f32."""
    if jnp.bfloat16 in (a.vals.dtype, jnp.dtype(in_dtype)):
        return jnp.promote_types(jnp.promote_types(a.vals.dtype, in_dtype),
                                 jnp.float32)
    return jnp.promote_types(a.vals.dtype, in_dtype)


def _ring_geometry(a: "_dia.DiaMatrix", kp: int, db_in: int,
                   db_out: Optional[int] = None):
    # db_out: element size of the (possibly promoted) output/accumulator
    # tile — with bf16 input the f32 out tile costs 2x db_in, so budgeting
    # everything at db_in could exceed VMEM on hardware (ADVICE r2).
    db_out = db_in if db_out is None else db_out
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    for tm in (4096, 2048, 1024, 512, 256):
        if a.m_pad % tm or lo > tm or hi > tm:
            continue
        # 4 ring banks (input dtype) + double-buffered out tile + one
        # accumulator temp (out dtype) + value tiles (input dtype)
        need = 4 * tm * kp * db_in + 3 * tm * kp * db_out \
            + 2 * a.ndiags * tm * db_in
        if need <= _SPMM_VMEM_BUDGET:
            p0 = -(-lo // tm) if lo else 1  # >=1 so strip tt-1 exists
            p1 = -(-(hi + 1) // tm)
            return tm, p0, p1
    return None


def ring_ok(a: "_dia.DiaMatrix", k: int) -> bool:
    if not a.offsets or a.ndiags > _MAX_UNROLL_DIAGS:
        return False
    kp = max(_LANE, -(-k // _LANE) * _LANE)
    return _ring_geometry(a, kp, 4, 4) is not None


def spmm_ring_rows(a: "_dia.DiaMatrix", kp: int, db: int,
                   db_out: Optional[int] = None) -> int:
    tm, p0, p1 = _ring_geometry(a, kp, db, db_out)
    return (p0 + a.m_pad // tm + p1) * tm


def to_spmm_ring(a: "_dia.DiaMatrix", x, *, out_dtype=None):
    """(n, k) dense block → the strip-aligned (rows, kp) layout.

    ``out_dtype`` must match what the later ``dia_spmm_pallas_ring_padded``
    call will produce (both default to the same promote policy, so
    matching is automatic unless you override one of them)."""
    n = a.shape[1]
    k = int(x.shape[1])
    kp = max(_LANE, -(-k // _LANE) * _LANE)
    db = jnp.dtype(x.dtype).itemsize
    dbo = jnp.dtype(out_dtype if out_dtype is not None
                    else _ring_out_dtype(a, x.dtype)).itemsize
    tm, p0, p1 = _ring_geometry(a, kp, db, dbo)
    rows = (p0 + a.m_pad // tm + p1) * tm
    xp = jnp.zeros((rows, kp), x.dtype)
    return xp.at[p0 * tm : p0 * tm + n, :k].set(x)


def from_spmm_ring(a: "_dia.DiaMatrix", yp, k: int, *, layout_dtype=None):
    """Slice the result strip back to (m, k).

    ``layout_dtype``: the *input* dtype the strip geometry was planned
    with (the geometry depends on element sizes).  When omitted it is
    inferred by matching candidate geometries against ``yp``'s row count;
    an ambiguous match raises instead of silently slicing wrong rows
    (ADVICE r2)."""
    kp = int(yp.shape[1])
    dbo = jnp.dtype(yp.dtype).itemsize
    if layout_dtype is not None:
        tm, p0, p1 = _ring_geometry(a, kp, jnp.dtype(layout_dtype).itemsize, dbo)
    else:
        fits = {}
        for db_in in (1, 2, 4, 8):
            g = _ring_geometry(a, kp, db_in, dbo)
            if g is not None and (g[1] + a.m_pad // g[0] + g[2]) * g[0] == yp.shape[0]:
                fits[g] = db_in
        if len(fits) != 1:
            raise ValueError(
                "from_spmm_ring: strip geometry is ambiguous for this row "
                "count — pass layout_dtype= (the input dtype the strip was "
                "built with)")
        ((tm, p0, p1),) = fits
    return yp[p0 * tm : p0 * tm + a.shape[0], :k]


def _spmm_ring_kernel(offsets, tm, kp, p0, T, TT, pret, x_hbm, v_ref, o_ref,
                      banks, sems):
    tt = pl.program_id(0)
    nstrips = TT  # one strip per tile of the shared layout

    def strip_dma(s):
        # s: traced strip id; bank slot s % 4 (dispatch over static slots)
        return [(slot, pltpu.make_async_copy(
            x_hbm.at[pl.ds(s * tm, tm), :], banks.at[slot], sems.at[slot]))
            for slot in range(4)]

    def start(s):
        for slot, dma in strip_dma(s):
            @pl.when((s % 4 == slot) & (s < nstrips))
            def _(dma=dma):
                dma.start()

    def wait(s):
        for slot, dma in strip_dma(s):
            @pl.when((s % 4 == slot) & (s < nstrips))
            def _(dma=dma):
                dma.wait()

    @pl.when(tt == 0)
    def _():
        for s in range(3):
            start(jnp.int32(s))
        wait(jnp.int32(0))
        wait(jnp.int32(1))

    @pl.when(tt > 0)
    def _():
        start(tt + 2)
        wait(tt + 1)

    in_body = (tt >= p0) & (tt < p0 + T)

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[...] = jnp.zeros((tm, kp), dtype=o_ref.dtype)

    @pl.when(in_body)
    def _():
        vt = v_ref[...] if pret else v_ref[...].T  # (tm, D)
        # value-level accumulation: the shifted read per diagonal is one
        # concatenate of two bank slices selected by dynamic slot index;
        # the whole sum stays an elementwise chain Mosaic fuses, with a
        # single o_ref store (per-piece `o_ref[slice] +=` read-modify-
        # writes the full tile through VMEM once per piece — measured as
        # the 0.36-roofline ceiling of the windowed kernel).
        # accumulate in (at least) f32 regardless of storage dtype: bf16
        # X/Y/value streams halve the HBM traffic while the VPU FMAs run
        # f32 (register upcasts are free of bandwidth)
        acc_t = jnp.promote_types(o_ref.dtype, jnp.float32)
        acc = jnp.zeros((tm, kp), dtype=acc_t)
        for d, off in enumerate(offsets):
            q, r = divmod(off, tm)  # floor: q in {-1, 0}, r in [0, tm)
            a_idx = jax.lax.rem(tt + jnp.int32(q), jnp.int32(4))
            hi_part = banks[pl.ds(a_idx, 1), pl.ds(r, tm - r), :][0]
            if r == 0:
                sh = hi_part
            else:
                b_idx = jax.lax.rem(tt + jnp.int32(q + 1), jnp.int32(4))
                lo_part = banks[pl.ds(b_idx, 1), pl.ds(0, r), :][0]
                sh = jnp.concatenate([hi_part, lo_part], axis=0)
            acc = acc + vt[:, d : d + 1].astype(acc_t) * sh.astype(acc_t)
        o_ref[...] = acc.astype(o_ref.dtype)


def dia_spmm_pallas_ring_padded(a: "_dia.DiaMatrix", xp, *, out_dtype=None):
    """SpMM in the shared strip layout: in and out have identical shape.

    ``out_dtype=None`` promotes bf16 inputs to an f32 result (the
    library-wide accumulate policy); pass ``jnp.bfloat16`` explicitly
    for the fully-bf16 chained pipeline (Y storage halves; the in-kernel
    accumulate stays f32 either way)."""
    kp = int(xp.shape[1])
    D = a.ndiags
    if out_dtype is None:
        out_dtype = _ring_out_dtype(a, xp.dtype)
    db = jnp.dtype(xp.dtype).itemsize
    tm, p0, p1 = _ring_geometry(a, kp, db, jnp.dtype(out_dtype).itemsize)
    T = a.m_pad // tm
    TT = p0 + T + p1
    pret = a.vals_t is not None
    if pret:
        v_spec = pl.BlockSpec((tm, D), lambda tt: (jnp.clip(tt - p0, 0, T - 1), 0),
                              memory_space=pltpu.VMEM)
        v_operand = a.vals_t
    else:
        v_spec = pl.BlockSpec((D, tm), lambda tt: (0, jnp.clip(tt - p0, 0, T - 1)),
                              memory_space=pltpu.VMEM)
        v_operand = a.vals
    kernel = functools.partial(_spmm_ring_kernel, a.offsets, tm, kp, p0, T, TT,
                               pret)
    return pl.pallas_call(
        kernel,
        grid=(TT,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), v_spec],
        out_specs=pl.BlockSpec((tm, kp), lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TT * tm, kp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((4, tm, kp), xp.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=_interpret(),
    )(xp, v_operand)


def dia_spmm_pallas_ring(a: "_dia.DiaMatrix", x):
    """y = A @ x via the ring kernel (X read from HBM exactly once)."""
    k = int(x.shape[1])
    return from_spmm_ring(a, dia_spmm_pallas_ring_padded(a, to_spmm_ring(a, x)),
                          k, layout_dtype=x.dtype)


_KT_MAX_K = 64


def _kt_kp(k: int) -> int:
    return max(8, -(-k // 8) * 8)


def _kt_span_pad(lo: int, hi: int) -> int:
    """Window overhang: covers every aligned slice base q·128 plus the
    +128 roll slack, 128-aligned (DMA lane slices must be)."""
    return (((lo + hi) // _LANE) + 1) * _LANE


def _kt_geometry(a: "_dia.DiaMatrix", kp_s: int, db: int):
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    e = _kt_span_pad(lo, hi)
    for tl in (16384, 8192, 4096, 2048, 1024, 512, 256, 128):
        if a.m_pad % tl:
            continue
        need = (2 * (tl + e) + 3 * tl) * kp_s * db + a.ndiags * tl * db
        if need <= _SPMM_VMEM_BUDGET:
            return tl, lo, hi
    return 128, lo, hi


def kt_ok(a: "_dia.DiaMatrix", k: int) -> bool:
    if not a.offsets or k > _KT_MAX_K or a.ndiags > _MAX_UNROLL_DIAGS:
        return False
    lo = -min(min(a.offsets), 0)
    hi = max(max(a.offsets), 0)
    return lo + hi < a.m_pad


def pad_xt_spmm(a: "_dia.DiaMatrix", x):
    """Transposed pre-padded X layout: (kp_s, (T-1)·tl + ws), lane-aligned."""
    n = a.shape[1]
    k = int(x.shape[1])
    kp_s = _kt_kp(k)
    db = jnp.dtype(x.dtype).itemsize
    tl, lo, hi = _kt_geometry(a, kp_s, db)
    T = a.m_pad // tl
    W = (T - 1) * tl + tl + _kt_span_pad(lo, hi)
    xt = jnp.zeros((kp_s, W), x.dtype)
    return xt.at[:k, lo : lo + n].set(x.T)


def _spmm_kt_kernel(offsets, lo, hi, tl, kp_s, x_hbm, v_ref, o_ref, xw_ref, sems):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    ws = tl + _kt_span_pad(lo, hi)  # 128-aligned window

    def dma(slot, step):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(step * tl, ws)], xw_ref.at[slot], sems.at[slot]
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < T)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    cur = t % 2
    o_ref[...] = jnp.zeros((kp_s, tl), dtype=o_ref.dtype)
    for d, off in enumerate(offsets):
        start = off + lo
        q, r = divmod(start, _LANE)  # aligned slice base + sub-vreg residue
        sl = xw_ref[cur, :, q * _LANE : q * _LANE + tl + _LANE]
        if r:  # roll left by r: element j ← j + r (np.roll(x, -r))
            sl = pltpu.roll(sl, tl + _LANE - r, axis=1)
        o_ref[...] += v_ref[d : d + 1, :] * sl[:, :tl]


def dia_spmm_pallas_kt_padded(a: "_dia.DiaMatrix", xt):
    """(kp_s, W) transposed X → (kp_s, m_pad) transposed Y."""
    kp_s = int(xt.shape[0])
    D = a.ndiags
    db = jnp.dtype(xt.dtype).itemsize
    tl, lo, hi = _kt_geometry(a, kp_s, db)
    T = a.m_pad // tl
    out_dtype = jnp.promote_types(jnp.promote_types(a.vals.dtype, xt.dtype), jnp.float32) \
        if jnp.bfloat16 in (a.vals.dtype, xt.dtype) \
        else jnp.promote_types(a.vals.dtype, xt.dtype)
    kernel = functools.partial(_spmm_kt_kernel, a.offsets, lo, hi, tl, kp_s)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((D, tl), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kp_s, tl), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp_s, T * tl), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kp_s, tl + _kt_span_pad(lo, hi)), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(xt, a.vals)


def dia_spmm_pallas_kt(a: "_dia.DiaMatrix", x):
    """y = A @ x with k ≤ 64 via the transposed-k kernel."""
    m = a.shape[0]
    k = int(x.shape[1])
    yt = dia_spmm_pallas_kt_padded(a, pad_xt_spmm(a, x))
    return yt[:k, :m].T


# ---------------------------------------------------------------------------
# EXPERIMENTAL (VERDICT r2 item 5): MXU-hybrid ring SpMM.
#
# The ring kernel's measured 0.385-of-roofline ceiling decomposed to the
# ±1-row shifted reads (PERF.md "SpMM k=128").  This variant absorbs
# every near diagonal (|off| ≤ bw, e.g. the stencil's {-1, 0, 1}) into a
# per-sub-tile banded-dense MXU contraction — Y_sub += A3 @ U where
# A3[r, j] = v_off[r] at j = r + off + bw is built from iota masks and U
# is the (tmx + 2bw)-row X window — so the misaligned reads vanish into
# the systolic array's own operand staging.  Far diagonals (±ny: aligned
# or sublane-aligned) stay VPU pieces.  MACs are (tmx+2bw)/(2bw+1)-fold
# redundant; the experiment is whether trading redundant MXU MACs for
# the VPU realignment wall wins.  Dispatched only explicitly
# (method-level opt-in); the probe decides its fate.
# ---------------------------------------------------------------------------


def _spmm_ring_mxu_kernel(offsets, near, bw, tmx, tm, kp, p0, T, TT, pret,
                          x_hbm, v_ref, o_ref, banks, sems):
    tt = pl.program_id(0)
    nstrips = TT

    def strip_dma(s):
        return [(slot, pltpu.make_async_copy(
            x_hbm.at[pl.ds(s * tm, tm), :], banks.at[slot], sems.at[slot]))
            for slot in range(4)]

    def start(s):
        for slot, dma in strip_dma(s):
            @pl.when((s % 4 == slot) & (s < nstrips))
            def _(dma=dma):
                dma.start()

    def wait(s):
        for slot, dma in strip_dma(s):
            @pl.when((s % 4 == slot) & (s < nstrips))
            def _(dma=dma):
                dma.wait()

    @pl.when(tt == 0)
    def _():
        for s in range(3):
            start(jnp.int32(s))
        wait(jnp.int32(0))
        wait(jnp.int32(1))

    @pl.when(tt > 0)
    def _():
        start(tt + 2)
        wait(tt + 1)

    in_body = (tt >= p0) & (tt < p0 + T)

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[...] = jnp.zeros((tm, kp), dtype=o_ref.dtype)

    @pl.when(in_body)
    def _():
        vt = v_ref[...] if pret else v_ref[...].T  # (tm, D)
        acc_t = jnp.promote_types(o_ref.dtype, jnp.float32)
        acc = jnp.zeros((tm, kp), dtype=acc_t)

        # far diagonals: the ring kernel's two-slice VPU pieces
        for d, off in enumerate(offsets):
            if off in near:
                continue
            q, r = divmod(off, tm)
            a_idx = jax.lax.rem(tt + jnp.int32(q), jnp.int32(4))
            hi_part = banks[pl.ds(a_idx, 1), pl.ds(r, tm - r), :][0]
            if r == 0:
                sh = hi_part
            else:
                b_idx = jax.lax.rem(tt + jnp.int32(q + 1), jnp.int32(4))
                lo_part = banks[pl.ds(b_idx, 1), pl.ds(0, r), :][0]
                sh = jnp.concatenate([hi_part, lo_part], axis=0)
            acc = acc + vt[:, d : d + 1].astype(acc_t) * sh.astype(acc_t)

        # near band via MXU: W = rows [tt*tm - bw, tt*tm + tm + bw),
        # extended so each sub-tile's contraction operand is a full
        # lane-aligned wpad rows — Mosaic rejects iota compares on a
        # non-128-multiple minor dim (probe_mxu2: "Invalid relayout"
        # on vector<256x258xi1>).  Columns beyond tmx+2bw never match
        # the band condition, so a3 is zero there and the extra u rows
        # (real rows of the next strip) contribute nothing.
        wpad = -(-(tmx + 2 * bw) // _LANE) * _LANE
        prev_i = jax.lax.rem(tt + jnp.int32(-1), jnp.int32(4))
        next_i = jax.lax.rem(tt + jnp.int32(1), jnp.int32(4))
        cur_i = jax.lax.rem(tt, jnp.int32(4))
        # skip statically-empty pieces (bw == 0 with a 128-multiple tmx
        # makes both edge slices zero-length; Mosaic may reject a
        # zero-length pl.ds on an otherwise-valid config — ADVICE r3)
        w_parts = []
        if bw:
            w_parts.append(banks[pl.ds(prev_i, 1), pl.ds(tm - bw, bw), :][0])
        w_parts.append(banks[pl.ds(cur_i, 1), :, :][0])
        if wpad - tmx - bw > 0:
            w_parts.append(
                banks[pl.ds(next_i, 1), pl.ds(0, wpad - tmx - bw), :][0])
        W = (jnp.concatenate(w_parts, axis=0) if len(w_parts) > 1
             else w_parts[0])  # (tm + wpad - tmx, kp)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (tmx, wpad), 0)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (tmx, wpad), 1)
        y_subs = []
        for i in range(tm // tmx):
            a3 = jnp.zeros((tmx, wpad), dtype=jnp.bfloat16)
            for d, off in enumerate(offsets):
                if off not in near:
                    continue
                vcol = vt[i * tmx : (i + 1) * tmx, d : d + 1].astype(jnp.bfloat16)
                # multiply by a 0/1 mask, NOT jnp.where: the select with
                # a lane-replicated (tmx, 1) branch makes Mosaic demand
                # an impossible lane-replicated layout for the wide bool
                # mask ("Invalid relayout ... '16,{0,*},(8,128)'",
                # probe_mxu2)
                m01 = (iota_j == iota_r + (off + bw)).astype(jnp.bfloat16)
                a3 = a3 + vcol * m01
            u = W[i * tmx : i * tmx + wpad].astype(jnp.bfloat16)
            y_subs.append(jax.lax.dot_general(
                a3, u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(acc_t))
        # value-indexed .at[].add lowers to an (unimplemented) Mosaic
        # scatter-add; a concat of the statically-unrolled sub-tiles
        # keeps the accumulate a plain vector add (probe_spmm_mxu)
        acc = acc + (y_subs[0] if len(y_subs) == 1
                     else jnp.concatenate(y_subs, axis=0))
        o_ref[...] = acc.astype(o_ref.dtype)


def dia_spmm_pallas_ring_mxu_padded(a: "_dia.DiaMatrix", xp, *,
                                    out_dtype=None, near_bw: int = 8,
                                    tmx: int = 256):
    """EXPERIMENTAL: ring SpMM with the near band on the MXU (bf16
    operands, f32 accumulate — ~1e-3 class on the near band).  Same
    strip layout contract as :func:`dia_spmm_pallas_ring_padded`."""
    kp = int(xp.shape[1])
    D = a.ndiags
    if out_dtype is None:
        out_dtype = _ring_out_dtype(a, xp.dtype)
    db = jnp.dtype(xp.dtype).itemsize
    tm, p0, p1 = _ring_geometry(a, kp, db, jnp.dtype(out_dtype).itemsize)
    T = a.m_pad // tm
    TT = p0 + T + p1
    near = tuple(o for o in a.offsets if abs(o) <= near_bw)
    bw = max((abs(o) for o in near), default=0)
    if not near or tm % tmx:
        raise ValueError("no near diagonals within near_bw or tmx misfit")
    pret = a.vals_t is not None
    if pret:
        v_spec = pl.BlockSpec((tm, D), lambda tt: (jnp.clip(tt - p0, 0, T - 1), 0),
                              memory_space=pltpu.VMEM)
        v_operand = a.vals_t
    else:
        v_spec = pl.BlockSpec((D, tm), lambda tt: (0, jnp.clip(tt - p0, 0, T - 1)),
                              memory_space=pltpu.VMEM)
        v_operand = a.vals
    kernel = functools.partial(_spmm_ring_mxu_kernel, a.offsets, near, bw,
                               tmx, tm, kp, p0, T, TT, pret)
    return pl.pallas_call(
        kernel,
        grid=(TT,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), v_spec],
        out_specs=pl.BlockSpec((tm, kp), lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TT * tm, kp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((4, tm, kp), xp.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=_interpret(),
    )(xp, v_operand)
