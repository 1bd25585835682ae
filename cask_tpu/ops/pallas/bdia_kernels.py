"""Pallas TPU kernel for BDIA SpMV (the fast BSR SpMV path).

Same hot-loop shape as the scalar DIA kernel (:mod:`dia_kernels`): the
value array streams tile-by-tile through the Pallas grid pipeline while
the de-interleaved x components sit resident in VMEM.  Each unrolled
``(c, d)`` pair is one shifted-window FMA; the shift's lane residue is
static (``d mod 128``) because component segments are 128-lane aligned,
so the kernel pays the same one-roll-per-pair cost as scalar DIA —
but streams **exactly nnz values** (no block→scalar diagonal fill).

Grid: ``(br, T)`` — output component r × block-row tile t.  The value
block per step is ``(D', TS, 128)``; the x read for pair ``(c, d)``
starts at row ``c·SEG + t·TS + (lo+d)//128``, always inside component
c's zero-padded segment (structural-zero discipline: out-of-range block
rows/cols carry zero values, so no masks exist in the loop).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cask_tpu.ops import bdia as _bdia
from cask_tpu.ops.pallas.dia_kernels import _shifted_window

_LANE = 128


def _interpret() -> bool:
    from cask_tpu.utils.platform import on_tpu

    return not on_tpu()


def _bdia_spmv_kernel(pair_qs, ts, seg, interpret, x_ref, v_ref, o_ref):
    t = pl.program_id(1)
    acc = jnp.zeros((ts, _LANE), dtype=o_ref.dtype)
    for j, (c, q, s) in enumerate(pair_qs):
        row0 = c * seg + t * ts + q
        acc = acc + v_ref[0, 0, j] * _shifted_window(x_ref, row0, s, ts, interpret)
    o_ref[0] = acc


def _bdia_resident_kernel(pair_qs, ts, seg, p0t, T, interpret, x_ref, v_ref, o_ref):
    # input and output share the segmented layout: tile (r, tt) writes
    # segment r's rows [tt*ts, (tt+1)*ts); tiles outside the body (the
    # lo-pad and tail-slack regions) write zeros.
    tt = pl.program_id(1)
    in_body = (tt >= p0t) & (tt < p0t + T)

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(in_body)
    def _():
        acc = jnp.zeros((ts, _LANE), dtype=o_ref.dtype)
        for j, (c, q, s) in enumerate(pair_qs):
            row0 = c * seg + tt * ts + q  # q measured from the segment
            acc = acc + v_ref[0, 0, j] * _shifted_window(x_ref, row0, s, ts,
                                                         interpret)
        o_ref[0] = acc


def bdia_spmv_pallas_resident(a: "_bdia.BdiaMatrix", x2):
    """SpMV in the solver-resident layout: output shares the input's
    (b·SEG, 128) segmented layout, so Krylov iterations chain with zero
    relayout copies (square blocks only; the BDIA twin of the scalar
    DIA solver layout, dia_kernels.py:231).
    """
    br, bc = a.blocksize
    if br != bc:
        raise ValueError("resident BDIA layout needs square blocks")
    ts, T = a.ts, a.n_tiles
    p0t, p1t = a.resident_pads
    seg = (p0t + T + p1t) * ts
    npairs = a.npairs
    pair_qs = tuple((c, *divmod(d, _LANE)) for (c, d) in a.pairs)
    out_dtype = jnp.promote_types(a.vals.dtype, x2.dtype)
    if jnp.bfloat16 in (a.vals.dtype, x2.dtype):
        out_dtype = jnp.promote_types(out_dtype, jnp.float32)

    def v_index(r, tt):
        return (r, jnp.clip(tt - p0t, 0, T - 1), 0, 0, 0)

    kernel = functools.partial(_bdia_resident_kernel, pair_qs, ts, seg, p0t, T,
                               _interpret())
    return pl.pallas_call(
        kernel,
        grid=(br, p0t + T + p1t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
            pl.BlockSpec((1, 1, npairs, ts, _LANE), v_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ts, _LANE), lambda r, tt: (r, tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((br, seg, _LANE), out_dtype),
        interpret=_interpret(),
    )(x2, a.vals).reshape(br * seg, _LANE)


def _perm_dot_exact(w, p, interpret: bool):
    """Exact ``w @ p`` for a 0/1 permutation matrix ``p``.

    On TPU, f32 uses the 3-pass bf16 split (an f32 is exactly the sum of
    three 8-mantissa-bit bf16 components; each MXU product against 0/1
    is a single exact term).  XLA:TPU's simplifier refolds this split
    (ops/bdia.py probe8d/e/9 history) — inside Mosaic we emit the three
    dots ourselves and nothing refolds them, which is the whole point of
    the in-kernel relayout (VERDICT r2 item 2)."""
    f32 = jnp.float32
    if interpret or w.dtype == jnp.float64:
        return jnp.dot(w, p.astype(w.dtype))
    if w.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            w, p, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    b0 = w.astype(jnp.bfloat16)
    r1 = w - b0.astype(f32)
    b1 = r1.astype(jnp.bfloat16)
    b2 = (r1 - b1.astype(f32)).astype(jnp.bfloat16)
    dot = lambda b: jax.lax.dot_general(  # noqa: E731
        b, p, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    return dot(b0) + dot(b1) + dot(b2)


def _bdia_fused_kernel(pair_qs, br, bc, ts, seg128, lp128, tbx, P1, T, mt,
                       spt, rtx_pad, interpret, xn_ref, v_ref, pin_ref,
                       pout_ref, o_ref, xs_ref):
    # grid (1 + T, br + 1): step 0 = prologue (zero scratch + slab 0),
    # step g ≥ 1 = value tile t = g−1.  De-interleave slabs are
    # INTERLEAVED into the tile schedule — slab p lands at tile
    # (p−1)·spt, always ≥ one slab ahead of the tile windows' reach — so
    # their MXU passes hide under the value-stream DMA instead of
    # running as a serial prefix (probe_fused1/2: the serial-phase
    # version paid ~90 µs at 1M rows; the value-block index is also
    # pinned during the prologue so the pipeline never re-fetches slabs
    # of values it already holds).  dim 1 = output component r; the last
    # sub-step merges the block (pout permutation) at M = mt·ts.
    g = pl.program_id(0)
    rr = pl.program_id(1)
    t = g - 1

    def do_slab(p):
        # (tbx, 128·bc) @ perm → lanes [c·128, (c+1)·128) = component c
        w = _perm_dot_exact(xn_ref[...], pin_ref[...], interpret)
        w = w.astype(xs_ref.dtype)
        for c in range(bc):
            xs_ref[pl.ds(c * seg128 + lp128 + p * tbx, tbx), :] = \
                w[:, c * _LANE : (c + 1) * _LANE]

    @pl.when((g == 0) & (rr == 0))
    def _prologue():
        # structural-zero discipline: every pad region of the component
        # segments reads as 0 in the FMA windows.  Only the head/tail
        # pad strips need zeroing — rows [lp128, lp128+rtx_pad) are
        # covered by the slab writes (xn itself is zero-padded), so the
        # full-scratch memset (4.2 MB serial VPU fill at 1M rows) is
        # avoided.
        tail = seg128 - lp128 - rtx_pad
        for c in range(bc):
            if lp128:
                xs_ref[pl.ds(c * seg128, lp128), :] = jnp.zeros(
                    (lp128, _LANE), xs_ref.dtype)
            if tail > 0:
                xs_ref[pl.ds(c * seg128 + lp128 + rtx_pad, tail), :] = \
                    jnp.zeros((tail, _LANE), xs_ref.dtype)
        do_slab(jnp.int32(0))

    @pl.when((g >= 1) & (rr == 0) & (t % spt == 0) & (t // spt + 1 < P1))
    def _slab():
        do_slab(t // spt + 1)

    for half in range(mt):
        for r in range(br):
            @pl.when((g >= 1) & (rr == r) & (t % mt == half))
            def _compute(r=r, half=half):
                acc = jnp.zeros((ts, _LANE), dtype=o_ref.dtype)
                for j, (c, q, s) in enumerate(pair_qs):
                    row0 = c * seg128 + t * ts + q
                    acc = acc + v_ref[0, 0, j] * _shifted_window(
                        xs_ref, row0, s, ts, interpret)
                o_ref[half * ts : (half + 1) * ts,
                      r * _LANE : (r + 1) * _LANE] = acc

    @pl.when((g >= 1) & (rr == br) & (t % mt == mt - 1))
    def _merge():
        # interleave the br component lane-groups back to natural order —
        # one exact relayout per output block, overlapping the next value
        # slab's DMA in the Mosaic pipeline (no separate XLA pass)
        merged = _perm_dot_exact(o_ref[...], pout_ref[...], interpret)
        o_ref[...] = merged.astype(o_ref.dtype)


def _bdia_fused_flat_kernel(pair_qs, br, bc, ts, seg128, lp128, tbx, P1, T,
                            mt, spt, rtx_pad, interpret, xn_ref, v_ref,
                            pin_ref, pout_ref, o_ref, xs_ref):
    # flat grid (1 + T,): one step per value tile, ALL br components
    # computed in-step (value block = (br, 1, npairs, ts, 128)).  The
    # 2-D (1+T, br+1) schedule exposes ~0.3 µs of fixed cost per grid
    # step, which dominates small matrices (probe_fused5: 31.6 µs at
    # 100k rows over 70 steps vs a 10.7 µs traffic floor); this
    # schedule has 1 + T steps.  Large matrices keep the 2-D schedule
    # (smaller value blocks pipeline more finely).
    g = pl.program_id(0)
    t = g - 1

    def do_slab(p):
        w = _perm_dot_exact(xn_ref[...], pin_ref[...], interpret)
        w = w.astype(xs_ref.dtype)
        for c in range(bc):
            xs_ref[pl.ds(c * seg128 + lp128 + p * tbx, tbx), :] = \
                w[:, c * _LANE : (c + 1) * _LANE]

    @pl.when(g == 0)
    def _prologue():
        tail = seg128 - lp128 - rtx_pad
        for c in range(bc):
            if lp128:
                xs_ref[pl.ds(c * seg128, lp128), :] = jnp.zeros(
                    (lp128, _LANE), xs_ref.dtype)
            if tail > 0:
                xs_ref[pl.ds(c * seg128 + lp128 + rtx_pad, tail), :] = \
                    jnp.zeros((tail, _LANE), xs_ref.dtype)
        do_slab(jnp.int32(0))

    @pl.when((g >= 1) & (t % spt == 0) & (t // spt + 1 < P1))
    def _slab():
        do_slab(t // spt + 1)

    @pl.when(g >= 1)
    def _compute():
        half = jnp.mod(t, mt)
        for r in range(br):
            acc = jnp.zeros((ts, _LANE), dtype=o_ref.dtype)
            for j, (c, q, s) in enumerate(pair_qs):
                row0 = c * seg128 + t * ts + q
                acc = acc + v_ref[r, 0, j] * _shifted_window(
                    xs_ref, row0, s, ts, interpret)
            o_ref[pl.ds(half * ts, ts), r * _LANE : (r + 1) * _LANE] = acc

    @pl.when((g >= 1) & (t % mt == mt - 1))
    def _merge():
        merged = _perm_dot_exact(o_ref[...], pout_ref[...], interpret)
        o_ref[...] = merged.astype(o_ref.dtype)


# flat-grid cutover: value streams below this ride the (1 + T,) grid.
# r3 measured the two schedules tied at 1M rows (116.3 2-D vs 119.3
# flat) and flat 1.7x better at 100k, with 24 MB as the cutover; r4
# re-measured the 2-D grid swinging 128-163 us across windows while
# flat stayed 118-119 BOTH days (probe_fused7) — flat is the robust
# schedule, so the cutover now covers every VMEM-feasible stream (the
# 2-D path remains reachable via flat=False for giant per-step blocks).
_FUSED_FLAT_MAX_VAL_BYTES = 256 * 1024 * 1024


def bdia_fused_ok(a: "_bdia.BdiaMatrix", *, slab_rows: int = 128) -> bool:
    """Can :func:`bdia_spmv_pallas_fused` run on this plan?

    Checks the resident-path preconditions (pair unroll + VMEM x budget,
    :func:`cask_tpu.ops.bdia.bdia_pallas_ok`) plus the fused kernel's
    own constraints: the forward halo must fit one de-interleave slab
    (``hi <= slab_rows·128`` block offsets) and the component-segment
    scratch must fit VMEM.  Works on metadata-only plans (``vals`` may
    be a ``ShapeDtypeStruct``) so distribution code can resolve its
    interior without touching device arrays."""
    from cask_tpu.ops.bdia import bdia_pallas_ok
    from cask_tpu.ops.pallas.dia_kernels import _X_VMEM_BUDGET

    if not bdia_pallas_ok(a):
        return False
    if slab_rows % _LANE or slab_rows < a.ts:
        return False
    if a.hi > slab_rows * _LANE:
        return False
    lp128 = -(-a.lo // _LANE)
    rtx = -(-a.nbc // _LANE)
    rtx_pad = -(-rtx // slab_rows) * slab_rows
    seg128 = lp128 + max(a.n_tiles * a.ts, rtx_pad) + a.hi // _LANE + 2
    db = jnp.dtype(a.vals.dtype).itemsize
    return a.blocksize[1] * seg128 * _LANE * db <= _X_VMEM_BUDGET


def bdia_spmv_pallas_fused(a: "_bdia.BdiaMatrix", x, *,
                           merge_tiles: Optional[int] = None,
                           slab_rows: int = 128,
                           flat: Optional[bool] = None):
    """One-shot SpMV on NATURAL-order x → natural-order y.

    The component de-interleave/interleave runs *inside* the kernel
    (phase 1: x slabs → VMEM component segments; per-block output merge),
    so the one-shot path pays zero XLA relayout passes and the relayout
    work hides under the HBM-bound value stream.

    Exact for f32 via the in-Mosaic 3-pass bf16 split
    (:func:`_perm_dot_exact`); paired-tile merges run at M = 2·ts for
    systolic-array utilization.  (A transpose-unit ``swapaxes`` relayout
    was tried and crashes the Mosaic compiler — probe_fused2; MXU
    permutation is the shipped route.)
    """
    br, bc = a.blocksize
    m, n = a.shape
    ts, T = a.ts, a.n_tiles
    lo, hi = a.lo, a.hi
    lp128 = -(-lo // _LANE)
    lp = lp128 * _LANE
    L_in, L_out = _LANE * bc, _LANE * br
    if slab_rows % _LANE or slab_rows < a.ts:
        raise ValueError("slab_rows must be a multiple of 128 and >= ts")
    tbx = slab_rows
    rtx = -(-a.nbc // _LANE)  # natural-x rows of 128 blocks each
    rtx_pad = -(-rtx // tbx) * tbx
    P1 = rtx_pad // tbx
    seg128 = lp128 + max(T * ts, rtx_pad) + hi // _LANE + 2
    npairs = a.npairs
    pair_qs = tuple((c, *divmod(lp + d, _LANE)) for (c, d) in a.pairs)

    x = jnp.asarray(x)
    if rtx_pad * L_in == n:
        xn = x.reshape(rtx_pad, L_in)
    else:
        xn = jnp.zeros((rtx_pad * L_in,), x.dtype).at[:n].set(x).reshape(
            rtx_pad, L_in)
    out_dtype = jnp.promote_types(a.vals.dtype, x.dtype)
    if jnp.bfloat16 in (a.vals.dtype, x.dtype):
        out_dtype = jnp.promote_types(out_dtype, jnp.float32)

    if hi > tbx * _LANE:
        # the interleaved slab schedule stays exactly one slab ahead of
        # the windows' forward reach; a wider-than-slab hi would need a
        # multi-slab prologue the single-block pipeline can't feed
        raise ValueError(
            f"fused BDIA kernel needs hi <= {tbx * _LANE} block offsets "
            f"(slab_rows * 128; got hi={hi} — use the resident path)")
    spt = tbx // ts  # tiles consumed per de-interleave slab

    interp = _interpret()
    pd = x.dtype if interp or x.dtype == jnp.float64 else jnp.bfloat16
    pin = jnp.asarray(_bdia._deint_perm(bc), pd)
    pout = jnp.asarray(_bdia._deint_perm(br).T, pd)
    if merge_tiles is not None:
        if T % merge_tiles:
            raise ValueError(f"merge_tiles={merge_tiles} must divide T={T}")
        mt = merge_tiles
    else:
        mt = 2 if T % 2 == 0 else 1

    if flat is None:
        flat = a.vals.size * jnp.dtype(a.vals.dtype).itemsize \
            <= _FUSED_FLAT_MAX_VAL_BYTES
    if flat:
        kernel = functools.partial(_bdia_fused_flat_kernel, pair_qs, br, bc,
                                   ts, seg128, lp128, tbx, P1, T, mt, spt,
                                   rtx_pad, interp)
        grid = (1 + T,)
        xn_spec = pl.BlockSpec(
            (tbx, L_in),
            lambda g: (jnp.clip((g - 1) // spt + 1, 0, P1 - 1), 0),
            memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec(
            (br, 1, npairs, ts, _LANE),
            lambda g: (0, jnp.clip(g - 1, 0, T - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec(
            (mt * ts, L_out),
            lambda g: (jnp.clip(g - 1, 0, T - 1) // mt, 0),
            memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_bdia_fused_kernel, pair_qs, br, bc, ts,
                                   seg128, lp128, tbx, P1, T, mt, spt,
                                   rtx_pad, interp)
        grid = (1 + T, br + 1)
        xn_spec = pl.BlockSpec(
            (tbx, L_in),
            lambda g, rr: (jnp.clip((g - 1) // spt + 1, 0, P1 - 1), 0),
            memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec(
            (1, 1, npairs, ts, _LANE),
            lambda g, rr: (jnp.where(g < 1, 0, jnp.clip(rr, 0, br - 1)),
                           jnp.clip(g - 1, 0, T - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec(
            (mt * ts, L_out),
            lambda g, rr: (jnp.clip(g - 1, 0, T - 1) // mt, 0),
            memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            xn_spec,
            v_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pin
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pout
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((T * ts, L_out), out_dtype),
        scratch_shapes=[pltpu.VMEM((bc * seg128, _LANE), x.dtype)],
        interpret=interp,
    )(xn, a.vals, pin, pout)
    return y.reshape(-1)[:m]


def bdia_spmv_pallas(a: "_bdia.BdiaMatrix", x2):
    """SpMV on the pre-deinterleaved (bc·SEG, 128) x layout.

    Returns (br, T·TS, 128); decode with :meth:`BdiaMatrix.from_bdia`.
    """
    br, bc = a.blocksize
    ts, seg, T = a.ts, a.seg_rows, a.n_tiles
    lo = a.lo
    npairs = a.npairs
    pair_qs = tuple(
        (c, *divmod(lo + d, _LANE)) for (c, d) in a.pairs
    )
    out_dtype = jnp.promote_types(a.vals.dtype, x2.dtype)
    if jnp.bfloat16 in (a.vals.dtype, x2.dtype):
        out_dtype = jnp.promote_types(out_dtype, jnp.float32)

    kernel = functools.partial(_bdia_spmv_kernel, pair_qs, ts, seg, _interpret())
    return pl.pallas_call(
        kernel,
        grid=(br, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
            pl.BlockSpec((1, 1, npairs, ts, _LANE), lambda r, t: (r, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ts, _LANE), lambda r, t: (r, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((br, T * ts, _LANE), out_dtype),
        interpret=_interpret(),
    )(x2, a.vals)


# ---------------------------------------------------------------------------
# BDIA SpMM ring: natural-layout X/Y, exactly-nnz value streaming.
#
# The block twin of the scalar ring SpMM (dia_kernels.py:852): X strips
# live in a per-component 4-bank VMEM ring and every X row crosses HBM
# exactly once.  Two structural wins over scalar DIA on a block matrix:
#
# - the value stream is exactly nnz (no block→scalar diagonal fill), and
#   the FMA loop runs D·bc pieces (20 for the dof-4 FEM stencil) instead
#   of the D·(2b−1)-with-overlap scalar expansion (35 pieces);
# - shifts are whole BLOCK rows, so component strips shift by whole
#   sublane rows with no lane work, and grid-aligned offsets (|d| = tm
#   or multiples of the grid row length when tm divides it) need no
#   concat at all.
#
# The component de-interleave lives in the DMA: component c's strip is
# the strided slab X[(i, c, :) for i in strip] of natural X viewed as
# (rows, bc, kp) — contiguous kp·itemsize runs (512 B at k=128 f32), so
# the "relayout" is free DMA addressing, not data movement.  Y writes
# the same way.  One-shot callers and chained block-Krylov users both
# stay in natural layout.
# ---------------------------------------------------------------------------

_MM_BANKS = 4


def _bdia_mm_geometry(a: "_bdia.BdiaMatrix", kp: int, db_in: int,
                      db_out: int):
    """Pick the strip length ``tm``.

    Preference order: (1) most *grid-aligned* offsets — a pair with
    ``d % tm == 0`` reads one whole ring bank and skips the two-slice
    concat (3 extra VPU passes per piece; probe_bspmm1 measured the
    kernel FMA-piece-bound, so concat count is the lever, VERDICT r3
    item 4b) — then (2) the largest feasible ``tm`` (fewer grid steps).
    """
    from cask_tpu.ops.pallas.dia_kernels import _SPMM_VMEM_BUDGET

    bc = a.blocksize[1]
    lo_b, hi_b = a.lo, a.hi
    dv = jnp.dtype(a.vals.dtype).itemsize
    best = None  # (aligned_count, tm)
    for tm in (1024, 512, 256, 128):
        if a.nb_pad % tm or lo_b > tm or hi_b > tm:
            continue
        br = a.blocksize[0]
        need = (bc * _MM_BANKS * tm * kp * db_in  # component strip rings
                + (2 * br + 1) * tm * kp * db_out  # out blocks + acc temp
                + 2 * tm * a.npairs * dv)          # value tiles
        if need > _SPMM_VMEM_BUDGET:
            continue
        aligned = sum(1 for (_, d) in a.pairs if d % tm == 0)
        if best is None or (aligned, tm) > best[:2]:
            best = (aligned, tm)
    return best[1] if best else None


def bdia_mm_ok(a: "_bdia.BdiaMatrix", k: int) -> bool:
    if a.npairs > _bdia._MAX_PAIRS:
        return False
    kp = max(_LANE, -(-k // _LANE) * _LANE)
    return _bdia_mm_geometry(a, kp, 4, 4) is not None


def _mm_vals_pack(a: "_bdia.BdiaMatrix", tm: int):
    """(br, T, tm, npairs) value tiles for the SpMM grid — a one-time
    device-side repack of the SpMV tiling, memoized on the instance
    (plan-once discipline).

    Never memoize under a trace: if ``a.vals`` is a tracer (spmm called
    inside jit on a fresh plan), caching it leaks the tracer out of the
    trace and poisons every later call (probe_bspmm1 hit exactly this —
    UnexpectedTracerError on the second jit)."""
    cache = getattr(a, "_mm_pack_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(a, "_mm_pack_cache", cache)
    if tm in cache:
        return cache[tm]
    br = a.blocksize[0]
    v = a.vals.reshape(br, a.n_tiles, a.npairs, a.ts * _LANE)
    v = jnp.moveaxis(v, 2, 3).reshape(br, a.nb_pad // tm, tm, a.npairs)
    if not isinstance(v, jax.core.Tracer):
        cache[tm] = v
    return v


def _bdia_spmm_ring_kernel(pairs, bc, tm, kp, T, interpret, x_hbm, v_ref,
                           o_ref, banks, sems):
    # grid (T, br): dim 0 = block-row tile, dim 1 = output component.
    # banks: (bc·4, tm, kp) — component c's ring occupies slots
    # [c·4, c·4+4); strip s of component c sits in slot c·4 + s mod 4.
    tt = pl.program_id(0)
    r = pl.program_id(1)

    def fill(s):
        # strip s for every component: DMA when it exists, zeros when it
        # is a pad strip (structural-zero discipline at the edges).
        # x_hbm is the 2-D (rows, bc·kp) natural view; component c's
        # strip is the 128-aligned lane slice [c·kp, (c+1)·kp) — legal
        # for every dtype tiling (the 3-D middle-dim slice crashed
        # Mosaic on bf16's (16, 128) tiles, probe_bspmm2)
        for slot in range(_MM_BANKS):
            @pl.when((jnp.mod(s, _MM_BANKS) == slot) & (s >= 0) & (s < T))
            def _(slot=slot):
                for c in range(bc):
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(s * tm, tm), pl.ds(c * kp, kp)],
                        banks.at[c * _MM_BANKS + slot],
                        sems.at[c * _MM_BANKS + slot],
                    ).start()

            @pl.when((jnp.mod(s, _MM_BANKS) == slot)
                     & ((s < 0) | (s >= T)))
            def _(slot=slot):
                for c in range(bc):
                    banks[c * _MM_BANKS + slot] = jnp.zeros(
                        (tm, kp), banks.dtype)

    def wait(s):
        for slot in range(_MM_BANKS):
            @pl.when((jnp.mod(s, _MM_BANKS) == slot) & (s >= 0) & (s < T))
            def _(slot=slot):
                for c in range(bc):
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(s * tm, tm), pl.ds(c * kp, kp)],
                        banks.at[c * _MM_BANKS + slot],
                        sems.at[c * _MM_BANKS + slot],
                    ).wait()

    @pl.when((tt == 0) & (r == 0))
    def _():
        for s in (-1, 0, 1, 2):
            fill(jnp.int32(s))
        for s in (-1, 0, 1):
            wait(jnp.int32(s))

    @pl.when((tt > 0) & (r == 0))
    def _():
        fill(tt + 2)
        wait(tt + 1)

    vt = v_ref[0, 0]  # (tm, npairs)
    acc_t = jnp.promote_types(o_ref.dtype, jnp.float32)
    acc = jnp.zeros((tm, kp), dtype=acc_t)
    for j, (c, d) in enumerate(pairs):
        q, r2 = divmod(d, tm)
        a_idx = c * _MM_BANKS + jnp.mod(tt + q, _MM_BANKS)
        hi_part = banks[pl.ds(a_idx, 1), pl.ds(r2, tm - r2), :][0]
        if r2 == 0:
            sh = hi_part
        else:
            b_idx = c * _MM_BANKS + jnp.mod(tt + q + 1, _MM_BANKS)
            lo_part = banks[pl.ds(b_idx, 1), pl.ds(0, r2), :][0]
            sh = jnp.concatenate([hi_part, lo_part], axis=0)
        acc = acc + vt[:, j : j + 1].astype(acc_t) * sh.astype(acc_t)
    # the out block spans all br components (a (tm, 1, kp) block is not
    # a legal Mosaic tile — last two dims must be (8k, 128m) or whole);
    # each rr sub-step writes its own middle slice, statically unrolled
    br = o_ref.shape[1]
    for rs in range(br):
        @pl.when(r == rs)
        def _(rs=rs):
            o_ref[:, rs, :] = acc.astype(o_ref.dtype)


def bdia_spmm_pallas_ring(a: "_bdia.BdiaMatrix", x, *, out_dtype=None):
    """``Y = A @ X`` with natural-layout (n, k) X and (m, k) Y.

    ``out_dtype=None`` promotes bf16 streams to an f32 result (the
    library accumulate policy); pass ``jnp.bfloat16`` for the fully-bf16
    chained pipeline.  Exactly-nnz value stream; X/Y cross HBM once.
    """
    br, bc = a.blocksize
    m, n = a.shape
    x = jnp.asarray(x)
    k = int(x.shape[1])
    kp = max(_LANE, -(-k // _LANE) * _LANE)
    if out_dtype is None:
        out_dtype = jnp.promote_types(a.vals.dtype, x.dtype)
        if jnp.bfloat16 in (a.vals.dtype, jnp.dtype(x.dtype)):
            out_dtype = jnp.promote_types(out_dtype, jnp.float32)
    db_in = jnp.dtype(x.dtype).itemsize
    tm = _bdia_mm_geometry(a, kp, db_in, jnp.dtype(out_dtype).itemsize)
    if tm is None:
        raise ValueError("no BDIA SpMM ring geometry fits VMEM "
                         "(check bdia_mm_ok first)")
    T = a.nb_pad // tm
    rows = T * tm  # padded block columns/rows

    if n == rows * bc and k == kp:
        x3 = x.reshape(rows, bc * kp)
    else:
        x3 = jnp.zeros((rows * bc, kp), x.dtype).at[:n, :k].set(x) \
            .reshape(rows, bc * kp)

    vmm = _mm_vals_pack(a, tm)
    kernel = functools.partial(_bdia_spmm_ring_kernel, a.pairs, bc, tm, kp,
                               T, _interpret())
    y3 = pl.pallas_call(
        kernel,
        grid=(T, br),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # natural X (rows, bc·kp)
            pl.BlockSpec((1, 1, tm, a.npairs), lambda tt, r: (r, tt, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, br, kp), lambda tt, r: (tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, br, kp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bc * _MM_BANKS, tm, kp), x.dtype),
            pltpu.SemaphoreType.DMA((bc * _MM_BANKS,)),
        ],
        interpret=_interpret(),
    )(x3, vmm)
    return y3.reshape(rows * br, kp)[:m, :k]
