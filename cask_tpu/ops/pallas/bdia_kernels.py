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
