"""MXU slab formulation of wide-k BDIA SpMM (VERDICT r4 item 3).

The ring SpMM kernel (:func:`bdia_kernels.bdia_spmm_pallas_ring`) is
VPU-FMA-bound at 0.163 useful roofline on the 1M-row fem dof-4 matrix at
k=128: D·bc = 20 shifted FMA passes per output tile, and both named
levers measured null/weak (PERF.md probe_bspmm2 — concat fusion 1.00x,
bf16 streams 1.32x).  This module changes the physics instead of the
schedule: the block band is **pre-sheared once** (plan time, on device)
into per-tile dense slabs, so each application is a dense
``(G·br × W) @ (W × k)`` matmul per tile — MXU work, not VPU passes.

Slab layout per tile ``t`` of ``G`` block rows (``W = 2·bc + G·bc·(1 +
n_far)`` columns)::

    [ halo 2·bc | near band G·bc | far segment G·bc per far offset ]

- *near* block offsets (|d| ≤ 1) shear into a dense band inside the
  ``G·bc`` core segment, with the two boundary blocks (d=−1 at the
  tile's first block row, d=+1 at its last) landing in the ``2·bc`` halo
  columns;
- each *far* offset d is a block diagonal inside its own ``G·bc``
  segment.  The shipped X-RING delivery
  (:func:`bdia_spmm_slab_ring`) holds the live super-windows in a
  revolving VMEM bank ring, so X crosses HBM ONCE and every far offset
  — arbitrary, no divisibility requirement — resolves per sub-tile to
  a static (bank, row offset) pair; the BlockSpec delivery
  (:func:`bdia_spmm_slab_padded`) keeps one pipelined fetch per
  segment and needs ``G·gg | d``.

Shipped state (fem dof-4, 1M rows, k=128, G=16 — PERF.md
probe_slabmm1c/e/f, probe_slabmm2/3): the slab stream inflates values
~10x (84 MB → 840 MB f32 / 420 MB bf16) but the FLOPs run on the MXU,
so the kernel is HBM-bound: **4.53 ms f32 (0.31 useful) and 2.53 ms
all-bf16 (0.56)** vs the VPU ring's 10.2 ms (0.14) — 2.3×/4.05×.  The
engineering ledger along the way: ~0.45 µs FIXED cost per grid step
(super-tile the grid), ~40 ns per MXU dot issue (ONE dot per sub-tile
via a sublane-concat window stack), VMEM lane padding to 128 (budget
with padded lanes).  MXU default precision truncates f32 operands to
bf16 (relerr ~5e-3); ``precision='highest'`` is exact-class (3.9e-7)
at ~10-20 % more time and is what the ``spmm`` auto route uses.

cask analog: the wide-k SpMM hardware path (SURVEY.md §2 R2/T3) — the
"matching-or-beating" target the ring's VPU bound could not reach.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cask_tpu.ops import bdia as _bdia

_LANE = 128


def _interpret() -> bool:
    from cask_tpu.utils.platform import on_tpu

    return not on_tpu()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BdiaSlabs:
    """Pre-sheared dense slab plan for the MXU SpMM path.

    ONE packed array: columns are ``[pre-halo bc | post-halo bc | near
    band G·bc | one G·bc far segment per far offset]``, so each sub-tile
    is a single ``(G·br, W)`` row-range dot against the stacked X window
    — MXU dot-issue count stays at one per sub-tile (probe_slabmm1e: the
    5-dots-per-sub-tile variant spent ~3.4 ms/apply in small-dot issue).
    Row ``t·G·br + g·br + r`` multiplies tile ``t``'s window into scalar
    output row ``(t·G + g)·br + r``.
    """

    slabs: jax.Array  # (ntiles · G·br, W)
    g: int = dataclasses.field(metadata=dict(static=True))
    blocksize: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    far_offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    nb_pad: int = dataclasses.field(metadata=dict(static=True))

    @property
    def ntiles(self) -> int:
        return self.nb_pad // self.g

    @property
    def gb_r(self) -> int:
        return self.g * self.blocksize[0]

    @property
    def gb_c(self) -> int:
        return self.g * self.blocksize[1]

    @property
    def width(self) -> int:
        """Total slab columns across segments."""
        return 2 * self.blocksize[1] + self.gb_c * (1 + len(self.far_offsets))

    @property
    def dtype(self):
        return self.slabs.dtype

    @property
    def gg_align(self) -> int:
        """Largest power-of-2 super-tile factor (≤ 32) dividing the tile
        count — the padded layout is aligned to it so ANY smaller
        power-of-2 ``gg`` can be chosen per call without re-padding."""
        gg = 1
        while gg < 32 and self.ntiles % (gg * 2) == 0 \
                and gg * 2 <= max(1, self.ntiles // 4):
            gg *= 2
        return gg

    @property
    def pad_tiles(self) -> int:
        """Zero tiles on each side of the padded X/Y layout (covers the
        farthest offset, rounded up to whole super-tiles)."""
        if not self.far_offsets:
            return 0
        m = max(abs(d) for d in self.far_offsets)
        ga = self.gg_align
        return -(-(-(-m // self.g)) // ga) * ga

    # -- padded chain layout ---------------------------------------------

    def to_padded(self, x) -> jax.Array:
        """Natural (n, k) → the zero-padded (rows_pad, kp) chain layout."""
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        k = x.shape[1]
        kp = max(_LANE, -(-k // _LANE) * _LANE)
        p = self.pad_tiles * self.gb_c
        body = self.ntiles * self.gb_c
        out = jnp.zeros((p + body + p, kp), x.dtype)
        return out.at[p : p + x.shape[0], :k].set(x)

    def from_padded(self, ypad, k: int) -> jax.Array:
        p = self.pad_tiles * self.gb_r
        m = self.shape[0]
        return ypad[p : p + m, :k]


def bdia_slab_ok(a: "_bdia.BdiaMatrix", g: int = 16) -> bool:
    """Can this plan take the slab MXU path?  Near offsets must be
    |d| ≤ 1 (one-block halo) and the tile geometry must clear the
    Mosaic sublane floors (≥ 8 rows per block view).  Far offsets may
    be ARBITRARY: the X-ring delivery resolves each to a static
    bank/offset pair (the BlockSpec variant additionally needs
    ``g·gg | d`` and validates it per call)."""
    br, bc = a.blocksize
    hb = max(8, bc)
    return not (a.nb_pad % g or (g * br) % 8 or hb % bc or (g * bc) % hb)


def bdia_slab_plan(a: "_bdia.BdiaMatrix", g: int = 16,
                   dtype=None) -> BdiaSlabs:
    """Shear the block band into per-tile dense slabs (device, one-time,
    jittable).  ``dtype=jnp.bfloat16`` halves the slab stream (the MXU
    truncates to bf16 at default precision anyway — only the *stored*
    precision changes)."""
    if not bdia_slab_ok(a, g):
        raise ValueError(f"plan not slab-eligible at g={g} "
                         f"(offsets {a.block_offsets})")
    br, bc = a.blocksize
    dt = jnp.dtype(dtype or a.vals.dtype)
    nb_pad, npairs = a.nb_pad, a.npairs
    ntiles = nb_pad // g
    offs = a.block_offsets
    near = [d for d in offs if abs(d) <= 1]
    far = tuple(sorted(d for d in offs if abs(d) > 1))
    # undo the (br, T, j, ts, 128) tiling → (br, i, j) natural values
    v_nat = a.vals.transpose(0, 1, 3, 4, 2).reshape(br, nb_pad, npairs)

    def blocks(d):
        dpos = offs.index(d)
        bd = v_nat[:, :, dpos * bc : (dpos + 1) * bc]  # (br, i, c)
        return jnp.moveaxis(bd, 0, 1).reshape(ntiles, g, br, bc).astype(dt)

    gb_c = g * bc
    halo = jnp.zeros((ntiles, g, br, 2 * bc), dt)
    core = jnp.zeros((ntiles, g, br, gb_c), dt)
    for d in near:
        B = blocks(d)
        eye = jnp.eye(g, g, d, dtype=dt)  # [g, h]: 1 at h = g + d
        core = core + jnp.einsum("tgrc,gh->tgrhc", B, eye).reshape(
            ntiles, g, br, gb_c)
        if d == -1:  # first block row's sub-diagonal block → halo pre
            halo = halo.at[:, 0, :, :bc].set(B[:, 0])
        if d == 1:  # last block row's super-diagonal block → halo post
            halo = halo.at[:, g - 1, :, bc:].set(B[:, g - 1])
    eye_g = jnp.eye(g, dtype=dt)
    segs = [halo, core]
    for d in far:  # block diagonal within its own shifted window
        segs.append(jnp.einsum("tgrc,gh->tgrhc", blocks(d), eye_g).reshape(
            ntiles, g, br, gb_c))
    slab = jnp.concatenate(segs, axis=-1)  # (ntiles, g, br, W)
    W = 2 * bc + gb_c * (1 + len(far))
    return BdiaSlabs(
        slabs=slab.reshape(ntiles * g * br, W),
        g=g, blocksize=(br, bc), shape=a.shape,
        far_offsets=far, nb_pad=nb_pad,
    )


def _slab_kernel(bc, hb, gb_r, gb_c, gg, nfar, p0s, nsup, acc_dtype,
                 precision, interpret, s_ref, *rest):
    # One grid step processes a SUPER-tile of gg G-tiles: the ~0.4 µs
    # fixed cost per Pallas grid step dominated the flat (ntiles,) grid
    # (probe_slabmm1c: 16448 steps ≈ 8 ms of pure step overhead).  Each
    # sub-tile is ONE (gb_r, W) dot against its stacked X window — the
    # stack is a sublane concat (cheap VPU copies), vs ~3.4 ms/apply of
    # MXU small-dot issue when the segments dot separately
    # (probe_slabmm1e).  rest = (xpre, xpost, xcore, *xfar, o_ref); the
    # pre/post halo views are hb-row blocks (Mosaic needs >= 8 sublanes
    # per block) holding the bc boundary rows at their tail/head;
    # interior sub-tile halos are sliced straight from the core window.
    xpre_ref, xpost_ref, xc_ref = rest[:3]
    xf_refs = rest[3 : 3 + nfar]
    o_ref = rest[3 + nfar]
    s = pl.program_id(0)
    in_body = (s >= p0s) & (s < p0s + nsup)

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
        precision=precision,
    )

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(in_body)
    def _():
        for j in range(gg):
            r0, c0 = j * gb_r, j * gb_c
            pre = (xpre_ref[hb - bc :, :] if j == 0
                   else xc_ref[c0 - bc : c0, :])
            post = (xpost_ref[:bc, :] if j == gg - 1
                    else xc_ref[c0 + gb_c : c0 + gb_c + bc, :])
            parts = [pre, post, xc_ref[c0 : c0 + gb_c]]
            parts += [xf_refs[fi][c0 : c0 + gb_c] for fi in range(nfar)]
            w = jnp.concatenate(parts, axis=0)  # (W, kp)
            acc = dot(s_ref[r0 : r0 + gb_r], w)
            o_ref[r0 : r0 + gb_r] = acc.astype(o_ref.dtype)


_VMEM_STEP_BUDGET = 6 * 1024 * 1024  # per-step operand bytes (x2 buffered)


def _pick_gg(sl: BdiaSlabs, kp: int, db_x: int, db_out: int,
             far_div: bool = False) -> int:
    """Largest feasible power-of-2 super-tile factor: must divide the
    layout alignment and keep the double-buffered per-step operands
    inside VMEM.  ``far_div``: additionally require whole-super-tile
    far shifts (the BlockSpec delivery; the X-ring takes any offset).

    VMEM blocks pad their LANE dimension to 128 — a (rows, 64) slab
    block occupies (rows, 128) of VMEM (probe_slabmm1d hit the 16 MB
    scoped limit at exactly 2x the unpadded estimate)."""
    nfar = len(sl.far_offsets)
    db_s = jnp.dtype(sl.dtype).itemsize

    def lanes(w):
        return -(-w // _LANE) * _LANE

    gg = sl.gg_align
    while gg > 1:
        step_bytes = (
            gg * sl.gb_r * lanes(sl.width) * db_s
            + (1 + nfar) * gg * sl.gb_c * kp * db_x
            + gg * sl.gb_r * kp * db_out)
        if step_bytes <= _VMEM_STEP_BUDGET and (
                not far_div
                or all(d % (sl.g * gg) == 0 for d in sl.far_offsets)):
            break
        gg //= 2
    return gg


def bdia_spmm_slab_padded(sl: BdiaSlabs, xpad, *,
                          gg: Optional[int] = None,
                          precision: Optional[str] = None,
                          out_dtype=None):
    """``Ypad = A @ Xpad`` in the zero-padded chain layout (square blocks:
    output layout == input layout, so solver iterations chain with no
    pad/slice copies — the measurement discipline of SURVEY §8.2).

    ``gg``: G-tiles per grid step (default: largest feasible power of 2).
    """
    br, bc = sl.blocksize
    if br != bc:
        raise ValueError("padded slab chain layout needs square blocks")
    g, gb_r, gb_c = sl.g, sl.gb_r, sl.gb_c
    ntiles, p0t = sl.ntiles, sl.pad_tiles
    nfar = len(sl.far_offsets)
    total = p0t + ntiles + p0t
    kp = int(xpad.shape[1])
    if kp % _LANE:
        raise ValueError(f"padded layout needs 128-multiple lanes, got {kp}")
    if xpad.shape[0] != total * gb_c:
        raise ValueError(f"xpad rows {xpad.shape[0]} != {total * gb_c}")
    if out_dtype is None:
        out_dtype = jnp.promote_types(sl.dtype, xpad.dtype)
        if jnp.bfloat16 in (jnp.dtype(sl.dtype), jnp.dtype(xpad.dtype)):
            out_dtype = jnp.promote_types(out_dtype, jnp.float32)
    if gg is None:
        gg = _pick_gg(sl, kp, jnp.dtype(xpad.dtype).itemsize,
                      jnp.dtype(out_dtype).itemsize, far_div=True)
    if sl.gg_align % gg or p0t % gg or ntiles % gg:
        raise ValueError(f"gg={gg} must divide the layout alignment "
                         f"(gg_align={sl.gg_align}, pad={p0t})")
    for d in sl.far_offsets:
        if d % (g * gg):
            raise ValueError(f"far offset {d} not a multiple of g*gg="
                             f"{g * gg}; pass a smaller gg")
    p0s, nsup = p0t // gg, ntiles // gg
    tot_s = p0s + nsup + p0s
    # halo X views travel as hb-row blocks (Mosaic floor: >= 8 sublanes
    # per block); the bc boundary rows sit at a static offset inside
    hb = max(8, bc)
    if hb % bc or gb_c % hb:
        raise ValueError(f"halo block geometry needs bc | 8 and "
                         f"{hb} | gb_c (bc={bc}, g={g})")
    nhb = total * gb_c // hb  # hb-row blocks in the padded frame
    sch = gg * gb_c // hb  # hb-blocks per super-tile

    def _slab_map(s):
        return (jnp.clip(s - p0s, 0, nsup - 1), 0)

    def _far_map(sh):
        def m(s):
            return (jnp.clip(s + sh, 0, tot_s - 1), 0)
        return m

    in_specs = [
        pl.BlockSpec((gg * gb_r, sl.width), _slab_map,
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [
        pl.BlockSpec((hb, kp), lambda s: (jnp.maximum(s * sch - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, kp),
                     lambda s: (jnp.minimum((s + 1) * sch, nhb - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gg * gb_c, kp), lambda s: (s, 0),
                     memory_space=pltpu.VMEM),
    ]
    for d in sl.far_offsets:
        in_specs.append(pl.BlockSpec((gg * gb_c, kp), _far_map(d // (g * gg)),
                                     memory_space=pltpu.VMEM))
    acc_dtype = (jnp.float64 if jnp.dtype(out_dtype) == jnp.float64
                 else jnp.float32)
    kernel = functools.partial(_slab_kernel, bc, hb, gb_r, gb_c, gg, nfar,
                               p0s, nsup, acc_dtype, precision, _interpret())
    return pl.pallas_call(
        kernel,
        grid=(tot_s,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gg * gb_r, kp), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total * gb_r, kp), out_dtype),
        interpret=_interpret(),
    )(sl.slabs, xpad, xpad, xpad, *([xpad] * nfar))


def bdia_spmm_pallas_slab(sl: BdiaSlabs, x, *,
                          precision: Optional[str] = None,
                          out_dtype=None):
    """``Y = A @ X`` (natural layouts) through the slab MXU kernel —
    the X-ring delivery (bit-identical to the BlockSpec version and
    1.3x faster measured, probe_slabmm2).  One-shot callers pay the
    pad/slice copies; chained solvers should use
    :meth:`BdiaSlabs.to_padded` + :func:`bdia_spmm_slab_ring_padded`."""
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    k = int(x.shape[1])
    kp = max(_LANE, -(-k // _LANE) * _LANE)
    body = sl.ntiles * sl.gb_c
    if x.shape[0] == body and k == kp:
        xb = x  # zero-copy: rows already fill the natural body frame
    else:
        xb = jnp.zeros((body, kp), x.dtype).at[: x.shape[0], :k].set(x)
    yb = bdia_spmm_slab_ring(sl, xb, precision=precision,
                             out_dtype=out_dtype)
    y = yb[: sl.shape[0], :k]
    return y[:, 0] if squeeze else y


# ---------------------------------------------------------------------------
# X-ring variant: every X window crosses HBM ONCE
# ---------------------------------------------------------------------------


def _slab_ring_kernel(bc, gb_r, gb_c, gg, far_blocks, nb, smin, smax, p0s,
                      nsup, tot_s, acc_dtype, precision, interpret,
                      s_ref, x_hbm, o_ref, banks, sems):
    # The BlockSpec version fetches each window once per consuming
    # segment (core + every far shift = (1+nfar)x X traffic) and needs
    # g·gg | d.  Here a revolving VMEM ring holds the last/next few
    # super-windows and the far segments read the SAME banks the core
    # already fetched — X crosses HBM exactly once, and an ARBITRARY far
    # offset d resolves to a static (bank shift, row offset) pair per
    # sub-tile (straddles concat two banks, the ring-SpMM two-slice
    # idiom).  Bank w%nb holds window w; at step s the live windows are
    # s+smin .. s+smax (+1 lookahead being filled).
    wg = gg * gb_c
    s = pl.program_id(0)

    def fill(w):
        for slot in range(nb):
            @pl.when((jnp.mod(w, nb) == slot) & (w >= 0) & (w < tot_s))
            def _(slot=slot):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(w * wg, wg), :],
                    banks.at[slot], sems.at[slot]).start()

            @pl.when((jnp.mod(w, nb) == slot) & ((w < 0) | (w >= tot_s)))
            def _(slot=slot):
                banks[slot] = jnp.zeros(banks.shape[1:], banks.dtype)

    def wait(w):
        for slot in range(nb):
            @pl.when((jnp.mod(w, nb) == slot) & (w >= 0) & (w < tot_s))
            def _(slot=slot):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(w * wg, wg), :],
                    banks.at[slot], sems.at[slot]).wait()

    @pl.when(s == 0)
    def _():
        for w0 in range(smin, smax + 2):
            fill(jnp.int32(w0))
        for w0 in range(smin, smax + 1):
            wait(jnp.int32(w0))

    @pl.when(s > 0)
    def _():
        fill(s + smax + 1)
        wait(s + smax)

    in_body = (s >= p0s) & (s < p0s + nsup)

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
        precision=precision,
    )

    @pl.when(jnp.logical_not(in_body))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(in_body)
    def _():
        def bank(sh):
            idx = jnp.mod(s + sh, nb)
            return banks[pl.ds(idx, 1)][0]

        core_b = bank(0)
        for j in range(gg):
            r0, c0 = j * gb_r, j * gb_c
            pre = bank(-1)[wg - bc :] if j == 0 else core_b[c0 - bc : c0]
            post = (bank(1)[:bc] if j == gg - 1
                    else core_b[c0 + gb_c : c0 + gb_c + bc])
            parts = [pre, post, core_b[c0 : c0 + gb_c]]
            for d in far_blocks:
                # window start relative to this super's frame — all
                # static, so each far read is a fixed bank/offset pair
                q0, o0 = divmod(c0 + d * bc, wg)
                if o0 + gb_c <= wg:
                    parts.append(bank(q0)[o0 : o0 + gb_c])
                else:
                    parts.append(jnp.concatenate(
                        [bank(q0)[o0:], bank(q0 + 1)[: o0 + gb_c - wg]],
                        axis=0))
            w = jnp.concatenate(parts, axis=0)
            acc = dot(s_ref[r0 : r0 + gb_r], w)
            o_ref[r0 : r0 + gb_r] = acc.astype(o_ref.dtype)


def bdia_spmm_slab_ring_padded(sl: BdiaSlabs, xpad, *,
                               gg: Optional[int] = None,
                               precision: Optional[str] = None,
                               out_dtype=None):
    """``Ypad = A @ Xpad`` like :func:`bdia_spmm_slab_padded`, but X
    crosses HBM ONCE via a revolving VMEM window ring (the far segments
    re-read banks the core stream already fetched).  Traffic floor drops
    from ``slab + (1+nfar)·X + Y`` to ``slab + X + Y``."""
    return _slab_ring_call(sl, xpad, True, gg, precision, out_dtype)


def bdia_spmm_slab_ring(sl: BdiaSlabs, xb, *,
                        gg: Optional[int] = None,
                        precision: Optional[str] = None,
                        out_dtype=None):
    """NATURAL-frame X-ring slab SpMM: ``xb``/``y`` are the body rows
    ``(ntiles·G·bc, kp)`` — no far-offset padding frame at all (the
    ring's bank fill substitutes zeros for out-of-range windows, so the
    padded layout's embed copy disappears).  Zero-copy for callers whose
    rows already fill the body (``nb_pad == nbr``, or the distributed
    align contract)."""
    return _slab_ring_call(sl, xb, False, gg, precision, out_dtype)


def _slab_ring_call(sl: BdiaSlabs, xpad, padded, gg, precision, out_dtype):
    br, bc = sl.blocksize
    if br != bc:
        raise ValueError("padded slab chain layout needs square blocks")
    g, gb_r, gb_c = sl.g, sl.gb_r, sl.gb_c
    ntiles = sl.ntiles
    p0t = sl.pad_tiles if padded else 0
    nfar = len(sl.far_offsets)
    total = p0t + ntiles + p0t
    kp = int(xpad.shape[1])
    if kp % _LANE:
        raise ValueError(f"padded layout needs 128-multiple lanes, got {kp}")
    if xpad.shape[0] != total * gb_c:
        raise ValueError(f"xpad rows {xpad.shape[0]} != {total * gb_c}")
    if out_dtype is None:
        out_dtype = jnp.promote_types(sl.dtype, xpad.dtype)
        if jnp.bfloat16 in (jnp.dtype(sl.dtype), jnp.dtype(xpad.dtype)):
            out_dtype = jnp.promote_types(out_dtype, jnp.float32)
    if gg is None:
        gg = _pick_gg(sl, kp, jnp.dtype(xpad.dtype).itemsize,
                      jnp.dtype(out_dtype).itemsize)
    if sl.gg_align % gg or p0t % gg or ntiles % gg:
        raise ValueError(f"gg={gg} must divide the layout alignment "
                         f"(gg_align={sl.gg_align}, pad={p0t})")
    p0s, nsup = p0t // gg, ntiles // gg
    tot_s = p0s + nsup + p0s
    wg = gg * gb_c
    # live bank span: each far offset resolves to a static (bank shift,
    # row offset) per sub-tile — NO g·gg | d requirement (straddling
    # windows concat two banks); endpoints j=0 / j=gg-1 bound the span
    smin, smax = -1, 1
    for d in sl.far_offsets:
        for j in (0, gg - 1):
            q0, o0 = divmod(j * gb_c + d * bc, wg)
            smin = min(smin, q0)
            smax = max(smax, q0 + (1 if o0 + gb_c > wg else 0))
    nb = smax - smin + 3  # live span + lookahead + safety

    def _slab_map(s):
        return (jnp.clip(s - p0s, 0, nsup - 1), 0)

    acc_dtype = (jnp.float64 if jnp.dtype(out_dtype) == jnp.float64
                 else jnp.float32)
    kernel = functools.partial(
        _slab_ring_kernel, bc, gb_r, gb_c, gg, sl.far_offsets, nb, smin,
        smax, p0s, nsup, tot_s, acc_dtype, precision, _interpret())
    return pl.pallas_call(
        kernel,
        grid=(tot_s,),
        in_specs=[
            pl.BlockSpec((gg * gb_r, sl.width), _slab_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec((gg * gb_r, kp), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total * gb_r, kp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nb, wg, kp), xpad.dtype),
            pltpu.SemaphoreType.DMA((nb,)),
        ],
        interpret=_interpret(),
    )(sl.slabs, xpad)
