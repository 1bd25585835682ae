"""Multi-chip SpMV/SpMM execution over a device mesh (BASELINE T7/T8).

The comm backend is XLA collectives compiled onto ICI/DCN — the
TPU-native equivalent of a NCCL/MPI layer (SURVEY.md §5) — so the work
here is partitioning, halo minimization, and *overlap*: every kernel is
written so the bulk of the local compute has no data dependence on the
collective's result, letting the XLA scheduler run the `ppermute` /
`all_gather` DMA concurrently with the interior FMAs:

    y_interior = f(local values, local x)      # big, collective-free
    halo       = ppermute(edge slices)         # in flight meanwhile
    y          = y_interior + fixup(halo)      # tiny edge correction

Verified overlap is a bench-time obligation (SURVEY.md §7 hard-part (d));
the structure here is what makes it *possible*.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cask_tpu.parallel.partition import (
    BdiaPartition, CooPartition, DiaPartition, PohPartition)

AXIS = "shards"


def row_mesh(nshards: Optional[int] = None, *, devices=None) -> Mesh:
    """1-D mesh over the row-partition axis.

    Axis type Auto: solvers run unmodified on sharded vectors (dots
    become psums via GSPMD propagation) without explicit out_sharding
    annotations at every contraction."""
    devices = devices if devices is not None else jax.devices()
    nshards = nshards or len(devices)
    return jax.make_mesh(
        (nshards,), (AXIS,), devices=devices[:nshards],
        axis_types=(jax.sharding.AxisType.Auto,),
    )


# ---------------------------------------------------------------------------
# per-shard compute bodies (run inside shard_map; leading shard axis == 1)
# ---------------------------------------------------------------------------


def _sq(x):
    return x.reshape(x.shape[1:])


def _coo_local(plan: CooPartition, x_loc, axis: str):
    """Interior/exterior split: interior is independent of the gather."""
    int_data, int_row, int_col = _sq(plan.int_data), _sq(plan.int_row), _sq(plan.int_col)
    ext_data, ext_row, ext_col = _sq(plan.ext_data), _sq(plan.ext_row), _sq(plan.ext_col)
    xg = jax.lax.all_gather(x_loc, axis, tiled=True)  # (P*mloc,) — async vs interior
    y = jax.ops.segment_sum(int_data * x_loc[int_col], int_row, num_segments=plan.mloc)
    y = y + jax.ops.segment_sum(ext_data * xg[ext_col], ext_row, num_segments=plan.mloc)
    return y


def _coo_local_mm(plan: CooPartition, x_loc, axis: str):
    int_data, int_row, int_col = _sq(plan.int_data), _sq(plan.int_row), _sq(plan.int_col)
    ext_data, ext_row, ext_col = _sq(plan.ext_data), _sq(plan.ext_row), _sq(plan.ext_col)
    xg = jax.lax.all_gather(x_loc, axis, tiled=True)  # (P*mloc, k)
    y = jax.ops.segment_sum(int_data[:, None] * x_loc[int_col], int_row, num_segments=plan.mloc)
    y = y + jax.ops.segment_sum(ext_data[:, None] * xg[ext_col], ext_row, num_segments=plan.mloc)
    return y


def _poh_from_arrays(plan, pfx, n, x_dim):
    """Reconstruct this shard's PohMatrix from the stacked (squeezed) arrays."""
    from cask_tpu.ops.pallas.poh_kernels import PohMatrix

    g = lambda f: _sq(getattr(plan, f"{pfx}_{f}"))
    return PohMatrix(
        vals=g("vals"), cloc=g("cloc"), rloc=g("rloc"), rloc_t=g("rloc_t"),
        wlo=g("wlo"), whi=g("whi"), panel=g("panel"),
        first=g("first"), last=g("last"),
        shape=(plan.mloc, n), row_panel=plan.row_panel,
        col_window=plan.col_window,
    )


def _poh_local(plan, x_loc, axis: str, precision: str = "split"):
    """Interior POH kernel runs collective-free; exterior consumes the
    all-gathered x — same overlap structure as the COO/DIA paths, but
    both halves on the one-hot MXU kernel."""
    xg = jax.lax.all_gather(x_loc, axis, tiled=True)  # (P*mloc,)
    int_m = _poh_from_arrays(plan, "int", plan.mloc, 1)
    ext_m = _poh_from_arrays(plan, "ext", plan.nshards * plan.mloc, 1)
    y = int_m.spmv(x_loc, precision=precision)
    return y + ext_m.spmv(xg, precision=precision)


def _poh_local_mm(plan, x_loc, axis: str, precision: str = "split"):
    xg = jax.lax.all_gather(x_loc, axis, tiled=True)  # (P*mloc, k)
    int_m = _poh_from_arrays(plan, "int", plan.mloc, 2)
    ext_m = _poh_from_arrays(plan, "ext", plan.nshards * plan.mloc, 2)
    y = int_m.spmm(x_loc, precision=precision)
    return y + ext_m.spmm(xg, precision=precision)


def _ring_halo(x_loc, lo: int, hi: int, axis: str, nshards: int):
    """Exchange edge slices with ring neighbors.

    left[j]  = x of global row (base - lo + j)   (from shard p-1)
    right[j] = x of global row (base + mloc + j) (from shard p+1)

    Wraparound shards receive garbage, but every matrix value referring
    past the global edge is a structural zero, so the product vanishes.
    """
    fwd = [(p, (p + 1) % nshards) for p in range(nshards)]
    bwd = [(p, (p - 1) % nshards) for p in range(nshards)]
    left = jax.lax.ppermute(x_loc[-lo:] if lo else x_loc[:0], axis, fwd) if lo else None
    right = jax.lax.ppermute(x_loc[:hi] if hi else x_loc[:0], axis, bwd) if hi else None
    return left, right


def _dia_local(plan: DiaPartition, x_loc, axis: str, interior: str = "xla",
               overlap: bool = True):
    vals = _sq(plan.vals)  # (D, mloc)
    mloc = plan.mloc
    lo, hi = plan.halo_lo, plan.halo_hi

    # 1. start the ring exchange (and the remainder's all_gather)
    left, right = _ring_halo(x_loc, lo, hi, axis, plan.nshards)
    y_rem = _coo_local(plan.remainder, x_loc, axis) if plan.remainder is not None else None

    if not overlap:
        # A/B instrumentation (SURVEY §7 hard-part (d)): force the
        # interior to wait for the collectives — the measured difference
        # vs overlap=True is the comm time actually hidden.
        deps = tuple(v for v in (x_loc, left, right) if v is not None)
        out = jax.lax.optimization_barrier(deps)
        x_loc = out[0]
        it = iter(out[1:])
        left = next(it) if left is not None else None
        right = next(it) if right is not None else None

    # 2. interior: shifted FMAs against zero-padded local x — no halo dep
    if interior == "pallas":
        # per-shard Pallas solver-layout kernel (requires 8192-aligned
        # mloc, see partition_dia(align=...))
        from cask_tpu.ops import dia as _dia
        from cask_tpu.ops.pallas import dia_kernels as dk

        local = _dia.DiaMatrix(
            vals=vals,
            rem_data=jnp.zeros((0,), vals.dtype),
            rem_row=jnp.zeros((0,), jnp.int32),
            rem_col=jnp.zeros((0,), jnp.int32),
            vals_t=None,
            offsets=plan.offsets,
            shape=(mloc, mloc),
        )
        xL = dk.to_layout(local, x_loc)
        y = dk.from_layout(local, dk.dia_spmv_pallas_layout(local, xL))
        y = y.astype(jnp.result_type(vals.dtype, x_loc.dtype))
    else:
        xp = jnp.zeros(lo + mloc + hi, x_loc.dtype).at[lo : lo + mloc].set(x_loc)
        y = jnp.zeros(mloc, dtype=jnp.result_type(vals.dtype, x_loc.dtype))
        for d, off in enumerate(plan.offsets):
            y = y + vals[d] * jax.lax.dynamic_slice(xp, (lo + off,), (mloc,))

    # 3. tiny edge fix-ups once the halo lands
    for d, off in enumerate(plan.offsets):
        if off < 0 and lo:
            w = -off
            y = y.at[:w].add(vals[d, :w] * jax.lax.dynamic_slice(left, (lo + off,), (w,)))
        elif off > 0 and hi:
            w = off
            y = y.at[mloc - w :].add(vals[d, mloc - w :] * right[:w])
    if y_rem is not None:
        y = y + y_rem
    return y


def _dia_local_mm(plan: DiaPartition, x_loc, axis: str):
    vals = _sq(plan.vals)
    mloc = plan.mloc
    lo, hi = plan.halo_lo, plan.halo_hi
    k = x_loc.shape[1]

    left, right = _ring_halo(x_loc, lo, hi, axis, plan.nshards)
    y_rem = _coo_local_mm(plan.remainder, x_loc, axis) if plan.remainder is not None else None

    xp = jnp.zeros((lo + mloc + hi, k), x_loc.dtype).at[lo : lo + mloc].set(x_loc)
    y = jnp.zeros((mloc, k), dtype=jnp.result_type(vals.dtype, x_loc.dtype))
    for d, off in enumerate(plan.offsets):
        xs = jax.lax.dynamic_slice(xp, (lo + off, 0), (mloc, k))
        y = y + vals[d][:, None] * xs

    for d, off in enumerate(plan.offsets):
        if off < 0 and lo:
            w = -off
            y = y.at[:w].add(
                vals[d, :w, None] * jax.lax.dynamic_slice(left, (lo + off, 0), (w, k))
            )
        elif off > 0 and hi:
            w = off
            y = y.at[mloc - w :].add(vals[d, mloc - w :, None] * right[:w])
    if y_rem is not None:
        y = y + y_rem
    return y


def _bdia_shard_matrix(plan: BdiaPartition):
    """This shard's local (mloc × mloc) BdiaMatrix view (no remainder —
    that rides the embedded CooPartition)."""
    from cask_tpu.ops.bdia import BdiaMatrix

    vals = _sq(plan.vals)  # (br, T, npairs, TS, 128)
    return BdiaMatrix(
        vals=vals,
        rem_data=jnp.zeros((0,), vals.dtype),
        rem_row=jnp.zeros((0,), jnp.int32),
        rem_col=jnp.zeros((0,), jnp.int32),
        block_offsets=plan.block_offsets,
        shape=(plan.mloc, plan.mloc),
        blocksize=plan.blocksize,
        ts=plan.ts,
    )


def _bdia_shard_meta(plan: BdiaPartition):
    """Metadata-only shard BdiaMatrix (``vals`` is a ShapeDtypeStruct):
    lets interior-eligibility predicates run without touching device
    arrays or tracers."""
    import numpy as np

    from cask_tpu.ops.bdia import BdiaMatrix

    _, br, T, npairs, TS, L = plan.vals.shape
    # empty-remainder dtypes match bdia_plan's (rem_row/rem_col are
    # integer index arrays — ADVICE r4: a float32 stand-in would fail
    # subtly if a consumer ever indexed with them)
    zf = np.zeros((0,), np.float32)
    zi = np.zeros((0,), np.int32)
    return BdiaMatrix(
        vals=jax.ShapeDtypeStruct((br, T, npairs, TS, L), plan.vals.dtype),
        rem_data=zf, rem_row=zi, rem_col=zi,
        block_offsets=plan.block_offsets,
        shape=(plan.mloc, plan.mloc),
        blocksize=plan.blocksize,
        ts=plan.ts,
    )


def _bdia_edge_fixups(plan: BdiaPartition, left, right, *, k: int = 0):
    """Component-plane halo corrections (head, tail) as natural-order
    deltas of the first lo_b·br / last hi_b·br scalar rows.

    ``head_vals``/``tail_vals`` are zero wherever the term was already
    covered by the zero-padded interior, so each pair's window FMA adds
    exactly the out-of-shard contributions (same discipline as
    ``_dia_local``'s per-offset edge adds, lifted to block components).
    """
    br, bc = plan.blocksize
    lo_b, hi_b = plan.halo_lo_b, plan.halo_hi_b
    hv, tv = _sq(plan.head_vals), _sq(plan.tail_vals)  # (br, npairs, w)
    head_nat = tail_nat = None
    if lo_b and left is not None:
        acc_t = jnp.result_type(hv.dtype, left.dtype)
        # left: (lo_b*bc,) or (lo_b*bc, k) natural order → (bc, lo_b[, k])
        lp = left.reshape((lo_b, bc) + left.shape[1:])
        lp = jnp.moveaxis(lp, 1, 0)
        pad = [(0, 0)] * lp.ndim
        pad[1] = (0, lo_b)
        lpad = jnp.pad(lp, pad)  # reads past the valid span hit zeroed vals
        head = jnp.zeros((br, lo_b) + left.shape[1:], dtype=acc_t)
        for j, (c, d) in enumerate(plan.pairs):
            if d >= 0:
                continue
            start = (c, lo_b + d) + (0,) * (lp.ndim - 2)
            xs = jax.lax.dynamic_slice(
                lpad, start, (1, lo_b) + lpad.shape[2:])[0]
            w = hv[:, j, :, None] if k else hv[:, j, :]
            head = head + w * xs
        head_nat = jnp.moveaxis(head, 0, 1).reshape((lo_b * br,) + left.shape[1:])
    if hi_b and right is not None:
        acc_t = jnp.result_type(tv.dtype, right.dtype)
        rp = right.reshape((hi_b, bc) + right.shape[1:])
        rp = jnp.moveaxis(rp, 1, 0)
        pad = [(0, 0)] * rp.ndim
        pad[1] = (hi_b, 0)
        rpad = jnp.pad(rp, pad)
        tail = jnp.zeros((br, hi_b) + right.shape[1:], dtype=acc_t)
        for j, (c, d) in enumerate(plan.pairs):
            if d <= 0:
                continue
            start = (c, d) + (0,) * (rp.ndim - 2)
            xs = jax.lax.dynamic_slice(
                rpad, start, (1, hi_b) + rpad.shape[2:])[0]
            w = tv[:, j, :, None] if k else tv[:, j, :]
            tail = tail + w * xs
        tail_nat = jnp.moveaxis(tail, 0, 1).reshape((hi_b * br,) + right.shape[1:])
    return head_nat, tail_nat


def _bdia_local(plan: BdiaPartition, x_loc, axis: str, interior: str = "xla",
                overlap: bool = True):
    """Per-shard BDIA SpMV: ring halo + collective-free interior + edge
    fixups — the flagship block kernel's config-5 path (VERDICT r2 #1)."""
    br, bc = plan.blocksize
    lo, hi = plan.halo_lo_b * bc, plan.halo_hi_b * bc

    # 1. collectives depart first
    left, right = _ring_halo(x_loc, lo, hi, axis, plan.nshards)
    y_rem = _coo_local(plan.remainder, x_loc, axis) if plan.remainder is not None else None

    if not overlap:
        deps = tuple(v for v in (x_loc, left, right) if v is not None)
        out = jax.lax.optimization_barrier(deps)
        x_loc = out[0]
        it = iter(out[1:])
        left = next(it) if left is not None else None
        right = next(it) if right is not None else None

    # 2. interior on zero-padded local x (structural-zero discipline:
    #    pairs reaching past the shard read pad zeros — no halo dep)
    local = _bdia_shard_matrix(plan)
    if interior == "fused":
        # the flagship one-shot kernel directly on the shard's
        # natural-order x — in-kernel component relayout, zero XLA
        # wrapper passes (VERDICT r3 item 2: the resident-path wrappers
        # below cost the 1.47x penalty the fused kernel was built to
        # kill).  Zero-copy when the shard is slab-aligned
        # (partition_bdia(align_b=16384)); otherwise one x pad copy.
        from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas_fused

        y = bdia_spmv_pallas_fused(local, x_loc)
    elif interior == "pallas":
        from cask_tpu.ops.pallas.bdia_kernels import bdia_spmv_pallas_resident

        y = local.from_resident(
            bdia_spmv_pallas_resident(local, local.to_resident(x_loc)))
    else:
        y = local._spmv_xla(x_loc)

    # 3. edge fixups once the halo lands
    head, tail = _bdia_edge_fixups(plan, left, right)
    if head is not None:
        y = y.at[: head.shape[0]].add(head.astype(y.dtype))
    if tail is not None:
        y = y.at[plan.mloc - tail.shape[0] :].add(tail.astype(y.dtype))
    if y_rem is not None:
        y = y + y_rem
    return y


def _bdia_shard_slab_geom(plan: BdiaPartition, g: int):
    """Static BdiaSlabs geometry of one shard (vals supplied per shard)."""
    from cask_tpu.ops.pallas.bdia_slab import BdiaSlabs

    _, br, T, npairs, TS, L = plan.vals.shape
    return dict(
        g=g, blocksize=plan.blocksize, shape=(plan.mloc, plan.mloc),
        far_offsets=tuple(sorted(d for d in plan.block_offsets
                                 if abs(d) > 1)),
        nb_pad=T * TS * L,
    ), BdiaSlabs


def _bdia_local_mm_slab(plan: BdiaPartition, slabs_loc, x_loc, axis: str,
                        geom=None):
    """Wide-k shard SpMM through the MXU slab X-ring kernel (exact
    precision) — same halo/fixup/remainder discipline as
    :func:`_bdia_local_mm`, with the interior's zero-padded frame being
    the slab kernel's own padded chain layout."""
    from cask_tpu.ops.pallas.bdia_slab import bdia_spmm_slab_ring

    br, bc = plan.blocksize
    lo, hi = plan.halo_lo_b * bc, plan.halo_hi_b * bc
    k = x_loc.shape[1]

    left, right = _ring_halo(x_loc, lo, hi, axis, plan.nshards)
    y_rem = _coo_local_mm(plan.remainder, x_loc, axis) \
        if plan.remainder is not None else None

    kwargs, BdiaSlabs = geom
    sl = BdiaSlabs(slabs=_sq(slabs_loc), **kwargs)
    # natural body frame: zero-copy when the shard fills it (the align
    # contract); otherwise one tail-pad copy — never the full far-offset
    # padding embed (the ring substitutes zeros for out-of-range windows)
    body = sl.ntiles * sl.gb_c
    kp = max(128, -(-k // 128) * 128)
    if x_loc.shape[0] == body and k == kp:
        xb = x_loc
    else:
        xb = jnp.zeros((body, kp), x_loc.dtype).at[: x_loc.shape[0], :k].set(
            x_loc)
    y = bdia_spmm_slab_ring(sl, xb, precision="highest")[: plan.mloc, :k]

    head, tail = _bdia_edge_fixups(plan, left, right, k=k)
    if head is not None:
        y = y.at[: head.shape[0]].add(head.astype(y.dtype))
    if tail is not None:
        y = y.at[plan.mloc - tail.shape[0] :].add(tail.astype(y.dtype))
    if y_rem is not None:
        y = y + y_rem.astype(y.dtype)
    return y


def _bdia_local_mm(plan: BdiaPartition, x_loc, axis: str):
    br, bc = plan.blocksize
    lo, hi = plan.halo_lo_b * bc, plan.halo_hi_b * bc
    k = x_loc.shape[1]

    left, right = _ring_halo(x_loc, lo, hi, axis, plan.nshards)
    y_rem = _coo_local_mm(plan.remainder, x_loc, axis) if plan.remainder is not None else None

    # interior: component-split shifted slices, one (c, d) pair at a time
    local = _bdia_shard_matrix(plan)
    nb = local.nbr
    lo_b, hi_b = plan.halo_lo_b, plan.halo_hi_b
    xc = x_loc.reshape(nb, bc, k)
    xp = jnp.zeros((bc, lo_b + nb + hi_b, k), x_loc.dtype)
    xp = xp.at[:, lo_b : lo_b + nb].set(jnp.moveaxis(xc, 1, 0))
    acc_t = jnp.result_type(local.vals.dtype, x_loc.dtype)
    vflat = local.vals.reshape(br, local.n_tiles, local.npairs, -1)
    vflat = jnp.moveaxis(vflat, 2, 1).reshape(br, local.npairs, -1)[..., :nb]
    y = jnp.zeros((br, nb, k), dtype=acc_t)
    for j, (c, d) in enumerate(plan.pairs):
        xs = jax.lax.dynamic_slice(xp, (c, lo_b + d, 0), (1, nb, k))[0]
        y = y + vflat[:, j, :, None].astype(acc_t) * xs.astype(acc_t)
    y = jnp.moveaxis(y, 0, 1).reshape(plan.mloc, k)

    head, tail = _bdia_edge_fixups(plan, left, right, k=k)
    if head is not None:
        y = y.at[: head.shape[0]].add(head.astype(y.dtype))
    if tail is not None:
        y = y.at[plan.mloc - tail.shape[0] :].add(tail.astype(y.dtype))
    if y_rem is not None:
        y = y + y_rem
    return y


# ---------------------------------------------------------------------------
# user-facing executor
# ---------------------------------------------------------------------------


class DistSpmv:
    """A partitioned matrix bound to a mesh; callable on global vectors.

    ``DistSpmv(plan, mesh)(x)`` accepts a global ``x`` (host or device,
    any sharding), returns the global ``y`` sharded over the mesh.  For
    device-resident iteration (solvers), use :meth:`padded` + the
    returned sharded arrays so no host round-trips occur.
    """

    def __init__(self, plan, mesh: Optional[Mesh] = None, *, interior: str = "auto",
                 overlap: bool = True, mm_interior: str = "auto"):
        self.plan = plan
        self.mesh = mesh if mesh is not None else row_mesh(plan.nshards)
        if self.mesh.shape[AXIS] != plan.nshards:
            raise ValueError(
                f"plan has {plan.nshards} shards but mesh axis '{AXIS}' "
                f"has {self.mesh.shape[AXIS]} devices"
            )
        self._xsharding = NamedSharding(self.mesh, P(AXIS))
        if isinstance(plan, DiaPartition):
            if interior == "auto":
                interior = "xla"  # pallas interior is opt-in (8192 align)
            if interior == "pallas" and plan.mloc % 8192:
                raise ValueError(
                    "interior='pallas' needs partition_dia(..., align=8192)"
                )
            local = partial(_dia_local, interior=interior, overlap=overlap)
            local_mm = _dia_local_mm
        elif isinstance(plan, BdiaPartition):
            if interior == "auto":
                # default the interior to the flagship fused kernel on
                # TPU when the shard geometry admits it; XLA elsewhere
                # (CPU interpret-mode Pallas is test-only speed)
                from cask_tpu.ops.pallas.bdia_kernels import bdia_fused_ok
                from cask_tpu.utils.platform import on_tpu

                interior = ("fused" if on_tpu()
                            and bdia_fused_ok(_bdia_shard_meta(plan))
                            else "xla")
            if interior == "fused":
                from cask_tpu.ops.pallas.bdia_kernels import bdia_fused_ok

                if not bdia_fused_ok(_bdia_shard_meta(plan)):
                    raise ValueError(
                        "interior='fused' needs the per-shard fused-kernel "
                        "geometry (bdia_fused_ok on the shard matrix): "
                        "square blocks, halo within one slab, VMEM-resident "
                        "component segments")
            local = partial(_bdia_local, interior=interior, overlap=overlap)
            local_mm = _bdia_local_mm
            # wide-k SpMM interior: the MXU slab X-ring kernel at exact
            # precision (probe_slabmm2: 2.3x the VPU formulations) when
            # the shard geometry shears; per-shard slabs built once here
            if mm_interior == "auto":
                from cask_tpu.ops.pallas.bdia_slab import bdia_slab_ok
                from cask_tpu.utils.platform import on_tpu

                mm_interior = ("slab" if on_tpu()
                               and self._slab_g(plan) is not None
                               else "xla")
            if mm_interior == "slab":
                g = self._slab_g(plan)
                if g is None:
                    raise ValueError(
                        "mm_interior='slab' needs slab-eligible shard "
                        "geometry (bdia_slab_ok on the shard matrix)")
                local_mm = partial(_bdia_local_mm_slab,
                                   geom=_bdia_shard_slab_geom(plan, g))
                self._mm_slab_g = g
        elif isinstance(plan, PohPartition):
            local = _poh_local
            local_mm = _poh_local_mm
        else:
            local = _coo_local
            local_mm = _coo_local_mm
        if mm_interior == "slab" and not isinstance(plan, BdiaPartition):
            raise ValueError("mm_interior='slab' needs a BdiaPartition")
        self.interior = interior  # resolved value ('auto' never survives)
        self.mm_interior = mm_interior

        plan_specs = jax.tree.map(lambda _: P(AXIS), plan)
        self.plan_dev = jax.device_put(
            plan, jax.tree.map(lambda s: NamedSharding(self.mesh, s), plan_specs)
        )

        self._spmv = jax.jit(
            shard_map(
                partial(local, axis=AXIS),
                mesh=self.mesh,
                in_specs=(plan_specs, P(AXIS)),
                out_specs=P(AXIS),
                check_vma=False,  # pallas_call outputs carry no vma info
            )
        )
        if getattr(self, "_mm_slab_g", None) is not None:
            self._slabs = self._build_shard_slabs(plan)
            f_mm = jax.jit(
                shard_map(
                    partial(local_mm, axis=AXIS),
                    mesh=self.mesh,
                    in_specs=(plan_specs, P(AXIS), P(AXIS, None)),
                    out_specs=P(AXIS, None),
                    check_vma=False,
                )
            )
            self._spmm_raw = f_mm
            self._spmm = lambda plan_dev, xp: f_mm(plan_dev, self._slabs, xp)
        else:
            self._spmm = jax.jit(
                shard_map(
                    partial(local_mm, axis=AXIS),
                    mesh=self.mesh,
                    in_specs=(plan_specs, P(AXIS, None)),
                    out_specs=P(AXIS, None),
                    check_vma=False,
                )
            )

    @staticmethod
    def _slab_g(plan):
        """Largest slab tile size the shard geometry admits (or None)."""
        from cask_tpu.ops.pallas.bdia_slab import bdia_slab_ok

        meta = _bdia_shard_meta(plan)
        for g in (16, 8, 4):
            if bdia_slab_ok(meta, g):
                return g
        return None

    def _build_shard_slabs(self, plan):
        """Shear every shard's band into slab form ONCE (device,
        vmapped over the shard axis, sharded like the plan)."""
        from cask_tpu.ops.bdia import BdiaMatrix
        from cask_tpu.ops.pallas.bdia_slab import bdia_slab_plan

        g = self._mm_slab_g

        def shear(vals):
            m = BdiaMatrix(
                vals=vals,
                rem_data=jnp.zeros((0,), vals.dtype),
                rem_row=jnp.zeros((0,), jnp.int32),
                rem_col=jnp.zeros((0,), jnp.int32),
                block_offsets=plan.block_offsets,
                shape=(plan.mloc, plan.mloc),
                blocksize=plan.blocksize,
                ts=plan.ts,
            )
            return bdia_slab_plan(m, g).slabs

        return jax.jit(
            jax.vmap(shear),
            out_shardings=NamedSharding(self.mesh, P(AXIS)),
        )(self.plan_dev.vals)

    @property
    def padded_n(self) -> int:
        return self.plan.nshards * self.plan.mloc

    def padded(self, x):
        """Pad a global vector/matrix to P*mloc rows and shard it."""
        x = jnp.asarray(x)
        pad = self.padded_n - x.shape[0]
        xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        if x.ndim == 1:
            return jax.device_put(xp, self._xsharding)
        return jax.device_put(xp, NamedSharding(self.mesh, P(AXIS, None)))

    def _unpad(self, y):
        m = self.plan.shape[0]
        if y.shape[0] == m:
            return y
        # XLA can't express a slice of a sharded dim when m doesn't
        # divide the mesh, so the convenience path replicates first;
        # scale users keep padded shapes via `padded_op`.  Replicating
        # a config-5-sized y onto every device is an OOM foot-gun —
        # warn loudly once (VERDICT r1 weak-7).
        if y.size * jnp.dtype(y.dtype).itemsize > 64 * 1024 * 1024:
            import warnings

            warnings.warn(
                f"DistSpmv convenience path replicates the full "
                f"{y.size * jnp.dtype(y.dtype).itemsize / 2**20:.0f} MB "
                "result on every device to slice off row padding; at this "
                "scale use `padded_op` with padded shapes (or a row count "
                "divisible by the mesh) to stay sharded.",
                RuntimeWarning, stacklevel=3)
        y = jax.device_put(y, NamedSharding(self.mesh, P()))
        return y[:m]

    def __call__(self, x):
        x = jnp.asarray(x)
        if x.ndim == 1:
            return self._unpad(self._spmv(self.plan_dev, self.padded(x)))
        return self._unpad(self._spmm(self.plan_dev, self.padded(x)))

    def padded_op(self, xp):
        """Operator on already-padded, sharded vectors (for solvers):
        keeps everything device-resident with zero reshard traffic.

        NOTE: inside a USER jit this closes over the plan (and any
        interior plans) as compile-time constants — fine at SpMV-plan
        scale, but large operands (the slab SpMM interior is ~10× the
        values) make compiles slow and can exceed the remote-compile
        relay's request limit (HTTP 413).  Jitted solver loops should
        thread :attr:`operands` through as arguments and call
        :meth:`padded_op_with` (the AMG lesson, probe_amg9/10)."""
        if xp.ndim == 1:
            return self._spmv(self.plan_dev, xp)
        return self._spmm(self.plan_dev, xp)

    @property
    def operands(self):
        """Device operand pytree (plan + any interior plans) to pass
        through jitted loops as ARGUMENTS via :meth:`padded_op_with`."""
        if getattr(self, "_slabs", None) is not None:
            return (self.plan_dev, self._slabs)
        return (self.plan_dev,)

    def padded_op_with(self, ops, xp):
        """Like :meth:`padded_op`, but with :attr:`operands` supplied
        explicitly (traced) — use inside jitted solver loops."""
        if xp.ndim == 1:
            return self._spmv(ops[0], xp)
        if len(ops) > 1:
            return self._spmm_raw(ops[0], ops[1], xp)
        return self._spmm(ops[0], xp)


# ---------------------------------------------------------------------------
# 2-D (SUMMA-style) executor
# ---------------------------------------------------------------------------

ROW_AXIS = "rows2d"
COL_AXIS = "cols2d"


def mesh_2d(pr: int, pc: int, *, devices=None) -> Mesh:
    """A (rows, cols) mesh for :class:`Dist2DSpmv`."""
    import numpy as _np

    devices = devices if devices is not None else jax.devices()
    if len(devices) < pr * pc:
        raise ValueError(f"need {pr * pc} devices, have {len(devices)}")
    return Mesh(_np.asarray(devices[: pr * pc]).reshape(pr, pc),
                (ROW_AXIS, COL_AXIS))


def _local_2d(plan, x_loc):
    """Partial block product on one device; caller psums over cols."""
    data, row, col = _sq(plan.data), _sq(plan.row), _sq(plan.col)
    if x_loc.ndim == 1:
        prod = data * x_loc[col]
    else:
        prod = data[:, None] * x_loc[col]
    part = jax.ops.segment_sum(prod, row, num_segments=plan.mr)
    return jax.lax.psum(part, COL_AXIS)


class Dist2DSpmv:
    """2-D block-partitioned SpMV/SpMM over a (rows, cols) mesh.

    Per-chip x footprint is n/pc (vs the 1-D plans' all-gathered n) and
    the only collective is a cols-axis ``psum`` of y partials — the 2-D
    point of the scaling-book recipe.  y returns sharded over rows.
    """

    def __init__(self, plan: "Coo2DPartition", mesh: Optional[Mesh] = None):
        from cask_tpu.parallel.partition import Coo2DPartition

        assert isinstance(plan, Coo2DPartition)
        self.plan = plan
        self.mesh = mesh if mesh is not None else mesh_2d(plan.pr, plan.pc)
        if (self.mesh.shape[ROW_AXIS], self.mesh.shape[COL_AXIS]) != (plan.pr, plan.pc):
            raise ValueError("mesh shape does not match the plan's pr × pc")
        plan_specs = jax.tree.map(lambda _: P((ROW_AXIS, COL_AXIS)), plan)
        self._spmv = jax.jit(shard_map(
            lambda pl_, x: _local_2d(pl_, x),
            mesh=self.mesh,
            in_specs=(plan_specs, P(COL_AXIS)),
            out_specs=P(ROW_AXIS),
            check_vma=False,
        ))
        self._spmm = jax.jit(shard_map(
            lambda pl_, x: _local_2d(pl_, x),
            mesh=self.mesh,
            in_specs=(plan_specs, P(COL_AXIS, None)),
            out_specs=P(ROW_AXIS, None),
            check_vma=False,
        ))
        self.plan_dev = jax.device_put(
            plan, jax.tree.map(lambda s: NamedSharding(self.mesh, s), plan_specs))

    def padded_x(self, x):
        x = jnp.asarray(x)
        pad = self.plan.pc * self.plan.mc - x.shape[0]
        xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        spec = P(COL_AXIS) if x.ndim == 1 else P(COL_AXIS, None)
        return jax.device_put(xp, NamedSharding(self.mesh, spec))

    @property
    def square_padded(self) -> bool:
        return self.plan.pr * self.plan.mr == self.plan.pc * self.plan.mc

    def padded_op(self, xp):
        """Operator on already-padded vectors for solver loops: y is
        resharded back to x's cols-axis layout (one cross-axis reshard —
        the 2-D analog of the 1-D plans' zero-reshard ``padded_op``), so
        Krylov iterations compose without host round-trips.  Needs the
        padded operator square (pr·mr == pc·mc)."""
        if not self.square_padded:
            raise ValueError(
                "padded_op needs pr*mr == pc*mc (square padded operator); "
                f"got {self.plan.pr}x{self.plan.mr} vs {self.plan.pc}x{self.plan.mc}")
        y = self._spmv(self.plan_dev, xp) if xp.ndim == 1 else \
            self._spmm(self.plan_dev, xp)
        spec = P(COL_AXIS) if xp.ndim == 1 else P(COL_AXIS, None)
        return jax.device_put(y, NamedSharding(self.mesh, spec))

    def __call__(self, x):
        xp = self.padded_x(x)
        y = self._spmv(self.plan_dev, xp) if xp.ndim == 1 else \
            self._spmm(self.plan_dev, xp)
        m = self.plan.shape[0]
        if y.size * jnp.dtype(y.dtype).itemsize > 64 * 1024 * 1024:
            # mirror of the 1-D convenience-path guard (VERDICT r2 weak-7)
            import warnings

            warnings.warn(
                f"Dist2DSpmv convenience path replicates the full "
                f"{y.size * jnp.dtype(y.dtype).itemsize / 2**20:.0f} MB "
                "result on every device to slice off row padding; at this "
                "scale use `padded_op` with padded shapes to stay sharded.",
                RuntimeWarning, stacklevel=2)
        y = jax.device_put(y, NamedSharding(self.mesh, P()))
        return y[:m]
