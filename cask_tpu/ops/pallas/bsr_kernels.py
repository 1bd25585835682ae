"""Pallas TPU kernel for BSR × dense (SpMM, BASELINE config 3).

The MXU path for *block-structured* matrices (FEM dof blocks).  Per
block-row the kernel concatenates the K referenced X slices into one
VMEM panel via async DMA, then issues a single

    (br, K·bc) @ (K·bc, k)  →  (br, k)

matmul — one well-shaped MXU op per block row instead of K tiny ones,
and the only gathers are scalar-indexed block DMAs (SURVEY.md §7
hard-part (b): block layouts turn gathers into contiguous loads).

Layout (host-packed by :meth:`BsrSpmmKernel.plan`):
- block rows are grouped ``G = max(1, 8 // br)`` per grid step so the
  value tile has ≥ 8 sublanes;
- per group-row ELL padding to ``K`` slots; padded slots point at block
  column 0 with zero values (structural-zero discipline, no masks);
- values: ``(T, G·br, K·bc)`` — the streamed operand, auto-pipelined by
  the Pallas grid machinery (cask's nnz stream analog);
- block-column ids: scalar-prefetched SMEM array, available before the
  body runs so DMA addresses need no VMEM round-trip.
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

from cask_tpu.formats.matrix import BSR

_LANE = 128


def _interpret() -> bool:
    from cask_tpu.utils.platform import on_tpu

    return not on_tpu()


def _kernel(G, br, bc, K, kp, cols_ref, x_hbm, v_ref, o_ref, xpanel, sems):
    # X-slice panels double-buffered across grid steps: while this block
    # row's matmul runs, the next block row's K slice DMAs are in flight
    # (addresses come from the scalar-prefetched column ids).
    t = pl.program_id(0)
    T = pl.num_programs(0)

    def dma(step, slot, g, j):
        col = cols_ref[(step * G + g) * K + j]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(col * bc, bc), :],
            xpanel.at[slot, g, pl.ds(j * bc, bc), :],
            sems.at[slot, g, j],
        )

    def start_step(step, slot):
        for g in range(G):
            for j in range(K):
                dma(step, slot, g, j).start()

    @pl.when(t == 0)
    def _():
        start_step(0, 0)

    @pl.when(t + 1 < T)
    def _():
        start_step(t + 1, (t + 1) % 2)

    cur = t % 2
    for g in range(G):
        for j in range(K):
            dma(t, cur, g, j).wait()
    acc_t = jnp.promote_types(o_ref.dtype, jnp.float32)
    for g in range(G):
        acc = jax.lax.dot_general(
            v_ref[0, g * br : (g + 1) * br, :],
            xpanel[cur, g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        )
        o_ref[0, g * br : (g + 1) * br, :] = acc.astype(o_ref.dtype)


@dataclasses.dataclass
class BsrSpmmKernel:
    """A packed BSR matrix bound to the Pallas SpMM kernel."""

    vals: jax.Array  # (T, G*br, K*bc)
    cols: jax.Array  # (T*G*K,) int32 block-column ids
    shape: Tuple[int, int]
    blocksize: Tuple[int, int]
    G: int
    K: int
    k: int  # dense width this plan was built for

    @classmethod
    def plan(cls, a: BSR, k: int) -> "BsrSpmmKernel":
        br, bc = a.blocksize
        G = max(1, 8 // br)
        nbr = a.n_block_rows
        T = -(-nbr // G)
        indptr = np.asarray(a.indptr, dtype=np.int64)
        indices = np.asarray(a.indices, dtype=np.int64)
        data = np.asarray(a.data)
        lens = np.diff(indptr)
        K = max(int(lens.max(initial=0)), 1)

        vals = np.zeros((T, G * br, K * bc), dtype=data.dtype)
        cols = np.zeros((T * G * K,), dtype=np.int32)
        for i in range(nbr):
            t, g = divmod(i, G)
            s, e = indptr[i], indptr[i + 1]
            for jj, blk in enumerate(range(s, e)):
                vals[t, g * br : (g + 1) * br, jj * bc : (jj + 1) * bc] = data[blk]
                cols[(t * G + g) * K + jj] = indices[blk]
        return cls(
            vals=jnp.asarray(vals),
            cols=jnp.asarray(cols),
            shape=a.shape,
            blocksize=(br, bc),
            G=G,
            K=K,
            k=k,
        )

    def __call__(self, x):
        m, n = self.shape
        br, bc = self.blocksize
        G, K = self.G, self.K
        k = int(x.shape[1])
        kp = max(_LANE, -(-k // _LANE) * _LANE)
        T = self.vals.shape[0]
        n_pad = -(-n // bc) * bc
        xp = jnp.zeros((n_pad, kp), x.dtype).at[:n, :k].set(x)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # X in HBM
                pl.BlockSpec((1, G * br, K * bc), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G * br, kp), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G, K * bc, kp), x.dtype),
                pltpu.SemaphoreType.DMA((2, G, K)),
            ],
        )
        kernel = functools.partial(_kernel, G, br, bc, K, kp)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, G * br, kp), self.vals.dtype),
            interpret=_interpret(),
        )(self.cols, xp, self.vals)
        return out.reshape(T * G * br, kp)[:m, :k]


def bsr_spmm_pallas(a: BSR, x, *, transpose: bool = False):
    """Convenience: plan + run (plan once via BsrSpmmKernel.plan for reuse).

    ``transpose=True`` re-encodes aᵀ host-side first (a plan build) —
    iterating callers should transpose once via
    :func:`cask_tpu.formats.convert.transpose` and plan on the result."""
    if transpose:
        from cask_tpu.formats.convert import transpose as _t

        a = _t(a)
    kern = BsrSpmmKernel.plan(a, k=int(x.shape[1]))
    return kern(x)
