"""Device-side matrix generation (no host→device bulk transfer).

The axon-proxied dev TPU moves host buffers at pathological rates
(SURVEY.md §8.2), so benchmarks build their operands *on device* with
jnp ops: a stencil's diagonals are formulaic, so the packed DIA value
array can be computed by the XLA program itself.  On production TPU
hosts this also skips a PCIe copy; the plan is bit-identical to
``dia_plan(generate.stencil_2d(...))``.
"""

from __future__ import annotations

import jax.numpy as jnp

from cask_tpu.ops.dia import DiaMatrix, _ROW_TILE, _round_up


def stencil2d_dia_device(nx: int, ny: int | None = None, *, dtype=jnp.float32) -> DiaMatrix:
    """5-point Laplacian on an nx×ny grid as a device-resident DiaMatrix.

    Diagonals (offsets −ny, −1, 0, +1, +ny):
      main = 4; ±1 = −1 unless crossing a grid-row boundary; ±ny = −1
      within bounds.  Matches ``dia_plan(stencil_2d(nx, ny))`` exactly.
    """
    ny = ny or nx
    n = nx * ny
    m_pad = _round_up(n, _ROW_TILE)
    r = jnp.arange(m_pad)
    in_range = r < n
    col_in_row = r % ny  # position within a grid row

    def diag(off):
        if off == 0:
            v = jnp.where(in_range, 4.0, 0.0)
        elif off == 1:
            v = jnp.where(in_range & (r + 1 < n) & (col_in_row != ny - 1), -1.0, 0.0)
        elif off == -1:
            v = jnp.where(in_range & (r >= 1) & (col_in_row != 0), -1.0, 0.0)
        elif off == ny:
            v = jnp.where(in_range & (r + ny < n), -1.0, 0.0)
        elif off == -ny:
            v = jnp.where(in_range & (r >= ny), -1.0, 0.0)
        else:
            raise ValueError(off)
        return v.astype(dtype)

    offsets = tuple(sorted({-ny, -1, 0, 1, ny}))
    vals = jnp.stack([diag(o) for o in offsets])
    return DiaMatrix(
        vals=vals,
        rem_data=jnp.zeros((0,), dtype),
        rem_row=jnp.zeros((0,), jnp.int32),
        rem_col=jnp.zeros((0,), jnp.int32),
        vals_t=None,
        offsets=offsets,
        shape=(n, n),
    )


def banded_dia_device(n: int, bandwidth: int, *, dtype=jnp.float32, seed: int = 0) -> DiaMatrix:
    """Dense band of width 2·bandwidth+1 with deterministic pseudo-random
    values generated on device (for bandwidth benches)."""
    import jax

    m_pad = _round_up(n, _ROW_TILE)
    offsets = tuple(range(-bandwidth, bandwidth + 1))
    key = jax.random.PRNGKey(seed)
    vals = jax.random.normal(key, (len(offsets), m_pad), dtype=dtype)
    r = jnp.arange(m_pad)
    masks = []
    for off in offsets:
        ok = (r < n) & (r + off >= 0) & (r + off < n)
        masks.append(ok)
    vals = vals * jnp.stack(masks).astype(dtype)
    return DiaMatrix(
        vals=vals,
        rem_data=jnp.zeros((0,), dtype),
        rem_row=jnp.zeros((0,), jnp.int32),
        rem_col=jnp.zeros((0,), jnp.int32),
        vals_t=None,
        offsets=offsets,
        shape=(n, n),
    )
