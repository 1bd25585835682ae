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


def fem_bdia_device(nx: int, ny: int | None = None, *, dof: int = 4,
                    dtype=jnp.float32, seed: int = 0):
    """Multi-dof FEM-stencil matrix as a device-resident BdiaMatrix.

    Structure matches ``bdia_plan(generate.fem_blocks(nx, dof=dof))``:
    5 block diagonals (−ny, −1, 0, +1, +ny) of dense dof×dof blocks with
    random values, grid-row wrap blocks structurally zero, diagonal
    blocks shifted by 4·dof.  Values are generated on device.
    """
    import jax

    from cask_tpu.ops.bdia import BdiaMatrix, _pick_ts

    ny = ny or nx
    nbr = nx * ny
    b = dof
    ts = _pick_ts(nbr)
    nb_pad = _round_up(nbr, ts * 128)
    T = nb_pad // (ts * 128)
    offsets = tuple(sorted({-ny, -1, 0, 1, ny}))
    npairs = len(offsets) * b

    i = jnp.arange(nb_pad)
    in_range = i < nbr
    col_in_row = i % ny

    def mask(off):
        if off == 0:
            ok = in_range
        elif off == 1:
            ok = in_range & (i + 1 < nbr) & (col_in_row != ny - 1)
        elif off == -1:
            ok = in_range & (i >= 1) & (col_in_row != 0)
        elif off == ny:
            ok = in_range & (i + ny < nbr)
        elif off == -ny:
            ok = in_range & (i >= ny)
        else:
            raise ValueError(off)
        return ok

    key = jax.random.PRNGKey(seed)
    vals = jax.random.normal(key, (b, nb_pad, npairs), dtype=dtype)
    m_all = jnp.stack([mask(o) for o in offsets], axis=-1)  # (nb_pad, 5)
    m_all = jnp.repeat(m_all, b, axis=-1)  # (nb_pad, npairs) pair order (d, c)
    vals = vals * m_all[None].astype(dtype)
    # diagonal dominance on the d=0, c=r slots (same spirit as fem_blocks)
    dpos0 = offsets.index(0)
    for r in range(b):
        vals = vals.at[r, :, dpos0 * b + r].add(
            jnp.where(in_range, 4.0 * b, 0.0).astype(dtype))
    v5 = vals.reshape(b, T, ts, 128, npairs).transpose(0, 1, 4, 2, 3)
    return BdiaMatrix(
        vals=v5,
        rem_data=jnp.zeros((0,), dtype),
        rem_row=jnp.zeros((0,), jnp.int32),
        rem_col=jnp.zeros((0,), jnp.int32),
        block_offsets=offsets,
        shape=(nbr * b, nbr * b),
        blocksize=(b, b),
        ts=ts,
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
