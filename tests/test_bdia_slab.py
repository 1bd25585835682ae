"""MXU slab SpMM (VERDICT r4 item 3): shear-to-dense formulation must
match the XLA/scipy ground truth exactly at f64 and to fp at f32, on
CPU interpret-mode Pallas (same harness as the other kernels)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cask_tpu.formats.convert import csr_to_bsr, to_scipy
from cask_tpu.formats.generate import fem_blocks
from cask_tpu.ops.bdia import bdia_plan
from cask_tpu.ops.pallas.bdia_slab import (
    bdia_slab_ok,
    bdia_slab_plan,
    bdia_spmm_pallas_slab,
    bdia_spmm_slab_padded,
)


def _plan(nx, dof=4, dtype=np.float64, seed=0):
    a = fem_blocks(nx, dof=dof, dtype=dtype, seed=seed, return_bsr=True)
    return bdia_plan(a, (dof, dof)), to_scipy(a)


class TestSlabPlan:
    def test_ok_gate(self):
        p, _ = _plan(16)
        assert bdia_slab_ok(p, 8)  # far offset 16 = 2 tiles
        assert bdia_slab_ok(p, 16)
        assert not bdia_slab_ok(p, 12)  # 16 % 12 != 0
        with pytest.raises(ValueError, match="slab-eligible"):
            bdia_slab_plan(p, 12)

    def test_geometry(self):
        p, _ = _plan(16, dof=4)
        sl = bdia_slab_plan(p, 8)
        assert sl.far_offsets == (-16, 16)
        assert sl.gb_r == sl.gb_c == 32
        assert sl.width == 2 * 4 + 32 * 3
        assert sl.slabs.shape == (sl.ntiles * 32, sl.width)
        # padding rounds up to the super-tile alignment (ntiles=128 at
        # this plan's nb_pad=1024 -> gg_align 32)
        assert sl.gg_align == 32
        assert sl.pad_tiles == 32

    @pytest.mark.parametrize("g", [4, 8, 16])
    def test_spmm_exact_f64(self, g):
        p, s = _plan(16, dof=4)
        sl = bdia_slab_plan(p, g)
        X = np.random.default_rng(1).standard_normal((p.shape[1], 8))
        Y = np.asarray(bdia_spmm_pallas_slab(sl, jnp.asarray(X)))
        np.testing.assert_allclose(Y, s @ X, rtol=1e-12, atol=1e-12)

    def test_spmv_vector_and_dof2(self):
        p, s = _plan(12, dof=2, seed=3)
        sl = bdia_slab_plan(p, 4)
        x = np.random.default_rng(2).standard_normal(p.shape[1])
        y = np.asarray(bdia_spmm_pallas_slab(sl, jnp.asarray(x)))
        np.testing.assert_allclose(y, s @ x, rtol=1e-12, atol=1e-12)

    def test_f32_class(self):
        p, s = _plan(16, dof=4, dtype=np.float32, seed=4)
        sl = bdia_slab_plan(p, 8)
        X = np.random.default_rng(4).standard_normal(
            (p.shape[1], 16)).astype(np.float32)
        Y = np.asarray(bdia_spmm_pallas_slab(sl, jnp.asarray(X)))
        np.testing.assert_allclose(Y, s @ X, rtol=1e-5, atol=1e-4)

    def test_bf16_slabs_promote_f32_out(self):
        p, s = _plan(12, dof=4, dtype=np.float32, seed=5)
        sl = bdia_slab_plan(p, 4, dtype=jnp.bfloat16)
        X = np.random.default_rng(5).standard_normal(
            (p.shape[1], 8)).astype(np.float32)
        Y = bdia_spmm_pallas_slab(sl, jnp.asarray(X))
        assert Y.dtype == jnp.float32
        rel = np.abs(np.asarray(Y) - s @ X).max() / np.abs(s @ X).max()
        assert rel < 0.05  # bf16-class

    @pytest.mark.parametrize("gg", [1, 2])
    def test_explicit_super_tile_factors(self, gg):
        # the gg super-tile grid must be bit-identical to gg=1 (the
        # step-overhead amortization is scheduling, not math)
        p, s = _plan(16, dof=4)
        sl = bdia_slab_plan(p, 8)
        X = np.random.default_rng(8).standard_normal((p.shape[1], 8))
        xp = sl.to_padded(jnp.asarray(X))
        y = bdia_spmm_slab_padded(sl, xp, gg=gg)
        y1 = bdia_spmm_slab_padded(sl, xp, gg=1)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y1))
        np.testing.assert_allclose(
            np.asarray(sl.from_padded(y, 8)), s @ X, rtol=1e-12, atol=1e-12)

    def test_gg_validation(self):
        p, _ = _plan(16, dof=4)
        sl = bdia_slab_plan(p, 8)
        xp = sl.to_padded(jnp.zeros((p.shape[1], 1)))
        with pytest.raises(ValueError, match="gg"):
            bdia_spmm_slab_padded(sl, xp, gg=3)
        # far offset 16 at g=8 caps gg at 2: g*gg must divide every d
        with pytest.raises(ValueError, match="far offset"):
            bdia_spmm_slab_padded(sl, xp, gg=4)
        # ... the BlockSpec auto pick respects the same constraint,
        # while the ring delivery is freed from it (arbitrary offsets)
        from cask_tpu.ops.pallas.bdia_slab import _pick_gg

        assert _pick_gg(sl, 128, 8, 8, far_div=True) == 2
        assert _pick_gg(sl, 128, 8, 8) == sl.gg_align

    def test_padded_chain_endomorphic(self):
        # the zero-copy solver layout: two chained applications equal A@(A@x)
        p, s = _plan(16, dof=4)
        sl = bdia_slab_plan(p, 8)
        x = np.random.default_rng(6).standard_normal((p.shape[1], 8))
        xp = sl.to_padded(jnp.asarray(x))
        y1 = bdia_spmm_slab_padded(sl, xp)
        assert y1.shape == xp.shape and y1.dtype == xp.dtype
        y2 = bdia_spmm_slab_padded(sl, y1)
        np.testing.assert_allclose(np.asarray(sl.from_padded(y2, 8)),
                                   s @ (s @ x), rtol=1e-12, atol=1e-10)

    def test_matches_device_gen(self):
        # the bench matrix builder and the plan-built slabs agree
        from cask_tpu.formats.device_gen import fem_bdia_device

        plan = fem_bdia_device(16, dof=4, dtype=jnp.float64)
        sl = bdia_slab_plan(plan, 8)
        x = np.random.default_rng(7).standard_normal(plan.shape[1])
        y = np.asarray(bdia_spmm_pallas_slab(sl, jnp.asarray(x)))
        y_ref = np.asarray(plan._spmv_xla(jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


class TestSlabRing:
    """X-ring variant: bit-identical to the BlockSpec version (only the
    X delivery changes — revolving VMEM banks instead of per-segment
    window fetches)."""

    @pytest.mark.parametrize("gg", [1, 2])
    def test_matches_blockspec_version(self, gg):
        from cask_tpu.ops.pallas.bdia_slab import bdia_spmm_slab_ring_padded

        p, s = _plan(16, dof=4)
        sl = bdia_slab_plan(p, 8)
        X = np.random.default_rng(11).standard_normal((p.shape[1], 8))
        xp = sl.to_padded(jnp.asarray(X))
        yr = bdia_spmm_slab_ring_padded(sl, xp, gg=gg)
        yb = bdia_spmm_slab_padded(sl, xp, gg=gg)
        np.testing.assert_array_equal(np.asarray(yr), np.asarray(yb))
        np.testing.assert_allclose(
            np.asarray(sl.from_padded(yr, 8)), s @ X, rtol=1e-12, atol=1e-12)

    def test_chain_endomorphic(self):
        from cask_tpu.ops.pallas.bdia_slab import bdia_spmm_slab_ring_padded

        p, s = _plan(16, dof=4)
        sl = bdia_slab_plan(p, 8)
        x = np.random.default_rng(12).standard_normal((p.shape[1], 8))
        xp = sl.to_padded(jnp.asarray(x))
        y2 = bdia_spmm_slab_ring_padded(
            sl, bdia_spmm_slab_ring_padded(sl, xp))
        np.testing.assert_allclose(np.asarray(sl.from_padded(y2, 8)),
                                   s @ (s @ x), rtol=1e-12, atol=1e-10)

    def test_dof2(self):
        from cask_tpu.ops.pallas.bdia_slab import bdia_spmm_slab_ring_padded

        p, s = _plan(12, dof=2, seed=3)
        sl = bdia_slab_plan(p, 4)
        x = np.random.default_rng(13).standard_normal((p.shape[1], 4))
        xp = sl.to_padded(jnp.asarray(x))
        y = sl.from_padded(bdia_spmm_slab_ring_padded(sl, xp), 4)
        np.testing.assert_allclose(np.asarray(y), s @ x,
                                   rtol=1e-12, atol=1e-12)


class TestSlabEdgeGeometries:
    def _bsr_from_scipy(self, s, b):
        from cask_tpu.formats.convert import csr_to_bsr, from_scipy

        return csr_to_bsr(from_scipy(s.tocsr()), (b, b))

    def test_no_far_offsets(self):
        # pure block-tridiagonal: pad_tiles == 0, no far segments, the
        # halo columns carry the whole coupling
        import scipy.sparse as sp

        rng = np.random.default_rng(31)
        nb, b = 96, 4
        n = nb * b
        s = sp.lil_matrix((n, n))
        for i in range(nb):
            for dj in (-1, 0, 1):
                j = i + dj
                if 0 <= j < nb:
                    s[i * b : (i + 1) * b, j * b : (j + 1) * b] = \
                        rng.standard_normal((b, b))
        p = bdia_plan(self._bsr_from_scipy(s, b), (b, b))
        assert all(abs(d) <= 1 for d in p.block_offsets)
        sl = bdia_slab_plan(p, 8)
        assert sl.far_offsets == () and sl.pad_tiles == 0
        from cask_tpu.ops.pallas.bdia_slab import bdia_spmm_slab_ring_padded

        X = rng.standard_normal((n, 8))
        y1 = np.asarray(bdia_spmm_pallas_slab(sl, jnp.asarray(X)))
        np.testing.assert_allclose(y1, s.tocsr() @ X, rtol=1e-12, atol=1e-12)
        xp = sl.to_padded(jnp.asarray(X))
        y2 = sl.from_padded(bdia_spmm_slab_ring_padded(sl, xp), 8)
        np.testing.assert_allclose(np.asarray(y2), s.tocsr() @ X,
                                   rtol=1e-12, atol=1e-12)

    def test_far_offset_not_divisible_by_g(self):
        # d=18 with g=8 (and any gg): only the X-ring delivery handles
        # it — each far read is a static two-bank slice
        import scipy.sparse as sp

        from cask_tpu.ops.pallas.bdia_slab import (
            bdia_spmm_slab_padded,
            bdia_spmm_slab_ring,
        )

        rng = np.random.default_rng(33)
        nb, b, off = 128, 4, 18
        n = nb * b
        s = sp.lil_matrix((n, n))
        for i in range(nb):
            s[i * b : (i + 1) * b, i * b : (i + 1) * b] = \
                rng.standard_normal((b, b))
            if i + off < nb:
                s[i * b : (i + 1) * b, (i + off) * b : (i + off + 1) * b] = \
                    rng.standard_normal((b, b))
            if i - off >= 0:
                s[i * b : (i + 1) * b, (i - off) * b : (i - off + 1) * b] = \
                    rng.standard_normal((b, b))
        p = bdia_plan(self._bsr_from_scipy(s, b), (b, b))
        assert p.block_offsets == (-off, 0, off)
        sl = bdia_slab_plan(p, 8)
        X = rng.standard_normal((n, 8))
        y = np.asarray(bdia_spmm_pallas_slab(sl, jnp.asarray(X)))
        np.testing.assert_allclose(y, s.tocsr() @ X, rtol=1e-12, atol=1e-12)
        # explicit non-divisible gg on the ring: still exact
        body = sl.ntiles * sl.gb_c
        xb = jnp.zeros((body, 128)).at[:n, :8].set(jnp.asarray(X))
        y2 = bdia_spmm_slab_ring(sl, xb, gg=2)[:n, :8]
        np.testing.assert_allclose(np.asarray(y2), s.tocsr() @ X,
                                   rtol=1e-12, atol=1e-12)
        # the BlockSpec delivery refuses (needs g*gg | d)
        with pytest.raises(ValueError, match="far offset"):
            bdia_spmm_slab_padded(sl, sl.to_padded(jnp.asarray(X)), gg=1)

    def test_single_asymmetric_far_offset(self):
        # one far offset only (e.g. a periodic-coupling band upward)
        import scipy.sparse as sp

        rng = np.random.default_rng(32)
        nb, b, off = 128, 4, 16
        n = nb * b
        s = sp.lil_matrix((n, n))
        for i in range(nb):
            for dj in (0, 1):
                j = i + dj
                if j < nb:
                    s[i * b : (i + 1) * b, j * b : (j + 1) * b] = \
                        rng.standard_normal((b, b))
            if i + off < nb:
                s[i * b : (i + 1) * b, (i + off) * b : (i + off + 1) * b] = \
                    rng.standard_normal((b, b))
        p = bdia_plan(self._bsr_from_scipy(s, b), (b, b))
        sl = bdia_slab_plan(p, 8)
        assert sl.far_offsets == (off,)
        X = rng.standard_normal((n, 8))
        y = np.asarray(bdia_spmm_pallas_slab(sl, jnp.asarray(X)))
        np.testing.assert_allclose(y, s.tocsr() @ X, rtol=1e-12, atol=1e-12)


class TestSlabRingNatural:
    def test_natural_matches_padded(self):
        from cask_tpu.ops.pallas.bdia_slab import (
            bdia_spmm_slab_ring,
            bdia_spmm_slab_ring_padded,
        )

        p, s = _plan(16, dof=4)
        sl = bdia_slab_plan(p, 8)
        X = np.random.default_rng(41).standard_normal((p.shape[1], 8))
        body = sl.ntiles * sl.gb_c
        xb = jnp.zeros((body, 128)).at[: X.shape[0], :8].set(jnp.asarray(X))
        yb = bdia_spmm_slab_ring(sl, xb)
        yp = sl.from_padded(
            bdia_spmm_slab_ring_padded(sl, sl.to_padded(jnp.asarray(X))), 8)
        np.testing.assert_array_equal(np.asarray(yb[: p.shape[0], :8]),
                                      np.asarray(yp))
        np.testing.assert_allclose(np.asarray(yb[: p.shape[0], :8]), s @ X,
                                   rtol=1e-12, atol=1e-12)
