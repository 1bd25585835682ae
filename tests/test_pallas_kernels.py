"""Pallas kernels in interpret mode (the DFE-simulation analog, SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cask_tpu.formats.convert import csr_to_bsr, to_scipy
from cask_tpu.formats.generate import banded, fem_blocks, stencil_2d
from cask_tpu.ops.dia import dia_plan
from cask_tpu.ops.pallas.bsr_kernels import BsrSpmmKernel, bsr_spmm_pallas


class TestBsrSpmm:
    @pytest.mark.parametrize("bs", [4, 8, 16])
    @pytest.mark.parametrize("k", [32, 128])
    def test_fem(self, bs, k):
        a = fem_blocks(9, dof=4)
        b = csr_to_bsr(a, bs)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((a.shape[1], k))
        y = bsr_spmm_pallas(b, x)
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_k_not_multiple_of_lane(self):
        a = stencil_2d(10)
        b = csr_to_bsr(a, 4)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((a.shape[1], 20))
        y = bsr_spmm_pallas(b, x)
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_plan_reuse(self):
        a = banded(200, 3, seed=2)
        b = csr_to_bsr(a, 8)
        kern = BsrSpmmKernel.plan(b, k=32)
        rng = np.random.default_rng(3)
        for seed in range(2):
            x = rng.standard_normal((a.shape[1], 32))
            y = kern(jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_ragged_rows(self):
        # rows with very different block counts exercise ELL padding
        import scipy.sparse as sp

        from cask_tpu.formats.convert import from_scipy

        rs = np.random.RandomState(4)
        s = sp.random(96, 96, density=0.02, format="csr", random_state=rs)
        s = s + sp.diags(np.ones(96))
        a = from_scipy(s.tocsr())
        b = csr_to_bsr(a, 8)
        x = rs.standard_normal((96, 32))
        y = bsr_spmm_pallas(b, x)
        np.testing.assert_allclose(np.asarray(y), s @ x, rtol=1e-12, atol=1e-10)


class TestDiaEdgeCases:
    def test_single_diagonal(self):
        import scipy.sparse as sp

        from cask_tpu.formats.convert import from_scipy

        s = sp.diags(np.arange(1.0, 9001.0)).tocsr()
        d = dia_plan(from_scipy(s))
        from cask_tpu.ops.pallas.dia_kernels import dia_spmv_pallas

        x = np.random.default_rng(5).standard_normal(9000)
        y = dia_spmv_pallas(d, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), s @ x, rtol=1e-12)

    def test_offset_multiple_of_lane(self):
        # off % 128 == 0 path (no lane roll)
        import scipy.sparse as sp

        from cask_tpu.formats.convert import from_scipy

        n = 9000
        s = (sp.diags(np.ones(n)) + sp.diags(np.ones(n - 256), 256)).tocsr()
        d = dia_plan(from_scipy(s))
        from cask_tpu.ops.pallas.dia_kernels import dia_spmv_pallas

        x = np.random.default_rng(6).standard_normal(n)
        y = dia_spmv_pallas(d, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), s @ x, rtol=1e-12)


class TestWindowedVariants:
    def test_spmv_windowed_matches_resident(self):
        import cask_tpu
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = cask_tpu.generate.stencil_2d(95)
        d = dia_plan(a)
        x = np.random.default_rng(0).standard_normal(a.shape[0])
        ref = to_scipy(a) @ x
        orig = dk._X_VMEM_BUDGET
        dk._X_VMEM_BUDGET = 1 << 16  # force the HBM-window path
        try:
            y = dk.dia_spmv_pallas(d, jnp.asarray(x))
        finally:
            dk._X_VMEM_BUDGET = orig
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-12, atol=1e-10)

    def test_spmm_windowed_matches_resident(self):
        import cask_tpu
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = cask_tpu.generate.banded(9000, 2, seed=7)
        d = dia_plan(a)
        X = np.random.default_rng(1).standard_normal((a.shape[1], 32))
        ref = to_scipy(a) @ X
        orig = dk._X_VMEM_BUDGET
        dk._X_VMEM_BUDGET = 1 << 18
        try:
            Y = dk.dia_spmm_pallas(d, jnp.asarray(X))
        finally:
            dk._X_VMEM_BUDGET = orig
        np.testing.assert_allclose(np.asarray(Y), ref, rtol=1e-12, atol=1e-10)


class TestSolverLayout:
    def test_layout_spmv_and_chain(self):
        import cask_tpu
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = cask_tpu.generate.stencil_2d(95)
        d = dia_plan(a)
        x = np.random.default_rng(0).standard_normal(a.shape[0])
        xL = dk.to_layout(d, jnp.asarray(x))
        yL = dk.dia_spmv_pallas_layout(d, xL)
        np.testing.assert_allclose(
            np.asarray(dk.from_layout(d, yL)), to_scipy(a) @ x, rtol=1e-12, atol=1e-10
        )
        # the output is a valid input: pads stay zero
        y2 = dk.from_layout(d, dk.dia_spmv_pallas_layout(d, yL))
        np.testing.assert_allclose(
            np.asarray(y2), to_scipy(a) @ (to_scipy(a) @ x), rtol=1e-12, atol=1e-10
        )

    def test_dia_operator_cg(self):
        import cask_tpu
        from cask_tpu.ops.dia import DiaOperator
        from cask_tpu.solvers import cg

        a = cask_tpu.generate.stencil_2d(95)  # SPD, 9025 rows
        op = DiaOperator(a)
        assert op._use_layout
        b = np.random.default_rng(1).standard_normal(a.shape[0])
        res = cg(op, op.to_padded(b), tol=1e-8, maxiter=600)
        x = np.asarray(op.from_padded(res.x))
        np.testing.assert_allclose(to_scipy(a) @ x, b, rtol=1e-5, atol=1e-6)


class TestInterleaved:
    @pytest.mark.parametrize("gen", [
        lambda: __import__("cask_tpu").generate.stencil_2d(95),
        lambda: __import__("cask_tpu").generate.banded(9000, 3, seed=2),
        lambda: __import__("cask_tpu").generate.stencil_2d(256),
    ])
    def test_correct_and_chains(self, gen):
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = gen()
        d = dia_plan(a)
        assert dk.interleaved_ok(d, jnp.float64)
        x = np.random.default_rng(0).standard_normal(a.shape[0])
        ref = to_scipy(a) @ x
        xI = dk.to_interleaved(d, jnp.asarray(x))
        vI = dk.pack_vals_interleaved(d)
        yI = dk.dia_spmv_pallas_interleaved(d, xI, vI)
        np.testing.assert_allclose(np.asarray(dk.from_interleaved(d, yI)), ref,
                                   rtol=1e-12, atol=1e-10)
        y2 = dk.from_interleaved(d, dk.dia_spmv_pallas_interleaved(d, yI, vI))
        np.testing.assert_allclose(np.asarray(y2), to_scipy(a) @ ref,
                                   rtol=1e-12, atol=1e-10)

    def test_rejects_wide_offsets(self):
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = __import__("cask_tpu").generate.stencil_2d(128)  # off == C
        d = dia_plan(a)
        assert not dk.interleaved_ok(d, jnp.float32)

    @pytest.mark.parametrize("gen", [
        lambda: __import__("cask_tpu").generate.stencil_2d(95),
        lambda: __import__("cask_tpu").generate.banded(9000, 3, seed=2),
        lambda: __import__("cask_tpu").generate.stencil_2d(256),
    ])
    def test_stream_variant_matches(self, gen):
        # HBM-streamed x with chunk prefetch: same layout, same numbers
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = gen()
        d = dia_plan(a)
        x = np.random.default_rng(3).standard_normal(a.shape[0])
        ref = to_scipy(a) @ x
        xI = dk.to_interleaved(d, jnp.asarray(x))
        vI = dk.pack_vals_interleaved(d)
        yI = dk.dia_spmv_pallas_il_stream(d, xI, vI)
        np.testing.assert_allclose(np.asarray(dk.from_interleaved(d, yI)), ref,
                                   rtol=1e-12, atol=1e-10)
        # chains in-layout like the resident variant
        y2 = dk.from_interleaved(d, dk.dia_spmv_pallas_il_stream(d, yI, vI))
        np.testing.assert_allclose(np.asarray(y2), to_scipy(a) @ ref,
                                   rtol=1e-12, atol=1e-10)


class TestSpmmRing:
    @pytest.mark.parametrize("gen,k", [
        (lambda: __import__("cask_tpu").generate.stencil_2d(95), 128),
        (lambda: __import__("cask_tpu").generate.banded(9000, 3, seed=2), 128),
        (lambda: __import__("cask_tpu").generate.stencil_2d(256), 100),
    ])
    def test_correct_and_chains(self, gen, k):
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = gen()
        d = dia_plan(a)
        assert dk.ring_ok(d, k)
        x = np.random.default_rng(0).standard_normal((a.shape[1], k))
        ref = to_scipy(a) @ x
        y = dk.dia_spmm_pallas_ring(d, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-12, atol=1e-10)
        # in/out share the strip layout: chains with no relayout
        xp = dk.to_spmm_ring(d, jnp.asarray(x))
        y2 = dk.dia_spmm_pallas_ring_padded(
            d, dk.dia_spmm_pallas_ring_padded(d, xp))
        np.testing.assert_allclose(
            np.asarray(dk.from_spmm_ring(d, y2, k)), to_scipy(a) @ ref,
            rtol=1e-12, atol=1e-8)

    def test_bf16_out_dtype_chained(self):
        # fully-bf16 pipeline: bf16 value/X/Y streams, f32 in-kernel
        # accumulate, endomorphic for chained timing
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = __import__("cask_tpu").generate.stencil_2d(95, dtype=np.float32)
        d = dia_plan(a)
        import dataclasses as _dc
        db = _dc.replace(d, vals=jnp.asarray(d.vals, jnp.bfloat16),
                         rem_data=jnp.asarray(d.rem_data, jnp.bfloat16))
        k = 128
        x = np.random.default_rng(3).standard_normal((a.shape[1], k)).astype(np.float32)
        ref = to_scipy(a).astype(np.float32) @ x
        xp = dk.to_spmm_ring(db, jnp.asarray(x, jnp.bfloat16))
        yp = dk.dia_spmm_pallas_ring_padded(db, xp, out_dtype=jnp.bfloat16)
        assert yp.dtype == jnp.bfloat16
        assert yp.shape == xp.shape  # endomorphic: chains with no relayout
        y = np.asarray(dk.from_spmm_ring(db, yp, k), dtype=np.float32)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(y, ref, atol=2e-2 * scale)
        # default promotion still yields f32
        yf = dk.dia_spmm_pallas_ring_padded(db, xp)
        assert yf.dtype == jnp.float32

    def test_bf16_in_f32_out_geometry(self):
        # regression: from_spmm_ring must use the INPUT layout's dtype
        # for geometry when out_dtype promotes (bf16 in, f32 out)
        import dataclasses as _dc

        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = __import__("cask_tpu").generate.stencil_2d(95, dtype=np.float32)
        d = dia_plan(a)
        db = _dc.replace(d, vals=jnp.asarray(d.vals, jnp.bfloat16),
                         rem_data=jnp.asarray(d.rem_data, jnp.bfloat16))
        x = np.random.default_rng(5).standard_normal((a.shape[1], 128)).astype(np.float32)
        ref = to_scipy(a).astype(np.float32) @ x
        y = np.asarray(db.spmm(jnp.asarray(x, jnp.bfloat16), method="pallas"),
                       np.float32)
        assert np.abs(y - ref).max() < 2e-2 * np.abs(ref).max()

    def test_dispatch_prefers_ring_at_wide_k(self):
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas import dia_kernels as dk

        a = __import__("cask_tpu").generate.stencil_2d(95)
        d = dia_plan(a)
        x = np.random.default_rng(1).standard_normal((a.shape[1], 128))
        y = d.spmm(jnp.asarray(x), method="pallas")
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x,
                                   rtol=1e-12, atol=1e-10)


class TestLell:
    @pytest.mark.parametrize("groups", [4, 8, 16])
    def test_grouped_correct(self, groups):
        import cask_tpu
        from cask_tpu.ops.pallas.lell_kernels import lell_plan

        a = cask_tpu.generate.random_uniform(2000, density=0.008, seed=3)
        p = lell_plan(a, max_layers=6, groups=groups)
        x = np.random.default_rng(0).standard_normal(a.shape[1])
        y = np.asarray(p.spmv(jnp.asarray(x)))
        np.testing.assert_allclose(y, to_scipy(a) @ x, rtol=1e-11, atol=1e-11)

    def test_hyb_powerlaw(self):
        import cask_tpu
        from cask_tpu.ops.pallas.lell_kernels import lell_plan_hyb

        a = cask_tpu.generate.power_law(3000, avg_degree=10, seed=6)
        h = lell_plan_hyb(a, groups=8, max_layers=6)
        x = np.random.default_rng(1).standard_normal(a.shape[1])
        y = np.asarray(h.spmv(jnp.asarray(x)))
        np.testing.assert_allclose(y, to_scipy(a) @ x, rtol=1e-10, atol=1e-10)
        # hubs took the tail: residual COO spill must be small
        assert h.main.rem_data.shape[0] < 0.02 * a.nnz

    def test_hyb_no_hubs(self):
        import cask_tpu
        from cask_tpu.ops.pallas.lell_kernels import lell_plan_hyb

        a = cask_tpu.generate.stencil_2d(40)
        h = lell_plan_hyb(a)
        assert h.hub.vals.shape[1] == 0 or h.hub.fill() >= 0
        x = np.random.default_rng(2).standard_normal(a.shape[1])
        np.testing.assert_allclose(
            np.asarray(h.spmv(jnp.asarray(x))), to_scipy(a) @ x, rtol=1e-11, atol=1e-11
        )

    def test_rectangular(self):
        import cask_tpu
        from cask_tpu.ops.pallas.lell_kernels import lell_plan

        a = cask_tpu.generate.random_uniform(1500, 900, density=0.01, seed=7)
        p = lell_plan(a, groups=8)
        x = np.random.default_rng(3).standard_normal(900)
        np.testing.assert_allclose(
            np.asarray(p.spmv(jnp.asarray(x))), to_scipy(a) @ x, rtol=1e-11, atol=1e-11
        )
