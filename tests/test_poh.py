"""Panel one-hot SpMV kernel (interpret mode) vs scipy ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from cask_tpu.formats.convert import to_scipy
from cask_tpu.formats.generate import banded, power_law, random_uniform
from cask_tpu.formats.matrix import CSR
from cask_tpu.ops.pallas.poh_kernels import PohMatrix, poh_plan, poh_synth_device


def _check(a: CSR, seed=0, rtol=1e-12, atol=1e-12, **plan_kw):
    p = poh_plan(a, **plan_kw)
    x = np.random.default_rng(seed).standard_normal(a.shape[1]).astype(a.dtype)
    y = np.asarray(p.spmv(jnp.asarray(x)))
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=rtol, atol=atol)
    return p


class TestPohSpmv:
    def test_power_law(self):
        p = _check(power_law(5000, avg_degree=12, seed=1))
        assert p.fill() > 0.8  # column sorting keeps padding waste small

    def test_rectangular_wide(self):
        _check(random_uniform(3000, 4700, density=0.002, seed=2))

    def test_rectangular_tall(self):
        _check(random_uniform(4700, 1100, density=0.002, seed=3))

    def test_banded(self):
        _check(banded(2000, 9, seed=4))

    @pytest.mark.parametrize("precision,tol", [("split", 5e-5), ("fast", 2e-2),
                                               ("highest", 2e-5)])
    def test_f32_precision_modes(self, precision, tol):
        a = power_law(3000, avg_degree=10, dtype=np.float32, seed=5)
        p = poh_plan(a)
        x = np.random.default_rng(0).standard_normal(a.shape[1]).astype(np.float32)
        y = np.asarray(p.spmv(jnp.asarray(x), precision=precision))
        ref = to_scipy(a) @ x
        np.testing.assert_allclose(y, ref, rtol=tol, atol=tol)

    def test_bf16(self):
        a32 = power_law(2000, avg_degree=8, dtype=np.float32, seed=13)
        a = CSR(data=a32.data.astype(jnp.bfloat16), indices=a32.indices,
                indptr=a32.indptr, shape=a32.shape)
        p = poh_plan(a)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(a.shape[1]), jnp.bfloat16)
        y = np.asarray(p.spmv(x), dtype=np.float64)
        ref = to_scipy(a32) @ np.asarray(x, np.float64)
        np.testing.assert_allclose(y, ref, rtol=0.1, atol=0.1)

    def test_small_matrix_smaller_than_panel(self):
        _check(random_uniform(50, 70, density=0.05, seed=6))

    def test_n_smaller_than_window(self):
        _check(random_uniform(5000, 300, density=0.01, seed=7))

    def test_empty_rows_and_cols(self):
        # rows/cols 100..199 structurally empty
        a0 = random_uniform(400, 400, density=0.02, seed=8)
        s = to_scipy(a0).tolil()
        s[100:200, :] = 0
        s[:, 100:200] = 0
        from cask_tpu.formats.convert import from_scipy

        _check(from_scipy(s.tocsr(), format="csr"))

    def test_empty_matrix(self):
        from cask_tpu.formats.convert import from_scipy
        import scipy.sparse as sp

        a = from_scipy(sp.csr_matrix((300, 500)), format="csr")
        _check(a)

    def test_plan_params(self):
        a = power_law(4000, avg_degree=8, seed=9)
        for kw in ({"row_panel": 1024}, {"col_window": 512},
                   {"tile_slots": 1024}, {"row_panel": 8192, "tile_slots": 4096}):
            _check(a, **kw)

    def test_single_dense_column(self):
        # a hub column touched by every row — worst case for windowing
        m = 3000
        row = np.arange(m, dtype=np.int64)
        col = np.full(m, 7, dtype=np.int64)
        from cask_tpu.formats.convert import coo_from_arrays, coo_to_csr

        a = coo_to_csr(coo_from_arrays(
            np.random.default_rng(0).standard_normal(m), row, col, (m, m)))
        _check(a)

    def test_jit_pytree(self):
        import jax

        a = power_law(2000, avg_degree=8, seed=10)
        p = poh_plan(a)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(a.shape[1]))
        y1 = jax.jit(lambda q, v: q.spmv(v))(p, x)
        np.testing.assert_allclose(np.asarray(y1), to_scipy(a) @ np.asarray(x),
                                   rtol=1e-12, atol=1e-12)


class TestPohTunerIntegration:
    def test_variant_build(self):
        from cask_tpu.tune.tuner import Variant

        a = power_law(1500, avg_degree=8, dtype=np.float32, seed=11)
        ref = to_scipy(a) @ np.ones(a.shape[1])
        for name in ("poh", "poh:1024", "poh_fast"):
            dev, fn = Variant(name, 0.0).build(a, None)
            y = np.asarray(fn(jnp.ones(a.shape[1], jnp.float32)))
            np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)

    def test_enumerated_for_unstructured(self):
        from cask_tpu.formats.signature import signature
        from cask_tpu.tune.tuner import enumerate_variants

        a = power_law(2000, avg_degree=8, dtype=np.float32, seed=12)
        names = {v.name for v in
                 enumerate_variants(a, signature(a), None, include_pallas=True)}
        assert {"poh", "poh:8192", "poh_fast:8192"} <= names
        # f64 stays off the one-hot MXU path (f32-cast would lose precision)
        a64 = power_law(2000, avg_degree=8, dtype=np.float64, seed=12)
        names64 = {v.name for v in
                   enumerate_variants(a64, signature(a64), None, include_pallas=True)}
        assert not any(n.startswith("poh") for n in names64)


class TestPohSynth:
    def test_device_synth_runs(self):
        d = poh_synth_device(n_panels=2, tiles_per_panel=3, row_panel=1024,
                             col_window=512, tile_slots=1024)
        assert isinstance(d, PohMatrix)
        x = jnp.ones((d.shape[1],), jnp.float32)
        y = d.spmv(x)
        assert y.shape == (d.shape[0],)
        assert bool(jnp.isfinite(y).all())

    def test_synth_contraction_stable(self):
        d = poh_synth_device(n_panels=2, tiles_per_panel=4, row_panel=1024,
                             col_window=512, tile_slots=1024)
        x = jnp.ones((d.shape[1],), jnp.float32)
        for _ in range(30):
            x = d.spmv(x)
        assert bool(jnp.isfinite(x).all())


class TestPohSpmm:
    """SpMM on the panel one-hot pack (k ≤ 64)."""

    @pytest.mark.parametrize("k", [8, 32, 64])
    def test_vs_scipy(self, k):
        a = power_law(3000, avg_degree=10, seed=1)
        p = poh_plan(a)
        X = np.random.default_rng(0).standard_normal((a.shape[1], k))
        Y = np.asarray(p.spmm(jnp.asarray(X)))
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-12, atol=1e-12)

    def test_rectangular(self):
        a = random_uniform(2000, 2700, density=0.003, seed=2)
        p = poh_plan(a)
        X = np.random.default_rng(1).standard_normal((a.shape[1], 16))
        Y = np.asarray(p.spmm(jnp.asarray(X)))
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-12, atol=1e-12)

    def test_f32_precision_modes(self):
        a = power_law(2000, avg_degree=8, dtype=np.float32, seed=3)
        p = poh_plan(a)
        X = np.random.default_rng(2).standard_normal((a.shape[1], 8)).astype(np.float32)
        ref = to_scipy(a) @ X
        # split error grows ~2^-17·sqrt(row degree): hub rows dominate
        for prec, tol in [("split", 1e-3), ("fast", 2e-2), ("highest", 2e-4)]:
            Y = np.asarray(p.spmm(jnp.asarray(X), precision=prec))
            np.testing.assert_allclose(Y, ref, rtol=tol, atol=tol)

    def test_wide_k_chunks(self):
        a = power_law(1000, avg_degree=6, seed=4)
        p = poh_plan(a)
        X = np.random.default_rng(4).standard_normal((a.shape[1], 150))
        Y = np.asarray(p.spmm(jnp.asarray(X)))
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-12, atol=1e-12)

    def test_raw_kernel_k_limit_raises(self):
        from cask_tpu.ops.pallas.poh_kernels import poh_spmm_pallas

        a = power_law(500, avg_degree=5, seed=4)
        p = poh_plan(a)
        with pytest.raises(ValueError):
            poh_spmm_pallas(p, jnp.ones((a.shape[1], 128)))

    def test_tuner_variant(self):
        from cask_tpu.tune.tuner import Variant

        a = power_law(1500, avg_degree=8, dtype=np.float32, seed=5)
        X = np.ones((a.shape[1], 8), np.float32)
        ref = to_scipy(a) @ X
        for name in ("poh_mm", "poh_mm_fast"):
            _, fn = Variant(name, 0.0).build(a, 8)
            np.testing.assert_allclose(np.asarray(fn(jnp.asarray(X))), ref,
                                       rtol=2e-4, atol=2e-4)


class TestPohDebug:
    def test_check_poh_validates_and_reconstructs(self):
        from cask_tpu.utils.debug import check_poh

        a = power_law(2500, avg_degree=9, seed=21)
        check_poh(poh_plan(a), a)

    def test_check_poh_catches_corruption(self):
        import dataclasses

        from cask_tpu.utils.debug import check_poh

        a = power_law(800, avg_degree=6, seed=22)
        p = poh_plan(a)
        bad = dataclasses.replace(
            p, cloc=jnp.asarray(np.asarray(p.cloc) + 10_000))
        with pytest.raises(AssertionError):
            check_poh(bad)


class TestPohTranspose:
    def test_to_coo_roundtrip(self):
        from cask_tpu.ops.pallas.poh_kernels import poh_to_coo

        a = power_law(2000, avg_degree=10, seed=6)
        p = poh_plan(a)
        np.testing.assert_allclose(poh_to_coo(p).todense(), to_scipy(a).toarray())

    def test_transpose_plan_spmv(self):
        from cask_tpu.ops.pallas.poh_kernels import poh_transpose_plan

        a = random_uniform(1500, 2300, density=0.004, seed=7)
        p = poh_plan(a)
        pt = poh_transpose_plan(p)
        assert pt.shape == (2300, 1500)
        x = np.random.default_rng(8).standard_normal(1500).astype(a.dtype)
        y = np.asarray(pt.spmv(jnp.asarray(x)))
        np.testing.assert_allclose(y, to_scipy(a).T @ x, rtol=1e-10, atol=1e-10)

    def test_dispatch_transpose(self):
        from cask_tpu import spmv as _spmv

        a = power_law(1200, avg_degree=8, seed=9)
        p = poh_plan(a)
        x = np.random.default_rng(10).standard_normal(a.shape[0]).astype(a.dtype)
        y = np.asarray(_spmv(p, jnp.asarray(x), transpose=True))
        np.testing.assert_allclose(y, to_scipy(a).T @ x, rtol=1e-10, atol=1e-10)
