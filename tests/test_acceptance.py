"""BASELINE.json acceptance configs, one test per config.

These are the driver's five acceptance configurations (BASELINE.md),
exercised at CI scale on the CPU harness; the perf-side obligations run
on hardware via bench.py / cask-tpu-bench (PERF.md records results).
"""

import numpy as np
import pytest

import cask_tpu
from cask_tpu.formats.convert import csr_to_bsr, to_scipy
from cask_tpu.formats.generate import fem_blocks, power_law, stencil_2d, suite


class TestConfig1_CsrSpmvF64:
    """CSR SpMV, float64, ~2k-row SuiteSparse-style matrix vs scipy."""

    def test_exact_f64(self):
        a = suite("small")["bcsstk_like"]  # banded SPD, 2003 rows (bcsstk analog)
        assert 1500 <= a.shape[0] <= 3000
        assert np.dtype(a.dtype) == np.float64
        rng = np.random.default_rng(0)
        x = rng.standard_normal(a.shape[1])
        y = cask_tpu.spmv(a, x, method="xla")
        ref = to_scipy(a) @ x
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-12, atol=0)


class TestConfig2_AutotunedBsrSpmv:
    """Autotuned SpMV on mid-size structured (FEM/stencil) matrices.

    CI-scale stand-in; the 100k-row hardware run is PERF.md's job.
    """

    def test_tuner_picks_structured_kernel(self, tmp_tuner_cache):
        a = fem_blocks(40, dof=4)  # 6400 rows, natural 4x4 blocks
        t = cask_tpu.tune(a, cache=tmp_tuner_cache, time_budget=3)
        rng = np.random.default_rng(1)
        x = rng.standard_normal(a.shape[1])
        np.testing.assert_allclose(
            np.asarray(t(x)), to_scipy(a) @ x, rtol=1e-10, atol=1e-10
        )
        # a structured variant must win over the plain gather path
        assert t.variant != "csr_xla"

    def test_bsr_formats_on_fem(self):
        a = fem_blocks(25, dof=4)
        rng = np.random.default_rng(2)
        x = rng.standard_normal(a.shape[1])
        for bs in (4, 8):
            y = cask_tpu.spmv(csr_to_bsr(a, bs), x)
            np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x,
                                       rtol=1e-10, atol=1e-10)


class TestConfig3_SpmmTallSkinny:
    """SpMM k in {32, 128}, CSR + BSR."""

    @pytest.mark.parametrize("k", [32, 128])
    def test_csr_and_bsr(self, k):
        a = stencil_2d(40)
        rng = np.random.default_rng(3)
        X = rng.standard_normal((a.shape[1], k))
        ref = to_scipy(a) @ X
        np.testing.assert_allclose(np.asarray(cask_tpu.spmm(a, X)), ref,
                                   rtol=1e-10, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(cask_tpu.spmm(csr_to_bsr(a, 4), X)), ref, rtol=1e-10, atol=1e-9
        )


class TestConfig4_SpGEMM:
    """SpGEMM A·A and A·B on graph matrices."""

    def test_aa(self):
        a = power_law(1000, avg_degree=8, seed=4)
        c = cask_tpu.spgemm(a)
        ref = (to_scipy(a) @ to_scipy(a)).tocsr()
        d = abs(to_scipy(c) - ref)
        assert d.nnz == 0 or d.max() < 1e-9

    def test_ab(self):
        a = power_law(600, avg_degree=6, seed=5)
        b = power_law(600, avg_degree=6, seed=6)
        c = cask_tpu.spgemm(a, b)
        ref = (to_scipy(a) @ to_scipy(b)).tocsr()
        d = abs(to_scipy(c) - ref)
        assert d.nnz == 0 or d.max() < 1e-9


class TestConfig5_DistributedHalo:
    """Row-partitioned SpMV/SpMM with halo exchange, multi-device.

    Fake 8-device mesh here (the multi-host simulation harness); the
    ≥10M-row variant is tests/distributed/test_scale.py (CASK_TPU_SLOW)
    and the real N≥2-host run needs the driver's slice.
    """

    def test_spmv_and_spmm_on_mesh(self):
        from cask_tpu.parallel import DistSpmv, partition_dia, row_mesh

        a = stencil_2d(64, dtype=np.float32)
        op = DistSpmv(partition_dia(a, 8), row_mesh(8))
        rng = np.random.default_rng(7)
        x = rng.standard_normal(a.shape[1]).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(op(x)), to_scipy(a) @ x, rtol=1e-5, atol=1e-5
        )
        X = rng.standard_normal((a.shape[1], 16)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(op(X)), to_scipy(a) @ X, rtol=1e-5, atol=1e-4
        )

    def test_overlap_structure_preserved(self):
        # the interior compute must not depend on the collectives: build
        # the jaxpr and check ppermute appears after the interior ops can
        # be scheduled — structural proxy: overlap=False differs only by
        # an optimization_barrier
        from cask_tpu.parallel import DistSpmv, partition_dia, row_mesh

        a = stencil_2d(32, dtype=np.float32)
        plan = partition_dia(a, 4)
        mesh = row_mesh(4)
        x = np.random.default_rng(8).standard_normal(a.shape[0]).astype(np.float32)
        y_ov = DistSpmv(plan, mesh, overlap=True)(x)
        y_ser = DistSpmv(plan, mesh, overlap=False)(x)
        np.testing.assert_allclose(np.asarray(y_ov), np.asarray(y_ser), rtol=1e-6)
