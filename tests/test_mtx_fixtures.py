"""Real .mtx fixture files through the full pipeline: load → tune →
solve (VERDICT r1 item 9).  The fixtures in tests/data/ exercise the
symmetric / pattern / complex / skew branches of the loader."""

import os

import numpy as np
import pytest

from cask_tpu.formats.mtx import read_mtx

DATA = os.path.join(os.path.dirname(__file__), "data")


def _path(name):
    return os.path.join(DATA, name)


class TestLoaderBranches:
    def test_symmetric_spd(self):
        a = read_mtx(_path("stiff2d_576.mtx"))
        assert a.shape == (576, 576)
        s = _to_dense(a)
        np.testing.assert_allclose(s, s.T, rtol=1e-12)
        w = np.linalg.eigvalsh(s)
        assert w.min() > 0  # genuinely SPD

    def test_pattern_symmetric(self):
        a = read_mtx(_path("graph_pattern_120.mtx"))
        s = _to_dense(a)
        assert set(np.unique(s)) <= {0.0, 1.0}
        np.testing.assert_array_equal(s, s.T)

    def test_complex_keeps_real_part(self):
        a = read_mtx(_path("complex_30x40.mtx"))
        assert a.shape == (30, 40)
        assert np.isrealobj(np.asarray(a.data))

    def test_skew_symmetric(self):
        a = read_mtx(_path("skew_6.mtx"))
        s = _to_dense(a)
        np.testing.assert_allclose(s, -s.T, rtol=1e-12)
        assert np.all(np.diag(s) == 0)


class TestPipeline:
    def test_load_tune_solve(self, tmp_tuner_cache):
        from cask_tpu.solvers import cg
        from cask_tpu.tune import tune

        a = read_mtx(_path("stiff2d_576.mtx"))
        tuned = tune(a, cache=tmp_tuner_cache, time_budget=2)
        rng = np.random.default_rng(0)
        x_true = rng.standard_normal(a.shape[0])
        b = np.asarray(tuned(x_true))
        res = cg(tuned, b, tol=1e-12, maxiter=2000)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6, atol=1e-8)

    def test_roundtrip_write_read(self, tmp_path):
        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.mtx import write_mtx

        a = read_mtx(_path("stiff2d_576.mtx"))
        p = tmp_path / "copy.mtx"
        write_mtx(str(p), a)
        a2 = read_mtx(str(p))
        d = abs(to_scipy(a) - to_scipy(a2))
        assert d.nnz == 0 or d.max() < 1e-12


def _to_dense(a):
    from cask_tpu.formats.convert import to_scipy

    return to_scipy(a).toarray()
