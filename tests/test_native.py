"""Native C++ core vs numpy references (cask host-runtime analog)."""

import io

import numpy as np
import pytest

from cask_tpu.formats.convert import csr_to_bsr, to_scipy
from cask_tpu.formats.generate import banded, power_law, stencil_2d
from cask_tpu.formats.reorder import bandwidth, rcm_permutation, reorder_rcm
from cask_tpu.native import available
from cask_tpu.native import binding as nat

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")


class TestNativeIlu0:
    def test_matches_numpy(self):
        from cask_tpu.ops.ilu import _ilu0_numpy

        a = stencil_2d(9)
        ip = np.asarray(a.indptr, np.int64)
        ix = np.asarray(a.indices, np.int64)
        d = np.asarray(a.data)
        ref = _ilu0_numpy(ip, ix, d)
        got = nat.ilu0(ip, ix, d)
        np.testing.assert_allclose(got, ref, rtol=1e-13)

    def test_used_by_default(self):
        from cask_tpu.ops.ilu import ilu0

        a = banded(120, 3, seed=1, spd=True)
        f_native = ilu0(a)  # default: native when available
        f_numpy = ilu0(a, use_native=False)
        np.testing.assert_allclose(
            np.asarray(f_native.lu.data), np.asarray(f_numpy.lu.data), rtol=1e-13
        )


class TestNativeBsr:
    def test_matches_numpy_path(self):
        a = stencil_2d(60)  # 3600 rows — force both paths explicitly
        from cask_tpu.native.binding import csr_to_bsr_arrays

        bindptr, bindices, bdata = csr_to_bsr_arrays(
            *a.shape, np.asarray(a.indptr), np.asarray(a.indices),
            np.asarray(a.data), 4, 4,
        )
        ref = csr_to_bsr(a, (4, 4))  # small nnz → numpy path
        np.testing.assert_array_equal(bindptr, np.asarray(ref.indptr))
        np.testing.assert_array_equal(bindices, np.asarray(ref.indices))
        np.testing.assert_allclose(bdata, np.asarray(ref.data))


class TestNativeLevels:
    @pytest.mark.parametrize("lower", [True, False])
    def test_matches_frontier(self, lower):
        import scipy.sparse as sp

        from cask_tpu.formats.convert import from_scipy
        from cask_tpu.ops.trisolve import _split_triangle, compute_levels

        rs = np.random.RandomState(0)
        s = sp.random(200, 200, density=0.04, format="csr", random_state=rs)
        s = (sp.tril(s, k=-1) if lower else sp.triu(s, k=1)) + sp.diags(np.ones(200))
        a = from_scipy(s.tocsr())
        rows, cols, strict, _ = _split_triangle(a, lower)
        sr, sc = rows[strict], cols[strict]
        lv = compute_levels(sr, sc, 200, lower)  # native path
        # reference: direct recurrence
        ref = np.zeros(200, dtype=np.int64)
        order = range(200) if lower else range(199, -1, -1)
        by_row = {}
        for r, c in zip(sr, sc):
            by_row.setdefault(r, []).append(c)
        for i in order:
            deps = by_row.get(i, [])
            ref[i] = 1 + max((ref[j] for j in deps), default=-1)
        np.testing.assert_array_equal(lv, ref)


class TestRcm:
    def test_reduces_bandwidth(self):
        a = power_law(400, avg_degree=4, seed=2)
        before = bandwidth(a)
        b, perm = reorder_rcm(a)
        assert sorted(perm) == list(range(400))
        assert bandwidth(b) < before

    def test_permutation_preserves_spmv(self):
        a = stencil_2d(12)
        b, perm = reorder_rcm(a)
        rng = np.random.default_rng(3)
        x = rng.standard_normal(a.shape[1])
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.shape[0])
        y_ref = to_scipy(a) @ x
        y_new = to_scipy(b) @ x[perm]
        np.testing.assert_allclose(y_new[inv], y_ref, rtol=1e-12)

    def test_python_fallback_agrees_structurally(self):
        a = banded(150, 5, density=0.5, seed=4)
        from cask_tpu.formats.reorder import _rcm_python, _symmetrize_pattern

        sym = _symmetrize_pattern(a)
        p = _rcm_python(np.asarray(sym.indptr, np.int64), np.asarray(sym.indices, np.int64))
        assert sorted(p) == list(range(150))


class TestNativeMtx:
    def test_big_parse_matches(self, tmp_path):
        from cask_tpu.formats.mtx import read_mtx, write_mtx

        a = power_law(2000, avg_degree=30, seed=5)  # >100k nnz → native path
        assert a.nnz > 100_000
        p = tmp_path / "big.mtx"
        write_mtx(p, a)
        b = read_mtx(p)
        assert (abs(to_scipy(a) - to_scipy(b)) > 1e-14).nnz == 0


class TestNativeAggregate:
    def test_parity_with_python_fallback(self):
        import numpy as np
        import pytest

        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.generate import power_law, stencil_2d
        from cask_tpu.native import binding
        from cask_tpu.solvers.amg import _strength_graph

        if not binding.available():
            pytest.skip("native core unavailable")
        # re-derive the Python greedy passes inline (the shipped
        # _aggregate routes through native; parity needs both paths)
        def py_aggregate(strength):
            n = strength.shape[0]
            indptr, indices = strength.indptr, strength.indices
            agg = np.full(n, -1, dtype=np.int64)
            next_id = 0
            for i in range(n):
                if agg[i] != -1:
                    continue
                nbrs = indices[indptr[i]:indptr[i + 1]]
                if (agg[nbrs] == -1).all():
                    agg[i] = next_id
                    agg[nbrs] = next_id
                    next_id += 1
            for i in range(n):
                if agg[i] != -1:
                    continue
                nbrs = indices[indptr[i]:indptr[i + 1]]
                hit = nbrs[agg[nbrs] != -1]
                if hit.size:
                    agg[i] = agg[hit[0]]
            for i in range(n):
                if agg[i] == -1:
                    agg[i] = next_id
                    next_id += 1
            return agg

        for mat in (stencil_2d(30), power_law(900, avg_degree=5, seed=4)):
            s = _strength_graph(to_scipy(mat).tocsr().astype(np.float64), 0.08)
            agg_c, n_agg = binding.aggregate(s.indptr, s.indices)
            agg_py = py_aggregate(s)
            np.testing.assert_array_equal(agg_c, agg_py)
            assert n_agg == int(agg_py.max()) + 1
