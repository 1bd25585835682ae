"""Formats: construction, conversion round-trips, IO, signatures.

Ground truth: scipy.sparse (SURVEY.md §4 item 1)."""

import io

import numpy as np
import pytest
import scipy.sparse as sp

from cask_tpu.formats import BSR, COO, CSR, signature
from cask_tpu.formats.convert import (
    bsr_to_csr,
    coo_to_csr,
    csr_to_bsr,
    csr_to_coo,
    from_scipy,
    to_scipy,
)
from cask_tpu.formats.generate import (
    banded,
    fem_blocks,
    power_law,
    random_uniform,
    stencil_2d,
    stencil_3d,
    suite,
)
from cask_tpu.formats.mtx import read_mtx, write_mtx


def _rand_scipy(m, n, density, seed=0):
    rs = np.random.RandomState(seed)
    return sp.random(m, n, density=density, format="csr", random_state=rs)


class TestConversions:
    @pytest.mark.parametrize("shape,density", [((40, 40), 0.1), ((83, 61), 0.07), ((1, 5), 0.5)])
    def test_scipy_roundtrip_csr(self, shape, density):
        s = _rand_scipy(*shape, density)
        a = from_scipy(s)
        assert isinstance(a, CSR)
        back = to_scipy(a)
        assert (abs(back - s) > 0).nnz == 0

    def test_coo_csr_roundtrip(self):
        s = _rand_scipy(57, 43, 0.1, seed=1)
        a = from_scipy(s, format="coo")
        csr = coo_to_csr(a)
        np.testing.assert_allclose(csr.todense(), s.toarray())
        coo2 = csr_to_coo(csr)
        np.testing.assert_allclose(coo2.todense(), s.toarray())

    def test_coo_duplicates_summed(self):
        a = COO(
            data=np.array([1.0, 2.0, 3.0]),
            row=np.array([0, 0, 1], np.int32),
            col=np.array([1, 1, 0], np.int32),
            shape=(2, 2),
        )
        csr = coo_to_csr(a)
        assert csr.nnz == 2
        np.testing.assert_allclose(csr.todense(), [[0.0, 3.0], [3.0, 0.0]])

    @pytest.mark.parametrize("bs", [(2, 2), (3, 3), (4, 8), (8, 8)])
    def test_bsr_roundtrip(self, bs):
        s = _rand_scipy(50, 70, 0.08, seed=2)
        csr = from_scipy(s)
        b = csr_to_bsr(csr, bs)
        assert isinstance(b, BSR)
        np.testing.assert_allclose(b.todense(), s.toarray())
        back = bsr_to_csr(b)
        np.testing.assert_allclose(back.todense(), s.toarray())

    def test_bsr_matches_scipy_bsr(self):
        s = _rand_scipy(48, 48, 0.1, seed=3)
        ours = csr_to_bsr(from_scipy(s), (4, 4))
        theirs = sp.bsr_matrix(s, blocksize=(4, 4))
        # same dense reconstruction; block counts agree
        np.testing.assert_allclose(ours.todense(), theirs.toarray())
        assert ours.n_blocks == theirs.data.shape[0]

    def test_bsr_fill_ratio(self):
        b = fem_blocks(6, dof=4, return_bsr=True)
        assert b.blocksize == (4, 4)
        # natural block structure → fill close to 1 (diag blocks fully dense,
        # off-diag blocks dense by construction)
        assert b.fill_ratio() < 1.2


class TestMtxIO:
    def test_roundtrip(self, tmp_path):
        s = _rand_scipy(30, 20, 0.15, seed=4)
        a = from_scipy(s)
        p = tmp_path / "m.mtx"
        write_mtx(p, a)
        b = read_mtx(p)
        np.testing.assert_allclose(b.todense(), s.toarray(), rtol=1e-15)

    def test_symmetric_expansion(self):
        text = """%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 2.0
2 1 -1.0
2 2 2.0
3 3 1.5
"""
        a = read_mtx(io.StringIO(text))
        expect = np.array([[2.0, -1.0, 0], [-1.0, 2.0, 0], [0, 0, 1.5]])
        np.testing.assert_allclose(a.todense(), expect)

    def test_pattern(self):
        text = """%%MatrixMarket matrix coordinate pattern general
2 2 2
1 2
2 1
"""
        a = read_mtx(io.StringIO(text))
        np.testing.assert_allclose(a.todense(), [[0, 1], [1, 0]])

    def test_gzip(self, tmp_path):
        import gzip

        s = _rand_scipy(10, 10, 0.3, seed=5)
        p = tmp_path / "m.mtx.gz"
        with gzip.open(p, "wt") as f:
            write_mtx(f, from_scipy(s))
        a = read_mtx(p)
        np.testing.assert_allclose(a.todense(), s.toarray(), rtol=1e-15)


class TestGenerators:
    def test_banded_structure(self):
        a = banded(100, 3, seed=0)
        dense = a.todense()
        i, j = np.nonzero(dense)
        assert np.all(np.abs(i - j) <= 3)

    def test_stencil_2d_is_spd(self):
        a = stencil_2d(8)
        d = a.todense()
        np.testing.assert_allclose(d, d.T)
        w = np.linalg.eigvalsh(d)
        assert w.min() > -1e-12

    def test_stencil_3d_shape(self):
        a = stencil_3d(5)
        assert a.shape == (125, 125)
        assert a.nnz == 125 + 2 * 3 * (4 * 25)

    def test_power_law_heavy_tail(self):
        a = power_law(500, avg_degree=6, seed=1)
        lens = a.row_lengths()
        assert lens.max() > 5 * max(lens.mean(), 1)

    def test_random_uniform_density(self):
        a = random_uniform(200, density=0.05, seed=2)
        assert abs(a.nnz / 200**2 - 0.05) < 0.01

    def test_suite_small(self):
        mats = suite("small")
        assert len(mats) >= 5
        for name, a in mats.items():
            assert a.shape[0] >= 1000, name


class TestSignature:
    def test_stable_and_distinct(self):
        a = stencil_2d(20)
        b = stencil_2d(20)
        c = power_law(400, seed=3)
        assert signature(a).key() == signature(b).key()
        assert signature(a).key() != signature(c).key()

    def test_class_key_ignores_size(self):
        a = stencil_2d(20)
        b = stencil_2d(40)
        assert signature(a).class_key() == signature(b).class_key()

    def test_value_invariance(self):
        a = stencil_2d(15)
        scaled = CSR(
            data=np.asarray(a.data) * 3.7,
            indices=a.indices,
            indptr=a.indptr,
            shape=a.shape,
        )
        assert signature(a).key() == signature(scaled).key()


class TestPytree:
    def test_csr_is_pytree(self):
        import jax

        a = stencil_2d(6)
        leaves = jax.tree.leaves(a)
        assert len(leaves) == 3  # data, indices, indptr

        def f(mat):
            return mat.data.sum()

        out = jax.jit(f)(a.device_put())
        np.testing.assert_allclose(float(out), float(np.asarray(a.data).sum()))

    def test_bsr_static_metadata(self):
        import jax

        b = csr_to_bsr(stencil_2d(6), (4, 4))

        @jax.jit
        def f(mat):
            assert mat.blocksize == (4, 4)  # static at trace time
            return mat.data.sum()

        f(b.device_put())


class TestBcooInterop:
    def test_roundtrip(self):
        from cask_tpu.formats.convert import from_bcoo, to_bcoo, to_scipy

        a = stencil_2d(8)
        b = to_bcoo(a)
        assert b.shape == a.shape
        back = from_bcoo(b)
        np.testing.assert_allclose(back.todense(), a.todense())

    def test_bcoo_matvec_agrees(self):
        import jax.numpy as jnp

        from cask_tpu.formats.convert import to_bcoo

        a = stencil_2d(7)
        x = np.random.default_rng(0).standard_normal(49)
        y_bcoo = to_bcoo(a) @ jnp.asarray(x)
        from cask_tpu import spmv

        np.testing.assert_allclose(np.asarray(y_bcoo), np.asarray(spmv(a, x)), rtol=1e-12)


class TestAstype:
    def test_astype_all_formats(self):
        import jax.numpy as jnp

        from cask_tpu.formats.convert import csr_to_bsr, csr_to_coo

        a = banded(64, 2, seed=0)
        for mat in (a, csr_to_coo(a), csr_to_bsr(a, (4, 4))):
            lo = mat.astype(jnp.float32)
            assert lo.dtype == jnp.float32
            assert lo.shape == mat.shape
            np.testing.assert_allclose(
                lo.todense(), mat.todense().astype(np.float32), rtol=1e-6)
            # indices untouched (shared identity is fine)
            hi = lo.astype(np.float64)
            np.testing.assert_allclose(hi.todense(), lo.todense())


class TestTranspose:
    @pytest.mark.parametrize("shape,density", [((40, 40), 0.1), ((83, 61), 0.07), ((7, 90), 0.2)])
    def test_transpose_coo_csr(self, shape, density):
        from cask_tpu.formats.convert import transpose

        s = _rand_scipy(*shape, density, seed=3)
        for fmt in (None, "coo"):
            a = from_scipy(s, format=fmt)
            at = transpose(a)
            assert at.shape == (shape[1], shape[0])
            np.testing.assert_allclose(at.todense(), s.toarray().T)

    @pytest.mark.parametrize("bs", [(2, 3), (4, 4)])
    def test_transpose_bsr(self, bs):
        from cask_tpu.formats.convert import transpose

        s = _rand_scipy(37, 53, 0.15, seed=4)
        a = csr_to_bsr(from_scipy(s), bs)
        at = transpose(a)
        assert at.blocksize == (bs[1], bs[0])
        assert at.shape == (53, 37)
        np.testing.assert_allclose(at.todense(), s.toarray().T)
        # double transpose round-trips
        np.testing.assert_allclose(transpose(at).todense(), a.todense())

    def test_transpose_csr_indices_sorted(self):
        from cask_tpu.formats.convert import transpose

        s = _rand_scipy(64, 64, 0.1, seed=5)
        at = transpose(from_scipy(s))
        indptr = np.asarray(at.indptr)
        indices = np.asarray(at.indices)
        for i in range(at.shape[0]):
            seg = indices[indptr[i]:indptr[i + 1]]
            assert (np.diff(seg) > 0).all()
