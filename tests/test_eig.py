"""LOBPCG block eigensolver vs dense/scipy ground truth."""

import numpy as np
import pytest

from cask_tpu.formats.convert import to_scipy
from cask_tpu.formats.generate import stencil_2d
from cask_tpu.solvers import lobpcg


def _spd():
    return stencil_2d(12)  # 144×144 SPD Laplacian


class TestLobpcg:
    def test_smallest_eigenpairs(self):
        a = _spd()
        dense = to_scipy(a).toarray()
        w = np.linalg.eigvalsh(dense)
        x0 = np.random.default_rng(0).standard_normal((a.shape[0], 4))
        res = lobpcg(a, x0, tol=1e-6, maxiter=300)
        assert bool(res.converged), float(res.residual_norm)
        np.testing.assert_allclose(np.asarray(res.theta), w[:4], rtol=1e-6)
        # residuals certify the eigenvectors
        X = np.asarray(res.x)
        r = dense @ X - X * np.asarray(res.theta)[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-6

    def test_largest_eigenpairs(self):
        a = _spd()
        w = np.linalg.eigvalsh(to_scipy(a).toarray())
        x0 = np.random.default_rng(1).standard_normal((a.shape[0], 3))
        res = lobpcg(a, x0, largest=True, tol=1e-6, maxiter=300)
        assert bool(res.converged)
        np.testing.assert_allclose(np.sort(np.asarray(res.theta)), w[-3:], rtol=1e-6)

    def test_preconditioning_reduces_iterations(self):
        from cask_tpu.solvers import ic0

        a = stencil_2d(16)
        x0 = np.random.default_rng(2).standard_normal((a.shape[0], 4))
        plain = lobpcg(a, x0, tol=1e-6, maxiter=400)
        pre = lobpcg(a, x0, tol=1e-6, maxiter=400, M=ic0(a).apply)
        assert bool(pre.converged)
        assert int(pre.iterations) < int(plain.iterations)
        w = np.linalg.eigvalsh(to_scipy(a).toarray())
        np.testing.assert_allclose(np.asarray(pre.theta), w[:4], rtol=1e-5)

    def test_jittable_and_callable_operator(self):
        import jax
        import jax.numpy as jnp

        from cask_tpu.ops.spmm import spmm

        a = _spd()
        dev = a.device_put()
        w = np.linalg.eigvalsh(to_scipy(a).toarray())
        x0 = np.random.default_rng(3).standard_normal((a.shape[0], 2))

        @jax.jit
        def smallest(x0):
            return lobpcg(lambda v: spmm(dev, v), x0, tol=1e-6, maxiter=300).theta

        np.testing.assert_allclose(np.asarray(smallest(jnp.asarray(x0))),
                                   w[:2], rtol=1e-6)

    def test_validation(self):
        a = _spd()
        with pytest.raises(ValueError):
            lobpcg(a, np.ones(a.shape[0]))  # not 2-D
        with pytest.raises(ValueError):
            lobpcg(a, np.ones((a.shape[0], a.shape[0] // 2)))  # 3k >= n

    def test_matches_scipy_eigsh(self):
        import scipy.sparse.linalg as spla

        a = stencil_2d(14)
        sp = to_scipy(a)
        ref = np.sort(spla.eigsh(sp, k=5, which="SM",
                                 return_eigenvectors=False))
        x0 = np.random.default_rng(4).standard_normal((a.shape[0], 5))
        res = lobpcg(a, x0, tol=1e-6, maxiter=500)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.theta), ref, rtol=1e-5)
