"""SpMM (sparse × dense tall-skinny) vs scipy (BASELINE config 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cask_tpu import spmm
from cask_tpu.formats.convert import csr_to_bsr, csr_to_coo, to_scipy
from cask_tpu.formats.generate import banded, fem_blocks, power_law, stencil_2d
from cask_tpu.ops.dia import dia_plan

MATS = {
    "banded": lambda: banded(301, 5, seed=1),
    "stencil": lambda: stencil_2d(18),
    "fem": lambda: fem_blocks(8, dof=4),
    "powerlaw": lambda: power_law(400, avg_degree=6, seed=2),
}


def _X(a, k, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((a.shape[1], k))


@pytest.mark.parametrize("name", list(MATS))
@pytest.mark.parametrize("k", [32, 128])
class TestSpmm:
    def test_csr(self, name, k):
        a = MATS[name]()
        x = _X(a, k)
        y = spmm(a, x, method="xla")
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_coo(self, name, k):
        a = MATS[name]()
        x = _X(a, k)
        y = spmm(csr_to_coo(a), x)
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_bsr(self, name, k):
        a = MATS[name]()
        x = _X(a, k)
        y = spmm(csr_to_bsr(a, 4), x)
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_csr_transpose(self, name, k):
        a = MATS[name]()
        rng = np.random.default_rng(3)
        x = rng.standard_normal((a.shape[0], k))
        y = spmm(a, x, transpose=True)
        np.testing.assert_allclose(np.asarray(y), to_scipy(a).T @ x, rtol=1e-12, atol=1e-10)

    def test_bsr_transpose(self, name, k):
        a = MATS[name]()
        rng = np.random.default_rng(4)
        x = rng.standard_normal((a.shape[0], k))
        y = spmm(csr_to_bsr(a, 4), x, transpose=True)
        np.testing.assert_allclose(np.asarray(y), to_scipy(a).T @ x, rtol=1e-12, atol=1e-10)


class TestSpmmDia:
    @pytest.mark.parametrize("k", [32, 128])
    def test_dia_xla(self, k):
        a = stencil_2d(18)
        x = _X(a, k)
        d = dia_plan(a)
        y = d._spmm_xla(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    @pytest.mark.parametrize("k", [32, 128])
    def test_dia_pallas_interpret(self, k):
        a = banded(9000, 2, seed=5)
        x = _X(a, k)
        d = dia_plan(a)
        from cask_tpu.ops.pallas.dia_kernels import dia_spmm_pallas, pallas_ok

        assert pallas_ok(d, k=k)
        y = dia_spmm_pallas(d, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)


class TestSpmmDiaKt:
    """Transposed-k SpMM: k in sublanes, rows in lanes (k ≤ 64 path)."""

    @pytest.mark.parametrize("k", [8, 20, 32, 64])
    def test_vs_scipy(self, k):
        a = banded(9000, 2, seed=5)
        x = _X(a, k)
        d = dia_plan(a)
        from cask_tpu.ops.pallas.dia_kernels import dia_spmm_pallas_kt, kt_ok

        assert kt_ok(d, k)
        y = dia_spmm_pallas_kt(d, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_dispatch_uses_kt_for_narrow_k(self):
        a = stencil_2d(25)
        x = _X(a, 16)
        d = dia_plan(a)
        y = d.spmm(jnp.asarray(x), method="pallas")
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_padded_layout_roundtrip(self):
        from cask_tpu.ops.pallas.dia_kernels import (
            dia_spmm_pallas_kt_padded, pad_xt_spmm)

        a = banded(3000, 4, seed=6)
        d = dia_plan(a)
        x = _X(a, 32)
        xt = pad_xt_spmm(d, jnp.asarray(x))
        yt = dia_spmm_pallas_kt_padded(d, xt)
        np.testing.assert_allclose(np.asarray(yt[:32, : a.shape[0]].T),
                                   to_scipy(a) @ x, rtol=1e-12, atol=1e-10)

    def test_asymmetric_offsets(self):
        # strictly upper-shifted band (lo=0) and lower-shifted band (hi=0)
        import scipy.sparse as sp

        from cask_tpu.formats.convert import from_scipy

        n = 2000
        rng = np.random.default_rng(7)
        for offs in ([1, 3, 7], [-5, -2, 0]):
            s = sp.diags([rng.standard_normal(n - abs(o)) for o in offs],
                         offs, shape=(n, n)).tocsr()
            a = from_scipy(s, format="csr")
            d = dia_plan(a)
            x = rng.standard_normal((n, 24))
            from cask_tpu.ops.pallas.dia_kernels import dia_spmm_pallas_kt

            y = dia_spmm_pallas_kt(d, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(y), s @ x, rtol=1e-12, atol=1e-10)


class TestSpmmBdiaDispatch:
    def test_bdia_matrix_spmm_and_transpose(self):
        import jax.numpy as jnp
        import numpy as np

        from cask_tpu import bdia_plan, spmm
        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.generate import fem_blocks

        a = fem_blocks(6, dof=2)
        plan = bdia_plan(a, (2, 2))
        k = 8
        x = np.random.default_rng(11).standard_normal((a.shape[1], k))
        y = spmm(plan, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-11)
        xt = np.random.default_rng(12).standard_normal((a.shape[0], k))
        yt = spmm(plan, jnp.asarray(xt), transpose=True)
        np.testing.assert_allclose(np.asarray(yt), to_scipy(a).T @ xt, rtol=1e-11)

    def test_ring_vals_pack_no_tracer_leak(self):
        """First call under jit, second call in a fresh jit: the value
        repack memo must never cache a tracer (probe_bspmm1 regression —
        UnexpectedTracerError on the second trace)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.generate import fem_blocks
        from cask_tpu.ops.bdia import bdia_plan
        from cask_tpu.ops.pallas.bdia_kernels import (bdia_mm_ok,
                                                      bdia_spmm_pallas_ring)

        a = fem_blocks(16, dof=4, dtype=np.float32)
        plan = bdia_plan(a, (4, 4))
        k = 128
        assert bdia_mm_ok(plan, k)
        x = np.random.default_rng(5).standard_normal(
            (a.shape[1], k)).astype(np.float32)

        y1 = jax.jit(lambda v: bdia_spmm_pallas_ring(plan, v))(jnp.asarray(x))
        # memo must hold a concrete array or nothing — never a tracer
        for v in getattr(plan, "_mm_pack_cache", {}).values():
            assert not isinstance(v, jax.core.Tracer)
        y2 = jax.jit(lambda v: 2.0 * bdia_spmm_pallas_ring(plan, v))(
            jnp.asarray(x))
        ref = to_scipy(a) @ x
        np.testing.assert_allclose(np.asarray(y1), ref, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y2), 2 * ref, rtol=2e-4, atol=1e-5)


class TestRingMxuHybrid:
    """EXPERIMENTAL MXU-hybrid ring SpMM (VERDICT r2 item 5): near band
    on the systolic array, far diagonals on the VPU."""

    def test_matches_ring_within_bf16(self):
        import jax.numpy as jnp

        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.generate import stencil_2d
        from cask_tpu.ops.dia import dia_plan
        from cask_tpu.ops.pallas.dia_kernels import (
            dia_spmm_pallas_ring_mxu_padded, from_spmm_ring, to_spmm_ring)

        a = stencil_2d(64, dtype=np.float32)
        plan = dia_plan(a)
        X = np.random.default_rng(0).standard_normal(
            (a.shape[1], 128)).astype(np.float32)
        xp = to_spmm_ring(plan, jnp.asarray(X))
        Y = np.asarray(from_spmm_ring(
            plan, dia_spmm_pallas_ring_mxu_padded(plan, xp), 128,
            layout_dtype=np.float32))
        ref = to_scipy(a) @ X
        assert np.abs(Y - ref).max() / np.abs(ref).max() < 5e-3


class TestBdiaRingGeometry:
    def test_prefers_grid_aligned_tm(self):
        # fem 256x256 grid, dof 4: offsets {-256,-1,0,1,256}.  tm=256
        # grid-aligns 3 of 5 offsets (12/20 pieces skip the two-slice
        # concat) while tm=1024/512 align only d=0 — the geometry must
        # trade step count for concat count (VERDICT r3 item 4b).
        from cask_tpu.formats.device_gen import fem_bdia_device
        from cask_tpu.ops.pallas.bdia_kernels import _bdia_mm_geometry

        plan = fem_bdia_device(256, dof=4, dtype=jnp.float32)
        tm = _bdia_mm_geometry(plan, 128, 4, 4)
        assert tm == 256
        aligned = sum(1 for (_, d) in plan.pairs if d % tm == 0)
        assert aligned == 12

    def test_largest_tm_on_ties(self):
        # offsets {-64,-1,0,1,64} never align with any candidate tm, so
        # the tie-break keeps the largest feasible strip
        from cask_tpu.formats.device_gen import fem_bdia_device
        from cask_tpu.ops.pallas.bdia_kernels import _bdia_mm_geometry

        plan = fem_bdia_device(64, dof=4, dtype=jnp.float32)
        tm = _bdia_mm_geometry(plan, 128, 4, 4)
        # 512 is the largest VMEM-feasible strip for this shape (1024
        # blows the ring budget) — unchanged from the pre-alignment rule
        assert tm == 512


class TestBsrSpmmAutoPlanRoute:
    """spmm(bsr, X) shares spmv's cached BDIA plan on TPU."""

    def test_auto_route_and_shared_cache(self, monkeypatch):
        import importlib

        from cask_tpu.formats.convert import csr_to_bsr, to_scipy
        from cask_tpu.formats.generate import fem_blocks
        from cask_tpu.ops.spmm import spmm

        spmv_mod = importlib.import_module("cask_tpu.ops.spmv")
        monkeypatch.setattr(spmv_mod, "_AUTO_BSR_PLAN_FORCE", True)
        a = fem_blocks(10, dof=4)
        b = csr_to_bsr(a, (4, 4))
        X = jnp.asarray(np.random.default_rng(20).standard_normal(
            (a.shape[1], 8)))
        Y = np.asarray(spmm(b, X))
        plan = getattr(b, "_bdia_auto_plan")
        assert plan is not None
        np.testing.assert_array_equal(Y, np.asarray(spmm(plan, X)))
        np.testing.assert_allclose(Y, to_scipy(a) @ np.asarray(X),
                                   rtol=1e-10, atol=1e-10)
        # spmv and spmm share the one memoized plan
        from cask_tpu.ops.spmv import spmv as _spmv

        _spmv(b, X[:, 0])
        assert b._bdia_auto_plan is plan


class TestCsrSpmmAutoRoute:
    """spmm(csr, X) rides the same cached DIA plan as spmv(csr, x)."""

    def test_banded_csr_routes_through_plan(self, monkeypatch):
        import importlib

        import jax.numpy as jnp

        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.generate import banded

        spmv_mod = importlib.import_module("cask_tpu.ops.spmv")
        monkeypatch.setattr(spmv_mod, "_AUTO_BSR_PLAN_FORCE", True)
        a = banded(500, 4, seed=31)
        X = np.random.default_rng(31).standard_normal((a.shape[1], 8))
        Y = np.asarray(spmm(a, jnp.asarray(X)))
        plan = getattr(a, "_dia_auto_plan", None)
        assert plan is not None, "banded CSR spmm must take the plan route"
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-10, atol=1e-10)
        # same instance-memoized plan serves spmv too
        from cask_tpu import spmv

        y = np.asarray(spmv(a, jnp.asarray(X[:, 0])))
        assert a._dia_auto_plan is plan
        np.testing.assert_allclose(y, to_scipy(a) @ X[:, 0],
                                   rtol=1e-10, atol=1e-10)

    def test_unstructured_declines(self, monkeypatch):
        import importlib

        import jax.numpy as jnp

        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.generate import power_law

        spmv_mod = importlib.import_module("cask_tpu.ops.spmv")
        monkeypatch.setattr(spmv_mod, "_AUTO_BSR_PLAN_FORCE", True)
        a = power_law(400, avg_degree=5, seed=32)
        X = np.random.default_rng(32).standard_normal((a.shape[1], 4))
        Y = np.asarray(spmm(a, jnp.asarray(X)))
        assert getattr(a, "_dia_auto_plan", "missing") is None
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-10, atol=1e-10)


class TestBdiaSlabSpmmRoute:
    """Wide-k BDIA SpMM rides the MXU slab kernel (exact precision) by
    default; the ring stays reachable via method='pallas_bdia'."""

    def _plan(self, nx=16, dof=4):
        import jax.numpy as jnp  # noqa: F401

        from cask_tpu.formats.generate import fem_blocks
        from cask_tpu.ops.bdia import bdia_plan

        a = fem_blocks(nx, dof=dof, return_bsr=True)
        return bdia_plan(a, (dof, dof)), a

    def test_slab_route_matches_scipy(self):
        import jax.numpy as jnp

        from cask_tpu.formats.convert import to_scipy

        p, a = self._plan()
        X = np.random.default_rng(41).standard_normal((p.shape[1], 128))
        Y = np.asarray(spmm(p, jnp.asarray(X), method="slab"))
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-10, atol=1e-9)
        # plan memoized on the instance; second call reuses it
        sl = getattr(p, "_slab_auto_plan", None)
        assert sl is not None
        spmm(p, jnp.asarray(X), method="slab")
        assert p._slab_auto_plan is sl

    def test_ring_still_forced_by_pallas_bdia(self):
        import jax.numpy as jnp

        from cask_tpu.formats.convert import to_scipy

        p, a = self._plan(12)
        X = np.random.default_rng(42).standard_normal((p.shape[1], 96))
        Y = np.asarray(spmm(p, jnp.asarray(X), method="pallas_bdia"))
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-10, atol=1e-9)
        # the explicit ring route must not build a slab plan
        assert getattr(p, "_slab_auto_plan", "missing") == "missing"

    def test_no_slab_build_under_trace(self):
        import jax
        import jax.numpy as jnp

        from cask_tpu.formats.convert import to_scipy

        p, a = self._plan(12)
        X = np.random.default_rng(43).standard_normal((p.shape[1], 96))

        @jax.jit
        def f(pp, XX):
            return spmm(pp, XX, method="slab")

        Y = np.asarray(f(p, jnp.asarray(X)))
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-10, atol=1e-9)
        # tracer leaves must not be memoized as a plan
        assert getattr(p, "_slab_auto_plan", None) is None


class TestSpmmSlabPlanArgument:
    """A held BdiaSlabs IS an spmm operator: jitted solver loops pass it
    as a pytree argument (exact precision)."""

    def test_slab_plan_as_traced_operand(self):
        import jax
        import jax.numpy as jnp

        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.generate import fem_blocks
        from cask_tpu.ops.bdia import bdia_plan
        from cask_tpu.ops.pallas.bdia_slab import bdia_slab_plan

        a = fem_blocks(16, dof=4, return_bsr=True)
        p = bdia_plan(a, (4, 4))
        sl = bdia_slab_plan(p, 8)
        X = np.random.default_rng(61).standard_normal((p.shape[1], 96))

        @jax.jit
        def f(SL, XX):
            return spmm(SL, XX)

        Y = np.asarray(f(sl, jnp.asarray(X)))
        np.testing.assert_allclose(Y, to_scipy(a) @ X, rtol=1e-10, atol=1e-9)
        with pytest.raises(ValueError, match="transpose"):
            spmm(sl, jnp.asarray(X), transpose=True)
