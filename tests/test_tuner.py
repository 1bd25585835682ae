"""Autotuner (cask DSE analog): variant search, timing, cache."""

import numpy as np
import pytest

from cask_tpu import tune
from cask_tpu.formats.convert import to_scipy
from cask_tpu.formats.generate import banded, fem_blocks, power_law, stencil_2d
from cask_tpu.formats.signature import signature
from cask_tpu.tune.timing import measure
from cask_tpu.tune.tuner import enumerate_variants


class TestEnumerate:
    def test_always_has_fallback(self):
        for mat in (stencil_2d(10), power_law(300, seed=1)):
            vs = enumerate_variants(mat, signature(mat), None)
            assert any(v.name == "csr_xla" for v in vs)

    def test_banded_proposes_dia(self):
        a = banded(500, 3, seed=2)
        vs = enumerate_variants(a, signature(a), None)
        assert any(v.name == "dia_pallas" for v in vs)
        # dia should be predicted cheapest for a pure band
        best = min(vs, key=lambda v: v.est_bytes)
        assert best.name == "dia_pallas"

    def test_powerlaw_skips_dia(self):
        a = power_law(500, avg_degree=5, seed=3)
        vs = enumerate_variants(a, signature(a), None)
        assert not any(v.name == "dia_pallas" for v in vs)

    def test_blocky_proposes_bsr(self):
        a = fem_blocks(10, dof=4)
        vs = enumerate_variants(a, signature(a), 32)
        assert any(v.name.startswith("bsr") for v in vs)

    def test_fem_spmv_ranks_bdia_first(self):
        # the north-star class: tuned BSR SpMV beats scalar DIA's
        # block→scalar fill on dof-block matrices (VERDICT r1 item 1)
        a = fem_blocks(23, dof=4)
        vs = enumerate_variants(a, signature(a), None, include_pallas=True)
        best = min(vs, key=lambda v: v.est_bytes)
        assert best.name == "bsr_pallas:4"

    def test_bsr_pallas_spmv_variant_correct(self):
        from cask_tpu.tune.tuner import Variant

        a = fem_blocks(9, dof=4)
        dev, fn = Variant("bsr_pallas:4", 0.0).build(a, None)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(a.shape[1])
        np.testing.assert_allclose(
            np.asarray(fn(x)), to_scipy(a) @ x, rtol=1e-10, atol=1e-10
        )


class TestTune:
    def test_result_correct_and_cached(self, tmp_tuner_cache):
        a = stencil_2d(16)
        t1 = tune(a, cache=tmp_tuner_cache, time_budget=2)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(a.shape[1])
        y = t1(x)
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-10, atol=1e-10)
        # second call: cache hit (same variant, no re-timing)
        t2 = tune(a, cache=tmp_tuner_cache)
        assert t2.variant == t1.variant
        assert tmp_tuner_cache.get(t1.signature_key) is not None

    def test_spmm_mode(self, tmp_tuner_cache):
        a = fem_blocks(8, dof=4)
        t = tune(a, k=32, cache=tmp_tuner_cache, time_budget=2)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((a.shape[1], 32))
        y = t(x)
        np.testing.assert_allclose(np.asarray(y), to_scipy(a) @ x, rtol=1e-10, atol=1e-9)

    def test_cache_distinguishes_k(self, tmp_tuner_cache):
        a = stencil_2d(12)
        t1 = tune(a, cache=tmp_tuner_cache, time_budget=1)
        t2 = tune(a, k=32, cache=tmp_tuner_cache, time_budget=1)
        assert t1.signature_key != t2.signature_key

    def test_diversity_rule_times_best_xla(self, tmp_tuner_cache):
        # time_budget=1 on a matrix whose top analytic candidate is a
        # Pallas variant: the best XLA variant must STILL be timed (a
        # mis-ranked prefilter must not silently exclude the fallback
        # class — VERDICT r2 weak-5), and every timed variant's
        # measurement must persist in the cache entry.
        a = fem_blocks(8, dof=4)
        t = tune(a, cache=tmp_tuner_cache, time_budget=1, include_pallas=True)
        entry = tmp_tuner_cache.get(t.signature_key)
        timings = entry["timings"]
        assert any("_xla" in name for name in timings)
        assert len(timings) >= 2
        for rec in timings.values():
            assert "seconds_per_op" in rec and "reliable" in rec


class TestMeasure:
    def test_linear_and_reliable_on_cpu(self):
        import jax.numpy as jnp

        a = stencil_2d(40)
        from cask_tpu import spmv

        dev = a.device_put()
        x0 = jnp.asarray(np.random.default_rng(2).standard_normal(a.shape[1]))
        m = measure(lambda v: spmv(dev, v), x0, k1=3, k2=9)
        assert m.seconds_per_iter > 0
        assert np.isfinite(m.checksum)

    def test_distinct_inputs_prevent_cse(self):
        # the checksum must reflect k distinct applications
        import jax.numpy as jnp

        calls = []

        def step(v):
            calls.append(1)
            return v * 2.0

        x0 = jnp.ones(256)
        m = measure(step, x0, k1=3, k2=9)
        assert np.isfinite(m.checksum)


class TestLellVariant:
    def test_not_enumerated(self):
        # Mosaic's gather depth limit makes LELL uncompilable on TPU;
        # it must stay out of the variant space (see lell_kernels docs)
        a = power_law(500, avg_degree=5, seed=3)
        vs = enumerate_variants(a, signature(a), None)
        assert not any(v.name.startswith("lell:") for v in vs)

    def test_builds_and_correct(self, tmp_tuner_cache):
        from cask_tpu.tune.tuner import Variant

        a = power_law(800, avg_degree=6, seed=4)
        dev, fn = Variant("lell:8", 0.0).build(a, None)
        x = np.random.default_rng(0).standard_normal(a.shape[1])
        import jax.numpy as jnp

        np.testing.assert_allclose(
            np.asarray(fn(jnp.asarray(x))), to_scipy(a) @ x, rtol=1e-10, atol=1e-10
        )


class TestReorderVariants:
    """RCM-reordered variants: the data-layout dimension of the DSE."""

    def _shuffled_banded(self, n=1500, bw=4, seed=2):
        import numpy as np

        from cask_tpu.formats.convert import from_scipy, to_scipy
        from cask_tpu.formats.generate import banded

        a0 = banded(n, bw, seed=seed)
        p = np.random.default_rng(0).permutation(n)
        s = to_scipy(a0).tocsr()[p][:, p].tocsr()
        return from_scipy(s, format="csr"), s

    def test_enumerated_when_band_recoverable(self):
        from cask_tpu.formats.signature import signature
        from cask_tpu.tune.tuner import enumerate_variants

        a, _ = self._shuffled_banded()
        names = {v.name for v in
                 enumerate_variants(a, signature(a), None, include_pallas=True)}
        assert "rcm:dia_pallas" in names and "rcm:dia_xla" in names

    def test_wrapped_fn_matches_scipy(self):
        import jax.numpy as jnp
        import numpy as np

        from cask_tpu.tune.tuner import Variant

        a, s = self._shuffled_banded()
        x = np.random.default_rng(1).standard_normal(a.shape[0])
        for name in ("rcm:dia_xla", "rcm:dia_pallas"):
            _, fn = Variant(name, 0.0).build(a, None)
            np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))), s @ x,
                                       rtol=1e-12, atol=1e-12)

    def test_spmm_wrapped(self):
        import jax.numpy as jnp
        import numpy as np

        from cask_tpu.tune.tuner import Variant

        a, s = self._shuffled_banded()
        X = np.random.default_rng(3).standard_normal((a.shape[0], 8))
        _, fn = Variant("rcm:dia_xla", 0.0).build(a, 8)
        np.testing.assert_allclose(np.asarray(fn(jnp.asarray(X))), s @ X,
                                   rtol=1e-12, atol=1e-12)

    def test_not_enumerated_for_native_banded(self):
        # a matrix already banded gets the direct dia variants, not rcm:
        from cask_tpu.formats.generate import banded
        from cask_tpu.formats.signature import signature
        from cask_tpu.tune.tuner import enumerate_variants

        a = banded(1000, 3, seed=1)
        names = {v.name for v in
                 enumerate_variants(a, signature(a), None, include_pallas=True)}
        assert "dia_pallas" in names
        assert not any(n.startswith("rcm:") for n in names)


class TestCalibration:
    def test_defaults_without_record(self, tmp_tuner_cache):
        from cask_tpu.tune.calibrate import SEED_EQUIV_BYTES, poh_equiv_bytes

        assert poh_equiv_bytes(tmp_tuner_cache) == SEED_EQUIV_BYTES

    def test_cached_record_overrides(self, tmp_tuner_cache):
        from cask_tpu.tune import calibrate as cal

        tmp_tuner_cache.put(cal._key(), {"equiv_bytes": {"poh:2048": 111.0}})
        eb = cal.poh_equiv_bytes(tmp_tuner_cache)
        assert eb["poh:2048"] == 111.0
        assert eb["poh_mm"] == cal.SEED_EQUIV_BYTES["poh_mm"]

    def test_enumeration_uses_calibration(self):
        # a cheap calibrated poh must outrank everything on a power-law
        a = power_law(600, avg_degree=6, seed=4)
        a32 = a.astype(np.float32)
        cheap = {"poh:2048": 1.0, "poh:8192": 2.0, "poh_fast:8192": 3.0,
                 "poh_mm": 1.0, "poh_mm_fast": 1.0}
        vs = enumerate_variants(a32, signature(a32), None,
                                include_pallas=True, calib=cheap)
        best = min(vs, key=lambda v: v.est_bytes)
        # the analytic model may pick either tile size at this scale;
        # the calibrated POH family must outrank every other variant
        assert best.name.split(":")[0] == "poh"


class TestAnalyticPohCost:
    """Window-aware prefilter cost (VERDICT r4 next-4): the probe_poh7 /
    probe_amg7 orderings must fall out of matrix STRUCTURE alone."""

    def test_auto_window_matches_plan(self):
        # the analytic C must equal what poh_plan actually builds
        from cask_tpu.ops.pallas.poh_kernels import poh_plan
        from cask_tpu.tune.calibrate import poh_auto_window

        for n_, deg, ts in ((3000, 6, 2048), (8000, 12, 2048),
                            (3000, 6, 8192)):
            a = power_law(n_, avg_degree=deg, seed=1).astype(np.float32)
            p = poh_plan(a, tile_slots=ts)
            assert poh_auto_window(a.shape[0], a.shape[1], a.nnz, ts) \
                == p.col_window

    def test_scattered_prefers_2048(self):
        # probe_poh7's 50k d12 power law (1.17M nnz): auto C is 2048 at
        # T=2048 but the 8192 cap at T=8192 → small tile costs less/nnz
        from cask_tpu.tune.calibrate import (
            poh_auto_window,
            poh_equiv_bytes_analytic,
        )

        m = n = 50_000
        nnz = 1_170_000
        assert poh_auto_window(m, n, nnz, 2048) == 2048
        assert poh_auto_window(m, n, nnz, 8192) == 8192
        assert poh_equiv_bytes_analytic(m, n, nnz, 2048) \
            < poh_equiv_bytes_analytic(m, n, nnz, 8192)

    def test_regular_tent_prefers_8192(self):
        # probe_amg7's regime: a tall 1-nnz/row tentative pack at AMG
        # scale hits the 8192 window cap at BOTH tile sizes, so per-slot
        # costs tie and the per-tile overhead favors big tiles
        from cask_tpu.tune.calibrate import (
            poh_auto_window,
            poh_equiv_bytes_analytic,
        )

        m, n, nnz = 1_200_000, 400_000, 1_200_000
        assert poh_auto_window(m, n, nnz, 2048) == 8192
        assert poh_auto_window(m, n, nnz, 8192) == 8192
        assert poh_equiv_bytes_analytic(m, n, nnz, 8192) \
            < poh_equiv_bytes_analytic(m, n, nnz, 2048)

    def test_anchors_reproduce_r4_seeds(self):
        # at the reference structure (probe_poh7's real matrix stats:
        # 50k rows, 1.17M nnz → C 2048/8192) the model must reproduce
        # the measured seed constants (320 at C=2048, ~1220 at C=8192)
        # — it interpolates BETWEEN measurements, not replaces them
        from cask_tpu.tune.calibrate import (
            POH_FILL,
            POH_TILE_EQUIV,
            SEED_EQUIV_BYTES,
            poh_equiv_bytes_analytic,
        )

        m = n = 50_000
        nnz = 1_170_000
        eb2 = poh_equiv_bytes_analytic(m, n, nnz, 2048) * POH_FILL \
            - POH_TILE_EQUIV / 2048
        eb8 = poh_equiv_bytes_analytic(m, n, nnz, 8192) * POH_FILL \
            - POH_TILE_EQUIV / 8192
        assert abs(eb2 - SEED_EQUIV_BYTES["poh:2048"]) / 320.0 < 0.02
        assert abs(eb8 - SEED_EQUIV_BYTES["poh:8192"]) / 1220.0 < 0.05

    def test_prefilter_orders_tiles_from_structure(self):
        # end-to-end through enumerate_variants on a genuinely scattered
        # matrix: the :2048 family must outrank :8192
        a = power_law(20_000, avg_degree=12, seed=9).astype(np.float32)
        vs = {v.name: v.est_bytes
              for v in enumerate_variants(a, signature(a), None,
                                          include_pallas=True)}
        assert vs["poh"] < vs["poh:8192"]
        assert vs["poh_fast:2048"] < vs["poh_fast:8192"]


class TestReorderedApi:
    def test_build_full_exposes_reordered_kernel(self):
        import jax.numpy as jnp
        import numpy as np

        from cask_tpu.tune.tuner import TunedSpmv, Variant

        from cask_tpu.formats.convert import to_scipy
        from cask_tpu.formats.generate import banded

        rng = np.random.default_rng(7)
        a0 = banded(120, 3, seed=5)
        p = rng.permutation(120)
        s = to_scipy(a0).toarray()[np.ix_(p, p)]
        import scipy.sparse as sp

        from cask_tpu.formats.convert import from_scipy

        a = from_scipy(sp.csr_matrix(s))
        dev, fn, info = Variant("rcm:dia_xla", 0.0).build_full(a, None)
        assert "perm" in info and "inner_fn" in info
        perm, inner = info["perm"], info["inner_fn"]
        x = rng.standard_normal(120)
        # convenience fn matches A @ x with boundary permutes
        np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))), s @ x, rtol=1e-12)
        # stay-reordered discipline: permute once, iterate, unpermute once
        xr = jnp.asarray(x[perm])
        for _ in range(3):
            xr = inner(xr)
        ref = x.copy()
        for _ in range(3):
            ref = s @ ref
        assert sorted(perm) == list(range(len(x)))  # perm is a true permutation
        np.testing.assert_allclose(np.asarray(xr)[np.argsort(perm)], ref, rtol=1e-12, atol=1e-10)

        tuned = TunedSpmv(variant="rcm:dia_xla", matrix=dev, _fn=fn,
                          signature_key="t", perm=perm, _inner_fn=inner)
        assert tuned.is_reordered
        rfn, rperm = tuned.reordered()
        np.testing.assert_allclose(
            np.asarray(rfn(jnp.asarray(x[rperm])))[np.argsort(rperm)], s @ x,
            rtol=1e-12, atol=1e-10)

    def test_reordered_raises_on_plain_variant(self):
        import pytest as _pytest

        from cask_tpu.tune.tuner import TunedSpmv

        t = TunedSpmv(variant="csr_xla", matrix=None, _fn=lambda x: x,
                      signature_key="t")
        assert not t.is_reordered
        with _pytest.raises(ValueError):
            t.reordered()


class TestPlausibilityGate:
    """probe_tune3 regression: in a noisy relay window every fast
    variant times unreliable (some physically impossible), and a blind
    reliable-first rule picks a 250x slower gather path.  The traffic
    floor must discard impossible readings, and a plausible unreliable
    reading >=8x faster than the best reliable one must win."""

    def test_physics_beats_blind_reliability(self, tmp_path, monkeypatch):
        import dataclasses as dc

        from cask_tpu.utils import platform as plat
        from cask_tpu.tune import timing as timing_mod
        from cask_tpu.tune.cache import TunerCache

        # fem blocks: three XLA variants enumerate (dia_xla, bsr_xla:4,
        # csr_xla), floors ~tens of us at this size
        a = fem_blocks(158, dof=4, dtype=np.float32)

        @dc.dataclass
        class FakeMeas:
            seconds_per_iter: float
            reliable: bool
            checksum: float = 1.0

        calls = {"n": 0}
        # call order == candidate order; re-measures repeat the 3rd value
        script = [
            FakeMeas(1e-6, False),   # fastest: physically impossible
            FakeMeas(5e-2, True),    # reliable but 3 orders slower
            FakeMeas(3e-4, False),   # plausible unreliable - true winner
        ]

        def fake_chained(step, x0, **kw):
            i = min(calls["n"], len(script) - 1)
            calls["n"] += 1
            return script[i]

        monkeypatch.setattr(plat, "on_tpu", lambda: True)
        monkeypatch.setattr(timing_mod, "measure_chained", fake_chained)

        t = tune(a, cache=TunerCache(path=str(tmp_path / "c.json")),
                 include_pallas=False, time_budget=3)
        # winner must be the plausible 3e-4 variant, not the reliable
        # 5e-2 one and not the impossible 1e-6 one
        assert abs(t.seconds_per_op - 3e-4) < 1e-9, t.seconds_per_op

    def test_reliable_plausible_still_wins_close_races(self, tmp_path,
                                                       monkeypatch):
        import dataclasses as dc

        from cask_tpu.utils import platform as plat
        from cask_tpu.tune import timing as timing_mod
        from cask_tpu.tune.cache import TunerCache

        a = stencil_2d(512, dtype=np.float32)

        @dc.dataclass
        class FakeMeas:
            seconds_per_iter: float
            reliable: bool
            checksum: float = 1.0

        calls = {"n": 0}
        script = [
            FakeMeas(4e-5, False),   # unreliable, plausible, slightly faster
            FakeMeas(6e-5, True),    # reliable, plausible: within 8x -> wins
            FakeMeas(9e-5, True),
        ]

        def fake_chained(step, x0, **kw):
            i = min(calls["n"], len(script) - 1)
            calls["n"] += 1
            return script[i]

        monkeypatch.setattr(plat, "on_tpu", lambda: True)
        monkeypatch.setattr(timing_mod, "measure_chained", fake_chained)

        t = tune(a, cache=TunerCache(path=str(tmp_path / "c.json")),
                 include_pallas=False, time_budget=3)
        assert abs(t.seconds_per_op - 6e-5) < 1e-9, t.seconds_per_op


class TestTuneWallBudget:
    def test_wall_budget_truncates_and_records(self, tmp_tuner_cache,
                                               monkeypatch):
        # scripted slow measurements: every timing call burns 0.25 s of
        # real wall clock, the budget allows ~one candidate — the tuner
        # must time at least one, skip the rest, and stamp the cache
        # entry truncated (VERDICT r3 item 8)
        import importlib
        import time as time_mod

        timing_mod = importlib.import_module("cask_tpu.tune.timing")
        from cask_tpu.tune.timing import Measurement

        calls = {"n": 0}

        def slow_measure(step, x0, **kw):
            import jax
            import jax.numpy as jnp

            calls["n"] += 1
            time_mod.sleep(0.25)
            y = step(jnp.asarray(x0))
            jax.block_until_ready(y)
            return Measurement(seconds_per_iter=1e-3 * calls["n"],
                               reliable=True, checksum=1.0)

        monkeypatch.setattr(timing_mod, "measure", slow_measure)
        monkeypatch.setattr(timing_mod, "measure_chained", slow_measure)
        tuner_mod = importlib.import_module("cask_tpu.tune.tuner")
        monkeypatch.setattr(tuner_mod, "measure", slow_measure)

        a = fem_blocks(8, dof=4)
        t = tune(a, cache=tmp_tuner_cache, time_budget=4,
                 include_pallas=False, wall_budget_s=0.1)
        entry = tmp_tuner_cache.get(t.signature_key)
        assert entry["truncated"] is True
        assert calls["n"] == 1  # one timed, rest skipped
        assert len(entry["timings"]) == 1

    def test_no_budget_not_truncated(self, tmp_tuner_cache):
        a = stencil_2d(10)
        t = tune(a, cache=tmp_tuner_cache, time_budget=2)
        entry = tmp_tuner_cache.get(t.signature_key)
        assert entry["truncated"] is False


class TestHbmBandwidth:
    def test_known_generation_lookup(self):
        from cask_tpu.utils.platform import _HBM_BW_SPEC

        match = sorted(_HBM_BW_SPEC, key=len, reverse=True)
        pick = lambda kind: next(
            (_HBM_BW_SPEC[k] for k in match if k in kind.lower()), None)
        assert pick("TPU v5 lite") == 8.19e11
        assert pick("TPU v5p") == 2.765e12
        assert pick("TPU v5") == 2.765e12
        assert pick("TPU v4") == 1.228e12
        assert pick("TPU v6 lite") == 1.64e12
        assert pick("TPU7x") is None  # unknown → caller loosens gates

    def test_helper_runs(self):
        from cask_tpu.utils.platform import hbm_bandwidth

        bw, known = hbm_bandwidth()
        assert bw > 1e11
        assert isinstance(known, bool)


class TestTunePrecisionConstraint:
    def test_f32_excludes_fast_variants(self, tmp_tuner_cache):
        from cask_tpu.formats.generate import power_law
        from cask_tpu.tune.tuner import enumerate_variants
        from cask_tpu.formats.signature import signature

        a = power_law(600, avg_degree=6, seed=9, dtype=np.float32)
        sig = signature(a)
        names_any = {v.name for v in enumerate_variants(
            a, sig, None, include_pallas=True)}
        assert any("_fast" in n for n in names_any)
        t = tune(a, cache=tmp_tuner_cache, time_budget=2, precision="f32")
        assert "_fast" not in t.variant
        assert t.signature_key.endswith(":f32")
        # distinct cache rows for the two constraint classes
        t2 = tune(a, cache=tmp_tuner_cache, time_budget=2)
        assert t2.signature_key != t.signature_key

    def test_unknown_precision_rejected(self, tmp_tuner_cache):
        import pytest

        from cask_tpu.formats.generate import stencil_2d

        with pytest.raises(ValueError):
            tune(stencil_2d(8), cache=tmp_tuner_cache, precision="bf16")


class TestMeasureChainedOperands:
    def test_operands_ride_as_traced_args(self):
        # plans beyond ~100 MB must be traced operands, not closure
        # constants (the axon relay 413s oversized compile requests);
        # the operands mode must measure and thread the pytree through
        import jax.numpy as jnp

        from cask_tpu.tune.timing import measure_chained

        n = 1 << 20  # big enough that the ladder slope beats CPU noise
        w = jnp.full((n,), 0.5, jnp.float32)
        x0 = jnp.ones((n,), jnp.float32)
        ms = measure_chained(lambda x, ops: x * ops["w"] + ops["b"], x0,
                             operands={"w": w,
                                       "b": jnp.zeros((n,), jnp.float32)},
                             k1=2, k2=32, points=3, repeats=2)
        assert np.isfinite(ms.seconds_per_iter)
        # checksum reflects the chained composition (0.5^k decay)
        assert 0.0 < ms.checksum < 1.0
