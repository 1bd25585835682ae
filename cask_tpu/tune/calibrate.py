"""Per-backend calibration of the POH kernel cost model.

The panel one-hot kernels are *compute*-bound, so their tuner cost is
expressed as time-equivalent HBM bytes per nnz slot (t/slot · HBM BW).
Those constants are hardware-generation-specific; instead of baking one
chip's folklore into the traffic model (VERDICT r1 weak item 4), they
live in a calibration record cached per backend kind, produced by one
tiny on-device timing probe and reused like any tuned variant.

``poh_equiv_bytes`` is the read path (cache → seed defaults);
``calibrate_poh`` is the probe (TPU only; one small power-law matrix,
each kernel variant timed once with the relay-proof protocol).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

from cask_tpu.tune.cache import TunerCache, default_cache

log = logging.getLogger("cask_tpu.tune")

# Seed values measured on v5e (PERF.md, 2026-08) — used only until a
# backend runs ``calibrate_poh`` (or on CPU, where POH never runs).
# probe_poh7 (r4) re-measured real scattered patterns: the per-slot cost
# scales with the auto-sized column window (∝ tile_slots·n/nnz_panel),
# so SMALL tiles win on scattered matrices (2048: 0.39 ns/slot vs 8192:
# 1.49 at 50k power-law) while regular packs (AMG tentative) prefer
# 8192; seeds reflect the scattered (home-turf) case and the tuner's
# on-device timing settles per matrix.
SEED_EQUIV_BYTES: Dict[str, float] = {
    "poh:2048": 320.0,
    "poh_fast:2048": 300.0,
    "poh:8192": 1220.0,
    "poh_fast:8192": 1200.0,
    "poh_mm": 130.0,
    "poh_mm_fast": 80.0,
    # column window of the matrix the :2048 constants were measured on:
    # probe_poh7's 50k d12 power law has 1.17M nnz → nnz/panel 95.8k →
    # auto C = 2048 at T=2048 (and the 8192 cap at T=8192); anchors the
    # window-aware power law below
    "_c_ref": 2048.0,
}

HBM_BYTES_PER_S = 819e9  # v5e spec; roofline reference for equiv-bytes

# Window-aware analytic cost model (VERDICT r4 next-4).  probe_poh7
# measured per-slot cost tracking the auto-sized column window C:
# 320 eq-B/slot at C=2048 (T=2048) vs 1220 at C=8192 (T=8192) on the
# same matrix — 3.8x for a 4x window, i.e. eb_slot(C) =
# base · (C / C_ref)^alpha with alpha = log4(3.8) ≈ 0.965: per-slot
# cost is ~LINEAR in the window (the 2nhx-vreg window pick and gather
# dot scale with C — consistent with probe_poh6's VPU-bound
# decomposition, which read ~224 eq-B at C=1024).  The per-TILE
# overhead term separates the regular-pack regime: when both tile sizes
# hit the same window (the 8192 cap, e.g. AMG tentative packs at 1M
# rows), per-slot costs tie and fewer/bigger tiles win — probe_amg7
# measured T=8192 ~10 % better there, which fixes POH_TILE_EQUIV.
POH_ALPHA = 0.965
POH_TILE_EQUIV = 6000.0  # equiv bytes per tile (probe_amg7 fit)
POH_FILL = 0.9           # typical packed-slot fill (probe_poh1-4: 0.85-0.99)


def poh_auto_window(m: int, n: int, nnz: int, tile_slots: int,
                    row_panel: int = 4096) -> int:
    """Replicate :func:`poh_kernels.poh_plan`'s auto ``col_window`` C —
    the prefilter must cost the plan that will actually be built, not an
    idealized one (floors and the 8192 cap included)."""
    lane = 128
    R = max(-(-row_panel // lane) * lane, lane)
    R = max(min(R, max(-(-max(m, 1) // lane) * lane, lane)), 8 * lane)
    nnz_per_panel = max(nnz * R / max(m, 1), 1.0)
    span = tile_slots * max(n, 1) / nnz_per_panel
    c = 128
    while c < min(span, 8192):
        c *= 2
    return max(c, 8 * lane)


def poh_equiv_bytes_analytic(m: int, n: int, nnz: int, tile_slots: int, *,
                             fast: bool = False,
                             calib: Optional[Dict[str, float]] = None) -> float:
    """Per-nnz time-equivalent bytes for a ``poh[:T]`` variant, derived
    from the matrix STRUCTURE (auto window + tile count) instead of one
    fixed constant per tile size — so the prefilter ranks ``:2048`` vs
    ``:8192`` per matrix without timing both."""
    calib = calib or poh_equiv_bytes()
    key = "poh_fast:2048" if fast else "poh:2048"
    base = float(calib.get(key, SEED_EQUIV_BYTES[key]))
    c_ref = float(calib.get("_c_ref", SEED_EQUIV_BYTES["_c_ref"]))
    c = poh_auto_window(m, n, nnz, tile_slots)
    eb_slot = base * (c / c_ref) ** POH_ALPHA
    return (eb_slot + POH_TILE_EQUIV / tile_slots) / POH_FILL


def backend_kind() -> str:
    """A stable identifier for the accelerator generation."""
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN")
    if gen:
        return f"tpu_{gen}"
    try:
        import jax

        return jax.devices()[0].device_kind.replace(" ", "_").lower()
    except Exception:
        return "unknown"


def _key() -> str:
    return f"calibration:poh:{backend_kind()}"


def poh_equiv_bytes(cache: Optional[TunerCache] = None) -> Dict[str, float]:
    """Calibrated equivalent-bytes per POH slot for this backend, or the
    seed defaults when no calibration record exists."""
    cache = cache or default_cache()
    hit = cache.get(_key())
    if hit and isinstance(hit.get("equiv_bytes"), dict):
        out = dict(SEED_EQUIV_BYTES)
        out.update({k: float(v) for k, v in hit["equiv_bytes"].items()})
        return out
    return dict(SEED_EQUIV_BYTES)


def calibrate_poh(cache: Optional[TunerCache] = None, *, n: int = 30_000,
                  avg_degree: int = 8, k: int = 32,
                  force: bool = False) -> Dict[str, float]:
    """Time each POH variant once on a small power-law matrix and store
    the per-slot equivalent bytes in the tuner cache (keyed on backend).

    Costs a few Pallas compiles (minutes each on the proxied dev chip) —
    run explicitly via ``python -m cask_tpu.bench.cli calibrate``; the
    tuner only *reads* the record.
    """
    import jax.numpy as jnp
    import numpy as np

    from cask_tpu.formats.generate import power_law
    from cask_tpu.ops.pallas.poh_kernels import poh_plan
    from cask_tpu.tune.timing import measure

    cache = cache or default_cache()
    if not force:
        hit = cache.get(_key())
        if hit and isinstance(hit.get("equiv_bytes"), dict):
            return poh_equiv_bytes(cache)

    a = power_law(n, avg_degree=avg_degree, seed=0, dtype=np.float32)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))
    xk = jnp.asarray(rng.standard_normal((a.shape[1], k)).astype(np.float32))

    results: Dict[str, float] = {}

    def record(name, seconds, slots, kk=1):
        eb = seconds * HBM_BYTES_PER_S / max(slots * kk, 1)
        results[name] = round(float(eb), 1)
        log.info("calibrate %s: %.3g s/op -> %.0f equiv-B/slot", name, seconds, eb)

    for ts in (2048, 8192):
        dev = poh_plan(a, tile_slots=ts).device_put()
        slots = dev.ntiles * ts  # packed slot count incl. tile fill
        m1 = measure(lambda v, d=dev: d.spmv(v, precision="split"), x1)
        record(f"poh:{ts}", m1.seconds_per_iter, slots)
        m2 = measure(lambda v, d=dev: d.spmv(v, precision="fast"), x1)
        record(f"poh_fast:{ts}", m2.seconds_per_iter, slots)
        if ts == 8192:
            m3 = measure(lambda v, d=dev: d.spmm(v, precision="split"), xk)
            record("poh_mm", m3.seconds_per_iter, slots, kk=k)
            m4 = measure(lambda v, d=dev: d.spmm(v, precision="fast"), xk)
            record("poh_mm_fast", m4.seconds_per_iter, slots, kk=k)

    # anchor window for the analytic model: the probe matrix's own auto
    # C at T=2048 (a calibrated backend's base constant is tied to it)
    results["_c_ref"] = float(poh_auto_window(n, n, int(a.nnz), 2048))
    cache.put(_key(), {"equiv_bytes": results, "n": n,
                       "avg_degree": avg_degree, "k": k})
    return poh_equiv_bytes(cache)
