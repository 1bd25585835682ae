"""Per-matrix autotuner (BASELINE T6) — cask's DSE layer, TPU-style.

cask enumerated FPGA architecture parameters with analytic resource/
performance models, then paid an hours-long bitstream build for the
winner (SURVEY.md §3.2).  On TPU, JIT replaces the bitstream build, so
the loop becomes: analytic *byte-traffic* prefilter → on-device timing of
the few surviving variants (minutes of compile on the proxied dev chip,
SURVEY.md §8.2, hence the prefilter is load-bearing) → JSON cache keyed
on sparsity signature.

Variant space (grows as kernels land):
- ``csr_xla``            — gather + segment_sum
- ``bsr_xla:<b>``        — block gather + einsum + segment_sum
- ``dia_pallas[:spmm]``  — diagonal-window streaming Pallas kernel
- ``bsr_pallas:<b>``     — Pallas block kernel (SpMM, MXU path)
- ``poh[:T]``/``poh_fast`` — panel one-hot kernel for unstructured
  matrices (gather/scatter as MXU one-hot matmuls); ``_fast`` allows
  single-pass bf16 MXU rounding on f32 data
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cask_tpu.formats.convert import csr_to_bsr
from cask_tpu.formats.matrix import CSR
from cask_tpu.formats.signature import Signature, signature as compute_signature
from cask_tpu.ops.spmm import spmm
from cask_tpu.ops.spmv import spmv
from cask_tpu.tune.cache import TunerCache, default_cache
from cask_tpu.tune.timing import measure

log = logging.getLogger("cask_tpu.tune")

_BSR_CANDIDATES = (4, 8, 16, 32)


@dataclasses.dataclass
class Variant:
    name: str  # e.g. "csr_xla", "bsr_xla:8", "dia_pallas"
    est_bytes: float  # analytic traffic per op application

    def build(self, a: CSR, k: Optional[int]) -> Tuple[object, Callable]:
        """Return (device_matrix, step_fn(x)->y) for this variant."""
        if self.name == "csr_xla":
            dev = a.device_put()
            if k is None:
                return dev, lambda x: spmv(dev, x, method="xla")
            return dev, lambda x: spmm(dev, x, method="xla")
        if self.name.startswith("bsr_xla:"):
            b = int(self.name.split(":")[1])
            dev = csr_to_bsr(a, (b, b)).device_put()
            if k is None:
                return dev, lambda x: spmv(dev, x, method="xla")
            return dev, lambda x: spmm(dev, x, method="xla")
        if self.name in ("dia_pallas", "dia_xla"):
            from cask_tpu.ops.dia import dia_plan

            method = "pallas" if self.name == "dia_pallas" else "xla"
            plan = dia_plan(a)
            dev = plan.device_put()
            if k is None:
                return dev, lambda x: dev.spmv(x, method=method)
            return dev, lambda x: dev.spmm(x, method=method)
        if self.name.startswith("bsr_pallas:"):
            b = int(self.name.split(":")[1])
            if k is None:
                # tuned BSR SpMV: the BDIA block-diagonal kernel (zero
                # gathers, zero fill — BASELINE north star's letter)
                from cask_tpu.ops.bdia import bdia_plan

                plan = bdia_plan(a, (b, b)).device_put()
                return plan, plan.spmv
            if k > 64:
                # wide-k block SpMM: the BDIA ring (exactly-nnz value
                # stream, X/Y cross HBM once in natural layout) beats
                # the per-block-DMA MXU kernel (0.26 roofline)
                from cask_tpu.ops.bdia import bdia_plan
                from cask_tpu.ops.pallas.bdia_kernels import bdia_mm_ok

                plan = bdia_plan(a, (b, b))
                if bdia_mm_ok(plan, k):
                    from cask_tpu.ops.spmm import spmm as _spmm_dispatch

                    dev = plan.device_put()
                    return dev, lambda x: _spmm_dispatch(dev, x)
            from cask_tpu.ops.pallas.bsr_kernels import BsrSpmmKernel

            kern = BsrSpmmKernel.plan(csr_to_bsr(a, (b, b)), k=k)
            return kern, kern.__call__
        if self.name.startswith("lell:"):
            from cask_tpu.ops.pallas.lell_kernels import lell_plan_hyb

            g = int(self.name.split(":")[1])
            dev = lell_plan_hyb(a, groups=g).device_put()
            return dev, dev.spmv
        if self.name.split(":")[0] in ("poh", "poh_fast", "poh_mm", "poh_mm_fast"):
            from cask_tpu.ops.pallas.poh_kernels import poh_plan

            parts = self.name.split(":")
            ts = int(parts[1]) if len(parts) > 1 else 2048
            prec = "fast" if parts[0].endswith("_fast") else "split"
            dev = poh_plan(a, tile_slots=ts).device_put()
            if parts[0].startswith("poh_mm"):
                return dev, functools.partial(dev.spmm, precision=prec)
            return dev, functools.partial(dev.spmv, precision=prec)
        if self.name.startswith("rcm:"):
            dev, fn, _ = self.build_full(a, k)
            return dev, fn
        raise ValueError(f"unknown variant {self.name!r}")

    def build_full(self, a: CSR, k: Optional[int]) -> Tuple[object, Callable, dict]:
        """Like :meth:`build`, plus an info dict.  For ``rcm:*`` variants
        the dict carries ``perm`` (the RCM row/col permutation) and
        ``inner_fn`` (the kernel in the *reordered* space), so solver
        loops can reorder once and stay reordered instead of paying two
        boundary vector permutes per application (the permutes dominate
        these variants — probe_tune2)."""
        if not self.name.startswith("rcm:"):
            dev, fn = self.build(a, k)
            return dev, fn, {}
        # reorder to a band, run the structured variant, permute at the
        # vector boundary; the reordered-space kernel ships in the info
        import jax.numpy as jnp

        from cask_tpu.formats.reorder import reorder_rcm

        a_r, perm = reorder_rcm(a)
        dev, fn = Variant(self.name[4:], 0.0).build(a_r, k)
        pd = jnp.asarray(perm)
        ipd = jnp.asarray(np.argsort(perm).astype(np.int32))
        info = {"perm": np.asarray(perm), "inner_fn": fn}
        if k is None:
            return dev, lambda x: fn(x[pd])[ipd], info
        return dev, lambda x: fn(x[pd, :])[ipd, :], info


def _dtype_bytes(dt) -> int:
    return jnp.dtype(dt).itemsize


def enumerate_variants(a: CSR, sig: Signature, k: Optional[int],
                       include_pallas: bool = True,
                       calib: Optional[dict] = None) -> List[Variant]:
    """Analytic HBM-traffic model per variant (the DSE performance-model
    analog, SURVEY.md §3.2) — ranks candidates before any compile.

    Per SpMV/SpMM application, modeled bytes:
    - ``csr_xla``:    values+indices, plus the gathered-X and partial
      product arrays XLA materializes (2·nnz·k·db)
    - ``bsr_xla:b``:  same shape but gathers/partials are per *block*
      (÷ b), at the cost of ``stored ≥ nnz`` block fill
    - ``dia_pallas``: streamed diagonals once (k-independent) + X/Y
    - ``bsr_pallas:b``: values once + per-block X slice DMA (kp·db·/b)
    """
    m, n = a.shape
    nnz = a.nnz
    db = _dtype_bytes(a.dtype)
    kk = k or 1
    kp = max(128, -(-kk // 128) * 128) if k else 1  # lane-padded dense width
    xbytes = (n + m) * db * kk

    # On TPU (include_pallas), the csr gather path's real cost is set by
    # scalar gathers, not bytes — measured ~12000 time-equivalent B/nnz
    # for SpMV (65 Mnnz/s, PERF.md).  Without the penalty the byte model
    # ranks csr_xla first on every unstructured matrix and wastes a
    # timing slot the one-hot kernels always win.
    gather_pen = nnz * 1000.0 * kk if include_pallas else 0.0
    out: List[Variant] = [
        Variant("csr_xla", nnz * (db + 4) + 2.0 * nnz * db * kk + xbytes
                + gather_pen)
    ]

    for b, fill_pct in zip(Signature.BLOCK_PROBE, sig.block_fill):
        if b not in _BSR_CANDIDATES:
            continue
        fill = max(fill_pct, 1) / 100.0
        stored = nnz / fill  # entries incl. block fill
        if fill >= 0.35:
            est = stored * db + (stored / (b * b)) * 4 + 2.0 * stored * db * kk / b + xbytes
            out.append(Variant(f"bsr_xla:{b}", est))
        if include_pallas and fill >= 0.3 and k:
            est = stored * db + (stored / (b * b)) * 4 + stored * kp * db / b + m * kp * db
            out.append(Variant(f"bsr_pallas:{b}", est))
        if fill >= 0.3 and k is None:
            # tuned BSR SpMV via the BDIA block-diagonal kernel: streams
            # the stored block entries once, x resident (like dia_pallas)
            from cask_tpu.ops.bdia import estimate_bdia_traffic

            bd = estimate_bdia_traffic(a, b)
            if bd is not None and include_pallas:
                out.append(Variant(f"bsr_pallas:{b}", bd[0] * db + 1.5 * xbytes))

    # diagonal split: streamed entries are k-independent
    from cask_tpu.ops.dia import estimate_dia_traffic

    est = estimate_dia_traffic(a)
    if est is not None:
        if include_pallas:
            out.append(Variant("dia_pallas", est * db + 1.5 * xbytes))
        # XLA formulation of the same split: slightly more traffic
        # (padded-x materialization) but no Pallas size constraints
        out.append(Variant("dia_xla", est * db + 2.0 * xbytes))

    # Unstructured path: the panel one-hot kernel (gather/scatter as MXU
    # one-hot matmuls — no hardware gather needed; 11–30x the csr_xla
    # gather path on v5e, PERF.md).  It is *compute*-bound (~6k MXU MACs
    # + ~500 VPU ops per slot), so its "traffic" is modeled as
    # time-equivalent bytes (t/slot · HBM_BW) read from the per-backend
    # calibration record (tune.calibrate; seeds from v5e measurements
    # until `cli calibrate` runs on the target generation).
    # (The LELL gather kernel stays un-enumerated: Mosaic's
    # tpu.dynamic_gather is single-vreg-deep on v5e.)
    if calib is None:
        from cask_tpu.tune.calibrate import poh_equiv_bytes

        calib = poh_equiv_bytes()
    if include_pallas and k is None and db <= 4:
        # window-aware analytic cost (VERDICT r4 next-4): per-slot cost
        # follows the AUTO column window the plan will pick for this
        # matrix at each tile size, plus a per-tile overhead — the
        # prefilter ranks :2048 vs :8192 from structure alone
        # (calibrate.poh_equiv_bytes_analytic; probe_poh7/probe_amg7)
        from cask_tpu.tune.calibrate import poh_equiv_bytes_analytic

        for ts, names in ((2048, ("poh", "poh_fast:2048")),
                          (8192, ("poh:8192", "poh_fast:8192"))):
            eb_s = poh_equiv_bytes_analytic(m, n, nnz, ts, calib=calib)
            eb_f = poh_equiv_bytes_analytic(m, n, nnz, ts, fast=True,
                                            calib=calib)
            out.append(Variant(names[0], nnz * eb_s + xbytes))
            out.append(Variant(names[1], nnz * eb_f + xbytes))
    if include_pallas and k is not None and k <= 64 and db <= 4:
        # SpMM twin: one-hots amortize over k columns
        out.append(Variant("poh_mm", nnz * calib["poh_mm"] * kk + xbytes))
        out.append(Variant("poh_mm_fast", nnz * calib["poh_mm_fast"] * kk + xbytes))

    # RCM reordering toward the banded kernels (cask's DSE explored
    # architecture params; reordering is the analogous *data-layout*
    # dimension).  Only probed when the natural ordering has no usable
    # diagonal split and the matrix is square.
    if est is None and m == n and nnz:
        from cask_tpu.formats.reorder import reorder_rcm

        try:
            a_r, _ = reorder_rcm(a)
            est_r = estimate_dia_traffic(a_r)
        except Exception:
            est_r = None
        if est_r is not None:
            permute = 8.0 * m * db * kk  # boundary vector gathers
            if include_pallas:
                out.append(Variant("rcm:dia_pallas",
                                   est_r * db + 1.5 * xbytes + permute))
            out.append(Variant("rcm:dia_xla",
                               est_r * db + 2.0 * xbytes + permute))
    return out


@dataclasses.dataclass
class TunedSpmv:
    """A matrix bound to its tuned kernel — the user-facing product of
    tuning (cask analog: the per-matrix generated architecture)."""

    variant: str
    matrix: object  # device-side matrix/plan in the winning format
    _fn: Callable
    signature_key: str
    seconds_per_op: Optional[float] = None
    # rcm:* winners only — the permutation and the reordered-space kernel
    perm: Optional[np.ndarray] = None
    _inner_fn: Optional[Callable] = None

    def __call__(self, x):
        return self._fn(x)

    @property
    def is_reordered(self) -> bool:
        return self.perm is not None

    def reordered(self) -> Tuple[Callable, np.ndarray]:
        """``(fn, perm)`` for solver loops on ``rcm:*`` winners: ``fn``
        applies the kernel in the *reordered* space (no boundary
        permutes).  Reorder the right-hand side once (``b[perm]``),
        iterate with ``fn``, and un-permute the solution once
        (``x[argsort(perm)]``) — the two per-application vector permutes
        the convenience ``__call__`` pays then vanish (they dominate the
        rcm variants: probe_tune2)."""
        if self.perm is None:
            raise ValueError(
                f"variant {self.variant!r} is not RCM-reordered; "
                "call the TunedSpmv directly")
        return self._inner_fn, self.perm


def tune(a: CSR, *, k: Optional[int] = None, cache: Optional[TunerCache] = None,
         time_budget: int = 3, include_pallas: Optional[bool] = None,
         force: bool = False,
         wall_budget_s: Optional[float] = None,
         precision: str = "any") -> TunedSpmv:
    """Pick the fastest kernel variant for matrix ``a`` (SpMV, or SpMM
    with ``k`` dense columns); cache the winner by sparsity signature.

    ``time_budget``: how many top analytic candidates to actually time.
    ``include_pallas`` defaults to "only on TPU": interpret-mode timings
    on CPU are meaningless for kernel choice and painfully slow.
    ``wall_budget_s``: stop timing further candidates once this much
    wall-clock has elapsed (each fresh Pallas candidate can cost 5–10
    minutes of relay compile on the proxied dev TPU — the plausibility
    gate bounded mis-*picks*, this bounds runaway *time*).  Defaults to
    900 s on TPU, unlimited elsewhere; at least one candidate is always
    timed, and a truncated run records ``"truncated": true`` in its
    cache entry.
    ``precision``: ``'any'`` (default) lets single-pass bf16-rounded
    variants (``poh_fast*``, ~2e-3 relative error class) compete on
    time; ``'f32'`` restricts the space to near-f32 variants (the
    ``_fast`` kernels are excluded from enumeration and from cache
    hits).
    """
    if include_pallas is None:
        from cask_tpu.utils.platform import on_tpu

        include_pallas = on_tpu()
    if not isinstance(a, CSR):
        from cask_tpu.formats.convert import bsr_to_csr, coo_to_csr
        from cask_tpu.formats.matrix import BSR, COO

        if isinstance(a, COO):
            a = coo_to_csr(a)
        elif isinstance(a, BSR):
            a = bsr_to_csr(a)
        else:
            raise TypeError(f"cannot tune {type(a)}")

    if precision not in ("any", "f32"):
        raise ValueError(f"unknown precision constraint {precision!r}")
    cache = cache or default_cache()
    sig = compute_signature(a)
    cache_key = f"{sig.key()}:k={k or 0}"
    if precision == "f32":
        cache_key += ":f32"  # 'any' winners may be bf16-rounded kernels

    if not force:
        hit = cache.get(cache_key)
        if hit is not None:
            var = Variant(hit["variant"], 0.0)
            dev, fn, info = var.build_full(a, k)
            return TunedSpmv(
                variant=var.name, matrix=dev, _fn=fn, signature_key=cache_key,
                seconds_per_op=hit.get("seconds_per_op"),
                perm=info.get("perm"), _inner_fn=info.get("inner_fn"),
            )

    from cask_tpu.tune.calibrate import poh_equiv_bytes

    variants = enumerate_variants(a, sig, k, include_pallas=include_pallas,
                                  calib=poh_equiv_bytes(cache))
    if precision == "f32":
        variants = [v for v in variants if "_fast" not in v.name]
    variants.sort(key=lambda v: v.est_bytes)
    candidates = variants[: max(time_budget, 1)]
    # diversity rule (VERDICT r2 weak-5): a mis-ranked prefilter (e.g. an
    # uncalibrated new backend) must never drop the best *XLA* variant
    # from timing — it is the variant class that always builds, so timing
    # it bounds the damage of any analytic-model error.
    if not any("_xla" in v.name for v in candidates):
        xla = next((v for v in variants if "_xla" in v.name), None)
        if xla is not None:
            candidates.append(xla)

    n = a.shape[1]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((n, k) if k else n).astype(np.dtype(a.dtype)))

    # Square operators time under the chained-ladder protocol (the only
    # reliable one through the axon relay — the pooled estimator read
    # physically-impossible numbers and mis-ranked variants on hardware,
    # probe6).  A per-step max-normalization keeps arbitrary matrices
    # stable under composition; its cost (~2 vector passes) is uniform
    # across variants, so rankings are unaffected.
    m, n_ = a.shape
    chained = (m == n_)

    def _time(fn):
        if not chained:
            return measure(fn, x0)
        from cask_tpu.tune.timing import measure_chained

        def step(v):
            y = fn(v)
            s = jnp.max(jnp.abs(y)) + jnp.asarray(1e-30, y.dtype)
            return (y / s).astype(v.dtype)

        return measure_chained(step, x0, k1=5, k2=60, points=3, repeats=2)

    # Plausibility gate (probe_tune3 post-mortem): in a noisy relay
    # window EVERY fast variant can time unreliable (two of them
    # physically impossible), and a blind "reliable outranks unreliable"
    # rule then picks the one reliable survivor — a 13.7 ms gather path
    # over a plausible 55.6 µs kernel.  The analytic traffic model gives
    # each variant a hard lower bound; a reading below half its floor is
    # a relay artifact and is discarded, and a reliable time may only
    # outrank an unreliable-but-plausible one within a bounded factor.
    from cask_tpu.utils.platform import hbm_bandwidth
    from cask_tpu.utils.platform import on_tpu as _on_tpu_fn

    _gate = _on_tpu_fn()
    _BW, _bw_known = hbm_bandwidth() if _gate else (819e9, False)
    # A reading below this fraction of the analytic floor is treated as
    # a relay artifact.  When the device generation is unidentified the
    # stand-in bandwidth may be badly low (a v5p reads ~3.4x v5e), so
    # loosen the cut rather than discard genuine readings (ADVICE r3).
    _floor_frac = 0.5 if _bw_known else 0.125

    def _floor(v: Variant) -> float:
        return (v.est_bytes / _BW) if _gate else 0.0

    if wall_budget_s is None and _gate:
        wall_budget_s = 900.0
    import time as _time_mod

    t_tune0 = _time_mod.time()
    truncated = False

    results_t = []  # (var, dev, fn, info, meas)
    timings = {}  # every variant's measurement persists in the cache
    for var in candidates:
        if (wall_budget_s is not None and results_t
                and _time_mod.time() - t_tune0 > wall_budget_s):
            # runaway-time cap: keep what's measured, skip the rest
            truncated = True
            log.warning("tune %s: wall budget %.0fs exceeded; skipping %s "
                        "and later candidates", cache_key, wall_budget_s,
                        var.name)
            break
        try:
            dev, fn, info = var.build_full(a, k)
            meas = _time(fn)
            plausible = meas.seconds_per_iter >= _floor_frac * _floor(var)
            log.info("tune %s: variant=%s t=%.3g s/op reliable=%s plausible=%s",
                     cache_key, var.name, meas.seconds_per_iter,
                     meas.reliable, plausible)
            timings[var.name] = {"seconds_per_op": meas.seconds_per_iter,
                                 "reliable": bool(meas.reliable),
                                 "floor_seconds": _floor(var),
                                 "plausible": bool(plausible)}
            if not np.isfinite(meas.checksum):
                continue
            results_t.append((var, dev, fn, info, meas))
        except Exception as e:  # a variant failing to build/compile is data
            log.warning("tune %s: variant %s failed: %s", cache_key, var.name, e)

    def _secs(r):
        return r[4].seconds_per_iter

    tier0 = [r for r in results_t
             if r[4].reliable and _secs(r) >= _floor_frac * _floor(r[0])]
    tier1 = [r for r in results_t
             if not r[4].reliable and _secs(r) >= _floor_frac * _floor(r[0])]
    best = min(tier0, key=_secs) if tier0 else None
    if tier1:
        u = min(tier1, key=_secs)
        if best is None or _secs(u) * 8.0 < _secs(best):
            # the physics gap is too large to ignore; re-measure the
            # unreliable candidate (compile is cached — cheap) and take
            # it unless the re-measurements also come out implausible
            var_u, dev_u, fn_u, info_u, meas_u = u

            def _better(m_new, m_old, v=var_u):
                if not np.isfinite(m_new.checksum):
                    return False
                if m_new.seconds_per_iter < _floor_frac * _floor(v):
                    return False  # still implausible
                if bool(m_new.reliable) != bool(m_old.reliable):
                    return bool(m_new.reliable)
                return m_new.seconds_per_iter < m_old.seconds_per_iter

            for _ in range(2):
                m2 = _time(fn_u)
                if _better(m2, meas_u):
                    meas_u = m2
                if m2.reliable:
                    break
            # recompute the gate diagnostics from the ADOPTED reading so
            # the persisted cache entry can't contradict itself (ADVICE
            # r3: stale 'plausible' after a re-measure)
            plaus_u = meas_u.seconds_per_iter >= _floor_frac * _floor(var_u)
            timings[var_u.name].update(
                seconds_per_op=meas_u.seconds_per_iter,
                reliable=bool(meas_u.reliable),
                plausible=bool(plaus_u),
                remeasured=True,
            )
            u = (var_u, dev_u, fn_u, info_u, meas_u)
            if meas_u.reliable and plaus_u:
                # the re-measure came back clean: promote into tier0 and
                # compare by time directly — requiring the 8x factor of
                # a now-reliable reading would discard a genuine 3x win
                # (ADVICE r3)
                if best is None or _secs(u) < _secs(best):
                    best = u
            elif best is None or _secs(u) * 8.0 < _secs(best):
                best = u
    if best is None and results_t:  # nothing plausible: least-bad reading
        best = min(results_t, key=lambda r: (not r[4].reliable, _secs(r)))

    if best is None:  # always possible: csr_xla
        var = Variant("csr_xla", 0.0)
        dev, fn = var.build(a, k)
        best = (var, dev, fn, {}, None)

    var, dev, fn, info, meas_b = best
    secs = meas_b.seconds_per_iter if meas_b is not None else float("nan")
    cache.put(cache_key, {"variant": var.name, "seconds_per_op": secs,
                          "shape": list(a.shape), "nnz": int(a.nnz),
                          "truncated": truncated,
                          "timings": timings})
    return TunedSpmv(variant=var.name, matrix=dev, _fn=fn,
                     signature_key=cache_key, seconds_per_op=secs,
                     perm=info.get("perm"), _inner_fn=info.get("inner_fn"))
