"""The driver bench must emit a parseable record even when truncated.

VERDICT r3: `BENCH_r03.json` was rc=124/parsed=null because bench.py
printed its single JSON line only at the very end and the driver's
timeout landed mid-run.  The rework emits a complete best-so-far record
after every variant (last line wins) under a wall-clock budget
(``CASK_BENCH_BUDGET_S``); this test runs the real bench.py entry in
smoke mode with a budget small enough that the variant loop truncates
after the (budget-exempt) first variant, and asserts the tail record
parses, carries a headline value, and is flagged truncated.
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_truncated_bench_still_emits_record():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the subprocess on CPU
    env["JAX_PLATFORMS"] = "cpu"
    env["CASK_BENCH_SMOKE"] = "1"
    env["CASK_BENCH_BUDGET_S"] = "0"  # everything after variant 1 skipped
    env["PYTHONPATH"] = _REPO
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON lines emitted; stderr: {out.stderr[-2000:]}"
    # VERDICT r4 missing #1: the driver keeps only the last 2000 chars of
    # stdout.  Reproduce EXACTLY that view and recover the headline.
    tail_view = out.stdout[-2000:]
    tail_lines = [ln for ln in tail_view.splitlines() if ln.startswith("{")]
    assert tail_lines, "no complete JSON line inside the 2000-char tail"
    rec = json.loads(tail_lines[-1])  # what the driver actually parses
    assert len(lines[-1]) < 1900, f"final line too long: {len(lines[-1])}"
    assert rec["metric"] == "spmv_roofline_frac"
    assert rec["value"] > 0.0
    detail = rec["detail"]
    assert detail["truncated"] is True
    assert detail["n_skipped"] > 0, "budget 0 must skip non-exempt variants"
    assert detail["variant"] == "bdia_fem_f32"  # the budget-exempt first
    # the penultimate (full-detail) line still carries everything
    full = json.loads(lines[-2])
    assert full["detail"]["skipped"]
    assert "all_variants" in full["detail"]
    assert all(json.loads(ln)["metric"] == "spmv_roofline_frac"
               for ln in lines)


def _load_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_REPO, "bench.py"))
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
    return bench_mod


def test_pick_attempt_prefers_plausible():
    bench_mod = _load_bench()
    bw = bench_mod.HBM_BW
    # 1 byte/s units: frac = bytes / s / bw
    plausible = {"s": 1.0, "bytes": 0.94 * bw, "reliable": True}
    faster_impossible = {"s": 0.8, "bytes": 0.94 * bw, "reliable": True}
    # the fastest PHYSICALLY POSSIBLE attempt wins, not the fastest
    assert bench_mod.pick_attempt([plausible, faster_impossible]) is plausible
    # all-impossible: the fastest carries (emit tiers exclude it later)
    worse = {"s": 0.9, "bytes": 0.99 * bw, "reliable": True}
    assert bench_mod.pick_attempt(
        [faster_impossible, worse]) is faster_impossible


def test_compact_record_fits_driver_tail():
    """A full-sweep-sized record (10 variants x 5 attempts each, the
    shape that overflowed BENCH_r04) must compact to < 1900 chars."""
    bench_mod = _load_bench()
    all_variants = {
        f"variant_with_a_long_name_{i:02d}": {
            "us": 118.62, "frac": 0.9486, "matrix": "fem_dof4_512x512",
            "reliable": True, "plausible": True,
            "attempt_fracs": [0.9486, 0.9313, 0.9199, 0.8712, 0.9401],
        }
        for i in range(10)
    }
    record = {
        "metric": "spmv_roofline_frac", "value": 0.9486,
        "unit": "fraction_of_819GBs_HBM_roofline", "vs_baseline": 1.1858,
        "detail": {
            "variant": "bdia_fused_oneshot_f32", "matrix": "fem_dof4_512x512",
            "rows": 1048576, "nnz": 20938752, "bytes_per_op": 92141568,
            "seconds_per_op": 0.00011862, "gnnz_per_s": 176.52,
            "gflops": 353.0, "achieved_GBs": 776.9, "hbm_bw_GBs": 819.0,
            "hbm_bw_known": True, "backend": "tpu", "on_tpu": True,
            "reliable": True, "plausible": True,
            "all_variants": all_variants,
            "unstructured": {
                "kernel": "poh_split_T2048", "matrix": "power_law_50000_d12",
                "nnz": 599940, "slots": 1648640,
                "seconds_per_op": 0.000216, "gnnz_per_s": 2.78,
                "gslots_per_s": 7.63, "reliable": True},
            "truncated": False,
            "skipped": ["a_variant_name", "another_variant_name"],
            "budget_s": 600.0, "wall_s": 353.3,
        },
    }
    full_line = json.dumps(record)
    assert len(full_line) > 2000, "fixture must reproduce the r4 overflow"
    line = bench_mod.compact_record(record)
    assert len(line) < 1900
    rec = json.loads(line)
    assert rec["metric"] == "spmv_roofline_frac"
    assert rec["value"] == 0.9486
    assert rec["detail"]["variant"] == "bdia_fused_oneshot_f32"
    assert rec["detail"]["n_skipped"] == 2
    assert rec["detail"]["unstructured"]["gnnz_per_s"] == 2.78
    assert "all_variants" not in json.dumps(rec)
    # degenerate degradation path: an absurdly small limit still yields
    # a parseable headline-only record
    tiny = json.loads(bench_mod.compact_record(record, limit=150))
    assert tiny["value"] == 0.9486 and "detail" not in tiny


def test_impossible_fraction_never_reliable():
    """VERDICT r4 weak-4: a frac>1.0 reading must carry plausible=False
    and never an unqualified reliable=True in the emitted detail.  Unit
    form: the same qualification rule bench.emit applies, exercised on a
    synthetic >1.0-frac attempt log through pick_attempt + the rule."""
    bench_mod = _load_bench()
    bw = bench_mod.HBM_BW
    # all attempts impossible (the dia_xla_f32 1.73-frac case from r4)
    attempts = [{"s": 1.0, "bytes": 1.73 * bw, "reliable": True},
                {"s": 1.1, "bytes": 1.73 * bw, "reliable": True}]
    picked = bench_mod.pick_attempt(attempts, bw)
    frac = picked["bytes"] / picked["s"] / bw
    assert frac > 1.0
    # emit applies bench.qualify to every variant entry and the headline
    reliable, plausible = bench_mod.qualify(picked["reliable"], frac)
    assert plausible is False
    assert reliable is False
    # a plausible reading keeps its raw reliability verdict
    assert bench_mod.qualify(True, 0.95) == (True, True)
    assert bench_mod.qualify(False, 0.95) == (False, True)
