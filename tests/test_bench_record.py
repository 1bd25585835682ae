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
    rec = json.loads(lines[-1])  # the driver reads the tail: last line wins
    assert rec["metric"] == "spmv_roofline_frac"
    assert rec["value"] > 0.0
    detail = rec["detail"]
    assert detail["truncated"] is True
    assert detail["skipped"], "budget 0 must skip the non-exempt variants"
    assert detail["variant"] == "bdia_fem_f32"  # the budget-exempt first
    # every later variant emits a superseding record; with budget 0 only
    # the exempt first variant (plus skip-emits) runs
    assert all(json.loads(ln)["metric"] == "spmv_roofline_frac"
               for ln in lines)


def test_pick_attempt_prefers_plausible():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_REPO, "bench.py"))
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
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
