"""The driver-ready scaling job script runs end-to-end on the fake mesh
and emits the weak-scaling-efficiency records (VERDICT r1 item 6)."""

import json


def test_scaling_job_emits_records(tmp_path):
    from examples.scaling_job import main

    out = tmp_path / "job.json"
    rc = main(["--rows-per-shard", "60000", "--shards", "1,2",
               "--out", str(out)])
    assert rc == 0
    recs = [json.loads(line) for line in out.read_text().splitlines()]
    kinds = {r["op"] for r in recs}
    assert {"dist_spmv_weak_scaling", "dist_spmv_overlap_ab",
            "scaling_summary"} <= kinds
    summary = [r for r in recs if r["op"] == "scaling_summary"][-1]
    assert summary["weak_scaling_efficiency_at_max_shards"] is not None
    scaling = [r for r in recs if r["op"] == "dist_spmv_weak_scaling"]
    assert scaling[0]["efficiency"] == 1.0
    assert all(r["rows"] >= 60000 * r["nshards"] * 0.9 for r in scaling)
