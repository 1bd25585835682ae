"""Driver benchmark: one JSON line with the primary metric.

Primary metric (BASELINE): tuned SpMV throughput per chip as a fraction
of the HBM-bandwidth roofline, on a config-2-class stencil matrix
(~1M rows, f32).  ``vs_baseline`` compares against the ≥0.80 roofline
target.  Timing uses the k-differenced on-device protocol
(cask_tpu.tune.timing) because naive wall-clocking is invalid on the
axon-proxied TPU (SURVEY.md §8.2).

Extra context fields beyond the required four are included for the
record; the required line schema is metric/value/unit/vs_baseline.
"""

import json
import os
import sys
import time


def main():
    t_start = time.time()
    import jax

    from cask_tpu.utils.platform import on_tpu as _on_tpu

    if not _on_tpu():
        # dev fallback: CPU harness (numbers not meaningful vs TPU roofline)
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax.numpy as jnp
    import numpy as np

    from cask_tpu.formats.device_gen import stencil2d_dia_device
    from cask_tpu.tune.timing import measure

    on_tpu = _on_tpu()
    HBM_BW = 819e9  # v5e spec; roofline denominator

    side = int(os.environ.get("CASK_BENCH_SIDE", "1024"))
    # build on device: the axon relay moves host buffers pathologically
    # slowly (SURVEY §8.2), and production hosts skip a PCIe copy too
    dia = stencil2d_dia_device(side, dtype=jnp.float32)
    m = dia.shape[0]
    nnz = 5 * m - 4 * side  # 5-point stencil
    x0 = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (m,), jnp.float32)
    )()

    # bytes actually moved per SpMV: streamed diagonals + x read + y write
    bytes_per_op = dia.traffic_bytes + 2 * m * 4

    results = {}
    variants = [("dia_pallas", lambda v: dia.spmv(v, method="pallas")),
                ("dia_xla", lambda v: dia.spmv(v, method="xla"))]
    for name, step in variants:
        try:
            meas = measure(step, x0)
            if np.isfinite(meas.checksum):
                results[name] = meas
        except Exception as e:  # noqa: BLE001 — a failing variant is data
            print(f"# variant {name} failed: {type(e).__name__}: {e}", file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "spmv_roofline_frac", "value": 0.0,
                          "unit": "fraction", "vs_baseline": 0.0,
                          "error": "all variants failed"}))
        return

    best_name = min(results, key=lambda k: results[k].seconds_per_iter)
    secs = results[best_name].seconds_per_iter
    achieved_bw = bytes_per_op / secs
    frac = achieved_bw / HBM_BW
    record = {
        "metric": "spmv_roofline_frac",
        "value": round(frac, 4),
        "unit": "fraction_of_819GBs_HBM_roofline",
        "vs_baseline": round(frac / 0.80, 4),
        "detail": {
            "variant": best_name,
            "matrix": f"stencil5_{side}x{side}",
            "rows": m,
            "nnz": nnz,
            "bytes_per_op": bytes_per_op,
            "seconds_per_op": secs,
            "gnnz_per_s": round(nnz / secs / 1e9, 3),
            "gflops_f32": round(2 * nnz / secs / 1e9, 2),
            "achieved_GBs": round(achieved_bw / 1e9, 2),
            "backend": ("tpu" if on_tpu else "cpu"),
            "on_tpu": on_tpu,
            "reliable": results[best_name].reliable,
            "all_variants": {k: v.seconds_per_iter for k, v in results.items()},
            "wall_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
