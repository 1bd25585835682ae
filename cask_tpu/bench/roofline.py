"""Roofline accounting: bytes-per-op models and achieved-fraction math.

cask's DSE carried an analytic performance model (cycles/nnz) against
the DFE's streaming rate; the TPU analog is a bytes model against HBM
bandwidth (SURVEY.md §6).  The *operative* denominator is the measured
or spec bandwidth of the chip the bench runs on.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

# Spec sheet HBM bandwidths by TPU generation (bytes/s).
SPEC_BW = {
    "v4": 1.2e12,
    "v5e": 8.19e11,
    "v5p": 2.765e12,
    "v6e": 1.64e12,
    "cpu": 5.0e10,  # placeholder so dev runs produce finite fractions
}


def chip_bandwidth() -> float:
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    from cask_tpu.utils.platform import on_tpu

    if not on_tpu():
        return SPEC_BW["cpu"]
    return SPEC_BW.get(gen, SPEC_BW["v5e"])


@dataclasses.dataclass
class OpTraffic:
    """Minimal HBM bytes one application of the op must move."""

    bytes_per_op: int
    flops_per_op: int
    nnz: int

    def record(self, seconds: float, *, bandwidth: Optional[float] = None) -> dict:
        bw = bandwidth or chip_bandwidth()
        achieved = self.bytes_per_op / seconds
        return {
            "seconds_per_op": seconds,
            "achieved_GBs": round(achieved / 1e9, 3),
            "roofline_frac": round(achieved / bw, 4),
            "gnnz_per_s": round(self.nnz / seconds / 1e9, 4),
            "gflops": round(self.flops_per_op / seconds / 1e9, 3),
        }


def spmv_traffic(matrix, variant: str, k: int = 1) -> OpTraffic:
    """Bytes/flops for one SpMV/SpMM with the given materialized format."""
    from cask_tpu.formats.matrix import BSR, COO, CSR
    from cask_tpu.ops.dia import DiaMatrix

    db = np.dtype(matrix.dtype).itemsize if hasattr(matrix, "dtype") else 4
    if isinstance(matrix, DiaMatrix):
        m, n = matrix.shape
        true_nnz = int(np.count_nonzero(np.asarray(matrix.vals))) + int(
            matrix.rem_data.shape[0]
        )
        bytes_ = matrix.traffic_bytes + (n + m) * db * k
        return OpTraffic(bytes_, 2 * true_nnz * k, true_nnz)
    if isinstance(matrix, BSR):
        m, n = matrix.shape
        stored = matrix.nnz
        true_nnz = int(np.count_nonzero(np.asarray(matrix.data)))
        bytes_ = stored * db + matrix.n_blocks * 4 + (n + m) * db * k
        return OpTraffic(bytes_, 2 * true_nnz * k, true_nnz)
    if isinstance(matrix, (CSR, COO)):
        m, n = matrix.shape
        nnz = matrix.nnz
        bytes_ = nnz * (db + 4) + (n + m) * db * k
        return OpTraffic(bytes_, 2 * nnz * k, nnz)
    raise TypeError(f"no traffic model for {type(matrix)}")
