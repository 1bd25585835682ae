"""Sparsity signatures — the autotuner cache key.

cask analog: cask's DSE selects an architecture *per matrix (class)*; its
implicit key was the matrix file.  Here the key is a structural
fingerprint, so that tuned parameters transfer between matrices with the
same sparsity *shape* (e.g. every timestep of a simulation, or resized
instances of the same stencil family), per BASELINE.json T6: "cache tuned
variants keyed on sparsity signature".
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Tuple

import numpy as np

from cask_tpu.formats.matrix import BSR, COO, CSR


@dataclasses.dataclass(frozen=True)
class Signature:
    shape: Tuple[int, int]
    nnz: int
    dtype: str
    # distribution of nnz/row, quantized: robust to permutations of rows
    row_nnz_quantiles: Tuple[int, ...]  # [min, p25, p50, p75, p90, p99, max]
    mean_bandwidth_log2: int  # log2 of mean |i - j| over entries
    # fraction of nnz that fall into occupied b×b blocks, for candidate b:
    # measures "blockiness" → BSR viability  (b in BLOCK_PROBE)
    block_fill: Tuple[int, ...]  # percent fill of occupied blocks per probe size

    BLOCK_PROBE = (4, 8, 16, 32)

    def key(self) -> str:
        payload = json.dumps(dataclasses.asdict(self), sort_keys=True)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def class_key(self) -> str:
        """Coarser key ignoring exact shape/nnz — matches the matrix
        *family* (same structure at a different size)."""
        d = dataclasses.asdict(self)
        m, n = d.pop("shape")
        nnz = d.pop("nnz")
        d["aspect_log2"] = int(np.round(np.log2(max(m, 1) / max(n, 1)))) if n else 0
        d["nnz_per_row_log2"] = int(np.round(np.log2(max(nnz / max(m, 1), 1e-9))))
        # size-relative bandwidth exponent α where bw ≈ n^α (stencils keep
        # α≈0.5 across sizes, dense bands α≈1, diagonals α≈0)
        bwl2 = d.pop("mean_bandwidth_log2")
        d["bandwidth_alpha_x2"] = int(np.round(2.0 * bwl2 / max(np.log2(n + 2.0), 1.0)))
        # quantize fill to 20%-buckets and quantiles relative to median
        d["block_fill"] = [int(f // 20) for f in d["block_fill"]]
        qs = d.pop("row_nnz_quantiles")
        med = max(qs[3], 1)
        d["rel_quantiles"] = [int(np.round(4.0 * q / med)) for q in qs]
        payload = json.dumps(d, sort_keys=True)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def signature(a) -> Signature:
    if isinstance(a, BSR):
        from cask_tpu.formats.convert import bsr_to_csr

        a = bsr_to_csr(a)
    if isinstance(a, COO):
        from cask_tpu.formats.convert import coo_to_csr

        a = coo_to_csr(a)
    if not isinstance(a, CSR):
        raise TypeError(f"cannot fingerprint {type(a)}")

    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64)
    m, n = a.shape
    lens = np.diff(indptr)
    if m and a.nnz:
        qs = np.quantile(lens, [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])
        rows = np.repeat(np.arange(m, dtype=np.int64), lens)
        bw = float(np.mean(np.abs(rows - indices))) if indices.size else 0.0
        block_fill = []
        for b in Signature.BLOCK_PROBE:
            bkey = (rows // b) * (-(-n // b)) + indices // b
            occupied = np.unique(bkey).size
            fill = indices.size / max(occupied * b * b, 1)
            block_fill.append(int(round(100 * min(fill, 1.0))))
    else:
        qs = np.zeros(7)
        bw = 0.0
        block_fill = [0] * len(Signature.BLOCK_PROBE)

    return Signature(
        shape=(int(m), int(n)),
        nnz=int(a.nnz),
        dtype=str(np.dtype(a.dtype)),
        row_nnz_quantiles=tuple(int(q) for q in qs),
        mean_bandwidth_log2=int(np.round(np.log2(bw + 1.0))),
        block_fill=tuple(block_fill),
    )
