"""Config-5-scale check: ≥10M-row row-partitioned SpMV on the fake mesh.

Gated behind CASK_TPU_SLOW=1 (roughly a minute of CPU): the driver's
fast suite skips it; run explicitly before perf rounds.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CASK_TPU_SLOW") != "1", reason="set CASK_TPU_SLOW=1"
)


def test_10m_row_distributed_spmv():
    import jax.numpy as jnp

    from cask_tpu.formats.generate import stencil_2d
    from cask_tpu.parallel import DistSpmv, partition_dia, row_mesh

    side = 3240  # 10.49M rows
    a = stencil_2d(side, dtype=np.float32)
    assert a.shape[0] >= 10_000_000
    plan = partition_dia(a, 8, align=8192)
    op = DistSpmv(plan, row_mesh(8))
    rng = np.random.default_rng(0)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    y = np.asarray(op(x))
    # spot-check rows against a direct computation (full scipy product at
    # this size is slow but fine once)
    ref = None
    import scipy.sparse as sp

    from cask_tpu.formats.convert import to_scipy

    ref = to_scipy(a) @ x
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-5
