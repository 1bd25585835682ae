"""Multi-chip distribution: partitioning, halo exchange, mesh executors."""

from cask_tpu.parallel.dist import AXIS, DistSpmv, row_mesh  # noqa: F401
from cask_tpu.parallel.partition import (  # noqa: F401
    CooPartition,
    DiaPartition,
    PohPartition,
    partition_coo,
    partition_dia,
    partition_poh,
)
