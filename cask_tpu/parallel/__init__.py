"""Multi-chip distribution: partitioning, halo exchange, mesh executors."""

from cask_tpu.parallel.dist import (  # noqa: F401
    AXIS,
    Dist2DSpmv,
    DistSpmv,
    mesh_2d,
    row_mesh,
)
from cask_tpu.parallel.partition import (  # noqa: F401
    Coo2DPartition,
    CooPartition,
    DiaPartition,
    PohPartition,
    partition_2d,
    partition_coo,
    partition_dia,
    stencil_dia_partition,
    partition_poh,
)
