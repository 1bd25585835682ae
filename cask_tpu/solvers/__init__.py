"""Iterative solvers built on cask_tpu ops (cask analog: R7 solver demo)."""

from cask_tpu.solvers.krylov import (  # noqa: F401
    SolveResult,
    bicgstab,
    cg,
    cgls,
    chebyshev,
    gmres,
    ir_solve,
    minres,
)
from cask_tpu.solvers.amg import (  # noqa: F401
    AmgPrecond,
    smoothed_aggregation_amg,
)
from cask_tpu.solvers.precond import (  # noqa: F401
    block_jacobi,
    chebyshev_precond,
    estimate_lmax,
    jacobi,
    lanczos_extremal,
    shard_ilu0,
)
