"""Iterative solvers built on cask_tpu ops (cask analog: R7 solver demo)."""

from cask_tpu.solvers.krylov import (  # noqa: F401
    SolveResult,
    bicgstab,
    block_cg,
    cg,
    cgls,
    chebyshev,
    gmres,
    ir_solve,
    minres,
    pipelined_cg,
)
from cask_tpu.solvers.eig import (  # noqa: F401
    EigResult,
    lobpcg,
)
from cask_tpu.solvers.amg import (  # noqa: F401
    AmgPrecond,
    smoothed_aggregation_amg,
)
from cask_tpu.solvers.precond import (  # noqa: F401
    IC0Factors,
    block_jacobi,
    chebyshev_precond,
    estimate_lmax,
    ic0,
    jacobi,
    lanczos_extremal,
    shard_ilu0,
    ssor,
)
