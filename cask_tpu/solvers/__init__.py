"""Iterative solvers built on cask_tpu ops (cask analog: R7 solver demo)."""

from cask_tpu.solvers.krylov import (  # noqa: F401
    SolveResult,
    bicgstab,
    cg,
    chebyshev,
    gmres,
)
from cask_tpu.solvers.precond import block_jacobi, jacobi  # noqa: F401
