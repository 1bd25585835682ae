"""Iterative solvers built on cask_tpu ops (cask analog: R7 solver demo)."""

from cask_tpu.solvers.krylov import SolveResult, bicgstab, cg, gmres  # noqa: F401
