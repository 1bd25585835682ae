"""CG with the zero-copy solver-resident SpMV operator.

The Krylov loop applies A hundreds of times; ``DiaOperator`` keeps every
vector in the Pallas kernel's own layout so no per-iteration padding or
format copies happen — on the dev TPU this path measures ~0.8 of the HBM
roofline per SpMV (PERF.md).

Run:
    env PYTHONPATH=. python examples/solver_resident_cg.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

from cask_tpu.utils.platform import on_tpu

if not on_tpu():
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import cask_tpu
from cask_tpu.ops.dia import DiaOperator


def main():
    a = cask_tpu.generate.stencil_2d(95)  # SPD Poisson, 9025 unknowns
    op = DiaOperator(a)
    print(f"operator mode: {op.mode} (offsets {op.dia.offsets})")

    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.shape[0])
    res = cask_tpu.solvers.cg(op, op.to_padded(b), tol=1e-8, maxiter=800)
    x = np.asarray(op.from_padded(res.x))
    err = np.abs(cask_tpu.to_scipy(a) @ x - b).max()
    print(f"CG: {int(res.iterations)} iterations, converged={bool(res.converged)}, "
          f"‖Ax−b‖∞ = {err:.2e}")


if __name__ == "__main__":
    main()
