"""On-device kernel timing for the autotuner.

The axon-proxied TPU in this container breaks every naive timing recipe
(SURVEY.md §8.2): ``block_until_ready`` does not await real execution and
host fetches of device buffers cost seconds.  The protocol here follows
§8.4's mandated design:

1. run the candidate k times *inside one compiled computation*, chaining a
   data dependence between iterations so XLA cannot elide them,
2. end in a scalar reduction and fetch only that scalar (cheap, and
   fetching forces completion),
3. time two iteration counts (k₁ < k₂) and difference the wall clocks to
   cancel fixed dispatch/fetch overhead,
4. sanity-check linearity; a candidate whose timings are not roughly
   linear in k is re-measured once and otherwise marked unreliable.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Measurement:
    seconds_per_iter: float
    reliable: bool
    checksum: float  # scalar output, doubles as correctness canary


def _iterate(step: Callable, x0, k: int):
    """Run ``x ← normalize(step(x))`` k times with a data dependence.

    Normalizing keeps values from over/underflowing over many iterations
    while preserving the memory-traffic profile of a single step.
    """

    def body(i, x):
        y = step(x)
        # cheap renorm: scale by a scalar derived from y (data dependence)
        s = jnp.abs(y[..., :1].reshape(-1)[0]) + 1.0
        return y / jnp.where(jnp.isfinite(s) & (s > 0), s, 1.0)

    xk = jax.lax.fori_loop(0, k, body, x0)
    return jnp.sum(jnp.abs(xk.reshape(-1)[:128]))


def measure(step: Callable, x0, *, k1: int = 4, k2: int = 20,
            tol_rel: float = 0.35, jit_kwargs: Optional[dict] = None) -> Measurement:
    """Seconds per application of ``step`` on the current default device."""
    jit_kwargs = jit_kwargs or {}
    f = jax.jit(_iterate, static_argnums=(0, 2), **jit_kwargs)

    def run(k):
        t0 = time.perf_counter()
        val = float(f(step, x0, k))  # scalar fetch forces completion
        return time.perf_counter() - t0, val

    # warm-up / compile both variants
    run(k1)
    run(k2)
    t1, v1 = run(k1)
    t2, _ = run(k2)
    per_iter = (t2 - t1) / (k2 - k1)
    # linearity check: redo and compare
    t1b, _ = run(k1)
    t2b, _ = run(k2)
    per_iter_b = (t2b - t1b) / (k2 - k1)
    reliable = (
        per_iter > 0
        and per_iter_b > 0
        and abs(per_iter - per_iter_b) <= tol_rel * max(per_iter, per_iter_b)
    )
    best = min(x for x in (per_iter, per_iter_b) if x > 0) if (per_iter > 0 or per_iter_b > 0) else float("inf")
    return Measurement(seconds_per_iter=best, reliable=reliable, checksum=v1)
