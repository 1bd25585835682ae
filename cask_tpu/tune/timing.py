"""On-device kernel timing for the autotuner and benches.

The axon-proxied TPU in this container breaks every naive timing recipe
(SURVEY.md §8.2): ``block_until_ready`` does not await real execution and
host fetches of device buffers cost seconds.  The protocol here follows
§8.4's mandated design:

1. run the candidate k times *inside one compiled computation*.  Each
   iteration consumes a *distinct* pre-built input (slices of one
   stacked buffer) so XLA cannot CSE the calls, and a scalar
   accumulator threads through the loop so none can be elided; inputs
   are pre-built so the loop adds no elementwise traffic that would
   pollute a bandwidth measurement,
2. end in a scalar reduction and fetch only that scalar (the fetch
   forces completion),
3. time two iteration counts (k₁ < k₂) and difference the wall clocks to
   cancel fixed dispatch/compile/fetch overhead,
4. repeat and keep measurements only when the two estimates agree
   (linearity sanity check); otherwise mark unreliable.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Measurement:
    seconds_per_iter: float
    reliable: bool
    checksum: float  # scalar folded over every iteration's output


_POOL = 8  # distinct inputs cycled through the loop


def _make_inputs(x0, k: int):
    """A pool of distinct copies of x0 (tiny relative perturbation, so
    kernels see realistic values but XLA sees different buffers).  The
    loop cycles the pool: ``step(xs[i % P])`` depends on the induction
    variable, so XLA cannot hoist the step out as loop-invariant, while
    the pool keeps the buffer bounded for huge operands / large k."""
    p = min(k, _POOL)
    scales = (1.0 + jnp.arange(p, dtype=x0.dtype) * jnp.asarray(1e-6, x0.dtype))
    return x0[None] * scales.reshape((p,) + (1,) * x0.ndim)


def _iterate(step: Callable, xs, k: int):
    p = xs.shape[0]

    def body(i, acc):
        y = step(xs[i % p])
        flat = y.reshape(-1)
        return acc + jnp.mean(jnp.abs(flat[:128]).astype(jnp.float32))

    return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))


def measure(step: Callable, x0, *, k1: int = 4, k2: int = 20,
            tol_rel: float = 0.35) -> Measurement:
    """Seconds per application of ``step`` on the current default device."""
    x0 = jnp.asarray(x0)
    xs = _make_inputs(x0, k2)
    # k is a traced operand (fori lowers to a dynamic while), so both
    # iteration counts share ONE compile — compiles are minutes on the
    # proxied dev TPU, and this halves them.
    f = jax.jit(_iterate, static_argnums=(0,))

    def run(k):
        t0 = time.perf_counter()
        val = float(f(step, xs, jnp.int32(k)))  # scalar fetch forces completion
        return time.perf_counter() - t0, val

    # warm-up (compile + one full-length pass)
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
    cands = [x for x in (per_iter, per_iter_b) if x > 0]
    best = min(cands) if cands else float("inf")
    return Measurement(seconds_per_iter=best, reliable=reliable, checksum=v1)


def _iterate_chained(step: Callable, x0, k):
    def body(i, x):
        return step(x)

    xk = jax.lax.fori_loop(0, k, body, x0)
    return jnp.mean(jnp.abs(xk.reshape(-1)[:128]).astype(jnp.float32))


def _iterate_chained_ops(step: Callable, x0, ops, k):
    def body(i, x):
        return step(x, ops)

    xk = jax.lax.fori_loop(0, k, body, x0)
    return jnp.mean(jnp.abs(xk.reshape(-1)[:128]).astype(jnp.float32))


def measure_chained(step: Callable, x0, *, operands=None,
                    k1: int = 20, k2: int = 320,
                    points: int = 4, repeats: int = 2,
                    tol_rel: float = 0.25) -> Measurement:
    """Timing for *endomorphic* steps (``step: x → x``-shaped).

    Purest protocol: iterations chain directly, so no input pools or
    padding copies pollute a bandwidth number.  Estimation uses a
    *ladder* of iteration counts and the **minimum pairwise slope**:
    the axon relay's completion polling adds latency that grows with run
    length, so any single two-point difference over-estimates; every
    inflation is additive, making the min slope the least-biased
    estimate (measured: large-k slopes read ~25% high, SURVEY-class
    pathology).  The caller must supply a step that is numerically
    stable under composition (e.g. a spectrally scaled SpMV).

    ``operands``: optional pytree passed to ``step(x, operands)`` as a
    TRACED argument.  Plans beyond ~100 MB must ride here, not in the
    step's closure: closed-over arrays become compile-time constants
    and the axon remote-compile relay rejects the oversized request
    body outright (HTTP 413 — probe_fused3's 512 MB X0, and the 840 MB
    slab plan in probe_slabmm1, both died this way).
    """
    x0 = jnp.asarray(x0)
    if operands is None:
        f = jax.jit(_iterate_chained, static_argnums=(0,))

        def run(k):
            t0 = time.perf_counter()
            val = float(f(step, x0, jnp.int32(k)))
            return time.perf_counter() - t0, val
    else:
        f = jax.jit(_iterate_chained_ops, static_argnums=(0,))

        def run(k):
            t0 = time.perf_counter()
            val = float(f(step, x0, operands, jnp.int32(k)))
            return time.perf_counter() - t0, val

    ks = [int(round(k1 + (k2 - k1) * i / (points - 1))) for i in range(points)]
    run(ks[0])  # compile + warm
    run(ks[-1])
    v1 = float("nan")
    walls = {k: float("inf") for k in ks}
    for _ in range(repeats):
        for k in ks:
            t, v1 = run(k)
            walls[k] = min(walls[k], t)

    slopes = []
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            dk = ks[j] - ks[i]
            if dk > 0:
                slopes.append((walls[ks[j]] - walls[ks[i]]) / dk)
    pos = sorted(s for s in slopes if s > 0)
    if not pos:
        return Measurement(seconds_per_iter=float("inf"), reliable=False, checksum=v1)
    # median of pairwise slopes: robust both to the one-sided polling
    # inflation at large k (which biases a plain fit high) and to random
    # jitter (which biases a min low — measured producing impossible
    # sub-floor readings)
    mid = len(pos) // 2
    best = pos[mid] if len(pos) % 2 else 0.5 * (pos[mid - 1] + pos[mid])
    spread = (pos[-1] - pos[0]) / best if best > 0 else float("inf")
    reliable = len(pos) == len(slopes) and spread <= 4 * tol_rel
    return Measurement(seconds_per_iter=best, reliable=reliable, checksum=v1)
