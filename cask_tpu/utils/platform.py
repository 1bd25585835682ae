"""Backend detection that survives broken TPU plugins.

On this container JAX_PLATFORMS=axon is pinned, but the axon PJRT plugin
registers only in one process at a time (the tunnel is single-tenant);
in any other process ``jax.default_backend()`` raises.  These helpers
fall back to CPU instead of crashing, so library code and examples work
regardless of who holds the chip.
"""

from __future__ import annotations

import jax


def backend() -> str:
    """Resolved default backend name; falls back to CPU if the configured
    platform cannot initialize."""
    try:
        return jax.default_backend()
    except RuntimeError:
        try:
            jax.config.update("jax_platforms", "cpu")
            return jax.default_backend()
        except Exception:
            return "cpu"


def on_tpu() -> bool:
    return backend() == "tpu"
