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


# Public spec HBM bandwidth (bytes/s) by device-kind substring; longest
# match wins ("TPU v5 lite" must hit v5e's number, not v5p's).
_HBM_BW_SPEC = {
    "v4": 1.228e12,
    "v5 lite": 8.19e11,   # v5e device_kind spells it "TPU v5 lite"
    "v5e": 8.19e11,
    "v5p": 2.765e12,
    "v5": 2.765e12,       # bare "TPU v5" is v5p
    "v6 lite": 1.64e12,   # v6e / Trillium
    "v6e": 1.64e12,
    "v6": 1.64e12,
}


def hbm_bandwidth() -> tuple:
    """``(bytes_per_second, known)`` for the default device's HBM.

    ``known=False`` (with the v5e spec as a stand-in) when the device
    generation can't be identified — callers gating measurements on
    physics floors should loosen their thresholds then (a faster-HBM
    part would otherwise see genuine readings discarded as artifacts,
    ADVICE r3)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 8.19e11, False
    for key in sorted(_HBM_BW_SPEC, key=len, reverse=True):
        if key in kind:
            return _HBM_BW_SPEC[key], True
    return 8.19e11, False
