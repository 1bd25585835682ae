"""Native C++ preprocessing core (cask host-runtime analog, SURVEY.md §2).

Use :mod:`cask_tpu.native.binding`; everything degrades gracefully to
numpy when the toolchain is absent."""

from cask_tpu.native.binding import NativeUnavailable, available  # noqa: F401
