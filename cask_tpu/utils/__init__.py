"""Aux subsystems: checkpointing, profiling, validation (SURVEY.md §5)."""

from cask_tpu.utils import checkpoint, debug, profiling  # noqa: F401
