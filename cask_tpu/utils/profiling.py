"""Tracing/profiling helpers (SURVEY.md §5).

cask analog: Maxeler build reports + perf-model cycle counts.  Here:
``jax.profiler`` traces viewable in XProf/Perfetto, plus the timing
harness in :mod:`cask_tpu.tune.timing` for wall numbers the proxied
TPU cannot fake.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Profile a block: ``with trace('/tmp/tb'): y = op(x).block_until_ready()``.

    View with xprof/tensorboard.  On the axon-proxied dev chip traces
    may be incomplete; prefer real-slice runs for overlap verification
    (SURVEY.md §7 hard-part (d)).
    """
    import jax

    logdir = logdir or os.environ.get("CASK_TPU_TRACE_DIR", "/tmp/cask_tpu_trace")
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named-scope annotation for profile timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
