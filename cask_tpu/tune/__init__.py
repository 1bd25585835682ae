"""Per-matrix autotuner (cask DSE analog): variant search + timing + cache."""

from cask_tpu.tune.cache import TunerCache, default_cache  # noqa: F401
from cask_tpu.tune.timing import Measurement, measure  # noqa: F401
from cask_tpu.tune.tuner import TunedSpmv, Variant, tune  # noqa: F401
