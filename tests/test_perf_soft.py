"""Soft performance-regression records (SURVEY.md §4 item 5).

These never fail on absolute speed (CI runs on CPU); they assert
*relative* sanity — the tuned/structured paths must not be drastically
slower than the naive path on the same backend — and print the roofline
records so every test run leaves a perf trace.
"""

import json

import jax.numpy as jnp
import numpy as np

from cask_tpu.formats.generate import banded, stencil_2d
from cask_tpu.ops.dia import dia_plan
from cask_tpu.ops.spmv import spmv
from cask_tpu.tune.timing import measure


class TestRelativePerf:
    def test_dia_beats_csr_gather_on_band(self):
        a = banded(20000, 8, seed=0, dtype=np.float32)
        dev = a.device_put()
        d = dia_plan(a).device_put()
        x0 = jnp.asarray(np.random.default_rng(0).standard_normal(20000).astype(np.float32))
        m_csr = measure(lambda v: spmv(dev, v), x0, k1=3, k2=9)
        m_dia = measure(lambda v: d._spmv_xla(v), x0, k1=3, k2=9)
        print(json.dumps({
            "test": "dia_vs_csr_band20k",
            "csr_us": m_csr.seconds_per_iter * 1e6,
            "dia_us": m_dia.seconds_per_iter * 1e6,
        }))
        # the structured path must at minimum not be 3x slower
        assert m_dia.seconds_per_iter < 3 * m_csr.seconds_per_iter

    def test_plan_reuse_beats_replan(self):
        import time

        from cask_tpu.ops.spgemm import spgemm_plan

        a = stencil_2d(40)
        t0 = time.perf_counter()
        plan = spgemm_plan(a, a)
        t_plan = time.perf_counter() - t0
        import jax

        numeric = jax.jit(plan.numeric)
        np.asarray(numeric(a.data, a.data).data)  # compile + run once
        t0 = time.perf_counter()
        np.asarray(numeric(a.data, a.data).data)
        t_numeric = time.perf_counter() - t0
        print(json.dumps({"test": "spgemm_plan_reuse",
                          "plan_s": t_plan, "numeric_warm_s": t_numeric}))
        # warm numeric re-run must be far cheaper than re-planning
        assert t_numeric < max(t_plan, 1e-3)
