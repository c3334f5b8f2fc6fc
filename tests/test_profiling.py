"""Profiling hooks (vfi_tpu/utils/profiling.py — SURVEY §5: the reference
has no profiler at all; these are the rebuild's additions)."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vfi_tpu.utils.profiling import StepTimer, trace


def test_step_timer_records_sections():
    t = StepTimer()
    for _ in range(3):
        with t.section("data"):
            time.sleep(0.01)
        with t.section("step"):
            time.sleep(0.002)
    assert len(t.sections["data"]) == 3
    assert len(t.sections["step"]) == 3
    assert t.mean("data") >= 0.01
    assert t.mean("step") >= 0.002
    # mean of a never-recorded section is NaN, not an exception
    assert np.isnan(t.mean("missing"))


def test_step_timer_records_on_exception():
    t = StepTimer()
    try:
        with t.section("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert len(t.sections["boom"]) == 1


def test_step_timer_report_format():
    t = StepTimer()
    with t.section("fwd"):
        time.sleep(0.001)
    rep = t.report()
    assert "fwd" in rep and "p50" in rep and "p90" in rep and "n=1" in rep


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "prof")
    with trace(logdir):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert found, f"no profile artifacts written under {logdir}"
