"""Timing/throughput utilities (reference utils/timer_utils.py counterpart)."""

import re

import jax.numpy as jnp

from surfacenetworks_tpu.train import ThroughputMeter, device_timer, time_string


def test_time_string_format():
    assert re.fullmatch(r"\d{8}_\d{6}", time_string())


def test_device_timer_syncs_and_reports():
    logs = []
    with device_timer("spmm", log=logs.append) as box:
        box["sync"] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    assert box["seconds"] > 0
    assert logs and logs[0].startswith("[spmm]")


def test_device_timer_silent_without_name():
    with device_timer() as box:
        pass
    assert "seconds" in box


def test_throughput_meter():
    import time

    m = ThroughputMeter(edges_per_step=1000.0)
    m.step(5)
    m._t0 = time.perf_counter() - 1.0  # freeze elapsed ~1s for stable rates
    s = m.summary()
    assert s["steps"] == 5
    assert abs(m.steps_per_s - 5.0) < 0.1
    assert abs(m.edges_per_s - 5000.0) < 100.0
    m.reset()
    assert m.summary()["steps"] == 0
