"""Device-synchronized timing and throughput meters.

TPU-native counterpart of the reference's ``utils/timer_utils.py:4-22``
(``timer`` / ``cutimer`` wall-clock prints with ``torch.cuda.synchronize``):
on TPU the dispatch is asynchronous, so synchronization is
``jax.block_until_ready`` on the values produced inside the timed region,
and the interesting rates are steps/s and edges/s (the BASELINE.json
primary metric) rather than bare wall time.  ``jax.profiler`` traces are
exposed through the ``trace`` context manager (the CLI flag
``--jax-profile`` uses the same machinery, cli/train_normal.py).
"""

from __future__ import annotations

import contextlib
import datetime
import time
from dataclasses import dataclass, field


def time_string() -> str:
    """Timestamp for log/checkpoint names (reference ``time_string``,
    utils/timer_utils.py:20-22)."""
    return datetime.datetime.now().strftime("%Y%m%d_%H%M%S")


@contextlib.contextmanager
def device_timer(name: str = "", sync=None, log=print):
    """Wall-clock a region, synchronizing on ``sync`` (an array/pytree) at
    exit so asynchronous TPU dispatch is included — the ``cutimer``
    equivalent.  ``sync`` may also be a zero-arg callable returning the
    value(s) to block on (useful when the value is created inside the
    region)."""
    import jax

    box = {}
    t0 = time.perf_counter()
    try:
        yield box
    finally:
        target = box.get("sync", sync)
        if callable(target):
            target = target()
        if target is not None:
            jax.block_until_ready(target)
        box["seconds"] = dt = time.perf_counter() - t0
        if name and log is not None:
            log(f"[{name}] {dt * 1e3:.3f} ms")


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace of the enclosed region (view with
    tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """Steps/s and edges/s meter for training loops.

    ``edges_per_step``: nnz of the batched operator x applications per step
    (forward + backward); callers pass whatever accounting they want — the
    meter only divides by elapsed time.  Rates use a moving window since
    ``reset()`` so compile time can be excluded by resetting after step 0.
    """

    edges_per_step: float = 0.0
    _t0: float = field(default_factory=time.perf_counter)
    _steps: int = 0

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1) -> None:
        self._steps += n

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_s(self) -> float:
        return self._steps / max(self.seconds, 1e-12)

    @property
    def edges_per_s(self) -> float:
        return self.steps_per_s * self.edges_per_step

    def summary(self) -> dict:
        return {
            "steps": self._steps,
            "seconds": round(self.seconds, 4),
            "steps_per_s": round(self.steps_per_s, 3),
            "edges_per_s": round(self.edges_per_s, 1),
        }
