"""Trace-time context naming the mesh axes a model body is sharded over.

When a whole model runs inside ``jax.shard_map`` (edge-partitioned single-mesh
execution, SURVEY.md §2.9's context-parallel analogue), per-device shards see
only their slice of the vertex axis — every *global* reduction in the op
library must become a collective:

* ``global_average`` (masked mean over vertices) psums over the vertex axis;
* ``GraphBatchNorm`` statistics (over all batch x vertex rows,
  reference utils_pt.py:107-118) psum over the vertex axis AND the batch axis
  when the mesh batch is also sharded.

The context is set by the graph-parallel runner (dist/graph_parallel.py)
around the traced body, read by nn/layers.py at trace time.  Outside any
context both names are None and layers reduce locally (the single-device and
pure-DP/GSPMD paths, where XLA handles global reductions itself).
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading


@dataclasses.dataclass(frozen=True)
class ShardedAxes:
    vertex_axis: str | None = None  # mesh axis sharding the vertex dim (-2)
    batch_axis: str | None = None  # mesh axis sharding the mesh-batch dim (0)


_state = threading.local()


def current_axes() -> ShardedAxes:
    return getattr(_state, "axes", ShardedAxes())


@contextlib.contextmanager
def sharded_axes(vertex_axis: str | None = None, batch_axis: str | None = None):
    prev = current_axes()
    _state.axes = ShardedAxes(vertex_axis=vertex_axis, batch_axis=batch_axis)
    try:
        yield
    finally:
        _state.axes = prev


def reduction_axes_for_stats() -> tuple[str, ...]:
    """Axes BatchNorm-style whole-tensor statistics must psum over."""
    axes = current_axes()
    return tuple(a for a in (axes.batch_axis, axes.vertex_axis) if a is not None)


def vertex_reduction_axis() -> str | None:
    """Axis a vertex-dim reduction (global_average) must psum over."""
    return current_axes().vertex_axis
