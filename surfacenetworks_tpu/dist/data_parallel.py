"""Data-parallel training over a device mesh.

Block-diagonal mesh batching is embarrassingly parallel across meshes, so DP
is the first-class axis: batches (inputs, targets, masks, and the batched
operator pytrees) shard along axis 0 over mesh axis 'data'; parameters and
optimizer state are replicated; GSPMD inserts the gradient all-reduce over
ICI.  Computation follows data: the caller places arrays with
``shard_batch`` / ``replicate`` and the jitted step preserves the layout.

(Not a port of any NCCL pattern — the reference has no distributed code,
SURVEY.md §2.9.)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surfacenetworks_tpu.dist.mesh_setup import put_global
from surfacenetworks_tpu.train.loop import TrainState


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every array in the batch pytree sharded on axis 0 ('data').

    Multi-process (``--multihost``): every process assembles the same global
    batch and ``put_global`` materializes each host's shards only."""

    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return put_global(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)


def make_dp_train_step(
    apply_fn: Callable,
    loss_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
):
    """jit-compiled DP train step.

    Use with a batch placed by ``shard_batch(mesh, ...)`` and a state placed
    by ``replicate(mesh, ...)``.  Gradients are constrained replicated so the
    parameter update stays identical on every device.
    """
    replicated_sharding = NamedSharding(mesh, P())

    def step(state: TrainState, batch):
        def objective(params):
            outputs = apply_fn(params, batch)
            loss, metrics = loss_fn(outputs, batch)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        grads = jax.lax.with_sharding_constraint(
            grads, jax.tree_util.tree_map(lambda _: replicated_sharding, grads)
        )
        new_state = state.apply_gradients(grads)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
