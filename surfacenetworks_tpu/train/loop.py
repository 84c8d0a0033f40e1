"""jit-compiled training loops.

The reference's hot loop (sample -> forward -> loss -> backward -> Adam,
train_4_normal.py:232-242) becomes a single compiled ``train_step`` over
static-shape batches; the host only assembles padded buckets and feeds them.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32), tx=tx)

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(params=params, opt_state=opt_state, step=self.step + 1)


def make_train_step(
    apply_fn: Callable,
    loss_fn: Callable,
    donate: bool = True,
):
    """Build a jitted train step.

    ``apply_fn(params, batch) -> outputs``; ``loss_fn(outputs, batch) ->
    (loss, metrics_dict)``.  ``batch`` is any pytree of device arrays
    (operators included — EllOperator / DiracOperator are pytrees).
    """

    def step(state: TrainState, batch):
        def objective(params):
            outputs = apply_fn(params, batch)
            loss, metrics = loss_fn(outputs, batch)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, loss_fn: Callable):
    def step(params, batch):
        outputs = apply_fn(params, batch)
        loss, metrics = loss_fn(outputs, batch)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    return jax.jit(step)


def check_finite(metrics: dict, context: str = "") -> None:
    """NaN crash-fast guard (train_4_normal.py:236,244)."""
    for k, v in metrics.items():
        if not bool(jnp.isfinite(v).all()):
            raise FloatingPointError(f"non-finite metric {k}={v} {context}")
