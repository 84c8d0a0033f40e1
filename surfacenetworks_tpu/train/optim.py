"""Optimizers and LR schedules matching the reference training recipes.

torch ``Adam(weight_decay=w)`` adds ``w * param`` to the gradient *before*
the moment updates (coupled L2), which in optax is ``add_decayed_weights``
chained before ``adam`` — not ``adamw`` (decoupled).  Reference recipes:

* normal_predict: Adam(lr=1e-3, amsgrad opt-in), LR x0.5 every ``half_lr``
  epochs once past epoch 100 (train_4_normal.py:154-159, 280-283)
* ARAP / mesh-MNIST / VAE / FAUST: Adam(1e-3, weight_decay=1e-5); ARAP and
  mesh-MNIST halve LR every 10 epochs past epoch 50 / 20
  (as_rigid_as_possible/main.py:207,237-239; mesh_mnist/main.py:142,176-178)
* SGD(lr, weight_decay=1e-5, momentum=0.9) late-stage option
  (train_4_normal.py:158-159)
"""

from __future__ import annotations

import optax


def epoch_halving_schedule(
    base_lr: float,
    steps_per_epoch: int,
    start_epoch: int = 0,
    every: int = 10,
) -> optax.Schedule:
    """LR x0.5 at each ``every``-epoch boundary after ``start_epoch``.

    Matches the reference's in-place ``param_group['lr'] *= 0.5`` pattern:
    the first halving fires at the first qualifying epoch boundary.
    """

    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.asarray(step) // max(steps_per_epoch, 1)
        # number of every-epoch boundaries passed since start_epoch
        n = jnp.where(epoch > start_epoch, (epoch - start_epoch - 1) // every + 1, 0)
        return base_lr * (0.5**n)

    return schedule


def adam(
    lr: float | optax.Schedule = 1e-3,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    base = optax.amsgrad(lr) if amsgrad else optax.adam(lr)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), base)
    return base


def sgd(lr: float = 1e-3, weight_decay: float = 1e-5, momentum: float = 0.9):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(lr, momentum=momentum))
    return optax.chain(*parts)
