"""Training stack: losses, optimizers, jit train loops, checkpointing."""

from surfacenetworks_tpu.train import checkpoint, losses, loop, optim
from surfacenetworks_tpu.train.loop import TrainState, make_eval_step, make_train_step

__all__ = [
    "TrainState",
    "checkpoint",
    "loop",
    "losses",
    "make_eval_step",
    "make_train_step",
    "optim",
]
