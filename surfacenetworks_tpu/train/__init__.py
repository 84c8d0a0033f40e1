"""Training stack: losses, optimizers, jit train loops, checkpointing."""

from surfacenetworks_tpu.train import checkpoint, losses, loop, optim, timing
from surfacenetworks_tpu.train.loop import TrainState, make_eval_step, make_train_step
from surfacenetworks_tpu.train.timing import ThroughputMeter, device_timer, time_string

__all__ = [
    "ThroughputMeter",
    "TrainState",
    "checkpoint",
    "device_timer",
    "loop",
    "losses",
    "make_eval_step",
    "make_train_step",
    "optim",
    "time_string",
    "timing",
]
