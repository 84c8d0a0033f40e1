"""Shared CLI utilities: logging, parameter counts, batch iteration."""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np


def make_logger(result_prefix: str, log_dir: str | None, debug: bool = False):
    """Reference-style logger: prints and appends to a per-run logfile
    (train_4_normal.py:97-103)."""

    def log(stuff):
        msg = f"{result_prefix}::{stuff}"
        if debug or log_dir is None:
            print(msg, file=sys.stderr)
        else:
            print(msg)
            os.makedirs(log_dir, exist_ok=True)
            with open(os.path.join(log_dir, f"{result_prefix}.log"), "a") as fp:
                print(stuff, file=fp)

    return log


def log_environment(log):
    """Host + device report (the TPU analogue of logging nvidia-smi,
    train_4_normal.py:106-107)."""
    import platform

    log(f"hostname {platform.node()}")
    log(f"devices {jax.devices()}")


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


class EpochSampler:
    """Sequential-with-shuffle sampler matching the reference's epoch
    semantics (sampler.py:93-122): fixed order per epoch, reshuffled when
    exhausted."""

    def __init__(self, items, batch_size: int, shuffle: bool = True, seed: int = 17):
        self.items = list(items)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.pos = 0
        if shuffle:
            self.rng.shuffle(self.items)

    def next_batch(self):
        out = []
        while len(out) < self.batch_size:
            if self.pos >= len(self.items):
                self.pos = 0
                if self.shuffle:
                    self.rng.shuffle(self.items)
            out.append(self.items[self.pos])
            self.pos += 1
        return out


class Throughput:
    """steps/s + vertices/s meter (the tqdm-replacement observability hook)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.items = 0

    def tick(self, items: int = 0):
        self.steps += 1
        self.items += items

    def report(self) -> str:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return f"{self.steps / dt:.2f} steps/s, {self.items / dt:.0f} vertices/s"
