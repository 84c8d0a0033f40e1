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


class MetricsLogger:
    """Per-epoch metrics JSONL + curve PNGs — the headless equivalent of the
    reference's visdom/plotly live-plot hooks (train_4_normal.py:93-95).

    ``write(epoch, split, **metrics)`` appends one JSON line to
    ``<log_dir>/<prefix>.metrics.jsonl``; ``plot()`` re-renders
    ``<prefix>_curves.png`` from the full file (cheap: call it per epoch —
    the curves update live as training runs, like a visdom window)."""

    def __init__(self, result_prefix: str, log_dir: str | None, debug: bool = False):
        self.path = None
        if not debug and log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{result_prefix}.metrics.jsonl")

    def write(self, epoch: int, split: str, **metrics) -> None:
        if self.path is None:
            return
        import json

        record = {"epoch": int(epoch), "split": split, "time": time.time()}
        # NaNs are written as-is (json NaN literal): a diverged run must show
        # as a gap/NaN in the record, not as a silently missing key
        record.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as fp:
            fp.write(json.dumps(record) + "\n")

    def plot(self) -> str | None:
        if self.path is None:
            return None
        from surfacenetworks_tpu import viz

        try:
            return viz.plot_curves(self.path)
        except Exception:  # rendering must never kill a training run
            return None


class MetricFetcher:
    """One-step-delayed device-scalar fetch.

    ``float(loss)`` right after a jit dispatch blocks the host on that very
    step; delaying the fetch by one step lets the host convert step t's
    metrics while the device runs step t+1, keeping dispatch off the
    critical path.  ``push`` returns the PREVIOUS step's floats (or None on
    the first call); ``flush`` drains the final step."""

    def __init__(self):
        self._pending = None

    def push(self, *device_scalars):
        prev = self._pending
        self._pending = device_scalars
        return tuple(float(x) for x in prev) if prev is not None else None

    def flush(self):
        prev, self._pending = self._pending, None
        return tuple(float(x) for x in prev) if prev is not None else None


class TieredSampler:
    """Size-tiered batch sampler for multi-bucket padding.

    Samples are grouped by their ``BucketSet`` tier so a batch never mixes
    tiers — each batch pads to its own tier's bucket, the static-shape
    analogue of the reference's per-batch re-padding
    (normal_predict/sampler.py:125-133).  Groups are drawn with probability
    proportional to their size, so the per-sample visit rate matches the
    plain shuffled sampler in expectation.
    """

    def __init__(self, items, bucketset, batch_size: int, shuffle: bool = True, seed: int = 17):
        groups: dict = {}
        for s in items:
            groups.setdefault(bucketset.tier_index([s]), []).append(s)
        self.samplers = {
            k: EpochSampler(v, batch_size, shuffle=shuffle, seed=seed + k)
            for k, v in groups.items()
        }
        self.keys = sorted(groups)
        sizes = np.asarray([len(groups[k]) for k in self.keys], np.float64)
        self.weights = sizes / sizes.sum()
        self.rng = np.random.default_rng(seed)

    def next_batch(self):
        k = self.keys[int(self.rng.choice(len(self.keys), p=self.weights))]
        return self.samplers[k].next_batch()


def add_multihost_flags(parser):
    """--multihost bootstrap flags (jax.distributed over DCN; SURVEY.md §2.9
    'communication backend' — the reference has none)."""
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed before any device use "
                             "(multi-host slice over DCN; pass coordinator flags "
                             "or rely on the TPU environment's auto-detection)")
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 (omit on TPU pods: auto)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)


def maybe_initialize_multihost(args, log=None):
    """Bootstrap jax.distributed when --multihost is set.  Must run before
    the first jax.devices() touch; no-op otherwise."""
    if not getattr(args, "multihost", False):
        return
    from surfacenetworks_tpu.dist import initialize_multihost

    kwargs = {}
    if args.num_processes is not None:
        kwargs["num_processes"] = args.num_processes
    if args.process_id is not None:
        kwargs["process_id"] = args.process_id
    initialize_multihost(coordinator_address=args.coordinator_address, **kwargs)
    if log is not None:
        log(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.device_count()} global devices ({len(jax.local_devices())} local)"
        )


def enable_compilation_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache for every trainer.

    Deep-trunk train steps compile for minutes on a remote TPU; cached
    executables cut repeat launches to seconds.  Default location is
    ``~/.cache/surfacenetworks_tpu/jax`` (override with
    ``SNX_COMPILATION_CACHE`` or the argument; empty string disables)."""
    if cache_dir is None:
        cache_dir = os.environ.get(
            "SNX_COMPILATION_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "surfacenetworks_tpu", "jax"),
        )
    if not cache_dir:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs


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

    @property
    def steps_per_s(self) -> float:
        return self.steps / max(time.perf_counter() - self.t0, 1e-9)

    def report(self) -> str:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return f"{self.steps / dt:.2f} steps/s, {self.items / dt:.0f} vertices/s"
