"""Host input pipeline tests: pack-once operator caching and background
prefetch (the round-4 answer to the reference's preload-once design,
normal_predict/train_4_normal.py:195-218)."""

import threading
import time

import numpy as np
import pytest

import jax

from surfacenetworks_tpu.data import (
    Buckets,
    OperatorCache,
    datasets,
    dirac_batch,
    laplacian_batch,
    prefetch,
    prefetch_over,
)


def _samples(n=3, seed=0):
    return datasets.synthetic_normal_dataset(n, seed=seed, operator="lap")


def _tree_eq(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("fmt", ["ell", "dense", "bsr"])
def test_cache_identical_output_and_hits(fmt):
    samples = _samples()
    buckets = Buckets.for_samples(samples, multiple=128 if fmt == "bsr" else 8)
    cache = OperatorCache()
    cold = laplacian_batch(samples, buckets, fmt=fmt, cache=cache)
    warm = laplacian_batch(samples, buckets, fmt=fmt, cache=cache)
    plain = laplacian_batch(samples, buckets, fmt=fmt)
    _tree_eq(cold.operator, plain.operator)
    _tree_eq(warm.operator, plain.operator)
    assert cache.misses == len(samples)
    assert cache.hits == len(samples)
    assert cache.bytes > 0


def test_cache_dirac_and_invalidation():
    samples = datasets.synthetic_normal_dataset(2, seed=1, operator="dirac")
    buckets = Buckets.for_samples(samples)
    cache = OperatorCache()
    b1 = dirac_batch(samples, buckets, cache=cache)
    b2 = dirac_batch(samples, buckets, cache=cache)
    _tree_eq(b1.operator, b2.operator)
    assert cache.hits == len(samples)
    # replacing the owner object invalidates: new V array -> miss, repack
    misses_before = cache.misses
    s = dict(samples[0])
    s.pop("dirac", None)
    s["V"] = np.array(samples[0]["V"])  # fresh object, same values
    dirac_batch([s], buckets, cache=cache)
    assert cache.misses > misses_before


def test_cache_budget_degrades_to_passthrough():
    samples = _samples()
    buckets = Buckets.for_samples(samples)
    cache = OperatorCache(budget_bytes=0)
    laplacian_batch(samples, buckets, fmt="ell", cache=cache)
    laplacian_batch(samples, buckets, fmt="ell", cache=cache)
    assert cache.hits == 0 and cache.bytes == 0  # over budget: never stored


def test_prefetch_order_and_overlap():
    produced = []

    def make(i):
        produced.append(i)
        time.sleep(0.01)
        return i * i

    got = list(prefetch(make, 10, depth=2))
    assert got == [i * i for i in range(10)]
    assert produced == list(range(10))


def test_prefetch_propagates_worker_exception():
    def make(i):
        if i == 3:
            raise ValueError("boom at 3")
        return i

    it = prefetch(make, 10, depth=2)
    got = []
    with pytest.raises(ValueError, match="boom at 3"):
        for x in it:
            got.append(x)
    assert got == [0, 1, 2]


def test_prefetch_early_exit_unblocks_worker():
    started = threading.active_count()

    def make(i):
        return np.zeros(1024)

    for x in prefetch(make, 1000, depth=2):
        break  # consumer bails immediately
    deadline = time.time() + 5.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= started


def test_prefetch_over_uses_sampler():
    class FakeSampler:
        def __init__(self):
            self.n = 0

        def next_batch(self):
            self.n += 1
            return [self.n]

    s = FakeSampler()
    got = list(prefetch_over(s, lambda batch: batch[0] * 10, 4))
    assert got == [10, 20, 30, 40]
    assert s.n == 4


@pytest.mark.parametrize("fmt", ["ell", "dense"])
def test_device_dataset_gather_matches_host_batch(fmt):
    """IndexedBatch.gather of the device-resident dataset equals the host
    batcher's output for the same sample subset (any order)."""
    from surfacenetworks_tpu.data import DeviceDataset, IndexedBatch

    samples = _samples(4, seed=7)
    buckets = Buckets.for_samples(samples)
    ds = DeviceDataset.build(samples, lambda s: laplacian_batch([s], buckets, fmt=fmt))
    pick = [samples[2], samples[0], samples[3]]
    ib = ds.batch(pick)
    gathered = jax.jit(IndexedBatch.gather)(ib.tree, ib.idx)
    host = laplacian_batch(pick, buckets, fmt=fmt)
    np.testing.assert_allclose(np.asarray(gathered["inputs"]), host.inputs, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gathered["targets"]), host.targets, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gathered["mask"]), host.mask)
    _tree_eq(gathered["operator"], host.operator)


def test_device_dataset_budget_fallback():
    from surfacenetworks_tpu.data import DeviceDataset

    samples = _samples(3, seed=8)
    buckets = Buckets.for_samples(samples)
    ds = DeviceDataset.build(
        samples, lambda s: laplacian_batch([s], buckets, fmt="dense"), budget_bytes=10
    )
    assert ds is None  # over budget: callers keep the host path


def test_store_path_matches_host_path(tmp_path):
    """The device-resident fast loop reproduces the host-assembly loop's
    losses (guards the in-jit gather + in-step accumulation against silent
    batch-content drift)."""
    import io
    from contextlib import redirect_stderr

    from surfacenetworks_tpu.cli import train_normal

    common = [
        "--synthetic", "6", "--batch-size", "2", "--layer", "2",
        "--num-epoch", "1", "--num-updates", "5", "--no-test", "--debug",
        "--seed", "13", "--result-dir", str(tmp_path),
    ]

    def run(extra):
        buf = io.StringIO()
        with redirect_stderr(buf):
            train_normal.main(common + extra)
        for line in buf.getvalue().splitlines():
            if "Train 0" in line:
                return float(line.split("loss ")[1].split(",")[0])
        raise AssertionError(buf.getvalue())

    store = run([])
    host = run(["--no-device-store"])
    assert abs(store - host) < 1e-4 * max(abs(host), 1e-6), (store, host)
