"""Real-data mesh-MNIST pipeline: idx loading + offline mesh dataset pass."""

import gzip
import struct

import numpy as np

from surfacenetworks_tpu.data import datasets


def _write_idx(tmp_path, images, labels, gz=False):
    ip = tmp_path / ("img.idx" + (".gz" if gz else ""))
    lp = tmp_path / ("lbl.idx" + (".gz" if gz else ""))
    opener = gzip.open if gz else open
    with opener(ip, "wb") as fh:
        fh.write(struct.pack(">IIII", 2051, len(images), 28, 28))
        fh.write(np.asarray(images, np.uint8).tobytes())
    with opener(lp, "wb") as fh:
        fh.write(struct.pack(">II", 2049, len(labels)))
        fh.write(np.asarray(labels, np.uint8).tobytes())
    return str(ip), str(lp)


def _fake_digits(n=3, seed=0):
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, 28, 28), np.uint8)
    for i in range(n):
        r0, c0 = rng.integers(4, 10, 2)
        imgs[i, r0 : r0 + 12, c0 : c0 + 12] = 220
    labels = rng.integers(0, 10, n).astype(np.uint8)
    return imgs, labels


def test_idx_roundtrip_plain_and_gz(tmp_path):
    imgs, labels = _fake_digits()
    for gz in (False, True):
        ip, lp = _write_idx(tmp_path, imgs, labels, gz=gz)
        im2, lb2 = datasets.load_mnist_idx(ip, lp)
        np.testing.assert_array_equal(im2, imgs)
        np.testing.assert_array_equal(lb2, labels)


def test_build_mnist_mesh_dataset(tmp_path):
    imgs, labels = _fake_digits(2, seed=1)
    out = datasets.build_mnist_mesh_dataset(imgs, labels, seed=1)
    assert len(out) >= 1
    s = out[0]
    assert {"V", "F", "L", "flat_L", "dirac", "flat_dirac", "flat_V", "label"} <= set(s)
    assert s["V"].shape[0] == s["L"].shape[0]
    # flat mesh has z == 0 and its own operator
    assert np.all(s["flat_V"][:, 2] == 0)


def test_mnist_mesh_dataset_feeds_batcher(tmp_path):
    from surfacenetworks_tpu.data import Buckets, mnist_batch

    imgs, labels = _fake_digits(2, seed=2)
    samples = datasets.build_mnist_mesh_dataset(imgs, labels, seed=2)
    buckets = Buckets.for_samples(samples)
    batch = mnist_batch(samples, buckets)
    assert batch.inputs.shape[0] == len(samples)
