"""Offline preprocessing CLI roundtrips (reference add_laplacian.py /
create_data.py equivalents, multiprocessing Pool): artifacts written by
``cli.preprocess`` load through the trainers' data paths."""

import os
import struct

import numpy as np

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu.cli import preprocess
from surfacenetworks_tpu.data import datasets


def _write_idx(tmpdir, images, labels):
    ip = os.path.join(tmpdir, "imgs-idx3-ubyte")
    lp = os.path.join(tmpdir, "labels-idx1-ubyte")
    n, r, c = images.shape
    with open(ip, "wb") as fh:
        fh.write(struct.pack(">IIII", 2051, n, r, c))
        fh.write(images.astype(np.uint8).tobytes())
    with open(lp, "wb") as fh:
        fh.write(struct.pack(">II", 2049, n))
        fh.write(labels.astype(np.uint8).tobytes())
    return ip, lp


def test_preprocess_mnist_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    images = np.zeros((3, 28, 28), np.uint8)
    for i in range(3):
        images[i, 6:22, 6:22] = rng.integers(120, 255, size=(16, 16))
    labels = np.array([1, 2, 3], np.uint8)
    ip, lp = _write_idx(str(tmp_path), images, labels)
    out = str(tmp_path / "train_plus.np")
    preprocess.main(
        ["mnist", "--images", ip, "--labels", lp, "--out", out, "--workers", "2"]
    )
    data = datasets.load_mnist_mesh_pickle(out)
    assert len(data) >= 1
    s = data[0]
    for key in ("V", "F", "label", "L", "flat_L", "dirac", "flat_dirac", "flat_V"):
        assert key in s, key
    # operator loads as csr and annihilates constants
    r = s["L"] @ np.ones(s["L"].shape[0])
    # f32 cancellation scales with the largest cotan weight
    assert np.max(np.abs(r)) <= 1e-5 * max(np.max(np.abs(s["L"].data)), 1.0)


def test_preprocess_normal_roundtrip(tmp_path, cube_mesh):
    V, F = cube_mesh
    obj_dir = tmp_path / "objs"
    obj_dir.mkdir()
    geo.save_obj(str(obj_dir / "cube.obj"), V, F)
    out = str(tmp_path / "npz")
    preprocess.main(
        ["normal", "--data-path", str(obj_dir), "--out", out, "--workers", "1"]
    )
    files = datasets.scan_mesh_tree(out)
    assert len(files) == 1 and files[0].endswith(".npz")
    got = datasets.load_normal_npz(files[0])
    ref = datasets.load_normal_sample(str(obj_dir / "cube.obj"))
    np.testing.assert_allclose(got["V"], ref["V"])
    np.testing.assert_allclose(got["target"], ref["target"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got["L"].todense()), np.asarray(ref["L"].todense()), atol=1e-5
    )


def test_preprocess_arap_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    V, F = datasets.random_blob_mesh(rng, 40)
    seq_dir = tmp_path / "seqs" / "walk0"
    seq_dir.mkdir(parents=True)
    for i in range(4):
        geo.save_obj(str(seq_dir / f"frame{i:03d}.obj"), V + 0.01 * i, F)
    out = str(tmp_path / "data_plus")
    preprocess.main(
        ["arap", "--data-path", str(tmp_path / "seqs"), "--out", out,
         "--op-frames", "2", "--workers", "1"]
    )
    seq = datasets.load_arap_sequence(os.path.join(out, "walk0.npy"))
    assert len(seq) == 4
    assert "L" in seq[0] and "L" in seq[1]
    assert "L" not in seq[2]
    np.testing.assert_allclose(seq[3]["V"], (V + 0.03).astype(np.float32), atol=1e-5)
