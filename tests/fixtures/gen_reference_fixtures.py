"""Generate tiny reference-format dataset fixtures (committed to the repo).

Each artifact is synthetically generated but BYTE-FORMAT-IDENTICAL to the
upstream tooling's outputs, so the loaders in ``data/datasets.py`` are proven
under real training (tests/test_reference_format_e2e.py), not just unit
tests:

* ``faust/*.npz``       — dense_correspondence/main.py:65-104 layout
                          (V, F, label, label_inv, dist_mat, pickled scipy L)
* ``objs/**/*.obj``     — normal_predict obj tree (train_4_normal.py:175)
* ``arap/*.npy``        — as_rigid_as_possible/main.py:58-76 sequence pickles
* ``mnist_plus.np``     — mesh_mnist/add_laplacian.py train_plus.np pickle

Regenerate with:  python tests/fixtures/gen_reference_fixtures.py
"""

import os

import numpy as np
import scipy.sparse as sp
from scipy.spatial.distance import cdist

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu.data import datasets

HERE = os.path.dirname(os.path.abspath(__file__))


def gen_faust(n_scans=3, n_points=80, seed=11):
    d = os.path.join(HERE, "faust")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_scans):
        V, F = datasets.random_blob_mesh(rng, n_points)
        L = geo.igl_style_laplacian(V, F, hack=1.0).tocsc().astype(np.float64)
        n = V.shape[0]
        perm = rng.permutation(n)
        label_inv = np.argsort(perm)
        # geodesic stand-in: euclidean distances (same dtype/shape contract)
        G = cdist(V, V).astype(np.float64)
        np.savez(
            os.path.join(d, f"tr_scan_{i:03d}.npz"),
            V=V.astype(np.float64), F=F.astype(np.int64),
            label=perm.astype(np.int64), label_inv=label_inv.astype(np.int64),
            dist_mat=G, L=np.array(L, dtype=object),
        )


def gen_objs(n=10, n_points=70, seed=13):
    rng = np.random.default_rng(seed)
    for i in range(n):
        sub = os.path.join(HERE, "objs", f"cat{i % 2}")
        os.makedirs(sub, exist_ok=True)
        V, F = datasets.random_blob_mesh(rng, n_points)
        geo.save_obj(os.path.join(sub, f"mesh_{i:02d}.obj"), V, F)


def gen_arap(n_seq=2, n_frames=44, n_points=60, seed=17):
    d = os.path.join(HERE, "arap")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for s in range(n_seq):
        V, F = datasets.random_blob_mesh(rng, n_points)
        frames = []
        for t in range(n_frames):
            Vt = V * (1.0 + 0.03 * t) + 0.02 * rng.normal(size=V.shape)
            frames.append({
                "V": Vt.astype(np.float64), "F": F.astype(np.int64),
                "L": sp.coo_matrix(
                    geo.igl_style_laplacian(Vt, F, hack=1.0)
                ).astype(np.float64),
            })
        np.save(os.path.join(d, f"seq_{s:02d}.npy"),
                np.array(frames, dtype=object), allow_pickle=True)


def gen_mnist(n=8, seed=19):
    samples = datasets.synthetic_mnist_dataset(n, seed=seed, n_classes=3)
    out = []
    for s in samples:
        d = {
            "V": s["V"].astype(np.float64),
            "F": s["F"].astype(np.int64),
            "label": int(s["label"]),
            "L": sp.coo_matrix(s["L"]).astype(np.float64),
        }
        if "flat_L" in s:
            d["flat_L"] = sp.coo_matrix(s["flat_L"]).astype(np.float64)
        if "flat_V" in s:
            d["flat_V"] = s["flat_V"].astype(np.float64)
        out.append(d)
    with open(os.path.join(HERE, "mnist_plus.np"), "wb") as f:
        np.save(f, np.array(out, dtype=object), allow_pickle=True)


if __name__ == "__main__":
    gen_faust()
    gen_objs()
    gen_arap()
    gen_mnist()
    print("fixtures written under", HERE)
