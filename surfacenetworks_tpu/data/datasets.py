"""Dataset pipelines: reference-format loaders + synthetic generators.

The reference trains from downloaded artifacts (obj trees for normal
prediction, ``data_plus/*.npy`` ARAP sequences, ``train_FAUST_npz`` archives,
``mesh_mnist/data/*.np`` pickles).  Loaders here accept those same formats so
reference users can bring their data unchanged; the synthetic generators
produce statistically similar workloads from nothing (this environment has
zero egress), used by tests and benchmarks.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import scipy.sparse as sp
from scipy.spatial import ConvexHull, Delaunay

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import native


# ---------------------------------------------------------------------------
# synthetic meshes
# ---------------------------------------------------------------------------


def random_blob_mesh(rng: np.random.Generator, n_points: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """Random smooth star-shaped closed mesh.

    Points are sampled on the unit sphere, triangulated by their convex hull
    (combinatorially valid for any radial displacement), then displaced by a
    random low-order smooth radial field.
    """
    pts = rng.normal(size=(n_points, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    hull = ConvexHull(pts)
    F = hull.simplices.astype(np.int32)
    # orient all faces outward (hull simplices have arbitrary orientation)
    c = pts[F].mean(axis=1)
    n = np.cross(pts[F[:, 1]] - pts[F[:, 0]], pts[F[:, 2]] - pts[F[:, 0]])
    flip = (n * c).sum(axis=1) < 0
    F[flip] = F[flip][:, [0, 2, 1]]

    a = rng.uniform(-0.25, 0.25, size=6)
    x, y, z = pts.T
    r = 1.0 + a[0] * np.sin(2 * x) + a[1] * np.cos(2 * y) + a[2] * np.sin(2 * z) + a[
        3
    ] * np.sin(3 * x * y) + a[4] * np.cos(3 * y * z) + a[5] * np.sin(3 * z * x)
    V = pts * r[:, None]
    return V, F


def height_field_mesh(
    rng: np.random.Generator, n_points: int = 150, n_blobs: int = 3
) -> tuple[np.ndarray, np.ndarray, int]:
    """Random triangulated height field (mesh-MNIST-like lifted mesh).

    Returns (V, F, label) where the label is the blob count — a synthetic
    stand-in for the digit class when MNIST is unavailable.
    """
    pts = rng.uniform(0, 1, size=(n_points, 2))
    tri = Delaunay(pts)
    z = np.zeros(n_points)
    # well-separated, resolvable peaks so the blob COUNT is geometrically
    # well-defined: sigma >= 0.08 (a peak covers >= ~15 of 200 sample
    # points) and centers at least 0.28 apart (no peak merging)
    centers: list = []
    for _ in range(n_blobs):
        for _try in range(50):
            c = rng.uniform(0.15, 0.85, size=2)
            if all(np.linalg.norm(c - o) > 0.28 for o in centers):
                break
        centers.append(c)
        s = rng.uniform(0.08, 0.13)
        z += rng.uniform(0.5, 1.0) * np.exp(
            -((pts[:, 0] - c[0]) ** 2 + (pts[:, 1] - c[1]) ** 2) / (2 * s**2)
        )
    V = np.concatenate([pts, z[:, None] / max(z.max(), 1e-6)], axis=1)
    return V, np.asarray(tri.simplices, dtype=np.int32), n_blobs


# ---------------------------------------------------------------------------
# per-task synthetic datasets (lists of sample dicts, batching-ready)
# ---------------------------------------------------------------------------


def synthetic_normal_dataset(
    num: int, n_points: int = 150, seed: int = 0, operator: str = "lap", hack: float = 1.0
) -> list[dict]:
    """normal_predict-style samples: input = V, target = vertex normals.

    ``operator='lap'`` attaches the igl-convention hacked Laplacian exactly as
    the reference sampler does on the fly (sampler.py:52-78); ``'dirac'``
    attaches structured Dirac coefficients.
    """
    rng = np.random.default_rng(seed)
    out = []
    for i in range(num):
        V, F = random_blob_mesh(rng, n_points)
        sample = {
            "V": V.astype(np.float32),
            "F": F,
            "input": V.astype(np.float32),
            "target": geo.vertex_normals(V, F).astype(np.float32),
            "name": f"synthetic_{i}",
        }
        if operator == "lap":
            sample["L"] = geo.igl_style_laplacian(V, F, hack=hack)
        else:
            sample["dirac"] = native.dirac_coeffs(V, F)
        out.append(sample)
    return out


def synthetic_mnist_dataset(
    num: int, seed: int = 0, n_points: int = 120, n_classes: int = 10
) -> list[dict]:
    """mesh-MNIST-style samples with both lifted and flat operators
    (mesh_mnist/add_laplacian.py pipeline: L = A^{-1}(D - W) cotan, plus
    Dirac, for the lifted mesh and its z=0 flattening).

    ``n_classes < 10`` makes the blob-count labels geometrically
    distinguishable (label k -> k+1 blobs; at the default 10 classes labels
    0 and 1 share one blob, capping achievable accuracy) — convergence
    evidence runs use the 3-class variant."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(num):
        label = int(rng.integers(0, n_classes))
        n_blobs = label + 1 if n_classes < 10 else max(label, 1)
        V, F, _ = height_field_mesh(rng, n_points, n_blobs=n_blobs)
        V = V.astype(np.float32)
        flat_V = V.copy()
        flat_V[:, 2] = 0
        sample = {
            "V": V,
            "F": F,
            "label": label,
            "L": geo.mesh_laplacian(V, F).astype(np.float32),
            "flat_L": geo.mesh_laplacian(flat_V, F).astype(np.float32),
            "dirac": native.dirac_coeffs(V, F),
            "flat_dirac": native.dirac_coeffs(flat_V, F),
            "flat_V": flat_V,
            "name": f"mnistlike_{i}",
        }
        out.append(sample)
    return out


def synthetic_arap_sequences(
    num_seq: int, n_frames: int = 50, n_points: int = 120, seed: int = 0
) -> list[list[dict]]:
    """ARAP-style temporal sequences: a blob mesh deformed by a smooth
    travelling wave; per-frame V, operators on the first 10 frames
    (as_rigid_as_possible/add_laplacian.py:39-75)."""
    rng = np.random.default_rng(seed)
    sequences = []
    for s in range(num_seq):
        V0, F = random_blob_mesh(rng, n_points)
        omega = rng.uniform(0.15, 0.4)
        phase = rng.uniform(0, 2 * np.pi, size=V0.shape[0])
        dirvec = rng.normal(size=3)
        dirvec /= np.linalg.norm(dirvec)
        frames = []
        for t in range(n_frames):
            amp = 0.15 * np.sin(omega * t + phase)
            V = V0 * (1.0 + amp[:, None]) + 0.05 * np.sin(omega * t) * dirvec
            frame = {"V": V.astype(np.float32), "F": F}
            if t < 10:
                frame["L"] = geo.mesh_laplacian(V, F).astype(np.float32)
                frame["dirac"] = native.dirac_coeffs(V, F)
            frames.append(frame)
        sequences.append(frames)
    return sequences


def synthetic_correspondence_dataset(num: int, n_points: int = 200, seed: int = 0) -> list[dict]:
    """FAUST-style samples: deformations of one base shape with known
    correspondence labels and a geodesic-proxy distance matrix."""
    rng = np.random.default_rng(seed)
    base_V, F = random_blob_mesh(rng, n_points)
    n = base_V.shape[0]
    # geodesic proxy: euclidean distances on the base shape (row-chunked —
    # the [n, n, 3] difference intermediate would be 30 GB at 50k vertices)
    Vf = base_V.astype(np.float32)
    G = np.empty((n, n), np.float32)
    chunk = max(1, (256 << 20) // max(n * 12, 1))
    for i0 in range(0, n, chunk):
        d = Vf[i0 : i0 + chunk, None, :] - Vf[None, :, :]
        G[i0 : i0 + chunk] = np.sqrt((d * d).sum(-1))
    out = []
    for i in range(num):
        a = rng.uniform(-0.2, 0.2, size=3)
        V = base_V * (1.0 + a[None, :] * np.sin(2 * base_V))
        perm = rng.permutation(n)
        inv = geo.invert_permutation(perm)
        Vp = V[perm].astype(np.float32)  # scan vertex i <-> template id perm[i]
        Fp = inv[F].astype(np.int32)
        out.append(
            {
                "V": Vp,
                "F": Fp,
                "input": Vp,
                "L": geo.igl_style_laplacian(Vp, Fp, hack=1.0),
                "label": perm.astype(np.int64),  # scan vertex -> template id
                "label_inv": inv.astype(np.int64),  # template id -> scan vertex
                "G": G[perm][:, perm],
                "name": f"faustlike_{i}",
            }
        )
    return out


# ---------------------------------------------------------------------------
# reference-format loaders
# ---------------------------------------------------------------------------


def load_normal_sample(
    obj_path: str,
    operator: str = "lap",
    hack: float = 1.0,
    uniform_mesh: bool = False,
) -> dict | None:
    """Load one .obj/.ply as a normal-prediction sample (sampler.read_npz
    parity: target = vertex normals; operator computed on the fly; NaN or
    empty meshes rejected by returning None)."""
    loader = geo.load_ply if obj_path.lower().endswith(".ply") else geo.load_obj
    V, F = loader(obj_path)
    if V.size == 0 or F.size == 0:
        return None
    target = geo.vertex_normals(V, F)
    if not np.isfinite(target).all():
        return None
    if uniform_mesh:
        V = geo.uniform_mesh_scale(V)
    sample = {
        "V": V.astype(np.float32),
        "F": F.astype(np.int32),
        "input": V.astype(np.float32),
        "target": target.astype(np.float32),
        "name": obj_path,
    }
    if operator == "lap":
        L = geo.igl_style_laplacian(V, F, hack=hack)
        if not np.isfinite(L.data).all():
            return None
        sample["L"] = L
    else:
        sample["dirac"] = native.dirac_coeffs(V, F)
    return sample


def scan_obj_tree(data_path: str) -> list[str]:
    """Recursive .obj listing (train_4_normal.py:175)."""
    return sorted(glob.glob(os.path.join(data_path, "**/*.obj"), recursive=True))


def load_faust_npz(path: str) -> dict:
    """Load a FAUST .npz in the reference layout (dense_correspondence
    main.py:65-104): V, F, L/D/DA scipy objects, label, label_inv, dist_mat."""
    with np.load(path, allow_pickle=True) as seq:
        out = {
            "V": seq["V"].astype(np.float32),
            "F": seq["F"].astype(np.int32),
            "label": seq["label"].astype(np.int64),
            "label_inv": seq["label_inv"].astype(np.int64),
            "G": seq["dist_mat"].astype(np.float32),
            "name": path,
        }
        if "L" in seq:
            out["L"] = seq["L"].item().astype(np.float32).tocsr()
        out["input"] = out["V"]
    return out


def load_mnist_idx(images_path: str, labels_path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read MNIST in the standard idx format (optionally .gz).

    The reference pulls MNIST through ``torchvision.datasets`` in
    mesh_mnist/create_data.py; this loader reads the raw idx files directly
    (no torchvision dependency).  Returns (images [N, 28, 28] uint8,
    labels [N] int64).
    """
    import gzip
    import struct

    def _open(p):
        return gzip.open(p, "rb") if p.endswith(".gz") else open(p, "rb")

    with _open(images_path) as fh:
        magic, n, rows, cols = struct.unpack(">IIII", fh.read(16))
        if magic != 2051:
            raise ValueError(f"bad idx image magic {magic} in {images_path}")
        images = np.frombuffer(fh.read(n * rows * cols), np.uint8).reshape(n, rows, cols)
    with _open(labels_path) as fh:
        magic, n2 = struct.unpack(">II", fh.read(8))
        if magic != 2049:
            raise ValueError(f"bad idx label magic {magic} in {labels_path}")
        labels = np.frombuffer(fh.read(n2), np.uint8).astype(np.int64)
    if n != n2:
        raise ValueError(f"image/label count mismatch: {n} vs {n2}")
    return images, labels


def build_mnist_mesh_dataset(
    images: np.ndarray,
    labels: np.ndarray,
    limit: int | None = None,
    with_operators: bool = True,
    seed: int = 0,
) -> list[dict]:
    """Offline mesh-MNIST dataset pass: images -> meshes -> operators.

    The combination of the reference's create_data.py (Poisson-disc sample +
    Delaunay + rejection) and add_laplacian.py (normalize + cotan L + Dirac
    for the lifted and flat meshes); rejected images are skipped like the
    reference's `continue` (create_data.py:92-101).
    """
    from surfacenetworks_tpu.geometry import sampling

    rng = np.random.default_rng(seed)
    out = []
    n = len(images) if limit is None else min(limit, len(images))
    for i in range(n):
        sample = sampling.image_to_mesh(np.asarray(images[i], np.float64), int(labels[i]), rng=rng)
        if sample is None:
            continue
        out.append(sampling.add_operators(sample) if with_operators else sample)
    return out


def load_arap_sequence(path: str) -> list[dict]:
    """Load one ARAP .npy sequence in the reference layout
    (as_rigid_as_possible/main.py:58-76)."""
    seq = np.load(path, encoding="latin1", allow_pickle=True)
    frames = []
    for frame in seq:
        f = {"V": np.asarray(frame["V"], np.float32), "F": np.asarray(frame["F"], np.int32)}
        if "L" in frame and frame["L"] is not None:
            f["L"] = frame["L"].astype(np.float32)
        frames.append(f)
    return frames


def scan_mesh_tree(data_path: str) -> list[str]:
    """Recursive mesh listing: preprocessed ``.npz`` (cli.preprocess normal)
    take precedence over raw ``.obj`` (lazy-operator path)."""
    npz = sorted(glob.glob(os.path.join(data_path, "**/*.npz"), recursive=True))
    return npz if npz else scan_obj_tree(data_path)


def load_normal_npz(path: str) -> dict:
    """Load one preprocessed normal-prediction sample written by
    ``cli.preprocess normal`` (operators already assembled offline)."""
    import scipy.sparse as sp

    with np.load(path, allow_pickle=True) as z:
        V = z["V"].astype(np.float32)
        sample = {
            "V": V,
            "F": z["F"].astype(np.int32),
            "input": V,
            "target": z["target"].astype(np.float32),
            "name": path,
        }
        if "L_data" in z:
            sample["L"] = sp.csr_matrix(
                (z["L_data"], z["L_indices"], z["L_indptr"]), shape=tuple(z["L_shape"])
            )
        else:
            sample["dirac"] = z["dirac"].item()
    return sample


def load_mnist_mesh_pickle(path: str) -> list[dict]:
    """Load a ``train_plus.np``-style object pickle (reference
    mesh_mnist/add_laplacian.py output or ``cli.preprocess mnist``): dicts
    with V, F, label, lifted + flat operators."""
    raw = np.load(open(path, "rb"), allow_pickle=True, encoding="latin1")
    out = []
    for s in raw:
        d = dict(s)
        d["V"] = np.asarray(d["V"], np.float32)
        d["F"] = np.asarray(d["F"], np.int32)
        d["label"] = int(d["label"])
        for key in ("L", "flat_L"):
            if key in d and d[key] is not None:
                d[key] = d[key].tocsr()
        if "flat_V" not in d:
            flat = d["V"].copy()
            flat[:, 2] = 0
            d["flat_V"] = flat
        out.append(d)
    return out
