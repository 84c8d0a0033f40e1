"""Offline preprocessing CLI — the reference's multiprocessing operator
passes, unified.

Subcommands (all run a ``multiprocessing.Pool``, like
mesh_mnist/add_laplacian.py:78, create_data.py:102 and
as_rigid_as_possible/add_laplacian.py:74):

* ``mnist``   — MNIST idx files -> Poisson-disc meshes -> cotan L + Dirac
  for the lifted AND flat configurations -> one ``train_plus.np``-style
  object pickle (create_data.py + add_laplacian.py in one pass).  Output
  feeds ``train_mnist --data-path`` and ``train_vae --data-path``.
* ``normal``  — .obj tree -> per-mesh ``.npz`` with vertex normals and the
  igl-style Laplacian (the lazy work of normal_predict/sampler.py:21-91
  done once, offline).  ``train_normal --data-path`` consumes either.
* ``arap``    — directories of per-frame ``.obj`` sequences ->
  ``data_plus/*.npy`` in the reference layout (V, F per frame; L for the
  operator frames), consumed by ``train_arap --data-path``.

Operators are host-side data (SURVEY §2.8 "operator as data"): this is the
one stage that should burn CPUs, not TPU time.
"""

from __future__ import annotations

import argparse
import glob
import multiprocessing
import os

import numpy as np

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu.data import datasets

# -------------------------------------------------------------- mnist


def _mnist_worker(job):
    image, label, seed = job
    from surfacenetworks_tpu.geometry import sampling

    rng = np.random.default_rng(seed)
    sample = sampling.image_to_mesh(np.asarray(image, np.float64), int(label), rng=rng)
    if sample is None:
        return None
    return sampling.add_operators(sample)


def run_mnist(args):
    images, labels = datasets.load_mnist_idx(args.images, args.labels)
    n = len(images) if args.limit is None else min(args.limit, len(images))
    jobs = [(images[i], labels[i], args.seed + i) for i in range(n)]
    with multiprocessing.Pool(args.workers) as pool:
        out = [s for s in pool.map(_mnist_worker, jobs, chunksize=8) if s is not None]
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as fh:  # exact name (np.save would append .npy)
        np.save(fh, np.asarray(out, dtype=object), allow_pickle=True)
    print(f"wrote {len(out)}/{n} samples -> {args.out}")


# -------------------------------------------------------------- normal


def _normal_worker(job):
    obj_path, out_dir, operator, hack, uniform = job
    sample = datasets.load_normal_sample(
        obj_path, operator=operator, hack=hack, uniform_mesh=uniform
    )
    if sample is None:
        return None
    stem = os.path.splitext(os.path.basename(obj_path))[0]
    out = os.path.join(out_dir, stem + ".npz")
    payload = {
        "V": sample["V"],
        "F": sample["F"],
        "target": sample["target"],
    }
    if "L" in sample:
        L = sample["L"].tocsr()
        payload.update(L_data=L.data, L_indices=L.indices, L_indptr=L.indptr,
                       L_shape=np.asarray(L.shape))
    else:
        payload["dirac"] = np.asarray(sample["dirac"], dtype=object)
    np.savez(out, **payload)
    return out


def run_normal(args):
    names = datasets.scan_obj_tree(args.data_path)
    os.makedirs(args.out, exist_ok=True)
    jobs = [(p, args.out, args.operator, args.hack, args.uniform_mesh) for p in names]
    with multiprocessing.Pool(args.workers) as pool:
        written = [p for p in pool.map(_normal_worker, jobs, chunksize=4) if p]
    print(f"wrote {len(written)}/{len(names)} meshes -> {args.out}")


# -------------------------------------------------------------- arap


def _arap_worker(job):
    seq_dir, out_dir, op_frames = job
    frame_paths = sorted(glob.glob(os.path.join(seq_dir, "*.obj")))
    if not frame_paths:
        return None
    frames = []
    for i, p in enumerate(frame_paths):
        V, F = geo.load_obj(p)
        frame = {"V": V.astype(np.float32), "F": F.astype(np.int32)}
        if i < op_frames:
            frame["L"] = geo.igl_style_laplacian(V, F, hack=1.0).astype(np.float32)
        frames.append(frame)
    out = os.path.join(out_dir, os.path.basename(os.path.normpath(seq_dir)) + ".npy")
    np.save(out, np.asarray(frames, dtype=object), allow_pickle=True)
    return out


def run_arap(args):
    seq_dirs = sorted(
        d for d in glob.glob(os.path.join(args.data_path, "*")) if os.path.isdir(d)
    )
    os.makedirs(args.out, exist_ok=True)
    jobs = [(d, args.out, args.op_frames) for d in seq_dirs]
    with multiprocessing.Pool(args.workers) as pool:
        written = [p for p in pool.map(_arap_worker, jobs) if p]
    print(f"wrote {len(written)}/{len(seq_dirs)} sequences -> {args.out}")


# -------------------------------------------------------------- cli


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Offline operator preprocessing")
    sub = parser.add_subparsers(dest="task", required=True)

    m = sub.add_parser("mnist", help="MNIST idx -> mesh dataset pickle")
    m.add_argument("--images", required=True)
    m.add_argument("--labels", required=True)
    m.add_argument("--out", default="train_plus.np")
    m.add_argument("--limit", type=int, default=None)
    m.add_argument("--seed", type=int, default=0)
    m.add_argument("--workers", type=int, default=os.cpu_count())
    m.set_defaults(fn=run_mnist)

    n = sub.add_parser("normal", help=".obj tree -> per-mesh .npz with operators")
    n.add_argument("--data-path", required=True)
    n.add_argument("--out", required=True)
    n.add_argument("--operator", default="lap", choices=["lap", "dirac"])
    n.add_argument("--hack", type=float, default=1.0)
    n.add_argument("--uniform-mesh", action="store_true")
    n.add_argument("--workers", type=int, default=os.cpu_count())
    n.set_defaults(fn=run_normal)

    a = sub.add_parser("arap", help="frame-.obj sequence dirs -> data_plus .npy")
    a.add_argument("--data-path", required=True)
    a.add_argument("--out", required=True)
    a.add_argument("--op-frames", type=int, default=10,
                   help="frames per sequence that get operators (reference: 10)")
    a.add_argument("--workers", type=int, default=os.cpu_count())
    a.set_defaults(fn=run_arap)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
