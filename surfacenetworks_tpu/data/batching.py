"""Bucketed static-shape batching with masks.

The reference re-pads every batch to the batch max and recompiles CUDA per
shape (normal_predict/sampler.py:125-133, utils/cuda/sparse_bmm.py:29-38).
On TPU recompilation is expensive, so batches are padded to *fixed buckets*
chosen once per dataset: vertex count, face count, ELL slot count and (for
Dirac) max valence are all static.  Zero padding is inert end-to-end: padded
vertices have mask 0, padded operator slots have value 0, and losses are
masked.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import scipy.sparse as sp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu.sparse import dirac_from_coeffs, stack_dirac, stack_operators


def round_up(x: int, multiple: int = 8) -> int:
    return ((x + multiple - 1) // multiple) * multiple


@dataclasses.dataclass
class Buckets:
    """Static shape buckets for a dataset."""

    n_vertices: int
    n_faces: int = 0
    ell_k: int = 16  # Laplacian row slots
    ell_k_t: int = 16  # transpose row slots
    max_valence: int = 16  # Dirac vertex-face incidence slots
    bsr_block: int = 128  # BSR block size (MXU tile)
    bsr_k: int = 8  # BSR blocks per block-row

    @classmethod
    def for_samples(cls, samples, multiple: int = 8) -> "Buckets":
        nv = max(s["V"].shape[0] for s in samples)
        nf = max(s["F"].shape[0] for s in samples)
        return cls(n_vertices=round_up(nv, multiple), n_faces=round_up(nf, multiple))


@dataclasses.dataclass
class MeshBatch:
    """One padded batch. ``operator`` is whatever the model family consumes
    (batched EllOperator, DiracOperator, dense array, or a pair/pyramid)."""

    inputs: np.ndarray  # [B, N, Cin]
    targets: Any  # [B, N, Cout] or labels [B]
    mask: np.ndarray  # [B, N, 1]
    operator: Any
    faces: np.ndarray | None = None  # [B, M, 3] (padded with 0)
    names: list | None = None
    aux: dict | None = None


def pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + a.shape[1:], dtype=np.float32)
    out[: a.shape[0]] = a
    return out


def rcm_reorder_sample(sample: dict) -> dict:
    """Reorder a sample's vertices by reverse-Cuthill-McKee on its Laplacian.

    Makes the operator banded so the BSR/MXU path covers it with few blocks.
    Vertex order is arbitrary in all Surface Networks workloads; faces are
    reindexed, and any per-vertex arrays (input/target/V/label arrays sized
    [n, ...]) are permuted consistently.
    """
    from surfacenetworks_tpu.sparse import rcm_permutation

    perm = rcm_permutation(sample["L"])
    inv = geo.invert_permutation(perm)
    n = sample["V"].shape[0]
    out = dict(sample)
    for key, val in sample.items():
        if key == "F":
            out[key] = inv[val].astype(np.int32)
        elif key == "L":
            out[key] = val.tocsr()[perm][:, perm].tocsr()
        elif key == "G":
            out[key] = val[perm][:, perm]
        elif isinstance(val, np.ndarray) and val.ndim >= 1 and val.shape[0] == n:
            out[key] = val[perm]
    out["rcm_perm"] = perm
    return out


def laplacian_batch(
    samples: list[dict],
    buckets: Buckets,
    input_key: str = "input",
    target_key: str = "target",
    fmt: str = "ell",
) -> MeshBatch:
    """Assemble a Laplacian-operator batch from per-mesh sample dicts.

    Each sample: ``V [n,3]``, ``F [m,3]``, ``L`` scipy sparse, ``input``,
    ``target`` arrays.  Replaces sampler.sample_batch + sparse_diag_cat
    (normal_predict/sampler.py:93-181) with bucketed padding + operator
    stacking.
    """
    B = len(samples)
    N = buckets.n_vertices
    inputs = np.stack([pad_rows(np.asarray(s[input_key], np.float32), N) for s in samples])
    targets = np.stack([pad_rows(np.asarray(s[target_key], np.float32), N) for s in samples])
    mask = np.zeros((B, N, 1), dtype=np.float32)
    for b, s in enumerate(samples):
        mask[b, : s["V"].shape[0]] = 1.0
    if fmt == "ell":
        operator = stack_operators([_fixed_k_operator(s["L"], buckets, N) for s in samples])
    elif fmt == "bsr":
        from surfacenetworks_tpu.sparse import bsr_operator_from_scipy, stack_bsr_operators

        operator = stack_bsr_operators(
            [
                bsr_operator_from_scipy(
                    s["L"],
                    block_size=buckets.bsr_block,
                    k=buckets.bsr_k,
                    n_rows=N,
                    n_cols=N,
                )
                for s in samples
            ]
        )
    elif fmt == "dense":
        dense = np.zeros((B, N, N), dtype=np.float32)
        for b, s in enumerate(samples):
            Ld = np.asarray(s["L"].todense(), dtype=np.float32)
            dense[b, : Ld.shape[0], : Ld.shape[1]] = Ld
        operator = dense
    else:
        raise ValueError(f"unknown operator format {fmt!r}")
    faces = _pad_faces(samples, buckets)
    return MeshBatch(
        inputs=inputs,
        targets=targets,
        mask=mask,
        operator=operator,
        faces=faces,
        names=[s.get("name") for s in samples],
    )


def _fixed_k_operator(L: sp.spmatrix, buckets: Buckets, N: int):
    """ELL operator with dataset-fixed slot counts for both directions."""
    from surfacenetworks_tpu.sparse import EllOperator, ell_from_scipy

    L = L.astype(np.float32)
    fwd = ell_from_scipy(L, k=buckets.ell_k, n_rows=N, n_cols=N)
    bwd = ell_from_scipy(L.T.tocsr(), k=buckets.ell_k_t, n_rows=N, n_cols=N)
    return EllOperator(fwd=fwd, bwd=bwd)


def _pad_faces(samples, buckets):
    if buckets.n_faces <= 0:
        return None
    B = len(samples)
    faces = np.zeros((B, buckets.n_faces, 3), dtype=np.int32)
    for b, s in enumerate(samples):
        faces[b, : s["F"].shape[0]] = s["F"]
    return faces


def dirac_batch(
    samples: list[dict],
    buckets: Buckets,
    input_key: str = "input",
    target_key: str = "target",
) -> MeshBatch:
    """Assemble a structured-Dirac batch (coeffs computed here if absent)."""
    B = len(samples)
    N, M = buckets.n_vertices, buckets.n_faces
    inputs = np.stack([pad_rows(np.asarray(s[input_key], np.float32), N) for s in samples])
    targets = np.stack([pad_rows(np.asarray(s[target_key], np.float32), N) for s in samples])
    mask = np.zeros((B, N, 1), dtype=np.float32)
    for b, s in enumerate(samples):
        mask[b, : s["V"].shape[0]] = 1.0
    ops = []
    for s in samples:
        coeffs = s.get("dirac")
        if coeffs is None:
            coeffs = geo.dirac_coeffs(s["V"], s["F"])
        ops.append(
            dirac_from_coeffs(coeffs, n_vertices=N, n_faces=M, max_valence=buckets.max_valence)
        )
    operator = stack_dirac(ops)
    return MeshBatch(
        inputs=inputs,
        targets=targets,
        mask=mask,
        operator=operator,
        faces=_pad_faces(samples, buckets),
        names=[s.get("name") for s in samples],
    )
