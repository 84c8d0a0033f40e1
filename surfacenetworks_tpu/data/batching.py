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
from surfacenetworks_tpu import native
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
    # Packed-valence Dirac tables (sparse/ell.py dirac_from_coeffs): base
    # slot count ~p95 valence; the few higher-valence vertices overflow into
    # a dirac_overflow-row side table.  0 = packing disabled.
    dirac_base_valence: int = 0
    dirac_overflow: int = 0

    @classmethod
    def for_samples(cls, samples, multiple: int = 8) -> "Buckets":
        nv = max(s["V"].shape[0] for s in samples)
        nf = max(s["F"].shape[0] for s in samples)
        base, ov = _dirac_packing(samples)
        return cls(
            n_vertices=round_up(nv, multiple),
            n_faces=round_up(nf, multiple),
            dirac_base_valence=base,
            dirac_overflow=ov,
        )

    def dirac_kwargs(self) -> dict:
        """kwargs for ``dirac_from_coeffs`` implementing this bucket's
        packing policy."""
        if not self.dirac_base_valence or self.dirac_base_valence >= self.max_valence:
            return {}
        return {
            "base_valence": self.dirac_base_valence,
            "n_overflow": self.dirac_overflow,
        }


@dataclasses.dataclass
class BucketSet:
    """Two or three size tiers over a heterogeneous dataset.

    The reference re-pads every batch to its own max (normal_predict/
    sampler.py:125-133); a single static bucket at the dataset max (the
    round-1/2 design) trades that flexibility for one XLA compilation but
    pays max padding on EVERY step.  A small tier set recovers most of the
    padding waste at the cost of one compilation per tier: each batch is
    padded to the smallest tier that fits it.  All tiers share the dataset's
    ELL widths / Dirac packing so operator tables differ only in row count.
    """

    tiers: list[Buckets]  # ascending n_vertices

    @classmethod
    def for_samples(cls, samples, n_tiers: int = 3, multiple: int = 8) -> "BucketSet":
        base = Buckets.for_samples(samples, multiple=multiple)
        if n_tiers <= 1 or len(samples) < 2:
            return cls(tiers=[base])
        nv = np.asarray([s["V"].shape[0] for s in samples])
        nf = np.asarray([s["F"].shape[0] for s in samples])
        order = np.argsort(nv, kind="stable")
        tiers = []
        seen = set()
        for i in range(n_tiers):
            # cut by RANK and size the tier to its segment's maxima, so no
            # sample lands just above a percentile-value boundary
            cut = int(np.ceil(len(samples) * (i + 1) / n_tiers)) - 1
            idx = order[: cut + 1]
            t_nv = round_up(int(nv[idx].max()), multiple)
            t_nf = round_up(int(nf[idx].max()), multiple)
            key = (t_nv, t_nf)
            if key in seen:
                continue
            seen.add(key)
            tiers.append(dataclasses.replace(base, n_vertices=t_nv, n_faces=t_nf))
        tiers.sort(key=lambda b: (b.n_vertices, b.n_faces))
        # top tier must cover the dataset max (bucket rounding included)
        tiers[-1] = dataclasses.replace(
            base, n_vertices=max(tiers[-1].n_vertices, base.n_vertices),
            n_faces=max(tiers[-1].n_faces, base.n_faces),
        )
        return cls(tiers=tiers)

    def select(self, samples) -> Buckets:
        """Smallest tier that fits every sample in the batch."""
        nv = max(s["V"].shape[0] for s in samples)
        nf = max(s["F"].shape[0] for s in samples)
        for t in self.tiers:
            if t.n_vertices >= nv and t.n_faces >= nf:
                return t
        return self.tiers[-1]

    def tier_index(self, samples) -> int:
        return self.tiers.index(self.select(samples))


def padded_vertex_fraction(samples, pick) -> float:
    """Fraction of padded (wasted) vertex rows over per-sample batches when
    each sample pads to ``pick(sample) -> Buckets`` (diagnostics/tests)."""
    total = padded = 0
    for s in samples:
        n = s["V"].shape[0]
        N = pick(s).n_vertices
        total += N
        padded += N - n
    return padded / max(total, 1)


def _dirac_packing(samples) -> tuple[int, int]:
    """Choose (base_valence, n_overflow) from the dataset's vertex-valence
    distribution: base = p95 (>= 4, even), overflow rows = max per-sample
    count of vertices above base (the fv gather cost scales with the base
    slot count — see sparse/ell.py DiracOperator)."""
    valences = []
    for s in samples:
        F = np.asarray(s["F"])
        if F.size == 0:
            continue
        val = np.bincount(F.reshape(-1), minlength=int(F.max()) + 1)
        valences.append(val)
    if not valences:
        return 0, 0
    allv = np.concatenate(valences)
    base = int(np.percentile(allv[allv > 0], 95))
    base = max(4, base + (base % 2))  # even, >= 4
    over = max(int((v > base).sum()) for v in valences)
    if over == 0:
        # packing still pays off whenever base < max valence: the table
        # shrinks with an empty (8-row) overflow
        return base, 8
    return base, round_up(over, 8)


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


def _rcm_perm_of(sample: dict) -> np.ndarray:
    """RCM permutation from a sample's Laplacian, or from the face-edge
    adjacency graph for Dirac-only samples."""
    from surfacenetworks_tpu.sparse import rcm_permutation

    if "L" in sample:
        return rcm_permutation(sample["L"])
    F = np.asarray(sample["F"])
    n_ = sample["V"].shape[0]
    r = np.concatenate([F[:, 0], F[:, 1], F[:, 2], F[:, 1], F[:, 2], F[:, 0]])
    c = np.concatenate([F[:, 1], F[:, 2], F[:, 0], F[:, 0], F[:, 1], F[:, 2]])
    A = sp.coo_matrix((np.ones_like(r, np.float32), (r, c)), shape=(n_, n_)).tocsr()
    return rcm_permutation(A)


def rcm_reorder_sequence(seq: list[dict]) -> list[dict]:
    """RCM-reorder an ARAP frame sequence with ONE permutation (from the
    first operator frame) applied to every frame's V/L/F, so the banded
    structure is shared and per-frame partitioned operators align."""
    perm = _rcm_perm_of(seq[0])
    inv = geo.invert_permutation(perm)
    out = []
    for f in seq:
        g = dict(f)
        g["V"] = np.asarray(f["V"])[perm]
        if "F" in f:
            g["F"] = inv[np.asarray(f["F"])].astype(np.int32)
        if "L" in f:
            g["L"] = f["L"].tocsr()[perm][:, perm].tocsr()
        g.pop("dirac", None)  # stale: coeffs bake in vertex/face order
        out.append(g)
    return out


def rcm_reorder_sample(sample: dict) -> dict:
    """Reorder a sample's vertices by reverse-Cuthill-McKee on its Laplacian.

    Makes the operator banded so the BSR/MXU path covers it with few blocks.
    Vertex order is arbitrary in all Surface Networks workloads; faces are
    reindexed, and any per-vertex arrays (input/target/V/label arrays sized
    [n, ...]) are permuted consistently.
    """
    perm = _rcm_perm_of(sample)
    inv = geo.invert_permutation(perm)
    n = sample["V"].shape[0]
    out = dict(sample)
    for key, val in sample.items():
        if key == "F":
            out[key] = inv[val].astype(np.int32)
        elif sp.issparse(val) and val.shape == (n, n):
            # L, flat_L, and any other per-vertex square operator
            out[key] = val.tocsr()[perm][:, perm].tocsr()
        elif key in ("dirac", "flat_dirac"):
            out[key] = None  # coeffs bake in vertex order; caller recomputes
        elif key == "G":
            out[key] = val[perm][:, perm]
        elif key == "label_inv":
            # values are scan-vertex indices (template id -> scan vertex,
            # dense_correspondence/main.py:97-104): remap, don't gather
            out[key] = inv[val]
        elif isinstance(val, np.ndarray) and val.ndim >= 1 and val.shape[0] == n:
            out[key] = val[perm]
    out["rcm_perm"] = perm
    return out


def choose_operator_format(
    batch_size: int, n_vertices: int, rcm_ok: bool = False
) -> str:
    """Pick the fastest operator representation for a bucket shape.

    Measured on TPU v5e (LapDeepModel-15 train step, B=4, N=1008): the dense
    [B, N, N] MXU path is ~11x faster than the ELL gather path — TPUs are
    dense-matmul machines and mesh buckets up to a couple thousand vertices
    cost less as dense operators than as gathers.  Dense is chosen whenever
    the batched operator fits a modest memory budget.

    Above the dense window, ``rcm_ok=True`` (the caller can RCM-reorder its
    samples and size buckets to 128 multiples — every trainer can) selects
    the BSR/MXU block-sparse path: at FAUST scale it measures ~14x faster
    than the ELL gather fallback (20 vs 278 us/apply, BENCH r03).  Callers
    that cannot reorder fall back to ELL, which handles any operator.
    """
    dense_bytes = batch_size * n_vertices * n_vertices * 4
    if n_vertices <= 2048 and dense_bytes <= 128 * 1024 * 1024:
        return "dense"
    if rcm_ok:
        return "bsr"
    return "ell"


def bsr_k_needed(L, block: int = 128) -> int:
    """Max distinct column blocks touched by any aligned ``block``-row band
    of ``L`` — the minimum BSR slot count that packs it."""
    coo = L.tocoo()
    if coo.nnz == 0:
        return 1
    br = (coo.row // block).astype(np.int64)
    bc = (coo.col // block).astype(np.int64)
    pairs = np.unique(br * (1 << 32) + bc)
    counts = np.bincount((pairs >> 32).astype(np.int64))
    return int(counts.max())


def fit_bsr_k(samples_or_Ls, bucketset_or_buckets) -> int:
    """Size ``bsr_k`` EXACTLY to the dataset (mutates the bucket(s), returns
    the fitted k).  The static default of 8 blocks/block-row only serves
    callers that never fit; fitted runs take the dataset's true maximum in
    BOTH directions — the BSR apply's MXU work is linear in k, and the
    round-5 audit found the old ``max(default, k)`` clamp silently padding
    k=5 FAUST-scale datasets to 8 slots: +60% device time on every
    operator apply in the flagship train step."""
    Ls = [s["L"] if isinstance(s, dict) else s for s in samples_or_Ls]
    tiers = getattr(bucketset_or_buckets, "tiers", [bucketset_or_buckets])
    block = tiers[0].bsr_block
    k = max(
        (max(bsr_k_needed(L, block), bsr_k_needed(L.T.tocsr(), block)) for L in Ls),
        default=1,
    )
    k = max(k, 1)
    for t in tiers:
        t.bsr_k = k
    return k


def _bsr_sample_operator(L, buckets: Buckets, N: int, op_dtype=None, cache=None):
    """Per-sample BSR operator, packed once per (L, shape, dtype) when a
    pipeline.OperatorCache is supplied."""
    from surfacenetworks_tpu.sparse import bsr_operator_from_scipy

    def build():
        return bsr_operator_from_scipy(
            L, block_size=buckets.bsr_block, k=buckets.bsr_k, n_rows=N, n_cols=N,
            **({"dtype": op_dtype} if op_dtype is not None else {}),
        )

    if cache is None:
        return build()
    key = ("bsr", N, buckets.bsr_block, buckets.bsr_k, str(op_dtype))
    return cache.get((L,), key, build)


def _dense_sample_operator(L, N: int, cache=None) -> np.ndarray:
    """Per-sample zero-padded dense [N, N] operator (cached: the todense +
    pad is the dominant host cost of the dense format)."""

    def build():
        out = np.zeros((N, N), dtype=np.float32)
        Ld = np.asarray(L.todense(), dtype=np.float32)
        out[: Ld.shape[0], : Ld.shape[1]] = Ld
        return out

    if cache is None:
        return build()
    return cache.get((L,), ("dense", N), build)


def _dirac_sample_operator(
    s: dict, buckets: Buckets, N: int, M: int, key: str = "dirac", cache=None
):
    """Per-sample packed Dirac tables; caches the coefficient computation
    AND the table packing.  Owners: the coeff object when precomputed, the
    (V, F) arrays otherwise."""

    def build():
        return dirac_from_coeffs(
            _dirac_coeffs_of(s, key), n_vertices=N, n_faces=M,
            max_valence=buckets.max_valence, **buckets.dirac_kwargs(),
        )

    if cache is None:
        return build()
    coeffs = s.get(key)
    owners = (coeffs,) if coeffs is not None else (s["V"], s["F"])
    ck = (key, N, M, buckets.max_valence, buckets.dirac_base_valence, buckets.dirac_overflow)
    return cache.get(owners, ck, build)


def laplacian_batch(
    samples: list[dict],
    buckets: Buckets,
    input_key: str = "input",
    target_key: str = "target",
    fmt: str = "ell",
    operator=None,
    op_dtype=None,
    cache=None,
) -> MeshBatch:
    """Assemble a Laplacian-operator batch from per-mesh sample dicts.

    Each sample: ``V [n,3]``, ``F [m,3]``, ``L`` scipy sparse, ``input``,
    ``target`` arrays.  Replaces sampler.sample_batch + sparse_diag_cat
    (normal_predict/sampler.py:93-181) with bucketed padding + operator
    stacking.  ``fmt='auto'`` selects per :func:`choose_operator_format`.
    ``operator`` short-circuits packing with a caller-built operator (e.g. a
    graph-parallel PartitionedOperator).  ``op_dtype`` (BSR only) stores the
    packed blocks at a narrower dtype — ``jnp.bfloat16`` halves the apply's
    dominant HBM stream at numerics identical to the MXU's default
    fp32-input rounding.  ``cache`` (a pipeline.OperatorCache) packs each
    sample's operator once and reuses it across epochs.
    """
    B = len(samples)
    N = buckets.n_vertices
    if fmt == "auto":
        fmt = choose_operator_format(B, N)
    inputs = np.stack([pad_rows(np.asarray(s[input_key], np.float32), N) for s in samples])
    targets = np.stack([pad_rows(np.asarray(s[target_key], np.float32), N) for s in samples])
    mask = np.zeros((B, N, 1), dtype=np.float32)
    for b, s in enumerate(samples):
        mask[b, : s["V"].shape[0]] = 1.0
    if operator is not None:
        pass
    elif fmt == "ell":
        operator = stack_operators(
            [_fixed_k_operator(s["L"], buckets, N, cache=cache) for s in samples]
        )
    elif fmt == "bsr":
        from surfacenetworks_tpu.sparse import stack_bsr_operators

        operator = stack_bsr_operators(
            [_bsr_sample_operator(s["L"], buckets, N, op_dtype, cache=cache) for s in samples]
        )
    elif fmt == "dense":
        operator = np.stack([_dense_sample_operator(s["L"], N, cache=cache) for s in samples])
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


def _lap_operator_batch(Ls: list, buckets: Buckets, N: int, fmt: str = "auto", cache=None):
    """Stacked Laplacian operator batch in the chosen (or auto) format."""
    if fmt == "auto":
        fmt = choose_operator_format(len(Ls), N)
    if fmt == "bsr":
        from surfacenetworks_tpu.sparse import stack_bsr_operators

        return stack_bsr_operators(
            [_bsr_sample_operator(L, buckets, N, cache=cache) for L in Ls]
        )
    if fmt == "dense":
        return np.stack([_dense_sample_operator(L, N, cache=cache) for L in Ls])
    return stack_operators([_fixed_k_operator(L, buckets, N, cache=cache) for L in Ls])


def _fixed_k_operator(L: sp.spmatrix, buckets: Buckets, N: int, cache=None):
    """ELL operator with dataset-fixed slot counts for both directions.

    Uses the native one-pass CSR->(fwd, transpose) packer when the C++
    runtime is built; NumPy/scipy otherwise (identical output, pinned by
    tests/test_native.py)."""
    from surfacenetworks_tpu.sparse import EllOperator, ell_from_scipy

    def build():
        csr = L.tocsr().astype(np.float32)
        op = native.ell_operator_from_csr(csr, N, buckets.ell_k, buckets.ell_k_t)
        if op is not None:
            return op
        fwd = ell_from_scipy(csr, k=buckets.ell_k, n_rows=N, n_cols=N)
        bwd = ell_from_scipy(csr.T.tocsr(), k=buckets.ell_k_t, n_rows=N, n_cols=N)
        return EllOperator(fwd=fwd, bwd=bwd)

    if cache is None:
        return build()
    return cache.get((L,), ("ell", N, buckets.ell_k, buckets.ell_k_t), build)


def _pad_faces(samples, buckets):
    if buckets.n_faces <= 0:
        return None
    B = len(samples)
    faces = np.zeros((B, buckets.n_faces, 3), dtype=np.int32)
    for b, s in enumerate(samples):
        faces[b, : s["F"].shape[0]] = s["F"]
    return faces


def mnist_batch(
    samples: list[dict],
    buckets: Buckets,
    model: str = "lap",
    fmt: str = "auto",
    cache=None,
    operator=None,
) -> MeshBatch:
    """Classification batch: inputs = lifted V, targets = int labels
    (mesh_mnist/main.py:79-117).  ``operator`` short-circuits packing with a
    caller-built (e.g. graph-parallel partitioned) operator."""
    B = len(samples)
    N = buckets.n_vertices
    inputs = np.stack([pad_rows(np.asarray(s["V"], np.float32), N) for s in samples])
    targets = np.asarray([s["label"] for s in samples], dtype=np.int32)
    mask = np.zeros((B, N, 1), dtype=np.float32)
    for b, s in enumerate(samples):
        mask[b, : s["V"].shape[0]] = 1.0
    if operator is not None:
        pass
    elif model == "dirac":
        operator = stack_dirac(
            [
                _dirac_sample_operator(s, buckets, N, buckets.n_faces, cache=cache)
                for s in samples
            ]
        )
    else:
        operator = _lap_operator_batch([s["L"] for s in samples], buckets, N, fmt, cache=cache)
    return MeshBatch(
        inputs=inputs, targets=targets, mask=mask, operator=operator,
        faces=_pad_faces(samples, buckets), names=[s.get("name") for s in samples],
    )


def _dirac_coeffs_of(s: dict, key: str = "dirac"):
    c = s.get(key)
    if c is not None:
        return c
    V = np.asarray(s["V"], np.float32)
    if key == "flat_dirac":
        V = V.copy()
        V[:, 2] = 0.0
    return native.dirac_coeffs(V, s["F"])


def vae_batch(
    samples: list[dict],
    buckets: Buckets,
    model: str = "lap",
    fmt: str = "auto",
    operator=None,
    flat_operator=None,
    cache=None,
) -> MeshBatch:
    """VAE batch: lifted + flat inputs and operators (mesh_mnist/main_vae.py:72-125).

    ``inputs`` is the lifted V; ``aux`` carries ``flat_inputs`` (x, y, 0) and
    ``flat_operator``.  ``operator``/``flat_operator`` short-circuit packing
    with caller-built (e.g. partitioned) operators.
    """
    B = len(samples)
    N = buckets.n_vertices
    inputs = np.stack([pad_rows(np.asarray(s["V"], np.float32), N) for s in samples])
    flat_inputs = inputs.copy()
    flat_inputs[:, :, 2] = 0.0
    mask = np.zeros((B, N, 1), dtype=np.float32)
    for b, s in enumerate(samples):
        mask[b, : s["V"].shape[0]] = 1.0
    if operator is not None and flat_operator is not None:
        pass
    elif model == "dirac":
        operator = stack_dirac(
            [
                _dirac_sample_operator(s, buckets, N, buckets.n_faces, cache=cache)
                for s in samples
            ]
        )
        flat_operator = stack_dirac(
            [
                _dirac_sample_operator(s, buckets, N, buckets.n_faces, key="flat_dirac", cache=cache)
                for s in samples
            ]
        )
    else:
        operator = _lap_operator_batch([s["L"] for s in samples], buckets, N, fmt, cache=cache)
        flat_operator = _lap_operator_batch(
            [s["flat_L"] for s in samples], buckets, N, fmt, cache=cache
        )
    return MeshBatch(
        inputs=inputs, targets=inputs, mask=mask, operator=operator,
        faces=_pad_faces(samples, buckets), names=[s.get("name") for s in samples],
        aux={"flat_inputs": flat_inputs, "flat_operator": flat_operator},
    )


def arap_batch(
    sequences: list[list[dict]],
    picks: list[tuple[int, int]],
    buckets: Buckets,
    model: str = "lap",
    fmt: str = "auto",
    input_frames: int = 2,
    output_frames: int = 40,
    operator=None,
    cache=None,
) -> MeshBatch:
    """Temporal batch: ``picks`` = (sequence index, frame offset) per batch
    element; inputs = 2 frames, targets = next 40, operator from the last
    input frame (as_rigid_as_possible/main.py:98-185).  ``operator``
    short-circuits packing with a caller-built (e.g. partitioned) operator."""
    B = len(picks)
    N = buckets.n_vertices
    inputs = np.zeros((B, N, 3 * input_frames), dtype=np.float32)
    targets = np.zeros((B, N, 3 * output_frames), dtype=np.float32)
    mask = np.zeros((B, N, 1), dtype=np.float32)
    op_samples = []
    faces_list = []
    for b, (ind, off) in enumerate(picks):
        seq = sequences[ind]
        n = seq[0]["V"].shape[0]
        for i in range(input_frames):
            inputs[b, :n, 3 * i : 3 * (i + 1)] = seq[off + i]["V"]
        for i in range(output_frames):
            targets[b, :n, 3 * i : 3 * (i + 1)] = seq[off + input_frames + i]["V"]
        mask[b, :n] = 1.0
        op_frame = seq[off + input_frames - 1]
        op_samples.append(op_frame)
        faces_list.append({"F": seq[0]["F"], "V": seq[0]["V"]})
    if operator is not None:
        pass
    elif model == "dirac":
        operator = stack_dirac(
            [
                _dirac_sample_operator(s, buckets, N, buckets.n_faces, cache=cache)
                for s in op_samples
            ]
        )
    else:
        operator = _lap_operator_batch([s["L"] for s in op_samples], buckets, N, fmt, cache=cache)
    return MeshBatch(
        inputs=inputs, targets=targets, mask=mask, operator=operator,
        faces=_pad_faces(faces_list, buckets),
    )


def correspondence_batch(
    sample: dict, buckets: Buckets, model: str = "lap", fmt: str = "ell",
    operator=None, op_dtype=None, cache=None,
) -> MeshBatch:
    """Single-shape batch (B=1) for the siamese trainer
    (dense_correspondence/main.py:106-191); targets = (G, label, label_inv).

    ``fmt='bsr'`` uses the MXU block-sparse operator — callers must RCM-reorder
    samples first (``rcm_reorder_sample``) and size buckets to a 128 multiple.
    ``operator`` short-circuits packing with a previously built operator for
    this sample (operators are rotation-invariant; trainers cache them).
    """
    N = buckets.n_vertices
    n = sample["V"].shape[0]
    inputs = pad_rows(np.asarray(sample["input"], np.float32), N)[None]
    mask = np.zeros((1, N, 1), dtype=np.float32)
    mask[0, :n] = 1.0
    if operator is not None:
        pass
    elif model == "dirac":
        operator = stack_dirac(
            [_dirac_sample_operator(sample, buckets, N, buckets.n_faces, cache=cache)]
        )
    elif fmt == "bsr":
        from surfacenetworks_tpu.sparse import stack_bsr_operators

        operator = stack_bsr_operators(
            [_bsr_sample_operator(sample["L"], buckets, N, op_dtype, cache=cache)]
        )
    elif model == "amp":
        # squared-Laplacian pyramid: list of batched operators, one per level
        operator = [
            stack_operators([_fixed_k_operator(Lk, buckets, N, cache=cache)])
            for Lk in sample["L_pyr"]
        ]
    else:
        operator = stack_operators([_fixed_k_operator(sample["L"], buckets, N, cache=cache)])
    return MeshBatch(
        inputs=inputs,
        targets=(sample["G"], sample["label"], sample["label_inv"]),
        mask=mask,
        operator=operator,
        names=[sample.get("name")],
    )


def _cascade_sample_pack(
    s: dict, levels: int, n_bucket: int, ell_k: int, input_key: str, target_key: str,
    cache=None,
):
    """Per-sample cascade pack: (reordered padded input, target, pyramid
    mask, per-level EllOperators).  The pyramid build (greedy coarsening +
    per-level Laplacians) is by far the most expensive host packing in the
    framework — cached as a unit."""
    from surfacenetworks_tpu.geometry import coarsening
    from surfacenetworks_tpu.sparse import EllOperator, ell_from_scipy

    def build():
        p = coarsening.build_pyramid(s["V"], s["F"], levels, n_bucket=n_bucket)
        inp = pad_rows(
            coarsening.reorder_fine_data(p, np.asarray(s[input_key], np.float32)), n_bucket
        )
        tgt = pad_rows(
            coarsening.reorder_fine_data(p, np.asarray(s[target_key], np.float32)), n_bucket
        )
        msk = coarsening.pyramid_mask(p).astype(np.float32)
        ops = []
        for lvl in range(levels):
            L = p.levels[lvl].L
            fwd = ell_from_scipy(L, k=ell_k, n_rows=L.shape[0], n_cols=L.shape[1])
            bwd = ell_from_scipy(L.T.tocsr(), k=ell_k, n_rows=L.shape[0], n_cols=L.shape[1])
            ops.append(EllOperator(fwd=fwd, bwd=bwd))
        return (inp, tgt, msk, ops)

    if cache is None:
        return build()
    owners = (s["V"], s["F"], s[input_key], s[target_key])
    return cache.get(owners, ("cascade", levels, n_bucket, ell_k), build)


def cascade_batch(
    samples: list[dict],
    levels: int,
    n_bucket: int,
    ell_k: int = 32,
    input_key: str = "input",
    target_key: str = "target",
    cache=None,
) -> MeshBatch:
    """Multiresolution batch for EfficientCascade: per-sample Laplacian
    pyramids (coarsest..finest), per-vertex data reordered into the
    pair-adjacent pyramid ordering.  ``operator`` is a list of batched
    EllOperators, one per level (finest last, matching reference Laps)."""
    packs = [
        _cascade_sample_pack(s, levels, n_bucket, ell_k, input_key, target_key, cache=cache)
        for s in samples
    ]
    inputs = np.stack([p[0] for p in packs])
    targets = np.stack([p[1] for p in packs])
    mask = np.stack([p[2] for p in packs])
    level_ops = [
        stack_operators([p[3][lvl] for p in packs]) for lvl in range(levels)
    ]
    return MeshBatch(
        inputs=inputs,
        targets=targets,
        mask=mask,
        operator=level_ops,
        names=[s.get("name") for s in samples],
    )


def dense_dirac_pair(samples: list[dict], N: int, M: int) -> tuple[np.ndarray, np.ndarray]:
    """Padded dense Dirac operator pair ``(Di [B,4M,4N], DiA [B,4N,4M])`` —
    the reference's ``--dense`` Dirac path (as_rigid_as_possible/main.py:132-136).
    Consumed by the blocks' dense-pair dispatch (nn.blocks.apply_dirac_vf)."""
    B = len(samples)
    Di = np.zeros((B, 4 * M, 4 * N), dtype=np.float32)
    DiA = np.zeros((B, 4 * N, 4 * M), dtype=np.float32)
    for b, s in enumerate(samples):
        D, DA = geo.dirac(s["V"], s["F"])
        Di[b, : D.shape[0], : D.shape[1]] = D.toarray()
        DiA[b, : DA.shape[0], : DA.shape[1]] = DA.toarray()
    return Di, DiA


def dirac_batch(
    samples: list[dict],
    buckets: Buckets,
    input_key: str = "input",
    target_key: str = "target",
    fmt: str = "structured",
    operator=None,
    cache=None,
) -> MeshBatch:
    """Assemble a Dirac batch: ``fmt='structured'`` (quaternion coefficient
    tables, the TPU-native default) or ``'dense'`` (padded dense operator
    pair, reference --dense parity).  ``operator`` short-circuits packing
    with a caller-built operator (e.g. a graph-parallel PartitionedDirac)."""
    B = len(samples)
    N, M = buckets.n_vertices, buckets.n_faces
    inputs = np.stack([pad_rows(np.asarray(s[input_key], np.float32), N) for s in samples])
    targets = np.stack([pad_rows(np.asarray(s[target_key], np.float32), N) for s in samples])
    mask = np.zeros((B, N, 1), dtype=np.float32)
    for b, s in enumerate(samples):
        mask[b, : s["V"].shape[0]] = 1.0
    if operator is not None:
        pass
    elif fmt == "dense":
        operator = dense_dirac_pair(samples, N, M)
    else:
        operator = stack_dirac(
            [_dirac_sample_operator(s, buckets, N, M, cache=cache) for s in samples]
        )
    return MeshBatch(
        inputs=inputs,
        targets=targets,
        mask=mask,
        operator=operator,
        faces=_pad_faces(samples, buckets),
        names=[s.get("name") for s in samples],
    )
