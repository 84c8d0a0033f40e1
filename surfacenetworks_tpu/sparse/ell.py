"""Static-shape sparse containers for TPU: padded ELL and structured Dirac.

Design rationale (TPU-first, not a CUDA translation):

* Mesh operators have *bounded row degree* (cotan Laplacian rows ~7 nnz,
  Dirac face rows exactly 3 quaternion blocks, vertex rows <= max valence).
  A padded ELL layout — per row a fixed number ``K`` of (column, value)
  slots, zero-padded — therefore wastes little and gives XLA fully static
  shapes: SpMM becomes gather + multiply + reduce, the feature dimension
  (128 in every Surface Networks model) rides the TPU lane axis.
* The reference instead JIT-compiles CUDA per batch shape
  (``utils/cuda/sparse_bmm.py:29-47``) and converts COO->CSR on device每
  step (``batch_csr.cu``).  On TPU, shapes must be static anyway, so the
  conversion work moves entirely to the host (NumPy, at data-load time) and
  the device kernel sees only dense arrays.
* Batching: the reference concatenates per-mesh operators block-diagonally
  into one big 2-D sparse matrix (``utils/utils_pt.py:41-53``).  Here a
  batch is simply a leading axis on ``cols``/``vals`` + ``vmap`` — the
  block-diagonal structure is implicit and no index offsetting exists.
* Backward: operators are constants (``sparse_bmm_func.py:62`` leaves
  ``grad_matrix1=None``); each operator stores its pre-transposed ELL for
  the VJP.  The Dirac pair (Di, DiA) likewise stores adjoint quaternion
  tables (DiA is *not* Di^T — it is area-rescaled, ``utils/mesh.py:59``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import scipy.sparse as sp
from flax import struct

from surfacenetworks_tpu.geometry.mesh_ops import DiracCoeffs


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class EllMatrix:
    """Padded ELL sparse matrix of logical shape ``(n_rows, n_cols)``.

    ``cols[r, k]`` / ``vals[r, k]``: the k-th nonzero of row r; padding slots
    have ``cols == 0`` and ``vals == 0`` so they contribute nothing.  A leading
    batch axis is allowed on both arrays (block-diagonal batch of operators).
    """

    cols: Any  # int32 [..., R, K]
    vals: Any  # float32 [..., R, K]
    n_cols: int = struct.field(pytree_node=False)
    # Static banded-window bound for the Pallas kernel: for every aligned
    # 128-row tile, all nonzero columns lie in [floor(min/8)*8, base+window).
    # 0 = unknown (hand-built matrix) -> the Pallas path falls back to XLA.
    window: int = struct.field(pytree_node=False, default=0)

    @property
    def n_rows(self) -> int:
        return self.cols.shape[-2]

    @property
    def k(self) -> int:
        return self.cols.shape[-1]


@struct.dataclass
class EllOperator:
    """A linear operator with its stored transpose (for the custom VJP)."""

    fwd: EllMatrix
    bwd: EllMatrix  # ELL of the transpose


@struct.dataclass
class DiracOperator:
    """Structured quaternionic Dirac operator pair (Di, DiA) for one mesh.

    Feature layout convention (parity with ``utils/utils_pt.py:197-215``): a
    ``[N, C]`` feature tensor with ``C % 4 == 0`` is interpreted as ``[N, 4,
    C//4]`` quaternion-valued channels — quaternion component is the *leading*
    split of the channel axis.

    ``Di  v``: faces <- vertices, ``out[i] = sum_c q_fv[i,c] (x) v[F[i,c]]``.
    ``DiA f``: vertices <- faces, ``out[j] = sum_s q_vf[j,s] (x) f[vf_face[j,s]]``.
    ``q_bwd_v`` / ``q_bwd_f`` are the adjoint tables used by the VJPs.
    A leading batch axis on every array is allowed (vmap-batched meshes).
    """

    faces: Any  # int32 [..., M, 3]
    q_fv: Any  # f32 [..., M, 3, 4]
    vf_face: Any  # int32 [..., N, Kv]
    q_vf: Any  # f32 [..., N, Kv, 4]
    q_bwd_v: Any  # f32 [..., N, Kv, 4]
    q_bwd_f: Any  # f32 [..., M, 3, 4]
    # Optional packed-valence overflow (see ``dirac_from_coeffs``): the
    # vertex-side tables above then hold only ``base_valence`` slots and the
    # few high-valence vertices carry their surplus here.  TPU rationale:
    # the fv apply is HBM-gather-issue bound (measured ~300 GB/s effective,
    # insensitive to bf16), so its cost is proportional to the padded slot
    # count K — packing K from max-valence (12+) down to ~p95 valence (8)
    # cut the apply 209 -> ~147 us at FAUST scale, while the surplus rows
    # cost one tiny gather + a P-row scatter-add.
    ov_rows: Any = None  # int32 [..., P] (0-padded; padded slots add zeros)
    ov_face: Any = None  # int32 [..., P, K_ov]
    q_ov_vf: Any = None  # f32 [..., P, K_ov, 4]
    q_ov_bwd_v: Any = None  # f32 [..., P, K_ov, 4]


# ---------------------------------------------------------------------------
# host-side builders (NumPy)
# ---------------------------------------------------------------------------


def _ell_window(cols: np.ndarray, vals: np.ndarray, n_cols: int, tr: int = 128) -> int:
    """Banded-window bound for the Pallas ELL kernel (host-side, pack time).

    For each aligned ``tr``-row tile, the window is measured from the tile's
    smallest nonzero column rounded down to a sublane multiple of 8; the
    returned value (rounded up to a lane multiple of 128, capped at
    ``n_cols``) covers every tile.  Windows computed at ``tr=128`` remain
    valid for any runtime tile size that divides 128, because a sub-tile's
    base can only be >= its enclosing tile's base.
    """
    R, K = cols.shape
    if R == 0 or K == 0:
        return 128
    T = -(-R // tr)
    pad = T * tr - R
    c = np.pad(cols, ((0, pad), (0, 0))).reshape(T, tr * K)
    nz = np.pad(vals, ((0, pad), (0, 0))).reshape(T, tr * K) != 0
    if not nz.any():
        return 128
    mins = np.where(nz, c, np.iinfo(np.int32).max).min(axis=1)
    maxs = np.where(nz, c, -1).max(axis=1)
    has = nz.any(axis=1)
    spans = np.where(has, maxs - (mins // 8) * 8 + 1, 1)
    return int(min(_round_up(int(spans.max()), 128), n_cols))


def ell_from_scipy(
    M: sp.spmatrix,
    k: int | None = None,
    n_rows: int | None = None,
    n_cols: int | None = None,
    k_multiple: int = 1,
) -> EllMatrix:
    """Pack a scipy sparse matrix into padded ELL (NumPy arrays).

    ``n_rows`` / ``n_cols`` optionally pad the logical shape (static-shape
    bucketing); ``k`` fixes the slot count (defaults to the max row degree,
    rounded up to ``k_multiple``).  Raises if ``k`` is too small.
    """
    csr = M.tocsr()
    csr.sum_duplicates()
    deg = np.diff(csr.indptr)
    kmax = int(deg.max()) if len(deg) and deg.size else 0
    if k is None:
        k = max(_round_up(max(kmax, 1), k_multiple), 1)
    elif kmax > k:
        raise ValueError(f"ELL k={k} smaller than max row degree {kmax}")
    R = n_rows if n_rows is not None else M.shape[0]
    C = n_cols if n_cols is not None else M.shape[1]
    if R < M.shape[0] or C < M.shape[1]:
        raise ValueError("padded shape smaller than matrix shape")
    cols = np.zeros((R, k), dtype=np.int32)
    vals = np.zeros((R, k), dtype=np.float32)
    # vectorized fill: slot index within row
    nnz = csr.indptr[-1]
    row_of = np.repeat(np.arange(M.shape[0]), deg)
    slot = np.arange(nnz) - np.repeat(csr.indptr[:-1], deg)
    cols[row_of, slot] = csr.indices
    vals[row_of, slot] = csr.data
    return EllMatrix(cols=cols, vals=vals, n_cols=C, window=_ell_window(cols, vals, C))


def operator_from_scipy(
    M: sp.spmatrix,
    k: int | None = None,
    n_rows: int | None = None,
    n_cols: int | None = None,
    k_multiple: int = 1,
) -> EllOperator:
    """Build an ``EllOperator`` (forward + stored transpose) from scipy."""
    fwd = ell_from_scipy(M, k=k, n_rows=n_rows, n_cols=n_cols, k_multiple=k_multiple)
    # transpose max row degree generally differs from the forward one
    bwd = ell_from_scipy(
        M.T.tocsr(), k=None, n_rows=n_cols, n_cols=n_rows, k_multiple=k_multiple
    )
    return EllOperator(fwd=fwd, bwd=bwd)


def stack_operators(ops: list[EllOperator]) -> EllOperator:
    """Stack per-mesh operators into a batched operator (leading axis).

    All operators must share padded shapes — the TPU replacement for the
    reference's ``sparse_diag_cat`` / ``sparse_cat`` (utils/utils_pt.py:21-53):
    the block-diagonal batch structure is expressed as a batch axis + vmap.
    """
    fwd_cols = np.stack([o.fwd.cols for o in ops])
    fwd_vals = np.stack([o.fwd.vals for o in ops])
    bwd_cols = np.stack([o.bwd.cols for o in ops])
    bwd_vals = np.stack([o.bwd.vals for o in ops])

    def merged_window(windows):
        # window=0 means "no banded bound known" — if ANY member lacks a
        # bound the batch has none either (a positive max() would run the
        # Pallas kernel with a bound never verified for that member and
        # silently drop its out-of-window nonzeros).
        ws = list(windows)
        return 0 if any(w == 0 for w in ws) else max(ws)

    return EllOperator(
        fwd=EllMatrix(
            cols=fwd_cols,
            vals=fwd_vals,
            n_cols=ops[0].fwd.n_cols,
            window=merged_window(o.fwd.window for o in ops),
        ),
        bwd=EllMatrix(
            cols=bwd_cols,
            vals=bwd_vals,
            n_cols=ops[0].bwd.n_cols,
            window=merged_window(o.bwd.window for o in ops),
        ),
    )


def dirac_from_coeffs(
    coeffs: DiracCoeffs,
    n_vertices: int | None = None,
    n_faces: int | None = None,
    max_valence: int | None = None,
    base_valence: int | None = None,
    n_overflow: int | None = None,
) -> DiracOperator:
    """Pad a host-side ``DiracCoeffs`` into a static-shape ``DiracOperator``.

    Zero quaternion coefficients make padded faces/vertices/slots inert, so
    bucketing is plain zero-padding.

    ``base_valence`` (< ``max_valence``) enables packed-valence tables: each
    vertex keeps its first ``base_valence`` *used* slots in the main table;
    vertices with higher valence park the surplus in an overflow table of
    ``n_overflow`` rows x ``max_valence - base_valence`` slots that the fv
    apply (and the vf backward) adds back with a scatter.  This trims the
    gather-bound slot count from the max valence (12+) to ~the 95th
    percentile (see the DiracOperator field docs for the measured win).
    """
    N = n_vertices if n_vertices is not None else coeffs.n_vertices
    M = n_faces if n_faces is not None else coeffs.n_faces
    Kv = max_valence if max_valence is not None else coeffs.vf_face.shape[1]
    if N < coeffs.n_vertices or M < coeffs.n_faces or Kv < coeffs.vf_face.shape[1]:
        raise ValueError("padded shape smaller than mesh")

    def pad(a, shape):
        out = np.zeros(shape, dtype=a.dtype)
        out[tuple(slice(0, s) for s in a.shape)] = a
        return out

    vf_face = pad(coeffs.vf_face.astype(np.int32), (N, Kv))
    q_vf = pad(coeffs.q_vf, (N, Kv, 4))
    q_bwd_v = pad(coeffs.q_bwd_v, (N, Kv, 4))
    overflow = {}
    if base_valence is not None and base_valence < Kv:
        B, K_ov = base_valence, Kv - base_valence
        # used slots first within each row (stable), then split
        used = (q_vf != 0).any(-1) | (q_bwd_v != 0).any(-1)
        order = np.argsort(~used, axis=1, kind="stable")
        vf_face = np.take_along_axis(vf_face, order, axis=1)
        q_vf = np.take_along_axis(q_vf, order[..., None], axis=1)
        q_bwd_v = np.take_along_axis(q_bwd_v, order[..., None], axis=1)
        used = np.take_along_axis(used, order, axis=1)
        rows = np.flatnonzero(used[:, B:].any(axis=1))
        P = n_overflow if n_overflow is not None else _round_up(max(len(rows), 1), 8)
        if len(rows) > P:
            raise ValueError(
                f"n_overflow={P} smaller than {len(rows)} over-valence vertices"
            )
        ov_rows = np.zeros(P, np.int32)
        ov_face = np.zeros((P, K_ov), np.int32)
        q_ov_vf = np.zeros((P, K_ov, 4), np.float32)
        q_ov_bwd_v = np.zeros((P, K_ov, 4), np.float32)
        ov_rows[: len(rows)] = rows
        ov_face[: len(rows)] = vf_face[rows, B:]
        q_ov_vf[: len(rows)] = q_vf[rows, B:]
        q_ov_bwd_v[: len(rows)] = q_bwd_v[rows, B:]
        vf_face, q_vf, q_bwd_v = vf_face[:, :B], q_vf[:, :B], q_bwd_v[:, :B]
        overflow = dict(
            ov_rows=ov_rows, ov_face=ov_face, q_ov_vf=q_ov_vf, q_ov_bwd_v=q_ov_bwd_v
        )

    return DiracOperator(
        faces=pad(coeffs.F.astype(np.int32), (M, 3)),
        q_fv=pad(coeffs.q_fv, (M, 3, 4)),
        vf_face=vf_face,
        q_vf=q_vf,
        q_bwd_v=q_bwd_v,
        q_bwd_f=pad(coeffs.q_bwd_f, (M, 3, 4)),
        **overflow,
    )


def stack_dirac(ops: list[DiracOperator]) -> DiracOperator:
    """Batch per-mesh Dirac operators along a new leading axis."""
    has_ov = [o.ov_rows is not None for o in ops]
    if any(has_ov) and not all(has_ov):
        raise ValueError("cannot stack packed and unpacked Dirac operators")
    overflow = {}
    if all(has_ov):
        overflow = dict(
            ov_rows=np.stack([o.ov_rows for o in ops]),
            ov_face=np.stack([o.ov_face for o in ops]),
            q_ov_vf=np.stack([o.q_ov_vf for o in ops]),
            q_ov_bwd_v=np.stack([o.q_ov_bwd_v for o in ops]),
        )
    return DiracOperator(
        faces=np.stack([o.faces for o in ops]),
        q_fv=np.stack([o.q_fv for o in ops]),
        vf_face=np.stack([o.vf_face for o in ops]),
        q_vf=np.stack([o.q_vf for o in ops]),
        q_bwd_v=np.stack([o.q_bwd_v for o in ops]),
        q_bwd_f=np.stack([o.q_bwd_f for o in ops]),
        **overflow,
    )


@dataclasses.dataclass(frozen=True)
class EllSpec:
    """Static bucket description for a dataset (choose once, reuse per batch)."""

    n_rows: int
    n_cols: int
    k: int
