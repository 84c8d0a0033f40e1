"""Edge-partitioned Dirac operator pair with two-sided halo exchange.

Completes the graph-parallel story for the Dirac model family (DirDeep /
DirVAE / ARAP DirModel — reference hot path ``utils/utils_pt.py:182-220``):
both streams of the quaternionic operator pair are row-sharded over the
'graph' mesh axis —

* **vertex rows** (features ``v [N, C]``, tables ``vf_face``/``q_vf``/
  ``q_bwd_v``) shard into ``N / n_parts`` rows per device,
* **face rows** (features ``f [M, C]``, tables ``faces``/``q_fv``/
  ``q_bwd_f``) shard into ``M / n_parts`` rows per device,

and each apply crosses the partition boundary in exactly one direction:

* ``Di v``  (vertices -> faces): every face gathers its 3 vertices, so the
  device exchanges a *vertex* halo of ``halo_v`` rows with its ring
  neighbours (``lax.ppermute`` over ICI) before the local gather-Hamilton
  apply.  Its VJP is the face->vertex adjoint table, needing a *face* halo.
* ``DiA f`` (faces -> vertices): every vertex gathers its incident faces —
  a *face* halo of ``halo_f`` rows; VJP gathers vertices, *vertex* halo.

Host-side, ``partition_dirac`` splits each partition's rows into *interior*
(every used incidence slot stays inside the partition's own source band; the
tables index the LOCAL frame and the gather-apply is independent of the
exchange) and *boundary* (a small side table in extended-frame
``[halo | local | halo]`` coordinates, scatter-added after the ppermutes
land) — the same overlap structure as ``edge_partition.partition_ell``, so
XLA's latency-hiding scheduler runs the halo exchange concurrently with the
bulk interior gather-Hamilton work.  Narrow halos require the mesh to be
RCM-vertex-reordered with faces sorted by minimum vertex index
(``sort_faces_for_partition``) so face index correlates with vertex index;
the packer measures the exact need per direction and validates any
caller-supplied halo against it.

Operators are constants (reference ``sparse_bmm_func.py:62``): both VJPs
multiply by pre-stored adjoint quaternion tables, never differentiating
through the operator.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surfacenetworks_tpu.dist.edge_partition import _halo_exchange, _scatter_add_rows
from surfacenetworks_tpu.geometry.mesh_ops import DiracCoeffs
from surfacenetworks_tpu.sparse.ell import dirac_from_coeffs
from surfacenetworks_tpu.sparse.ops import _dirac_gather_apply


@struct.dataclass
class PartitionedDirac:
    """Row-sharded Dirac pair split into interior and boundary rows.

    Two row families, each with an interior table (LOCAL source-frame
    indices; boundary rows zeroed so they contribute exactly +0.0) and a
    boundary side table (extended-frame indices, flat per-partition layout
    ``[n_parts * Mb]`` like ``PartitionedEll``):

    * **face rows** gather vertices: interior ``faces``/``q_fv``/``q_bwd_f``
      index the local vertex band ``[0, n_loc_v)``; boundary faces live in
      ``fbnd_rows``/``fbnd_verts`` (extended vertex frame) with their
      ``fbnd_q_fv``/``fbnd_q_bwd_f`` coefficients.
    * **vertex rows** gather faces: interior ``vf_face``/``q_vf``/``q_bwd_v``
      index the local face band; boundary vertices live in
      ``vbnd_rows``/``vbnd_face``/``vbnd_q_vf``/``vbnd_q_bwd_v``.

    Padded / unused slots carry zero quaternion coefficients and point at an
    in-bounds row, so they contribute nothing.  A leading batch axis on
    every array is allowed.
    """

    faces: Any  # int32 [..., M, 3] — LOCAL vertex frame, boundary faces zeroed
    q_fv: Any  # f32 [..., M, 3, 4]
    q_bwd_f: Any  # f32 [..., M, 3, 4]
    fbnd_rows: Any  # int32 [..., n_parts*Mbf] — partition-local face rows
    fbnd_verts: Any  # int32 [..., n_parts*Mbf, 3] — extended vertex frame
    fbnd_q_fv: Any  # f32 [..., n_parts*Mbf, 3, 4]
    fbnd_q_bwd_f: Any  # f32 [..., n_parts*Mbf, 3, 4]
    vf_face: Any  # int32 [..., N, Kv] — LOCAL face frame, boundary verts zeroed
    q_vf: Any  # f32 [..., N, Kv, 4]
    q_bwd_v: Any  # f32 [..., N, Kv, 4]
    vbnd_rows: Any  # int32 [..., n_parts*Mbv] — partition-local vertex rows
    vbnd_face: Any  # int32 [..., n_parts*Mbv, Kv] — extended face frame
    vbnd_q_vf: Any  # f32 [..., n_parts*Mbv, Kv, 4]
    vbnd_q_bwd_v: Any  # f32 [..., n_parts*Mbv, Kv, 4]
    halo_v: int = struct.field(pytree_node=False)
    halo_f: int = struct.field(pytree_node=False)
    n_parts: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default="graph")


def sort_faces_for_partition(F: np.ndarray) -> np.ndarray:
    """Stable face order by minimum vertex index.

    After an RCM vertex reorder this makes face index correlate with vertex
    index, so both halos stay near the mesh bandwidth instead of O(N).
    Face order is arbitrary in every Surface Networks workload (faces only
    feed operator construction and viz)."""
    return np.argsort(np.asarray(F).min(axis=1), kind="stable")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _halo_need(table: np.ndarray, used: np.ndarray, n_parts: int, n_src: int) -> int:
    """Smallest halo such that every used slot of every row lands inside its
    partition's extended source frame."""
    R = table.shape[0]
    part = np.arange(R) // (R // n_parts)
    off = table - part[:, None] * (n_src // n_parts)
    lo = int(np.where(used, -off, 0).max(initial=0))
    hi = int(np.where(used, off - n_src // n_parts + 1, 0).max(initial=0))
    return max(lo, hi, 0)


def _split_rows(
    table: np.ndarray,
    used: np.ndarray,
    n_parts: int,
    n_src: int,
    halo: int,
    coeffs: list[np.ndarray],
):
    """Split one incidence table's rows into interior and boundary.

    Returns ``(int_table, int_coeffs, bnd_rows, bnd_table, bnd_coeffs)``:
    the interior table indexes the LOCAL source frame ``[0, src_loc)`` with
    boundary rows (and their coefficients) zeroed; the boundary side table
    (flat ``[n_parts * Mb]`` layout) indexes the extended frame.
    """
    R, S = table.shape
    n_loc_r = R // n_parts
    src_loc = n_src // n_parts
    part = np.arange(R) // n_loc_r
    ext = (table - part[:, None] * src_loc + halo).astype(np.int64)
    if used.any():
        mn, mx = int(ext[used].min()), int(ext[used].max())
        if mn < 0 or mx >= src_loc + 2 * halo:
            raise ValueError(
                f"halo {halo} too small for incidence span (RCM-reorder vertices "
                "and sort faces with sort_faces_for_partition first)"
            )
    remote = used & ((ext < halo) | (ext >= halo + src_loc))
    is_bnd = remote.any(axis=1)

    int_table = np.where(used & ~is_bnd[:, None], ext - halo, 0).astype(np.int32)
    int_coeffs = [
        np.where(is_bnd[:, None, None], 0.0, q).astype(np.float32) for q in coeffs
    ]

    ext_safe = np.where(used, ext, halo).astype(np.int32)  # unused slots in bounds
    per_part = is_bnd.reshape(n_parts, n_loc_r)
    mb = int(per_part.sum(axis=1).max(initial=0))
    mb = min(_round_up(mb, 8), n_loc_r) if mb else 0
    bnd_rows = np.zeros((n_parts, mb), dtype=np.int32)
    bnd_table = np.full((n_parts, mb, S), halo, dtype=np.int32)
    bnd_coeffs = [np.zeros((n_parts, mb) + q.shape[1:], dtype=np.float32) for q in coeffs]
    for p in range(n_parts):
        rloc = np.nonzero(per_part[p])[0]
        bnd_rows[p, : rloc.size] = rloc
        bnd_table[p, : rloc.size] = ext_safe[p * n_loc_r + rloc]
        for bq, q in zip(bnd_coeffs, coeffs):
            bq[p, : rloc.size] = q[p * n_loc_r + rloc]
    flat = lambda a: a.reshape((n_parts * mb,) + a.shape[2:])
    return (
        int_table,
        int_coeffs,
        flat(bnd_rows),
        flat(bnd_table),
        [flat(bq) for bq in bnd_coeffs],
    )


def partition_dirac(
    coeffs: DiracCoeffs,
    n_parts: int,
    n_vertices: int,
    n_faces: int,
    halo_v: int | None = None,
    halo_f: int | None = None,
    max_valence: int | None = None,
    axis: str = "graph",
) -> PartitionedDirac:
    """Pack host-side Dirac coefficients into a row-partitioned operator.

    ``n_vertices`` / ``n_faces`` are the padded (bucketed) sizes and must be
    divisible by ``n_parts``.  ``halo_v`` / ``halo_f`` default to the
    measured need rounded up to a multiple of 8.  The packed-valence
    overflow path (``dirac_from_coeffs`` ``base_valence``) is not supported
    here — its scatter rows are global indices; partitioned operators keep
    the plain table layout.
    """
    if n_vertices % n_parts or n_faces % n_parts:
        raise ValueError(
            f"padded sizes ({n_vertices}, {n_faces}) not divisible by {n_parts}"
        )
    op = dirac_from_coeffs(coeffs, n_vertices, n_faces, max_valence)
    # the bwd tables share the incidence tables, so the halo must cover
    # every slot either direction uses
    used_v = (op.q_fv != 0).any(-1) | (op.q_bwd_f != 0).any(-1)  # face rows
    used_f = (op.q_vf != 0).any(-1) | (op.q_bwd_v != 0).any(-1)  # vertex rows
    need_v = _halo_need(op.faces.reshape(n_faces, 3), used_v, n_parts, n_vertices)
    need_f = _halo_need(op.vf_face, used_f, n_parts, n_faces)
    halo_v = _round_up(max(need_v, 1), 8) if halo_v is None else halo_v
    halo_f = _round_up(max(need_f, 1), 8) if halo_f is None else halo_f
    if halo_v > n_vertices // n_parts or halo_f > n_faces // n_parts:
        raise ValueError(
            f"halos ({halo_v}, {halo_f}) exceed partition sizes "
            f"({n_vertices // n_parts}, {n_faces // n_parts})"
        )
    faces_int, (q_fv_int, q_bwd_f_int), fbnd_rows, fbnd_verts, (fbnd_q_fv, fbnd_q_bwd_f) = (
        _split_rows(
            op.faces.reshape(n_faces, 3), used_v, n_parts, n_vertices, halo_v,
            [op.q_fv, op.q_bwd_f],
        )
    )
    vf_int, (q_vf_int, q_bwd_v_int), vbnd_rows, vbnd_face, (vbnd_q_vf, vbnd_q_bwd_v) = (
        _split_rows(op.vf_face, used_f, n_parts, n_faces, halo_f, [op.q_vf, op.q_bwd_v])
    )
    return PartitionedDirac(
        faces=faces_int,
        q_fv=q_fv_int,
        q_bwd_f=q_bwd_f_int,
        fbnd_rows=fbnd_rows,
        fbnd_verts=fbnd_verts,
        fbnd_q_fv=fbnd_q_fv,
        fbnd_q_bwd_f=fbnd_q_bwd_f,
        vf_face=vf_int,
        q_vf=q_vf_int,
        q_bwd_v=q_bwd_v_int,
        vbnd_rows=vbnd_rows,
        vbnd_face=vbnd_face,
        vbnd_q_vf=vbnd_q_vf,
        vbnd_q_bwd_v=vbnd_q_bwd_v,
        halo_v=halo_v,
        halo_f=halo_f,
        n_parts=n_parts,
        axis=axis,
    )


def stack_partitioned_dirac(
    ops: list[PartitionedDirac], min_mbf: int = 0, min_mbv: int = 0
) -> PartitionedDirac:
    """Batch per-mesh partitioned Dirac operators along a new leading axis
    (boundary side tables re-padded to the widest member; ``min_mbf`` /
    ``min_mbv`` floor the widths for batch-to-batch shape stability)."""
    from surfacenetworks_tpu.dist.edge_partition import _repad_bnd

    first = ops[0]
    assert all(
        o.halo_v == first.halo_v and o.halo_f == first.halo_f and o.n_parts == first.n_parts
        for o in ops
    )
    n_parts = first.n_parts
    mbf = max(min_mbf, max(o.fbnd_rows.shape[0] // n_parts for o in ops))
    mbv = max(min_mbv, max(o.vbnd_rows.shape[0] // n_parts for o in ops))
    arr = lambda name: np.stack([getattr(o, name) for o in ops])
    fbnd = lambda name: np.stack(
        [_repad_bnd(np.asarray(getattr(o, name)), n_parts, mbf) for o in ops]
    )
    vbnd = lambda name: np.stack(
        [_repad_bnd(np.asarray(getattr(o, name)), n_parts, mbv) for o in ops]
    )
    return PartitionedDirac(
        faces=arr("faces"),
        q_fv=arr("q_fv"),
        q_bwd_f=arr("q_bwd_f"),
        fbnd_rows=fbnd("fbnd_rows"),
        fbnd_verts=fbnd("fbnd_verts"),
        fbnd_q_fv=fbnd("fbnd_q_fv"),
        fbnd_q_bwd_f=fbnd("fbnd_q_bwd_f"),
        vf_face=arr("vf_face"),
        q_vf=arr("q_vf"),
        q_bwd_v=arr("q_bwd_v"),
        vbnd_rows=vbnd("vbnd_rows"),
        vbnd_face=vbnd("vbnd_face"),
        vbnd_q_vf=vbnd("vbnd_q_vf"),
        vbnd_q_bwd_v=vbnd("vbnd_q_bwd_v"),
        halo_v=first.halo_v,
        halo_f=first.halo_f,
        n_parts=first.n_parts,
        axis=first.axis,
    )


# ---------------------------------------------------------------------------
# device side — local-shard applies (used INSIDE shard_map bodies)
# ---------------------------------------------------------------------------


def _gather(idx: jnp.ndarray, q: jnp.ndarray, x_ext: jnp.ndarray) -> jnp.ndarray:
    if idx.ndim == 2:
        return _dirac_gather_apply(idx, q, x_ext)
    return jax.vmap(_dirac_gather_apply)(idx, q, x_ext)


def _split_apply(int_tbl, int_q, bnd_rows, bnd_tbl, bnd_q, x_loc, halo, axis):
    """Interior/boundary overlap structure (see edge_partition._apply_local):
    the interior gather-Hamilton apply depends only on ``x_loc`` so XLA's
    latency-hiding scheduler overlaps the ppermutes with it; only the small
    boundary table waits for the extended frame."""
    y = _gather(int_tbl, int_q, x_loc)
    if halo == 0 or bnd_rows.shape[-1] == 0:
        return y
    x_ext = _halo_exchange(x_loc, halo, axis)
    y_bnd = _gather(bnd_tbl, bnd_q, x_ext)
    return _scatter_add_rows(y, bnd_rows, y_bnd)


@jax.custom_vjp
def partitioned_dirac_vf(op: PartitionedDirac, v_loc: jnp.ndarray) -> jnp.ndarray:
    """``Di @ v`` on LOCAL row shards: interior faces gather local vertices
    while the vertex halo is in flight; boundary faces scatter-add after.

    ``v_loc [..., n_loc_v, C]`` (C % 4 == 0) -> ``[..., m_loc, C]``.
    """
    return _split_apply(
        op.faces, op.q_fv, op.fbnd_rows, op.fbnd_verts, op.fbnd_q_fv,
        v_loc, op.halo_v, op.axis,
    )


def _pvf_fwd(op, v_loc):
    return partitioned_dirac_vf(op, v_loc), (op, jnp.zeros((0,), v_loc.dtype))


def _pvf_bwd(res, g):
    op, wit = res
    v_bar = _split_apply(
        op.vf_face, op.q_bwd_v, op.vbnd_rows, op.vbnd_face, op.vbnd_q_bwd_v,
        g, op.halo_f, op.axis,
    ).astype(wit.dtype)
    return (jax.tree_util.tree_map(jnp.zeros_like, op), v_bar)


partitioned_dirac_vf.defvjp(_pvf_fwd, _pvf_bwd)


@jax.custom_vjp
def partitioned_dirac_fv(op: PartitionedDirac, f_loc: jnp.ndarray) -> jnp.ndarray:
    """``DiA @ f`` on LOCAL row shards: interior vertices gather local faces
    while the face halo is in flight; boundary vertices scatter-add after.

    ``f_loc [..., m_loc, C]`` -> ``[..., n_loc_v, C]``.
    """
    return _split_apply(
        op.vf_face, op.q_vf, op.vbnd_rows, op.vbnd_face, op.vbnd_q_vf,
        f_loc, op.halo_f, op.axis,
    )


def _pfv_fwd(op, f_loc):
    return partitioned_dirac_fv(op, f_loc), (op, jnp.zeros((0,), f_loc.dtype))


def _pfv_bwd(res, g):
    op, wit = res
    f_bar = _split_apply(
        op.faces, op.q_bwd_f, op.fbnd_rows, op.fbnd_verts, op.fbnd_q_bwd_f,
        g, op.halo_v, op.axis,
    ).astype(wit.dtype)
    return (jax.tree_util.tree_map(jnp.zeros_like, op), f_bar)


partitioned_dirac_fv.defvjp(_pfv_fwd, _pfv_bwd)


# ---------------------------------------------------------------------------
# placement
# ---------------------------------------------------------------------------


def shard_partitioned_dirac(mesh: Mesh, op: PartitionedDirac, axis: str | None = None):
    """Place a PartitionedDirac row-sharded on its mesh axis (vertex and
    face tables alike shard their leading row dimension; multi-host aware)."""
    from surfacenetworks_tpu.dist.mesh_setup import put_global

    axis = axis if axis is not None else op.axis
    batched = np.ndim(op.faces) == 3
    spec = P(None, axis) if batched else P(axis)
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), op)
