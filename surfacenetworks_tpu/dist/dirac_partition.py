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

Host-side, ``partition_dirac`` remaps both incidence tables into their
partition's extended frame ``[halo | local | halo]`` (same scheme as
``edge_partition.partition_ell``).  Narrow halos require the mesh to be
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

from surfacenetworks_tpu.dist.edge_partition import _halo_exchange
from surfacenetworks_tpu.geometry.mesh_ops import DiracCoeffs
from surfacenetworks_tpu.sparse.ell import dirac_from_coeffs
from surfacenetworks_tpu.sparse.ops import _dirac_gather_apply


@struct.dataclass
class PartitionedDirac:
    """Row-sharded Dirac pair in halo-frame indexing.

    ``faces[i, c]`` indexes the *extended vertex frame* of face i's
    partition (position 0 = global vertex row ``part(i) * n_loc_v -
    halo_v``); ``vf_face[j, s]`` indexes the extended *face* frame of vertex
    j's partition.  Padded / unused slots carry zero quaternion coefficients
    and point at the first local row, so they contribute nothing while
    staying in bounds.  A leading batch axis on every array is allowed.
    """

    faces: Any  # int32 [..., M, 3] — vertex-halo frame
    q_fv: Any  # f32 [..., M, 3, 4]
    vf_face: Any  # int32 [..., N, Kv] — face-halo frame
    q_vf: Any  # f32 [..., N, Kv, 4]
    q_bwd_v: Any  # f32 [..., N, Kv, 4]
    q_bwd_f: Any  # f32 [..., M, 3, 4]
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


def _remap(table: np.ndarray, used: np.ndarray, n_parts: int, n_src: int, halo: int):
    """Global source indices -> extended local frame; unused slots -> first
    local row (their coefficients are zero)."""
    R = table.shape[0]
    src_loc = n_src // n_parts
    part = np.arange(R) // (R // n_parts)
    local = table - part[:, None] * src_loc + halo
    local = np.where(used, local, halo).astype(np.int32)
    if used.any():
        mn, mx = int(local[used].min()), int(local[used].max())
        if mn < 0 or mx >= src_loc + 2 * halo:
            raise ValueError(
                f"halo {halo} too small for incidence span (RCM-reorder vertices "
                "and sort faces with sort_faces_for_partition first)"
            )
    return local


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
    return PartitionedDirac(
        faces=_remap(op.faces.reshape(n_faces, 3), used_v, n_parts, n_vertices, halo_v),
        q_fv=op.q_fv,
        vf_face=_remap(op.vf_face, used_f, n_parts, n_faces, halo_f),
        q_vf=op.q_vf,
        q_bwd_v=op.q_bwd_v,
        q_bwd_f=op.q_bwd_f,
        halo_v=halo_v,
        halo_f=halo_f,
        n_parts=n_parts,
        axis=axis,
    )


def stack_partitioned_dirac(ops: list[PartitionedDirac]) -> PartitionedDirac:
    """Batch per-mesh partitioned Dirac operators along a new leading axis."""
    first = ops[0]
    assert all(
        o.halo_v == first.halo_v and o.halo_f == first.halo_f and o.n_parts == first.n_parts
        for o in ops
    )
    arr = lambda name: np.stack([getattr(o, name) for o in ops])
    return PartitionedDirac(
        faces=arr("faces"),
        q_fv=arr("q_fv"),
        vf_face=arr("vf_face"),
        q_vf=arr("q_vf"),
        q_bwd_v=arr("q_bwd_v"),
        q_bwd_f=arr("q_bwd_f"),
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


@jax.custom_vjp
def partitioned_dirac_vf(op: PartitionedDirac, v_loc: jnp.ndarray) -> jnp.ndarray:
    """``Di @ v`` on LOCAL row shards: vertex halo exchange + local gather.

    ``v_loc [..., n_loc_v, C]`` (C % 4 == 0) -> ``[..., m_loc, C]``.
    """
    v_ext = _halo_exchange(v_loc, op.halo_v, op.axis)
    return _gather(op.faces, op.q_fv, v_ext)


def _pvf_fwd(op, v_loc):
    return partitioned_dirac_vf(op, v_loc), op


def _pvf_bwd(op, g):
    g_ext = _halo_exchange(g, op.halo_f, op.axis)
    v_bar = _gather(op.vf_face, op.q_bwd_v, g_ext)
    return (jax.tree_util.tree_map(jnp.zeros_like, op), v_bar)


partitioned_dirac_vf.defvjp(_pvf_fwd, _pvf_bwd)


@jax.custom_vjp
def partitioned_dirac_fv(op: PartitionedDirac, f_loc: jnp.ndarray) -> jnp.ndarray:
    """``DiA @ f`` on LOCAL row shards: face halo exchange + local gather.

    ``f_loc [..., m_loc, C]`` -> ``[..., n_loc_v, C]``.
    """
    f_ext = _halo_exchange(f_loc, op.halo_f, op.axis)
    return _gather(op.vf_face, op.q_vf, f_ext)


def _pfv_fwd(op, f_loc):
    return partitioned_dirac_fv(op, f_loc), op


def _pfv_bwd(op, g):
    g_ext = _halo_exchange(g, op.halo_v, op.axis)
    f_bar = _gather(op.faces, op.q_bwd_f, g_ext)
    return (jax.tree_util.tree_map(jnp.zeros_like, op), f_bar)


partitioned_dirac_fv.defvjp(_pfv_fwd, _pfv_bwd)


# ---------------------------------------------------------------------------
# placement
# ---------------------------------------------------------------------------


def shard_partitioned_dirac(mesh: Mesh, op: PartitionedDirac, axis: str | None = None):
    """Device-put a PartitionedDirac row-sharded on its mesh axis (vertex and
    face tables alike shard their leading row dimension)."""
    axis = axis if axis is not None else op.axis
    batched = np.ndim(op.faces) == 3
    spec = P(None, axis) if batched else P(axis)
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), op)
