"""Edge-partitioned operator sharding with halo exchange.

The mesh-GNN analogue of context/sequence parallelism (SURVEY.md §2.9): one
large mesh's operator rows are partitioned contiguously across devices on
mesh axis 'graph', vertex features are row-sharded, and each SpMM needs only
the *boundary band* of neighbouring partitions.  With RCM vertex ordering
the operator bandwidth is O(sqrt N) (measured 242 at N=7000), so a halo of
a few hundred rows suffices and per-apply communication is O(halo * C) per
device — exchanged with ``jax.lax.ppermute`` between ring neighbours over
ICI, instead of all-gathering the full feature tensor.

Host-side preprocessing (``partition_ell``) remaps every row's column
indices into its own partition's extended frame [halo | local | halo].

Device side, two entry points:

* ``partitioned_spmm(op, x_loc)`` — operates on LOCAL shards *inside* a
  ``shard_map`` body (the mesh axis name is stored statically on the
  operator).  This is what ``nn.blocks.apply_operator`` dispatches, so whole
  models run partitioned: wrap the model with
  ``dist.graph_parallel.make_graph_sharded_apply``.
* ``make_partitioned_spmm(mesh)`` — standalone global-array convenience
  wrapper (one shard_map around a single apply).

The custom VJP multiplies by the identically partitioned stored transpose
(operators are constants, reference sparse_bmm_func.py:62).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surfacenetworks_tpu.sparse.ops import _ell_matmul_xla


@struct.dataclass
class PartitionedEll:
    """Row-sharded ELL in halo-frame column indexing.

    ``cols[r, k]`` indexes the *extended local frame* of row r's partition:
    position 0 is that partition's first halo row (global row
    ``part(r)*n_loc - halo``).  Arrays are stored flat ``[N, K]`` (optionally
    with a leading mesh-batch axis ``[B, N, K]``) so the same
    ``P('graph')`` / ``P('data', 'graph')`` sharding as the features applies.
    ``axis`` is the mesh axis name the rows are sharded over.
    """

    cols: Any  # int32 [..., N, K]
    vals: Any  # f32 [..., N, K]
    halo: int = struct.field(pytree_node=False)
    n_parts: int = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False, default="graph")


@struct.dataclass
class PartitionedOperator:
    fwd: PartitionedEll
    bwd: PartitionedEll


def matrix_bandwidth(M: sp.spmatrix) -> int:
    """max |row - col| over nonzeros (0 for empty/diagonal matrices)."""
    coo = M.tocoo()
    if coo.nnz == 0:
        return 0
    return int(np.abs(coo.row - coo.col).max())


def suggest_halo(M: sp.spmatrix, multiple: int = 8) -> int:
    """Smallest sufficient halo for a (reordered) operator: its bandwidth,
    rounded up (benchmarks/scaling.py uses the same bound).  RCM-reorder
    first — an unordered mesh operator has bandwidth ~N."""
    bw = max(matrix_bandwidth(M), 1)
    return ((bw + multiple - 1) // multiple) * multiple


def partition_ell(
    M: sp.spmatrix,
    n_parts: int,
    halo: int,
    k: int = 16,
    n_rows: int | None = None,
    axis: str = "graph",
) -> PartitionedEll:
    """Pack a square operator into row partitions with halo-frame columns.

    Requires the (reordered) matrix bandwidth to be <= halo; raises otherwise.
    """
    M = M.tocsr().astype(np.float32)
    N = n_rows if n_rows is not None else M.shape[0]
    if N % n_parts:
        raise ValueError(f"padded size {N} not divisible by {n_parts} partitions")
    n_loc = N // n_parts
    if halo > n_loc:
        raise ValueError(f"halo {halo} larger than partition size {n_loc}")
    Mp = sp.csr_matrix(M)
    Mp.resize((N, N))
    Mp.sum_duplicates()
    bw = matrix_bandwidth(Mp)
    if bw > halo:
        raise ValueError(f"operator bandwidth {bw} exceeds halo {halo}; RCM-reorder first")
    csr = Mp.tocsr()
    deg = np.diff(csr.indptr)
    if deg.size and deg.max() > k:
        raise ValueError(f"ELL k={k} smaller than max row degree {deg.max()}")
    cols = np.zeros((N, k), dtype=np.int32)
    vals = np.zeros((N, k), dtype=np.float32)
    row_of = np.repeat(np.arange(N), deg)
    slot = np.arange(csr.indptr[-1]) - np.repeat(csr.indptr[:-1], deg)
    part = row_of // n_loc
    local_col = csr.indices - part * n_loc + halo
    assert (local_col >= 0).all() and (local_col < n_loc + 2 * halo).all()
    cols[row_of, slot] = local_col
    vals[row_of, slot] = csr.data
    return PartitionedEll(cols=cols, vals=vals, halo=halo, n_parts=n_parts, axis=axis)


def partition_operator(
    M: sp.spmatrix,
    n_parts: int,
    halo: int,
    k: int = 16,
    n_rows: int | None = None,
    axis: str = "graph",
) -> PartitionedOperator:
    return PartitionedOperator(
        fwd=partition_ell(M, n_parts, halo, k, n_rows, axis),
        bwd=partition_ell(M.T.tocsr(), n_parts, halo, k, n_rows, axis),
    )


def stack_partitioned(ops: list[PartitionedOperator]) -> PartitionedOperator:
    """Batch per-mesh partitioned operators along a new leading axis (all
    must share halo / n_parts / padded shape)."""

    def stack_ell(ms: list[PartitionedEll]) -> PartitionedEll:
        assert all(m.halo == ms[0].halo and m.n_parts == ms[0].n_parts for m in ms)
        return PartitionedEll(
            cols=np.stack([m.cols for m in ms]),
            vals=np.stack([m.vals for m in ms]),
            halo=ms[0].halo,
            n_parts=ms[0].n_parts,
            axis=ms[0].axis,
        )

    return PartitionedOperator(
        fwd=stack_ell([o.fwd for o in ops]), bwd=stack_ell([o.bwd for o in ops])
    )


# ---------------------------------------------------------------------------
# device side — local-shard ops (used INSIDE shard_map bodies)
# ---------------------------------------------------------------------------


def _halo_exchange(x_loc: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Extended frame [from-left | local | from-right] along the row axis
    (-2) via ring ppermute; chain-end devices receive zeros."""
    if halo == 0:
        return x_loc
    n_dev = jax.lax.axis_size(axis)
    from_left = jax.lax.ppermute(
        x_loc[..., -halo:, :], axis, perm=[(i, i + 1) for i in range(n_dev - 1)]
    )
    from_right = jax.lax.ppermute(
        x_loc[..., :halo, :], axis, perm=[(i + 1, i) for i in range(n_dev - 1)]
    )
    return jnp.concatenate([from_left, x_loc, from_right], axis=-2)


def _ell_local(cols, vals, x_ext):
    if cols.ndim == 2:
        return _ell_matmul_xla(cols, vals, x_ext)
    assert cols.ndim == x_ext.ndim == 3, (cols.shape, x_ext.shape)
    return jax.vmap(_ell_local)(cols, vals, x_ext)


def _apply_local(m: PartitionedEll, x_loc: jnp.ndarray) -> jnp.ndarray:
    x_ext = _halo_exchange(x_loc, m.halo, m.axis)
    return _ell_local(m.cols, m.vals, x_ext)


@jax.custom_vjp
def partitioned_spmm(op: PartitionedOperator, x_loc: jnp.ndarray) -> jnp.ndarray:
    """``L @ x`` on LOCAL row shards, inside a shard_map body.

    ``x_loc [..., n_loc, C]`` and ``op`` leaves ``[..., n_loc, K]`` are the
    per-device shards (shard_map slices them); the halo band is exchanged
    with ring ppermute over ``op.fwd.axis``.  Backward multiplies the
    cotangent by the identically partitioned stored transpose.
    """
    return _apply_local(op.fwd, x_loc)


def _pspmm_fwd(op, x_loc):
    return partitioned_spmm(op, x_loc), op


def _pspmm_bwd(op, g):
    x_bar = _apply_local(op.bwd, g)
    return (jax.tree_util.tree_map(jnp.zeros_like, op), x_bar)


partitioned_spmm.defvjp(_pspmm_fwd, _pspmm_bwd)


# ---------------------------------------------------------------------------
# global-array convenience wrappers
# ---------------------------------------------------------------------------


def make_partitioned_spmm(mesh: Mesh, axis: str = "graph"):
    """Build ``pspmm(op, x [N, C]) -> [N, C]`` on GLOBAL arrays, x row-sharded
    on ``axis`` (a single-apply shard_map around :func:`partitioned_spmm`)."""

    def pspmm(op: PartitionedOperator, x):
        fn = jax.shard_map(
            partitioned_spmm,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
        )
        return fn(op, x)

    return pspmm


def shard_partitioned(mesh: Mesh, op: PartitionedOperator, axis: str | None = None):
    """Device-put a PartitionedOperator row-sharded on its mesh axis."""
    axis = axis if axis is not None else op.fwd.axis
    batched = np.ndim(op.fwd.cols) == 3
    spec = P(None, axis) if batched else P(axis)
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), op)


def shard_rows(mesh: Mesh, x, axis: str = "graph"):
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
