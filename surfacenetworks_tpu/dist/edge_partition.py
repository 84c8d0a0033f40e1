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
indices into its own partition's extended frame [halo | local | halo]; the
device function is a ``shard_map`` whose custom VJP multiplies by the
identically partitioned stored transpose (operators get no gradient).
"""

from __future__ import annotations

import functools
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
    ``part(r)*n_loc - halo``).  Arrays are stored flat [N, K] so the same
    P('graph') sharding as the features applies.
    """

    cols: Any  # int32 [N, K]
    vals: Any  # f32 [N, K]
    halo: int = struct.field(pytree_node=False)
    n_parts: int = struct.field(pytree_node=False)


@struct.dataclass
class PartitionedOperator:
    fwd: PartitionedEll
    bwd: PartitionedEll


def partition_ell(
    M: sp.spmatrix,
    n_parts: int,
    halo: int,
    k: int = 16,
    n_rows: int | None = None,
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
    coo = Mp.tocoo()
    if coo.nnz:
        bw = int(np.abs(coo.row - coo.col).max())
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
    return PartitionedEll(cols=cols, vals=vals, halo=halo, n_parts=n_parts)


def partition_operator(
    M: sp.spmatrix, n_parts: int, halo: int, k: int = 16, n_rows: int | None = None
) -> PartitionedOperator:
    return PartitionedOperator(
        fwd=partition_ell(M, n_parts, halo, k, n_rows),
        bwd=partition_ell(M.T.tocsr(), n_parts, halo, k, n_rows),
    )


def _halo_exchange(x_loc: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Extended frame [from-left | local | from-right] via ring ppermute;
    boundary devices receive zeros."""
    n_dev = jax.lax.axis_size(axis)
    from_left = jax.lax.ppermute(
        x_loc[-halo:], axis, perm=[(i, i + 1) for i in range(n_dev - 1)]
    )
    from_right = jax.lax.ppermute(
        x_loc[:halo], axis, perm=[(i + 1, i) for i in range(n_dev - 1)]
    )
    return jnp.concatenate([from_left, x_loc, from_right], axis=0)


def make_partitioned_spmm(mesh: Mesh, axis: str = "graph"):
    """Build ``pspmm(op, x [N, C]) -> [N, C]`` with x row-sharded on ``axis``."""

    def _local_apply(halo, cols, vals, x_loc):
        x_ext = _halo_exchange(x_loc, halo, axis)
        return _ell_matmul_xla(cols, vals, x_ext)

    def _sharded(m: PartitionedEll, x):
        fn = jax.shard_map(
            functools.partial(_local_apply, m.halo),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
        return fn(m.cols, m.vals, x)

    @jax.custom_vjp
    def pspmm(op: PartitionedOperator, x):
        return _sharded(op.fwd, x)

    def _fwd(op, x):
        return pspmm(op, x), op

    def _bwd(op, g):
        x_bar = _sharded(op.bwd, g)
        return (jax.tree_util.tree_map(jnp.zeros_like, op), x_bar)

    pspmm.defvjp(_fwd, _bwd)
    return pspmm


def shard_partitioned(mesh: Mesh, op: PartitionedOperator, axis: str = "graph"):
    """Device-put a PartitionedOperator row-sharded on ``axis``."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), op)


def shard_rows(mesh: Mesh, x, axis: str = "graph"):
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
