"""Edge-partitioned operator sharding with halo exchange.

The mesh-GNN analogue of context/sequence parallelism (SURVEY.md §2.9): one
large mesh's operator rows are partitioned contiguously across devices on
mesh axis 'graph', vertex features are row-sharded, and each SpMM needs only
the *boundary band* of neighbouring partitions.  With RCM vertex ordering
the operator bandwidth is O(sqrt N) (measured 242 at N=7000), so a halo of
a few hundred rows suffices and per-apply communication is O(halo * C) per
device — exchanged with ``jax.lax.ppermute`` between ring neighbours over
ICI, instead of all-gathering the full feature tensor.

Host-side preprocessing (``partition_ell``) splits each partition's rows in
two (the BASELINE north-star structure: "overlapping the exchange with local
neighborhood aggregation"):

* **interior rows** — every nonzero column is inside the partition's own
  band; their ELL table indexes the LOCAL frame ``[0, n_loc)`` and the
  matmul depends only on ``x_loc``, never on the exchange;
* **boundary rows** — at least one column lands in a neighbour's band; they
  are packed into a small side table (``bnd_rows``/``bnd_cols``/``bnd_vals``,
  column indices in the extended frame ``[halo | local | halo]``) whose
  matmul consumes the ppermuted halo and scatter-adds onto the interior
  result.

Device-side the interior matmul has no data dependency on the two
``ppermute``s, so XLA's latency-hiding scheduler runs the halo exchange
concurrently with the bulk of the local aggregation; only the O(halo)
boundary rows wait on the wire.

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
    """Row-sharded ELL split into interior and boundary rows.

    *Interior* table: ``cols[r, k]`` indexes the LOCAL frame ``[0, n_loc)``
    of row r's partition; boundary rows are zeroed out here (cols 0, vals 0)
    so the interior matmul is exact for them too (contributes +0.0).

    *Boundary* table: ``bnd_rows`` holds each boundary row's partition-local
    row index (flat layout ``[n_parts * Mb]`` — partition p owns slice
    ``[p*Mb, (p+1)*Mb)``; padded slots point at row 0 with all-zero vals);
    ``bnd_cols`` indexes the *extended* frame ``[halo | local | halo]`` of
    size ``n_loc + 2*halo``.

    Every array is stored flat over the global row dim (optionally with a
    leading mesh-batch axis) so a single ``P('graph')`` /
    ``P('data', 'graph')`` prefix spec shards all leaves alike.  ``axis`` is
    the mesh axis name the rows are sharded over.
    """

    cols: Any  # int32 [..., N, K] — LOCAL frame, boundary rows zeroed
    vals: Any  # f32 [..., N, K]
    bnd_rows: Any  # int32 [..., n_parts*Mb] — partition-local row indices
    bnd_cols: Any  # int32 [..., n_parts*Mb, K] — extended frame
    bnd_vals: Any  # f32 [..., n_parts*Mb, K]
    # Optional MXU interior (interior_fmt='bsr'): per-partition block-ELL of
    # the interior rows in LOCAL block coordinates.  The interior matmul then
    # rides the batched-MXU path that wins the single-chip bench (~13x over
    # the ELL gather formulation) while the boundary side table stays ELL.
    bsr_cols: Any = None  # int32 [..., N/bs, KB] — LOCAL block frame
    bsr_vals: Any = None  # f32 [..., N/bs, KB, bs, bs]
    halo: int = struct.field(pytree_node=False, default=0)
    n_parts: int = struct.field(pytree_node=False, default=1)
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
    interior_fmt: str = "ell",
    block_size: int = 128,
) -> PartitionedEll:
    """Pack a square operator into interior/boundary row partitions.

    Requires the (reordered) matrix bandwidth to be <= halo; raises otherwise.
    Rows whose every nonzero stays inside their own partition band go into
    the interior table (local-frame columns, exchange-independent); the rest
    go into the boundary side table (extended-frame columns).

    ``interior_fmt='bsr'`` additionally packs each partition's interior into
    LOCAL-frame block-ELL (``block_size`` x ``block_size`` MXU tiles) so the
    interior matmul runs on the MXU; requires the partition size to be a
    multiple of ``block_size``.
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
    row_of = np.repeat(np.arange(N), deg)
    slot = np.arange(csr.indptr[-1]) - np.repeat(csr.indptr[:-1], deg)
    part = row_of // n_loc
    ext_col = csr.indices - part * n_loc + halo  # extended-frame column
    assert (ext_col >= 0).all() and (ext_col < n_loc + 2 * halo).all()

    # full-row ELL in extended coordinates (the boundary table's layout)
    ext_cols = np.zeros((N, k), dtype=np.int32)
    ext_vals = np.zeros((N, k), dtype=np.float32)
    ext_cols[row_of, slot] = ext_col
    ext_vals[row_of, slot] = csr.data

    # boundary = any entry outside the local band [halo, halo + n_loc)
    is_bnd = np.zeros(N, dtype=bool)
    remote = (ext_col < halo) | (ext_col >= halo + n_loc)
    is_bnd[row_of[remote]] = True

    # interior table: local-frame columns; boundary rows zeroed (contribute
    # exactly +0.0, keeping the split bitwise-faithful to the fused apply)
    cols = np.where(is_bnd[:, None], 0, np.maximum(ext_cols - halo, 0)).astype(np.int32)
    cols = np.where(ext_vals == 0, 0, cols)  # dead slots stay in bounds
    vals = np.where(is_bnd[:, None], 0.0, ext_vals).astype(np.float32)

    # boundary side table, Mb rows per partition (shared static width)
    per_part = is_bnd.reshape(n_parts, n_loc)
    mb = int(per_part.sum(axis=1).max(initial=0))
    mb = min(_round_up_int(mb, 8), n_loc) if mb else 0
    bnd_rows = np.zeros((n_parts, mb), dtype=np.int32)
    bnd_cols = np.zeros((n_parts, mb, k), dtype=np.int32)
    bnd_vals = np.zeros((n_parts, mb, k), dtype=np.float32)
    for p in range(n_parts):
        rloc = np.nonzero(per_part[p])[0]
        bnd_rows[p, : rloc.size] = rloc
        bnd_cols[p, : rloc.size] = ext_cols[p * n_loc + rloc]
        bnd_vals[p, : rloc.size] = ext_vals[p * n_loc + rloc]

    bsr_cols = bsr_vals = None
    if interior_fmt == "bsr":
        from surfacenetworks_tpu.sparse.bsr import bsr_from_scipy

        if n_loc % block_size:
            raise ValueError(
                f"interior_fmt='bsr' needs partition size {n_loc} divisible by "
                f"block size {block_size}"
            )
        # per-partition interior matrix in LOCAL coordinates (boundary rows
        # are all-zero here, matching the ELL interior exactly)
        mats = []
        for p in range(n_parts):
            rows = np.repeat(np.arange(n_loc), k)
            pc = cols[p * n_loc : (p + 1) * n_loc].reshape(-1)
            pv = vals[p * n_loc : (p + 1) * n_loc].reshape(-1)
            keep = pv != 0
            mats.append(
                sp.coo_matrix((pv[keep], (rows[keep], pc[keep])), shape=(n_loc, n_loc)).tocsr()
            )
        packed = [bsr_from_scipy(m, block_size=block_size) for m in mats]
        kb = max(pm.block_cols.shape[-1] for pm in packed)
        packed = [bsr_from_scipy(m, block_size=block_size, k=kb) for m in mats]
        bsr_cols = np.concatenate([pm.block_cols for pm in packed], axis=0)
        bsr_vals = np.concatenate([pm.block_vals for pm in packed], axis=0)
    elif interior_fmt != "ell":
        raise ValueError(f"unknown interior_fmt {interior_fmt!r}")

    return PartitionedEll(
        cols=cols,
        vals=vals,
        bnd_rows=bnd_rows.reshape(n_parts * mb),
        bnd_cols=bnd_cols.reshape(n_parts * mb, k),
        bnd_vals=bnd_vals.reshape(n_parts * mb, k),
        bsr_cols=bsr_cols,
        bsr_vals=bsr_vals,
        halo=halo,
        n_parts=n_parts,
        axis=axis,
    )


def _round_up_int(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def partition_operator(
    M: sp.spmatrix,
    n_parts: int,
    halo: int,
    k: int = 16,
    n_rows: int | None = None,
    axis: str = "graph",
    interior_fmt: str = "ell",
    block_size: int = 128,
) -> PartitionedOperator:
    return PartitionedOperator(
        fwd=partition_ell(M, n_parts, halo, k, n_rows, axis, interior_fmt, block_size),
        bwd=partition_ell(
            M.T.tocsr(), n_parts, halo, k, n_rows, axis, interior_fmt, block_size
        ),
    )


def _repad_bnd(arr: np.ndarray, n_parts: int, mb: int) -> np.ndarray:
    """Re-pad a flat per-partition boundary array [n_parts*mb_old, ...] to a
    new per-partition width mb (zero-padded at each partition's tail)."""
    mb_old = arr.shape[0] // n_parts
    if mb_old == mb:
        return arr
    out = np.zeros((n_parts, mb) + arr.shape[1:], dtype=arr.dtype)
    out[:, :mb_old] = arr.reshape((n_parts, mb_old) + arr.shape[1:])
    return out.reshape((n_parts * mb,) + arr.shape[1:])


def stack_partitioned(
    ops: list[PartitionedOperator], min_mb: int = 0, min_kb: int = 0
) -> PartitionedOperator:
    """Batch per-mesh partitioned operators along a new leading axis (all
    must share halo / n_parts / padded shape; boundary tables are re-padded
    to the widest member).  ``min_mb`` / ``min_kb`` floor the boundary width
    and the BSR-interior block width so different batches over one dataset
    stack to identical shapes (one jit compilation)."""

    def stack_ell(ms: list[PartitionedEll]) -> PartitionedEll:
        assert all(m.halo == ms[0].halo and m.n_parts == ms[0].n_parts for m in ms)
        n_parts = ms[0].n_parts
        mb = max(min_mb, max(m.bnd_rows.shape[0] // n_parts for m in ms))
        bsr_cols = bsr_vals = None
        if ms[0].bsr_vals is not None:
            kb = max(min_kb, max(m.bsr_cols.shape[-1] for m in ms))

            def pad_kb(a, fill_shape):
                pad = [(0, 0)] * a.ndim
                pad[1] = (0, kb - a.shape[1])
                return np.pad(a, pad)

            bsr_cols = np.stack([pad_kb(np.asarray(m.bsr_cols), kb) for m in ms])
            bsr_vals = np.stack([pad_kb(np.asarray(m.bsr_vals), kb) for m in ms])
        return PartitionedEll(
            cols=np.stack([m.cols for m in ms]),
            vals=np.stack([m.vals for m in ms]),
            bnd_rows=np.stack([_repad_bnd(np.asarray(m.bnd_rows), n_parts, mb) for m in ms]),
            bnd_cols=np.stack([_repad_bnd(np.asarray(m.bnd_cols), n_parts, mb) for m in ms]),
            bnd_vals=np.stack([_repad_bnd(np.asarray(m.bnd_vals), n_parts, mb) for m in ms]),
            bsr_cols=bsr_cols,
            bsr_vals=bsr_vals,
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


def _scatter_add_rows(y, rows, upd):
    """y[..., rows[i], :] += upd[..., i, :] (batched via vmap)."""
    if rows.ndim == 1:
        return y.at[rows].add(upd)
    return jax.vmap(_scatter_add_rows)(y, rows, upd)


def _bsr_local(bcols, bvals, x_loc):
    from surfacenetworks_tpu.sparse.bsr import _bsr_matmul_xla

    if bcols.ndim == 2:
        return _bsr_matmul_xla(bcols, bvals, x_loc)
    assert bcols.ndim == 3 and x_loc.ndim == 3
    return jax.vmap(_bsr_matmul_xla)(bcols, bvals, x_loc)


def _apply_local(m: PartitionedEll, x_loc: jnp.ndarray) -> jnp.ndarray:
    """Interior/boundary split apply — the overlap structure.

    The interior matmul consumes only ``x_loc`` and carries no data
    dependency on the two ``ppermute``s, so XLA's latency-hiding scheduler
    issues collective-permute-start, runs the interior rows, and only the
    small boundary matmul sits behind collective-permute-done.  Numerically
    the split is exact: boundary rows contribute +0.0 in the interior table
    and are summed in their original slot order in the boundary table.

    With a BSR interior (``interior_fmt='bsr'``) the interior runs on the
    MXU via the batched block matmul instead of the ELL gather.
    """
    if m.bsr_vals is not None:
        y = _bsr_local(m.bsr_cols, m.bsr_vals, x_loc)
    else:
        y = _ell_local(m.cols, m.vals, x_loc)
    if m.halo == 0 or m.bnd_rows.shape[-1] == 0:
        return y
    x_ext = _halo_exchange(x_loc, m.halo, m.axis)
    y_bnd = _ell_local(m.bnd_cols, m.bnd_vals, x_ext)
    return _scatter_add_rows(y, m.bnd_rows, y_bnd)


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
    # dtype witness: under mixed precision x_loc may be bf16 while the
    # fp32-stored operator makes the forward fp32; the cotangent is cast
    # back to the primal dtype (mirrors sparse/ops.py spmm).
    return partitioned_spmm(op, x_loc), (op, jnp.zeros((0,), x_loc.dtype))


def _pspmm_bwd(res, g):
    op, wit = res
    x_bar = _apply_local(op.bwd, g).astype(wit.dtype)
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
    """Place a PartitionedOperator row-sharded on its mesh axis (multi-host
    aware via ``put_global``)."""
    from surfacenetworks_tpu.dist.mesh_setup import put_global

    axis = axis if axis is not None else op.fwd.axis
    batched = np.ndim(op.fwd.cols) == 3
    spec = P(None, axis) if batched else P(axis)
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), op)


def shard_rows(mesh: Mesh, x, axis: str = "graph"):
    from surfacenetworks_tpu.dist.mesh_setup import put_global

    return put_global(x, NamedSharding(mesh, P(axis)))
