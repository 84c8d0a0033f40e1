"""Residual message-passing blocks (Surface Networks op set).

Every block keeps the reference signature shape ``block(op, mask, x)``
(Dirac: ``block(dirac_op, v, f)``), reference ``src/utils/utils_pt.py:124-263``:

* ``LapResNet2``      — x -> ELU -> [x ‖ L x] -> conv(2d->d,'pre') twice, + input.
* ``AvgResNet2``      — neighborhood op replaced by the masked global average.
* ``DirResNet2``      — vertex+face features coupled through the Dirac pair in
  quaternion layout; face stream has no residual by default.
* ``MlpResNet2``      — pointwise only (BN -> ELU -> Linear twice, + input).
* ``IdResNet2``       — neighborhood op replaced by identity (ablation;
  reference normal_predict/models.py:324-345).
* ``GatResNet2``      — masked multi-head attention over the operator's ELL
  pattern (revives the reference's dead GAT baseline, models.py:85-124).
* ``WideLapResNet2`` / ``WideAvgResNet2`` — width-changing generalizations
  with configurable inner layer count and the channel-truncating/doubling
  residual (reference ``_LapResNet2``/``_AvgResNet2``,
  normal_predict/models.py:418-477).

The ``op`` argument is polymorphic (dispatch in ``apply_operator``):
a batched ``EllOperator``, a dense ``[B, N, N]`` array (the reference's
``--dense`` paths / DenseLapResNet2), or any callable ``x -> Lx``.
"""

from __future__ import annotations

import functools
import sys
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surfacenetworks_tpu.nn.layers import GraphBatchNorm, GraphConv1x1, global_average
from surfacenetworks_tpu.sparse.bsr import BsrOperator, bsr_spmm
from surfacenetworks_tpu.sparse.ell import DiracOperator, EllOperator
from surfacenetworks_tpu.sparse.ops import (
    dense_bmm,
    dirac_apply_fv,
    dirac_apply_vf,
    spmm,
)


def _edge_partition_module():
    # A PartitionedOperator instance can only exist if its module is already
    # imported; checking sys.modules keeps nn free of a hard dist dependency.
    return sys.modules.get("surfacenetworks_tpu.dist.edge_partition")


def _dirac_partition_module():
    return sys.modules.get("surfacenetworks_tpu.dist.dirac_partition")


def apply_operator(op: Any, x: jnp.ndarray) -> jnp.ndarray:
    """Dispatch ``L @ x`` over the supported operator representations.

    ``PartitionedOperator`` (edge-partitioned row shards) dispatches to the
    halo-exchange SpMM — valid only inside a graph-sharded shard_map body
    (``dist.graph_parallel.make_graph_sharded_apply``), where ``x`` is the
    local row shard.
    """
    if isinstance(op, EllOperator):
        return spmm(op, x)
    if isinstance(op, BsrOperator):
        return bsr_spmm(op, x)
    ep = _edge_partition_module()
    if ep is not None and isinstance(op, ep.PartitionedOperator):
        return ep.partitioned_spmm(op, x)
    if callable(op) and not isinstance(op, jnp.ndarray):
        return op(x)
    return dense_bmm(op, x)


def apply_dirac_vf(op: Any, v: jnp.ndarray) -> jnp.ndarray:
    """``Di @ v`` (vertices -> faces) for structured / ELL / dense operators.

    ``PartitionedDirac`` (edge-partitioned row shards) dispatches to the
    halo-exchange apply — valid only inside a graph-sharded shard_map body,
    where ``v`` is the local vertex-row shard.
    """
    if isinstance(op, DiracOperator):
        return dirac_apply_vf(op, v)
    dp = _dirac_partition_module()
    if dp is not None and isinstance(op, dp.PartitionedDirac):
        return dp.partitioned_dirac_vf(op, v)
    di, _ = op
    *lead, n, c = v.shape
    vq = v.reshape(*lead, n * 4, c // 4)
    if isinstance(di, EllOperator):
        out = spmm(di, vq)
    else:
        out = dense_bmm(di, vq)
    m4 = out.shape[-2]
    return out.reshape(*lead, m4 // 4, c)


def apply_dirac_fv(op: Any, f: jnp.ndarray) -> jnp.ndarray:
    """``DiA @ f`` (faces -> vertices)."""
    if isinstance(op, DiracOperator):
        return dirac_apply_fv(op, f)
    dp = _dirac_partition_module()
    if dp is not None and isinstance(op, dp.PartitionedDirac):
        return dp.partitioned_dirac_fv(op, f)
    _, dia = op
    *lead, m, c = f.shape
    fq = f.reshape(*lead, m * 4, c // 4)
    if isinstance(dia, EllOperator):
        out = spmm(dia, fq)
    else:
        out = dense_bmm(dia, fq)
    n4 = out.shape[-2]
    return out.reshape(*lead, n4 // 4, c)


def dirac_num_faces(op) -> int:
    """Face count of a Dirac operator: structured table or dense (Di, DiA)
    pair.  For a ``PartitionedDirac`` inside a shard_map body this is the
    LOCAL face-shard size — exactly what the zero-initialized face stream
    needs there."""
    if isinstance(op, DiracOperator):
        return op.faces.shape[-2]
    dp = _dirac_partition_module()
    if dp is not None and isinstance(op, dp.PartitionedDirac):
        return op.faces.shape[-2]
    di, _ = op
    return di.shape[-2] // 4


def _cat_op(x: jnp.ndarray, ox: jnp.ndarray) -> jnp.ndarray:
    """Concat [x || Op x] in the *wider* of the two dtypes.

    Under mixed precision x is bf16 but the operator result arrives fp32
    (fp32-stored operator values, fp32 accumulation); rounding it to bf16
    before the 'pre' BatchNorm amplifies the rounding by |mean|/std per
    channel — raw Laplacian channels reach ~100x.  Promoting the concat keeps
    BN statistics full-precision; the following Dense casts back down.
    fp32-everything callers see exact reference numerics (both sides fp32).
    """
    dt = jnp.promote_types(x.dtype, ox.dtype)
    return jnp.concatenate([x.astype(dt), ox.astype(dt)], axis=-1)


def _bn_mode(bnmode: str | None) -> str | None:
    """Reference convention: bnmode '' -> 'pre'; None -> no norm; other strings
    pass through (and unknown strings disable norm inside GraphConv1x1)."""
    if bnmode is None:
        return None
    return bnmode + "pre"


class LapResNet2(nn.Module):
    """Two-step Laplacian residual block (utils_pt.py:151-180)."""

    features: int
    bnmode: str | None = ""
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = nn.elu(inputs)
        x = _cat_op(x, apply_operator(op, x))
        x = GraphConv1x1(2 * self.features, self.features, _bn_mode(self.bnmode), dtype=self.dtype, name="bn_fc0")(x)
        x = nn.elu(x)
        x = _cat_op(x, apply_operator(op, x))
        x = GraphConv1x1(2 * self.features, self.features, _bn_mode(self.bnmode), dtype=self.dtype, name="bn_fc1")(x)
        return x + inputs


class AvgResNet2(nn.Module):
    """Global-average residual block (utils_pt.py:222-243)."""

    features: int
    bnmode: str | None = ""
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = nn.elu(inputs)
        avg = jnp.broadcast_to(global_average(x, mask), x.shape)
        x = jnp.concatenate([x, avg], axis=-1)
        x = GraphConv1x1(2 * self.features, self.features, _bn_mode(self.bnmode), dtype=self.dtype, name="bn_fc0")(x)
        x = nn.elu(x)
        avg = jnp.broadcast_to(global_average(x, mask), x.shape)
        x = jnp.concatenate([x, avg], axis=-1)
        x = GraphConv1x1(2 * self.features, self.features, _bn_mode(self.bnmode), dtype=self.dtype, name="bn_fc1")(x)
        return x + inputs


def _gat_attend_banded(cols, vals, xh, s_src, s_dst, window: int,
                       negative_slope: float, precision=None):
    """Banded-window attention: the SDDMM design applied to GAT (round-5).

    Per aligned 128-row tile, all neighbor columns lie in
    ``[base, base + window)`` (the pallas-ELL band convention,
    EllMatrix.window), so instead of per-slot HBM gathers the tile (1)
    dynamic-slices the ``[W, H*ch + H]`` payload band (features + dst
    scores ride together), (2) broadcasts the additive scores over the
    whole band, (3) softmaxes over the band with ``-1e9`` at non-neighbor
    positions — identical to the slot softmax (same finite support) — and
    (4) aggregates with ONE MXU einsum ``A [tile, W] x band [W, ch]`` per
    head.  No HBM gather anywhere; the backward comes from autodiff over
    the same banded dataflow.  Measured at 7k/RCM (W=640, H=4, C=128):
    fwd+bwd 1.37 ms vs 3.47 ms for the gather formulation (2.5x);
    ``precision=HIGHEST`` is exact vs the gather path (2.7e-7) at 1.65 ms
    (2.1x) — default MXU precision differs by ~3e-3 from bf16 rounding of
    the aggregation matmul.
    """
    import jax

    N, H, ch = xh.shape
    C = H * ch
    TR = 128
    K = cols.shape[1]
    Np = (N + TR - 1) // TR * TR
    payload = jnp.concatenate([xh.reshape(N, C), s_dst], axis=-1)
    if Np != N:
        cols = jnp.pad(cols, ((0, Np - N), (0, 0)))
        vals = jnp.pad(vals, ((0, Np - N), (0, 0)))
        payload = jnp.pad(payload, ((0, Np - N), (0, 0)))
    W = min(int(window), Np)
    T = Np // TR
    colsT = cols.reshape(T, TR, K)
    valsT = vals.reshape(T, TR, K)
    base = jnp.min(jnp.where(valsT != 0, colsT, Np), axis=(1, 2))
    base = jnp.clip((base // 8) * 8, 0, Np - W)
    bands = jnp.stack([
        jax.lax.dynamic_slice(payload, (base[t], 0), (W, C + H))
        for t in range(T)
    ])  # [T, W, C+H]
    xb = bands[..., :C].reshape(T, W, H, ch)
    sdb = bands[..., C:]  # [T, W, H]
    rel = colsT - base[:, None, None]
    iota = jnp.arange(W)
    adj = jnp.zeros((T, TR, W), jnp.bool_)
    for k in range(K):
        adj = adj | ((rel[:, :, k, None] == iota) & (valsT[:, :, k, None] != 0))
    ss = s_src
    if Np != N:
        ss = jnp.pad(ss, ((0, Np - N), (0, 0)))
    e = jax.nn.leaky_relu(
        ss.reshape(T, TR, 1, H) + sdb[:, None, :, :], negative_slope
    )  # [T, TR, W, H]
    e = jnp.where(adj[..., None], e, -1e9)
    A = jax.nn.softmax(e, axis=2)
    out = jnp.einsum("trwh,twhc->trhc", A, xb, precision=precision)
    out = out.reshape(Np, H, ch)[:N]
    row_valid = (vals[:N] != 0).any(axis=1)
    return out * row_valid[:, None, None]


# banded attention needs the band resident per tile; past this width the
# score tensor [T, 128, W, H] outgrows the gather formulation's traffic
_GAT_BANDED_MAX_WINDOW = 2048


def _gat_slots_attend(cols, vals, payload, s_src, H, ch, negative_slope):
    """Gather-formulation attention core over an explicit payload frame.

    ``cols [R, K]`` indexes ``payload [Nf, H*ch + H]`` (features + dst
    scores); ``s_src [R, H]`` is row-aligned.  One gather per slot (scores
    ride with the features — halves the gather-issue count); masked softmax
    over the K slots; rows with no valid slot return zero.
    """
    import jax

    R, K = cols.shape
    gathered = []
    scores = []
    for k in range(K):
        g = jnp.take(payload, cols[:, k], axis=0)
        gathered.append(g[:, : H * ch])
        e_k = jax.nn.leaky_relu(s_src + g[:, H * ch:], negative_slope)
        scores.append(jnp.where(vals[:, k: k + 1] != 0, e_k, -1e9))
    E = jnp.stack(scores, axis=1)  # [R, K, H]
    A = jax.nn.softmax(E, axis=1)
    out = jnp.zeros((R, H, ch), payload.dtype)
    for k in range(K):
        out = out + A[:, k, :, None] * gathered[k].reshape(R, H, ch)
    row_valid = (vals != 0).any(axis=1)
    return out * row_valid[:, None, None]


def _gat_attend_partitioned(pop, xh, s_src, s_dst, negative_slope):
    """Row-partitioned attention inside a graph-sharded shard_map body
    (closes the round-4 'GAT cannot run edge-partitioned' gap).

    The PartitionedEll split is softmax-exact for attention: every row's
    COMPLETE slot list lives in exactly one table — interior rows in the
    local-frame table (boundary rows zeroed there), boundary rows in the
    extended-frame side table — so a per-table masked softmax IS the row's
    neighbor softmax.  The payload (features + dst scores) halo-exchanges
    once per attend (ring ppermute, the same wire pattern as the SpMM);
    boundary outputs scatter into the zeroed interior slots.  Gradients are
    plain autodiff through the gathers and the ppermute.  Uses the gather
    formulation (partition-local column frames carry no banded-window
    bound).
    """
    import jax

    from surfacenetworks_tpu.dist import edge_partition as ep

    m = pop.fwd
    H, ch = xh.shape[-2], xh.shape[-1]
    N = xh.shape[-3]
    payload = jnp.concatenate(
        [xh.reshape(xh.shape[:-3] + (N, H * ch)), s_dst], axis=-1
    )
    has_bnd = bool(m.halo) and m.bnd_rows.shape[-1] > 0
    pext = ep._halo_exchange(payload, m.halo, m.axis) if has_bnd else payload

    def one(cols, vals, payload, pext, s_src, bnd_rows, bnd_cols, bnd_vals):
        out = _gat_slots_attend(cols, vals, payload, s_src, H, ch, negative_slope)
        if has_bnd:
            out_b = _gat_slots_attend(
                bnd_cols, bnd_vals, pext, s_src[bnd_rows], H, ch, negative_slope
            )
            out = out.at[bnd_rows].add(out_b)
        return out

    if m.cols.ndim == 2:
        return one(
            m.cols, m.vals, payload, pext, s_src, m.bnd_rows, m.bnd_cols, m.bnd_vals
        )
    return jax.vmap(one)(
        m.cols, m.vals, payload, pext, s_src, m.bnd_rows, m.bnd_cols, m.bnd_vals
    )


def gat_attend(op, xh, s_src, s_dst, negative_slope: float = 0.2,
               force_gather: bool = False, precision=None):
    """Masked multi-head graph attention over the operator's ELL pattern.

    The reference ships a dead ``GatDeepModel`` (needs the absent ``pygat``
    package, normal_predict/models.py:85-124); this is the revived TPU-native
    aggregation: per-slot additive scores
    ``e[r, k] = leaky_relu(s_src[r] + s_dst[cols[r, k]])`` (the standard GAT
    decomposition — no pairwise matrix), masked softmax over the row's valid
    slots (padding slots carry vals == 0), then an attention-weighted
    neighbor aggregation.

    Two implementations, dispatched on the operator's static banded bound:
    * ``window > 0`` (RCM-ordered pack): :func:`_gat_attend_banded` —
      band-resident scores + MXU aggregation, no HBM gathers (2.5x the
      gather path fwd+bwd at the 7k flagship shape);
    * ``window == 0`` or ``force_gather``: per-slot payload gathers, the
      slot axis unrolled like the Dirac applies (sparse/ops.py
      ``_dirac_gather_apply``).

    ``xh [N, H, Ch]``, ``s_src``/``s_dst`` ``[N, H]`` -> ``[N, H, Ch]``.
    """
    import jax

    ep = _edge_partition_module()
    if ep is not None and isinstance(op, ep.PartitionedOperator):
        return _gat_attend_partitioned(op, xh, s_src, s_dst, negative_slope)
    m = op.fwd if isinstance(op, EllOperator) else None
    if m is None:
        raise TypeError("gat_attend needs an EllOperator (pattern source)")
    if (not force_gather) and 0 < m.window <= _GAT_BANDED_MAX_WINDOW:
        fn = functools.partial(
            _gat_attend_banded, window=m.window,
            negative_slope=negative_slope, precision=precision,
        )
        if m.cols.ndim == 2:
            return fn(m.cols, m.vals, xh, s_src, s_dst)
        return jax.vmap(lambda c, v, x, ss, sd: fn(c, v, x, ss, sd))(
            m.cols, m.vals, xh, s_src, s_dst
        )

    def single(cols, vals, xh, s_src, s_dst):
        N, H, ch = xh.shape
        # ONE gather per slot: the destination scores ride along with the
        # features ([N, H*ch + H] rows, full-lane width) instead of a second
        # narrow [N, H] gather — halves the gather-issue count, which is
        # what bounds this formulation (same model as the Dirac applies).
        # Rows with NO valid slot (bucket padding) return zero so padded
        # rows stay inert like the Lap/Avg operator rows.
        payload = jnp.concatenate([xh.reshape(N, H * ch), s_dst], axis=-1)
        return _gat_slots_attend(cols, vals, payload, s_src, H, ch, negative_slope)

    if m.cols.ndim == 2:
        return single(m.cols, m.vals, xh, s_src, s_dst)
    return jax.vmap(single)(m.cols, m.vals, xh, s_src, s_dst)


class GatResNet2(nn.Module):
    """Graph-attention residual block — the LapResNet2 scheme with the
    Laplacian apply replaced by masked multi-head attention over the same
    neighborhood pattern (revives the reference's dead GAT baseline,
    normal_predict/models.py:85-124, without pygat)."""

    features: int
    heads: int = 4
    bnmode: str | None = ""
    dtype: Any = None

    def _attend(self, op, x, name):
        H = self.heads
        C = x.shape[-1]
        assert C % H == 0, (C, H)
        ch = C // H
        a_src = self.param(f"{name}_a_src", nn.initializers.glorot_uniform(), (H, ch))
        a_dst = self.param(f"{name}_a_dst", nn.initializers.glorot_uniform(), (H, ch))
        xh = x.reshape(x.shape[:-1] + (H, ch))
        s_src = jnp.einsum("...hc,hc->...h", xh, a_src)
        s_dst = jnp.einsum("...hc,hc->...h", xh, a_dst)
        out = gat_attend(op, xh, s_src, s_dst)
        return out.reshape(x.shape)

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = nn.elu(inputs)
        x = _cat_op(x, self._attend(op, x, "att0"))
        x = GraphConv1x1(2 * self.features, self.features, _bn_mode(self.bnmode), dtype=self.dtype, name="bn_fc0")(x)
        x = nn.elu(x)
        x = _cat_op(x, self._attend(op, x, "att1"))
        x = GraphConv1x1(2 * self.features, self.features, _bn_mode(self.bnmode), dtype=self.dtype, name="bn_fc1")(x)
        return x + inputs


class IdResNet2(nn.Module):
    """Identity-op ablation block (normal_predict/models.py:324-345)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = nn.elu(inputs)
        x = jnp.concatenate([x, x], axis=-1)
        x = GraphConv1x1(2 * self.features, self.features, "pre", dtype=self.dtype, name="bn_fc0")(x)
        x = nn.elu(x)
        x = jnp.concatenate([x, x], axis=-1)
        x = GraphConv1x1(2 * self.features, self.features, "pre", dtype=self.dtype, name="bn_fc1")(x)
        return x + inputs


class MlpResNet2(nn.Module):
    """Pointwise residual block (utils_pt.py:245-263)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphBatchNorm(self.features, name="bn0")(inputs)
        x = nn.elu(x)
        x = GraphConv1x1(self.features, self.features, None, dtype=self.dtype, name="fc0")(x)
        x = GraphBatchNorm(self.features, name="bn1")(x)
        x = nn.elu(x)
        x = GraphConv1x1(self.features, self.features, None, dtype=self.dtype, name="fc1")(x)
        return x + inputs


class DirResNet2(nn.Module):
    """Dirac residual block over coupled vertex/face streams (utils_pt.py:182-220).

    ``__call__(op, v, f) -> (v + v', f')``; channels must be divisible by 4
    (quaternion layout).  ``res_f=True`` adds a face residual (reference flag,
    default off).
    """

    features: int
    res_f: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, op, v, f):
        x_in, f_in = nn.elu(v), nn.elu(f)
        x = apply_dirac_vf(op, x_in)
        dt = jnp.promote_types(f_in.dtype, x.dtype)
        x = jnp.concatenate([f_in.astype(dt), x.astype(dt)], axis=-1)
        x = GraphConv1x1(2 * self.features, self.features, "pre", dtype=self.dtype, name="bn_fc0")(x)
        f_out = x

        x = nn.elu(x)
        x = apply_dirac_fv(op, x)
        dt = jnp.promote_types(x_in.dtype, x.dtype)
        x = jnp.concatenate([x_in.astype(dt), x.astype(dt)], axis=-1)
        x = GraphConv1x1(2 * self.features, self.features, "pre", dtype=self.dtype, name="bn_fc1")(x)
        v_out = x

        if self.res_f:
            f_out = f + f_out
        return v + v_out, f_out


class WideLapResNet2(nn.Module):
    """Width-changing Laplacian block with ``inner_layers`` steps and a
    truncating/doubling residual (normal_predict/models.py:447-477)."""

    num_inputs: int
    num_outputs: int | None = None
    bnmode: str | None = ""
    inner_layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        num_outputs = self.num_outputs if self.num_outputs is not None else self.num_inputs
        x = inputs
        widths_in = [self.num_inputs] + [num_outputs] * (self.inner_layers - 1)
        for i in range(self.inner_layers):
            x = nn.elu(x)
            x = _cat_op(x, apply_operator(op, x))
            x = GraphConv1x1(
                2 * widths_in[i], num_outputs, _bn_mode(self.bnmode), dtype=self.dtype, name=f"bn_fc{i}"
            )(x)
        if num_outputs <= inputs.shape[-1]:
            return x + inputs[..., :num_outputs]
        return x + jnp.concatenate([inputs] * 2, axis=-1)


class WideAvgResNet2(nn.Module):
    """Width-changing Avg block (normal_predict/models.py:418-444)."""

    num_inputs: int
    num_outputs: int | None = None
    bnmode: str | None = ""
    inner_layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        num_outputs = self.num_outputs if self.num_outputs is not None else self.num_inputs
        x = inputs
        widths_in = [self.num_inputs] + [num_outputs] * (self.inner_layers - 1)
        for i in range(self.inner_layers):
            x = nn.elu(x)
            avg = jnp.broadcast_to(global_average(x, mask), x.shape)
            x = jnp.concatenate([x, avg], axis=-1)
            x = GraphConv1x1(
                2 * widths_in[i], num_outputs, _bn_mode(self.bnmode), dtype=self.dtype, name=f"bn_fc{i}"
            )(x)
        if num_outputs <= inputs.shape[-1]:
            return x + inputs[..., :num_outputs]
        return x + jnp.concatenate([inputs] * 2, axis=-1)


# DenseLapResNet2 is LapResNet2 with a dense operator — apply_operator already
# dispatches on the operator type, so one module covers both reference classes
# (utils_pt.py:124-148 and :151-180).
DenseLapResNet2 = LapResNet2
