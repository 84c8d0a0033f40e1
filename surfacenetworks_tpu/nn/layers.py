"""Core neural layers: GraphConv1x1, graph batch-norm, masked global average.

Parity targets (reference ``src/utils/utils_pt.py``):

* ``GraphConv1x1``    — per-vertex Linear on ``[B, N, C]`` with optional
  BatchNorm before ('pre') or after ('post') the Linear (utils_pt.py:76-104).
* ``GraphBatchNorm``  — BatchNorm1d over the flattened ``B*N`` rows, forced to
  train mode always (utils_pt.py:107-118).  The reference normalizes over
  *all* rows including zero padding — padding leaks into the statistics.
  That behaviour is reproduced by default for parity; ``masked=True`` opts
  into mask-aware statistics (a fix the reference lacks).
* ``global_average``  — masked mean over the vertex axis, keepdim
  (utils_pt.py:120-122).

BatchNorm here has no running statistics on purpose: the reference keeps BN
in training mode even during evaluation ("BatchNorm for some reasons is not
stable in eval", mesh_mnist/main.py:180-183), so batch statistics are the
only statistics that ever matter.  This makes every layer a pure function —
jit/pjit-friendly with no mutable state.

Mixed precision: every layer takes flax's conventional ``dtype`` attribute
(the *computation* dtype; params always stay float32).  ``dtype=None``
(default) reproduces float32 reference numerics bit-for-bit.
``dtype=jnp.bfloat16`` runs matmuls and activations in bf16 — the MXU's
native input width, and half the HBM traffic on the bandwidth-bound
elementwise chain — while reductions that are numerically fragile at bf16
(batch-norm statistics, global averages) are computed in float32 and cast
back.  Losses upcast to float32 at their entry, so the only bf16 effects are
rounded activations (~2e-3 relative).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from surfacenetworks_tpu import parallel_context


def global_average(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the vertex axis, keepdim. ``x [B,N,C]``, ``mask [B,N,1]``.

    Inside a graph-sharded body (``parallel_context.sharded_axes``) the vertex
    axis is a device shard; the masked sums are psummed over that mesh axis so
    every shard sees the mesh-global average.
    """
    # vertex-axis sums run at >= fp32 even under bf16 (and stay f64 under x64)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(acc_dtype)
    mf = mask.astype(acc_dtype)
    num = jnp.sum(xf * mf, axis=-2, keepdims=True)
    den = jnp.sum(mf * jnp.ones_like(xf), axis=-2, keepdims=True)
    axis = parallel_context.vertex_reduction_axis()
    if axis is not None:
        num, den = jax.lax.psum((num, den), axis)
    return (num / den).astype(x.dtype)


class GraphBatchNorm(nn.Module):
    """Batch normalization over all (batch, vertex) rows per channel.

    Always uses batch statistics (see module docstring). ``eps`` matches
    torch BatchNorm1d; variance is the biased estimator, as in torch's
    normalization path.
    """

    features: int
    eps: float = 1e-5
    masked: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        out_dtype = x.dtype
        # statistics run at >= fp32: a bf16 sum over B*N rows loses ~3
        # decimal digits and BN divides by it.  fp32 in == fp32 out (no-op);
        # f64 stays f64 (the x64 parity suites).
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        axes = tuple(range(x.ndim - 1))
        psum_axes = parallel_context.reduction_axes_for_stats()
        if psum_axes:
            # graph-/batch-sharded body: statistics are over the GLOBAL
            # (batch x vertex) rows, exactly as the unsharded reference BN.
            # Two-pass (mean, then squared deviations) — the single-pass
            # E[x^2]-E[x]^2 form loses enough fp32 precision at post-Dense
            # activation scales to break per-layer parity.
            if self.masked and mask is not None:
                w = mask * jnp.ones_like(x)
            else:
                w = jnp.ones_like(x)
            cnt, s1 = jax.lax.psum(
                (jnp.sum(w, axis=axes), jnp.sum(x * w, axis=axes)), psum_axes
            )
            denom = jnp.maximum(cnt, 1.0)
            mean = s1 / denom
            var = jax.lax.psum(jnp.sum(w * (x - mean) ** 2, axis=axes), psum_axes) / denom
        elif self.masked and mask is not None:
            w = mask * jnp.ones_like(x)
            denom = jnp.maximum(jnp.sum(w, axis=axes), 1.0)
            mean = jnp.sum(x * w, axis=axes) / denom
            var = jnp.sum(w * (x - mean) ** 2, axis=axes) / denom
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        return (y * gamma + beta).astype(out_dtype)


class GraphConv1x1(nn.Module):
    """Per-vertex Linear with optional pre/post batch-norm.

    ``batch_norm`` accepts None/''/'pre'/'post'; any other string (e.g. the
    reference's accidental 'grouppre') applies no normalization — a reference
    quirk preserved deliberately (utils_pt.py:97-101 only matches exact
    'pre'/'post').
    """

    num_inputs: int
    num_outputs: int
    batch_norm: str | None = None
    masked_bn: bool = False
    dtype: Any = None  # computation dtype (params stay fp32); None == fp32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        assert x.shape[-1] == self.num_inputs, (x.shape, self.num_inputs)
        if self.batch_norm == "pre":
            # BN reads x at whatever precision it arrives (fp32 operator
            # results stay unrounded — BN's (x-mean)/std amplifies input
            # rounding by |mean|/std per channel, which for raw Laplacian
            # channels reaches 100x); the Dense below casts to self.dtype.
            x = GraphBatchNorm(self.num_inputs, masked=self.masked_bn, name="bn")(x, mask)
        x = nn.Dense(self.num_outputs, dtype=self.dtype, name="fc")(x)
        if self.batch_norm == "post":
            x = GraphBatchNorm(self.num_outputs, masked=self.masked_bn, name="bn")(x, mask)
        return x


def repeating_expand(inputs: jnp.ndarray, out_features: int) -> jnp.ndarray:
    """Tile the channel axis up to ``out_features`` (with a truncated tail).

    Parity: normal_predict/models.py:612-617 — the input-residual head of the
    deep models.
    """
    in_features = inputs.shape[-1]
    times = out_features // in_features
    rem = out_features % in_features
    parts = [inputs] * times + ([inputs[..., :rem]] if rem else [])
    return jnp.concatenate(parts, axis=-1)
