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
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def global_average(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the vertex axis, keepdim. ``x [B,N,C]``, ``mask [B,N,1]``."""
    num = jnp.sum(x * mask, axis=-2, keepdims=True)
    den = jnp.sum(mask * jnp.ones_like(x), axis=-2, keepdims=True)
    return num / den


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
        axes = tuple(range(x.ndim - 1))
        if self.masked and mask is not None:
            w = mask * jnp.ones_like(x)
            denom = jnp.maximum(jnp.sum(w, axis=axes), 1.0)
            mean = jnp.sum(x * w, axis=axes) / denom
            var = jnp.sum(w * (x - mean) ** 2, axis=axes) / denom
        else:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        return y * gamma + beta


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

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        assert x.shape[-1] == self.num_inputs, (x.shape, self.num_inputs)
        if self.batch_norm == "pre":
            x = GraphBatchNorm(self.num_inputs, masked=self.masked_bn, name="bn")(x, mask)
        x = nn.Dense(self.num_outputs, name="fc")(x)
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
