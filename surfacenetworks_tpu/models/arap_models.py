"""ARAP temporal-deformation models (reference ``src/as_rigid_as_possible/models.py``).

Input = 2 frames of coordinates (6 channels); output = 40 predicted frames
(120 channels); every model ends with the constant-velocity-style residual
``x + last_frame.repeat(40)`` (models.py:52).  The operator comes from the
last input frame.  ``GCNModel`` closes a reference gap: its ``--model gcn``
flag imports a ``gcn.py`` that does not exist in the repo
(as_rigid_as_possible/main.py:28) — here it is a standard
normalized-adjacency residual GCN over the same block scheme.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surfacenetworks_tpu.nn.blocks import (
    dirac_num_faces,
    AvgResNet2,
    DirResNet2,
    LapResNet2,
    MlpResNet2,
    _cat_op,
    apply_operator,
)
from surfacenetworks_tpu.nn.layers import GraphBatchNorm, GraphConv1x1

WIDTH = 128
IN_FRAMES = 2
OUT_FRAMES = 40


def _residual_head(x, inputs):
    return x + jnp.tile(inputs[..., -3:], (1, 1, OUT_FRAMES))


class Model(nn.Module):
    """Lap model (models.py:21-52); ``op`` may be sparse or dense."""

    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(3 * IN_FRAMES, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            if i % 2 == 0:
                x = LapResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
            else:
                x = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, 3 * OUT_FRAMES, "pre", dtype=self.dtype, name="conv2")(x)
        return _residual_head(x, inputs)


class AvgModel(nn.Module):
    """models.py:54-77."""

    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(3 * IN_FRAMES, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, 3 * OUT_FRAMES, "pre", dtype=self.dtype, name="conv2")(x)
        return _residual_head(x, inputs)


class MlpModel(nn.Module):
    """models.py:80-105."""

    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(3 * IN_FRAMES, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = MlpResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = GraphBatchNorm(WIDTH, name="bn")(x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, 3 * OUT_FRAMES, None, dtype=self.dtype, name="conv2")(x)
        return _residual_head(x, inputs)


class DirModel(nn.Module):
    """models.py:108-152."""

    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        batch = inputs.shape[0]
        m = dirac_num_faces(op)
        v = GraphConv1x1(3 * IN_FRAMES, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        f = jnp.zeros((batch, m, WIDTH), dtype=v.dtype)
        for i in range(self.layers):
            if i % 2 == 0:
                v, f = DirResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, v, f)
            else:
                v = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(None, mask, v)
        x = nn.elu(v)
        x = GraphConv1x1(WIDTH, 3 * OUT_FRAMES, "pre", dtype=self.dtype, name="conv2")(x)
        return _residual_head(x, inputs)


class GCNResNet2(nn.Module):
    """Residual GCN block: two steps of [x ‖ A_norm x] -> conv, + input —
    the missing-``gcn.py`` equivalent, consistent with the other blocks."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = nn.elu(inputs)
        x = _cat_op(x, apply_operator(op, x))
        x = GraphConv1x1(2 * self.features, self.features, "pre", dtype=self.dtype, name="bn_fc0")(x)
        x = nn.elu(x)
        x = _cat_op(x, apply_operator(op, x))
        x = GraphConv1x1(2 * self.features, self.features, "pre", dtype=self.dtype, name="bn_fc1")(x)
        return x + inputs


class GCNModel(nn.Module):
    """GCN over the normalized adjacency operator (supply
    ``geometry.normalized_adjacency`` as the batch operator)."""

    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(3 * IN_FRAMES, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            if i % 2 == 0:
                x = GCNResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
            else:
                x = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, 3 * OUT_FRAMES, "pre", dtype=self.dtype, name="conv2")(x)
        return _residual_head(x, inputs)
