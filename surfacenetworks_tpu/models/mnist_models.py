"""Mesh-MNIST classifiers (reference ``src/mesh_mnist/models.py``).

conv1(3->64) -> 5 residual blocks (64-wide) -> ELU -> 'pre' conv -> ELU ->
masked global average -> dropout(0.5) -> Linear(64,10) -> log_softmax.
Dropout randomness comes from the flax 'dropout' rng collection; pass
``deterministic=True`` for evaluation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surfacenetworks_tpu.nn.blocks import dirac_num_faces, AvgResNet2, DirResNet2, LapResNet2, MlpResNet2
from surfacenetworks_tpu.nn.layers import GraphConv1x1, global_average

WIDTH = 64
NUM_CLASSES = 10


class _ClassifierHead(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, deterministic):
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, WIDTH, "pre", dtype=self.dtype, name="bn_conv2")(x)
        x = nn.elu(x)
        x = jnp.squeeze(global_average(x, mask), axis=-2)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        # final Dense promotes to fp32 (fp32 params, default dtype): the 10-way
        # log-softmax and NLL always run full precision
        x = nn.Dense(NUM_CLASSES, name="fc1")(x.astype(jnp.float32))
        return nn.log_softmax(x, axis=-1)


class Model(nn.Module):
    """Laplacian classifier (models.py:22-56)."""

    layers: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, op, mask, deterministic: bool = False):
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = LapResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        return _ClassifierHead(dtype=self.dtype, name="head")(x, mask, deterministic)


class AvgModel(nn.Module):
    """models.py:58-90."""

    layers: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, op, mask, deterministic: bool = False):
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        return _ClassifierHead(dtype=self.dtype, name="head")(x, mask, deterministic)


class MlpModel(nn.Module):
    """models.py:93-125."""

    layers: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, op, mask, deterministic: bool = False):
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = MlpResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        return _ClassifierHead(dtype=self.dtype, name="head")(x, mask, deterministic)


class DirModel(nn.Module):
    """models.py:128-159 (vertex stream pooled)."""

    layers: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, op, mask, deterministic: bool = False):
        batch = inputs.shape[0]
        m = dirac_num_faces(op)
        v = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        f = jnp.zeros((batch, m, WIDTH), dtype=v.dtype)
        for i in range(self.layers):
            v, f = DirResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, v, f)
        return _ClassifierHead(dtype=self.dtype, name="head")(v, mask, deterministic)
