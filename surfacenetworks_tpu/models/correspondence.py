"""FAUST dense-correspondence models (reference ``src/dense_correspondence/models.py``).

A shared trunk embeds each shape to 120-d per-vertex features; the siamese
head forms correspondence logits ``FA @ FB^T [B, NA, NB]`` (models.py:199-203)
— a single large MXU matmul on TPU.  ``AmplifyModel`` consumes a
squared-Laplacian pyramid, indexing ``L_sequence[i//2]`` per Lap layer
(models.py:68-77).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surfacenetworks_tpu.nn.blocks import dirac_num_faces, AvgResNet2, DirResNet2, LapResNet2, MlpResNet2
from surfacenetworks_tpu.nn.layers import GraphBatchNorm, GraphConv1x1

WIDTH = 128
OUT = 120


def _head(x, inputs):
    return x + jnp.tile(inputs[..., -3:], (1, 1, OUT // 3))


class Model(nn.Module):
    """Lap trunk (models.py:21-49).

    ``remat=True`` rematerializes each block in the backward pass
    (jax.checkpoint): for full-resolution FAUST scans (7k vertices, 15
    layers, two siamese passes) this caps stored activations at O(1) blocks.
    """

    layers: int = 15
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        lap_cls = nn.remat(LapResNet2) if self.remat else LapResNet2
        avg_cls = nn.remat(AvgResNet2) if self.remat else AvgResNet2
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            if i % 2 == 0:
                x = lap_cls(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
            else:
                x = avg_cls(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, OUT, "pre", dtype=self.dtype, name="conv2")(x)
        return _head(x, inputs)


class AmplifyModel(nn.Module):
    """Squared-Laplacian pyramid trunk (models.py:51-82): even layer i uses
    pyramid operator ``ops[i//2]`` (last one repeated past the end)."""

    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, ops, mask, inputs):
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            op = ops[min(i // 2, len(ops) - 1)]
            if i % 2 == 0:
                x = LapResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
            else:
                x = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, OUT, "pre", dtype=self.dtype, name="conv2")(x)
        return _head(x, inputs)


class AvgModel(nn.Module):
    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, OUT, "pre", dtype=self.dtype, name="conv2")(x)
        return _head(x, inputs)


class MlpModel(nn.Module):
    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = MlpResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = GraphBatchNorm(WIDTH, name="bn")(x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, OUT, None, dtype=self.dtype, name="conv2")(x)
        return _head(x, inputs)


class DirModel(nn.Module):
    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        batch = inputs.shape[0]
        m = dirac_num_faces(op)
        v = GraphConv1x1(3, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        f = jnp.zeros((batch, m, WIDTH), dtype=v.dtype)
        for i in range(self.layers):
            if i % 2 == 0:
                v, f = DirResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, v, f)
            else:
                v = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(None, mask, v)
        x = nn.elu(v)
        x = GraphConv1x1(WIDTH, OUT, "pre", dtype=self.dtype, name="conv2")(x)
        return _head(x, inputs)


TRUNKS = {
    "lap": Model,
    "amp": AmplifyModel,
    "avg": AvgModel,
    "mlp": MlpModel,
    "dir": DirModel,
}


class SiameseModel(nn.Module):
    """Shared trunk over both shapes; logits = FA @ FB^T (models.py:184-203).

    ``remat=True`` (lap trunk) rematerializes blocks in the backward pass —
    the memory knob for full-resolution scans."""

    model: str = "lap"
    layers: int = 15
    remat: bool = False
    dtype: Any = None  # trunk computation dtype; logits accumulate in fp32

    def setup(self):
        for key, cls in TRUNKS.items():
            if key in self.model:
                if key == "lap":
                    self.trunk = cls(self.layers, remat=self.remat, dtype=self.dtype)
                else:
                    self.trunk = cls(self.layers, dtype=self.dtype)
                return
        raise ValueError(f"unknown trunk {self.model!r}")

    def features(self, operation_a, operation_b, input_a, input_b):
        """Both trunks' 120-d embeddings WITHOUT forming the N x N logits —
        pair with ``train.losses.corr_dcel_streaming`` to keep peak memory
        O(block * N) instead of O(N^2) (the head wall at 25k+ vertices)."""
        fa = self.trunk(*operation_a, input_a)
        fb = self.trunk(*operation_b, input_b)
        if self.dtype is not None:
            fa, fb = fa.astype(self.dtype), fb.astype(self.dtype)
        return fa, fb

    def __call__(self, operation_a, operation_b, input_a, input_b):
        fa = self.trunk(*operation_a, input_a)
        fb = self.trunk(*operation_b, input_b)
        if self.dtype is not None:
            # _head promoted to fp32 via the coordinate residual; drop back so
            # the N x N logits matmul streams bf16 operands through the MXU
            fa, fb = fa.astype(self.dtype), fb.astype(self.dtype)
        return jnp.einsum("bnc,bmc->bnm", fa, fb, preferred_element_type=jnp.float32)
