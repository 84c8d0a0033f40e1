"""Normal-prediction model zoo (reference ``src/normal_predict/models.py``).

All models map ``(operator, mask, inputs [B,N,Cin]) -> [B,N,Cout]`` on padded
dense tensors.  The alternating even-Lap / odd-Avg block pattern and the
input-residual heads are reference behaviours (models.py:53-57, :77).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surfacenetworks_tpu.nn.blocks import (
    dirac_num_faces,
    AvgResNet2,
    DirResNet2,
    GatResNet2,
    IdResNet2,
    MlpResNet2,
    WideAvgResNet2,
    WideLapResNet2,
)
from surfacenetworks_tpu.nn.layers import GraphConv1x1, repeating_expand

WIDTH = 128


def _conv2_bn(bnmode: str | None) -> str | None:
    return None if bnmode is None else bnmode + "pre"


class LapDeepModel(nn.Module):
    """Deep Laplacian network (normal_predict/models.py:39-83).

    Alternates width-changing Lap blocks (even layers) with Avg blocks (odd),
    optional bottleneck width schedule, ELU + 1x1 head, and the
    repeating-expand input residual.
    """

    in_features: int
    out_features: int
    layers: int = 15
    bnmode: str | None = ""
    only_lap: bool = False
    bottleneck: bool = False
    remat: bool = False  # rematerialize each block's activations in the
    # backward pass (jax.checkpoint) — trades ~1 extra forward of FLOPs for
    # O(layers) -> O(1) stored activations; for FAUST-scale meshes
    dtype: Any = None  # computation dtype (bfloat16 for mixed precision)

    @nn.compact
    def __call__(self, op, mask, inputs):
        if self.bottleneck:
            assert self.layers == 16
            widths = [128, 128, 64, 64, 32, 32, 16, 16, 16, 16, 32, 32, 64, 64, 128, 128, 128]
        else:
            widths = [WIDTH] * (self.layers + 1)
        x = GraphConv1x1(self.in_features, WIDTH, "", dtype=self.dtype, name="conv1")(inputs)
        lap_cls = nn.remat(WideLapResNet2) if self.remat else WideLapResNet2
        avg_cls = nn.remat(WideAvgResNet2) if self.remat else WideAvgResNet2
        for i in range(self.layers):
            if i % 2 == 0 or self.only_lap:
                x = lap_cls(widths[i], widths[i + 1], self.bnmode, dtype=self.dtype, name=f"rn{i}")(
                    op, mask, x
                )
            else:
                x = avg_cls(widths[i], widths[i + 1], self.bnmode, dtype=self.dtype, name=f"rn{i}")(
                    op, mask, x
                )
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, self.out_features, _conv2_bn(self.bnmode), dtype=self.dtype, name="conv2")(x)
        # the input residual is fp32; the sum promotes, so outputs are fp32
        return x + repeating_expand(inputs, x.shape[-1])


class DirDeepModel(nn.Module):
    """Deep Dirac network (normal_predict/models.py:234-280): even layers are
    Dirac blocks over coupled vertex/face streams (faces zero-initialized),
    odd layers Avg blocks; head = conv2('pre') then ELU, no input residual."""

    in_features: int
    out_features: int
    layers: int = 15
    num_faces: int | None = None  # inferred from the operator if None
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        batch = inputs.shape[0]
        if self.num_faces is not None:
            m = self.num_faces
        else:
            # structured DiracOperator carries faces [B, M, 3]
            m = dirac_num_faces(op)
        v = GraphConv1x1(self.in_features, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        f = jnp.zeros((batch, m, WIDTH), dtype=v.dtype)
        for i in range(self.layers):
            if i % 2 == 0:
                v, f = DirResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, v, f)
            else:
                v = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(None, mask, v)
        x = GraphConv1x1(WIDTH, self.out_features, "pre", dtype=self.dtype, name="conv2")(v)
        return nn.elu(x.astype(jnp.float32))


class DirModelToFace(nn.Module):
    """Dirac network with face-stream output (normal_predict/models.py:282-322)."""

    in_features: int
    out_features: int
    layers: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        batch = inputs.shape[0]
        m = dirac_num_faces(op)
        v = GraphConv1x1(self.in_features, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        f = jnp.zeros((batch, m, WIDTH), dtype=v.dtype)
        for i in range(self.layers):
            if i % 2 == 0:
                v, f = DirResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, v, f)
            else:
                v = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(None, mask, v)
        x = nn.elu(f)
        return GraphConv1x1(WIDTH, self.out_features, "pre", dtype=self.dtype, name="conv2")(x).astype(jnp.float32)


class GatDeepModel(nn.Module):
    """Deep graph-attention network — the reference's GAT baseline
    (normal_predict/models.py:85-124) revived: dead upstream (requires the
    absent ``pygat`` package), implemented here as masked multi-head
    attention over the operator's ELL neighborhood pattern
    (nn.blocks.GatResNet2), alternating with Avg blocks like every deep
    model in the zoo."""

    in_features: int
    out_features: int
    layers: int = 15
    heads: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(self.in_features, WIDTH, "", dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            if i % 2 == 0:
                x = GatResNet2(WIDTH, heads=self.heads, dtype=self.dtype, name=f"rn{i}")(
                    op, mask, x
                )
            else:
                x = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, self.out_features, "pre", dtype=self.dtype, name="conv2")(x)
        return x + repeating_expand(inputs, self.out_features)


class AvgModel(nn.Module):
    """Graph-agnostic ablation (normal_predict/models.py:127-157)."""

    in_features: int
    out_features: int
    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(self.in_features, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = AvgResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, self.out_features, "pre", dtype=self.dtype, name="conv2")(x)
        return x + inputs


class MlpModel(nn.Module):
    """Pointwise-only ablation (normal_predict/models.py:160-192)."""

    in_features: int
    out_features: int
    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        from surfacenetworks_tpu.nn.layers import GraphBatchNorm

        x = GraphConv1x1(self.in_features, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = MlpResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = GraphBatchNorm(WIDTH, name="bn")(x)
        x = nn.elu(x)
        x = GraphConv1x1(WIDTH, self.out_features, None, dtype=self.dtype, name="conv2")(x)
        return x + inputs


class IdDeepModel(nn.Module):
    """Identity-op ablation (normal_predict/models.py:349-378)."""

    in_features: int
    out_features: int
    layers: int = 15
    dtype: Any = None

    @nn.compact
    def __call__(self, op, mask, inputs):
        x = GraphConv1x1(self.in_features, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)
        for i in range(self.layers):
            x = IdResNet2(WIDTH, dtype=self.dtype, name=f"rn{i}")(op, mask, x)
        x = GraphConv1x1(WIDTH, self.out_features, "pre", dtype=self.dtype, name="conv2")(x)
        return nn.elu(x.astype(jnp.float32))
