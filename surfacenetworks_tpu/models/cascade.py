"""Multiresolution models: EfficientCascade U-Net, GlobalLocalModel, LapMATModel.

Parity targets: normal_predict/models.py:413-643.  The cascade consumes a
Laplacian pyramid ``Laps[0..k-1]`` (coarsest..finest; see
``geometry.coarsening``): down path = width-changing LapResNet + MaxPool(2)
over the pair-ordered vertex axis, up path = 2x nearest-neighbour upsample +
skip-add + LapResNet, with the repeating-expand input residual head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from surfacenetworks_tpu.nn.blocks import (
    AvgResNet2,
    WideLapResNet2,
    apply_operator,
)
from surfacenetworks_tpu.nn.layers import GraphConv1x1, repeating_expand

WIDTH = 128


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool1d(2) over the vertex axis of [B, N, C]."""
    b, n, c = x.shape
    return jnp.max(x.reshape(b, n // 2, 2, c), axis=2)


def upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling over the vertex axis (F.interpolate)."""
    return jnp.repeat(x, 2, axis=1)


class LaplacianPooling(nn.Module):
    """Learned pooling: a 1-inner-layer width-changing LapResNet whose output
    reshapes to half (down) or double (up) the vertex count
    (normal_predict/models.py:517-527)."""

    num_inputs: int
    down: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, op, x):
        num_outputs = self.num_inputs // 2 if self.down else self.num_inputs * 2
        y = WideLapResNet2(self.num_inputs, num_outputs, "", inner_layers=1, dtype=self.dtype, name="lap")(
            op, None, x
        )
        return y.reshape(x.shape[0], -1, self.num_inputs)


class EfficientCascade(nn.Module):
    """normal_predict/models.py:529-609."""

    in_features: int = 3
    out_features: int = 3
    cascade_levels: int = 4
    inner_layers: int = 2
    bnmode: str | None = ""
    with_avg: bool = False
    naive_pool: bool = True
    bottleneck: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, laps, mask, inputs):
        k = self.cascade_levels
        widths = [16, 32, 64, 128] if self.bottleneck else [WIDTH] * k
        x = GraphConv1x1(self.in_features, WIDTH, None, dtype=self.dtype, name="conv1")(inputs)

        down_series, mask_series = [], []
        ma = mask
        for i in range(k - 1, 0, -1):
            down_series.append(x)
            mask_series.append(ma)
            x = WideLapResNet2(
                widths[i], widths[i - 1], self.bnmode, self.inner_layers, dtype=self.dtype, name=f"down_rn{i}"
            )(laps[i], ma, x)
            if self.with_avg:
                x = AvgResNet2(widths[i - 1], self.bnmode, dtype=self.dtype, name=f"down_avg{i}")(laps[i], ma, x)
            if self.naive_pool:
                x = max_pool2(x)
            else:
                x = LaplacianPooling(widths[i - 1], down=True, dtype=self.dtype, name=f"down_pool{i}")(laps[i], x)
            ma = max_pool2(ma)

        x = WideLapResNet2(widths[0], widths[0], self.bnmode, self.inner_layers, dtype=self.dtype, name="lap0")(
            laps[0], None, x
        )

        for i in range(1, k):
            if self.naive_pool:
                x = upsample2(x)
            else:
                x = LaplacianPooling(widths[i], down=False, dtype=self.dtype, name=f"up_pool{i}")(laps[i - 1], x)
            x = x + down_series[-i][..., : x.shape[-1]]
            x = WideLapResNet2(
                widths[i - 1], widths[i], self.bnmode, self.inner_layers, dtype=self.dtype, name=f"up_rn{i}"
            )(laps[i], mask_series[-i], x)

        x = nn.elu(x)
        bn = None if self.bnmode is None else self.bnmode + "pre"
        x = GraphConv1x1(WIDTH, self.out_features, bn, dtype=self.dtype, name="conv2")(x)
        return x + repeating_expand(inputs, x.shape[-1])


class GlobalLocalModel(nn.Module):
    """Two-branch cascade(global) + deep(local) model with learned sigmoid
    gating (normal_predict/models.py:619-643).

    NOTE: the reference slices the gate weight as ``[:, :, :-1]`` which for
    out_features=1 overlaps the score channel (models.py:630-631) — here the
    gate is the dedicated extra channel (``[..., -1:]``), the evident intent.
    """

    in_features: int = 3
    out_features: int = 1
    cascade_levels: int = 4
    local_layers: int = 15

    @nn.compact
    def __call__(self, operators, masks, inputs, sigmoid: bool = False):
        from surfacenetworks_tpu.models.normal_models import LapDeepModel

        laps, l_local = operators
        mask_global, mask_local = masks
        swg = EfficientCascade(
            self.in_features, self.out_features + 1, self.cascade_levels, name="global_net"
        )(laps, mask_global, inputs)
        score_local = LapDeepModel(
            self.in_features, self.out_features, self.local_layers, name="local_net"
        )(l_local, mask_local, inputs)
        score_global = swg[..., : self.out_features]
        weight_global = nn.sigmoid(swg[..., -1:])
        if sigmoid:
            score_global = nn.sigmoid(score_global)
            score_local = nn.sigmoid(score_local)
        score_final = weight_global * score_global + (1 - weight_global) * score_local
        return jnp.concatenate([score_global, score_local, score_final], axis=1)


class LapMATModel(nn.Module):
    """Laplacian network with medial-axis-transform double supervision
    (normal_predict/models.py:382-410; fixes the undefined-SPB1MM bug by
    using the framework SpMM)."""

    in_features: int = 3
    out_features: int = 2
    layers: int = 15

    @nn.compact
    def __call__(self, op_and_mass, mask, inputs):
        from surfacenetworks_tpu.models.normal_models import LapDeepModel

        op, mass = op_and_mass  # mass: [B, N, 1]
        half = self.out_features // 2
        outputs = LapDeepModel(self.in_features, half, self.layers, name="LapModel")(
            op, mask, inputs
        )
        x = nn.elu(outputs)
        x = apply_operator(op, x)
        x = jnp.sqrt(jnp.maximum(mass, 0.0)) * x
        ma = jnp.clip(x, -4.0, 4.0)
        return jnp.concatenate([outputs, ma], axis=-1)
