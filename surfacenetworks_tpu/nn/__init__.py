"""Neural op library: layers and residual message-passing blocks."""

from surfacenetworks_tpu.nn.layers import (
    GraphBatchNorm,
    GraphConv1x1,
    global_average,
    repeating_expand,
)
from surfacenetworks_tpu.nn.blocks import (
    AvgResNet2,
    GatResNet2,
    DenseLapResNet2,
    DirResNet2,
    IdResNet2,
    LapResNet2,
    MlpResNet2,
    WideAvgResNet2,
    WideLapResNet2,
    apply_dirac_fv,
    apply_dirac_vf,
    apply_operator,
)

__all__ = [
    "AvgResNet2",
    "GatResNet2",
    "DenseLapResNet2",
    "DirResNet2",
    "GraphBatchNorm",
    "GraphConv1x1",
    "IdResNet2",
    "LapResNet2",
    "MlpResNet2",
    "WideAvgResNet2",
    "WideLapResNet2",
    "apply_dirac_fv",
    "apply_dirac_vf",
    "apply_operator",
    "global_average",
    "repeating_expand",
]
