"""Per-task model zoos."""

from surfacenetworks_tpu.models.normal_models import (
    AvgModel,
    DirDeepModel,
    DirModelToFace,
    IdDeepModel,
    LapDeepModel,
    MlpModel,
)

__all__ = [
    "AvgModel",
    "DirDeepModel",
    "DirModelToFace",
    "IdDeepModel",
    "LapDeepModel",
    "MlpModel",
]
