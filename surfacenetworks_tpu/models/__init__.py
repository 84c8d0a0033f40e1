"""Per-task model zoos."""

from surfacenetworks_tpu.models import arap_models, correspondence, mnist_models, vae
from surfacenetworks_tpu.models.normal_models import (
    AvgModel,
    GatDeepModel,
    DirDeepModel,
    DirModelToFace,
    IdDeepModel,
    LapDeepModel,
    MlpModel,
)
from surfacenetworks_tpu.models.correspondence import SiameseModel
from surfacenetworks_tpu.models.vae import DirVAE, LapVAE

__all__ = [
    "AvgModel",
    "GatDeepModel",
    "DirDeepModel",
    "DirModelToFace",
    "DirVAE",
    "IdDeepModel",
    "LapDeepModel",
    "LapVAE",
    "MlpModel",
    "SiameseModel",
    "arap_models",
    "correspondence",
    "mnist_models",
    "vae",
]
