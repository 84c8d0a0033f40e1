"""Data pipelines: bucketed padded batching + datasets."""

from surfacenetworks_tpu.data.batching import (
    Buckets,
    MeshBatch,
    dirac_batch,
    laplacian_batch,
    pad_rows,
    round_up,
)
from surfacenetworks_tpu.data import datasets

__all__ = [
    "Buckets",
    "MeshBatch",
    "datasets",
    "dirac_batch",
    "laplacian_batch",
    "pad_rows",
    "round_up",
]
