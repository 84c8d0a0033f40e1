"""Data pipelines: bucketed padded batching + datasets."""

from surfacenetworks_tpu.data.batching import (
    Buckets,
    BucketSet,
    padded_vertex_fraction,
    MeshBatch,
    arap_batch,
    correspondence_batch,
    dirac_batch,
    cascade_batch,
    choose_operator_format,
    laplacian_batch,
    mnist_batch,
    pad_rows,
    rcm_reorder_sample,
    rcm_reorder_sequence,
    round_up,
    vae_batch,
)
from surfacenetworks_tpu.data import datasets

__all__ = [
    "Buckets",
    "BucketSet",
    "padded_vertex_fraction",
    "MeshBatch",
    "arap_batch",
    "correspondence_batch",
    "datasets",
    "dirac_batch",
    "cascade_batch",
    "choose_operator_format",
    "laplacian_batch",
    "mnist_batch",
    "pad_rows",
    "rcm_reorder_sample",
    "rcm_reorder_sequence",
    "round_up",
    "vae_batch",
]
