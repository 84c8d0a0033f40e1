"""Distribution: device meshes, data parallelism, edge-partitioned operators."""

from surfacenetworks_tpu.dist.mesh_setup import (
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicated,
)
from surfacenetworks_tpu.dist.data_parallel import (
    make_dp_train_step,
    replicate,
    shard_batch,
)
from surfacenetworks_tpu.dist import dirac_partition, edge_partition, graph_parallel
from surfacenetworks_tpu.dist.dirac_partition import (
    PartitionedDirac,
    partition_dirac,
    partitioned_dirac_fv,
    partitioned_dirac_vf,
    shard_partitioned_dirac,
    sort_faces_for_partition,
    stack_partitioned_dirac,
)
from surfacenetworks_tpu.dist.edge_partition import (
    PartitionedOperator,
    make_partitioned_spmm,
    partition_operator,
    partitioned_spmm,
    shard_partitioned,
    shard_rows,
    stack_partitioned,
    suggest_halo,
)
from surfacenetworks_tpu.dist.graph_parallel import (
    GraphStore,
    make_graph_sharded_apply,
    partition_batch_dirac,
    partition_batch_operator,
    place_graph_batch,
)

__all__ = [
    "GraphStore",
    "batch_sharding",
    "initialize_multihost",
    "make_dp_train_step",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]

from surfacenetworks_tpu.dist.analysis import check_overlap_structure  # noqa: E402,F401
