"""Device mesh construction and multi-host initialization.

The reference has no distributed runtime at all (SURVEY.md §2.9) — this layer
is the TPU-native scale-out design: a named ``jax.sharding.Mesh`` whose axes
carry data parallelism over meshes ('data') and vertex/edge partitioning
within a mesh ('graph'); XLA inserts the collectives (psum for gradient
reduction over ICI, all-to-all/ppermute for halo exchange).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_graph: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('data', 'graph') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_graph
    assert n_data * n_graph <= len(devices), (n_data, n_graph, len(devices))
    grid = np.asarray(devices[: n_data * n_graph]).reshape(n_data, n_graph)
    return Mesh(grid, axis_names=("data", "graph"))


def initialize_multihost(coordinator_address: str | None = None, **kwargs) -> None:
    """jax.distributed bootstrap for multi-host slices (DCN across hosts,
    ICI within a slice).

    Only the benign "already initialized in this process" case is a no-op;
    any genuine misconfiguration (bad coordinator address, inconsistent
    process counts, unreachable peers, calling after JAX backend use without
    ever initializing) re-raises so a broken launch fails loudly instead of
    silently degrading to a single-process run."""
    try:
        from jax._src.distributed import global_state as _dist_state

        if getattr(_dist_state, "client", None) is not None:
            return  # this process already runs a distributed client: no-op
    except ImportError:  # pragma: no cover - private-API layout change
        pass
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    except RuntimeError as e:
        if "should only be called once" not in str(e):
            raise
    else:
        import logging

        logging.getLogger(__name__).info(
            "jax.distributed initialized: process %d/%d, coordinator %s",
            jax.process_index(), jax.process_count(), coordinator_address,
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch-of-meshes) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Place host data with a sharding that may span processes.

    Single-process this is ``jax.device_put``; multi-process it builds a
    global jax.Array from the (identical-on-every-host) local copy via
    ``make_array_from_callback`` — each process materializes only its own
    addressable shards.  Every trainer/dist placement routes through here so
    the same code path works on one chip, one host, and a DCN slice.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])
