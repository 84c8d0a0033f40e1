"""Worker for the 2-process jax.distributed CPU simulation test.

Each process owns 2 virtual CPU devices (xla_force_host_platform_device_count
is set by the parent); together they form a 4-device global mesh spanning a
process boundary — the CPU stand-in for a 2-host DCN slice.  The worker
initializes through ``dist.mesh_setup.initialize_multihost`` (the DCN code
path, SURVEY.md §2.9), builds a global ('data', 'graph') mesh, and runs a
psum + a tiny DP train step across both processes.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    from surfacenetworks_tpu.dist import initialize_multihost

    initialize_multihost(
        coordinator_address=coordinator, num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from surfacenetworks_tpu.dist import make_mesh

    mesh = make_mesh(n_data=2, n_graph=2)

    # cross-process psum over both axes via shard_map
    def local_sum(x):
        return jax.lax.psum(x, ("data", "graph"))

    fn = jax.shard_map(local_sum, mesh=mesh, in_specs=P(), out_specs=P())
    out = jax.jit(fn)(jnp.ones(()))
    # replicated output: read this process's addressable shard
    total = float(np.asarray(out.addressable_shards[0].data))
    assert total == 4.0, total

    # tiny DP train step across the process boundary: per-process global
    # batch assembly (same data everywhere), batch sharded over all 4 devices
    from surfacenetworks_tpu import models as zoo
    from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch
    from surfacenetworks_tpu.train import TrainState, losses, optim

    dp_mesh = make_mesh(n_data=4, n_graph=1)
    samples = datasets.synthetic_normal_dataset(4, 30, seed=0, operator="lap")
    batch = laplacian_batch(samples, Buckets(n_vertices=32))
    model = zoo.LapDeepModel(3, 3, layers=2)
    params = model.init(
        jax.random.key(0), batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    )["params"]
    state = TrainState.create(params, optim.adam(1e-3))

    batch_sh = NamedSharding(dp_mesh, P("data"))
    rep_sh = NamedSharding(dp_mesh, P())

    def put_global(x):
        x = np.asarray(x)
        sh = batch_sh if x.ndim >= 1 else rep_sh
        return jax.make_array_from_process_local_data(sh, x)

    op = jax.tree_util.tree_map(put_global, batch.operator)
    mask, inputs, targets = (put_global(a) for a in (batch.mask, batch.inputs, batch.targets))
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep_sh, np.asarray(x))
        if hasattr(x, "ndim")
        else x,
        state,
    )

    @jax.jit
    def step(state, op, mask, inputs, targets):
        def objective(p):
            out = model.apply({"params": p}, op, mask, inputs)
            return losses.normal_cosine_loss(out, mask, targets)

        loss, grads = jax.value_and_grad(objective)(state.params)
        return state.apply_gradients(grads), loss

    state, loss = step(state, op, mask, inputs, targets)
    jax.block_until_ready(state.params)
    loss_val = float(np.asarray(loss.addressable_shards[0].data))
    assert np.isfinite(loss_val), loss_val
    print(f"worker {process_id}: psum=4.0 dp_loss={loss_val:.4f} OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
