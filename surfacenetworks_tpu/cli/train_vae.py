"""Surface-Networks VAE trainer (reference: src/mesh_mnist/main_vae.py).

ELBO = masked Gaussian reconstruction NLL + KLD with the reference's
10-epoch linear warm-up (main_vae.py:190).  Per-epoch PLY dumps of inputs,
reconstructions, and fixed-noise samples decoded on flat meshes.
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import config
from surfacenetworks_tpu.cli.common import (
    EpochSampler,
    MetricFetcher,
    MetricsLogger,
    count_params,
    enable_compilation_cache,
    log_environment,
    make_logger,
)
from surfacenetworks_tpu.data import Buckets, OperatorCache, datasets, prefetch_over, vae_batch
from surfacenetworks_tpu.models.vae import DirVAE, LapVAE
from surfacenetworks_tpu.train import TrainState, checkpoint, losses, optim

parser = argparse.ArgumentParser(description="Mesh VAE (TPU)")
parser.add_argument("--batch-size", type=int, default=64)
parser.add_argument("--num-epoch", type=int, default=1000)
parser.add_argument("--model", default="lap", help="lap | dirac")
parser.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 activations/matmuls, "
                         "fp32 params, optimizer state and BN statistics")
parser.add_argument("--num-layers", type=int, default=5)
parser.add_argument("--synthetic", type=int, default=0)
parser.add_argument("--data-path", default=None)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--dump-ply", type=int, default=0, help="dump N sample PLYs per epoch")
parser.add_argument("--result-prefix", default="vae")
parser.add_argument("--result-dir", default="results/mesh_mnist_vae")
parser.add_argument("--data-parallel", type=int, default=0,
                    help="shard the mesh batch across this many devices on the "
                         "'data' mesh axis (params replicated; batch size divisible)")
parser.add_argument("--graph-parallel", type=int, default=0,
                    help="edge-partition the lifted AND flat operators' rows across "
                         "this many devices on the 'graph' mesh axis (lap and dirac; "
                         "encoder+decoder run in one shard_map)")
parser.add_argument("--seed", type=int, default=17)
parser.add_argument("--no-device-store", action="store_true",
                    help="disable the device-resident dataset (single-device "
                         "AND graph-parallel fast paths); keep the host "
                         "assemble-and-upload route, mainly for A/B timing")
config.add_config_flags(parser)


def main(argv=None):
    args = config.parse_with_config(parser, argv)
    log = make_logger(args.result_prefix, os.path.join(args.result_dir, "log"))
    log(args)
    enable_compilation_cache()
    log_environment(log)

    if args.synthetic:
        data = datasets.synthetic_mnist_dataset(args.synthetic, seed=args.seed)
    elif args.data_path:
        # train_plus.np-style pickle (reference add_laplacian.py output or
        # ``python -m surfacenetworks_tpu.cli.preprocess mnist``)
        data = datasets.load_mnist_mesh_pickle(args.data_path)
    else:
        raise SystemExit("provide --synthetic N or --data-path train_plus.np")
    model_key = "dirac" if args.model.startswith("dir") else "lap"
    n_gp = args.graph_parallel if args.graph_parallel > 1 else 0
    if n_gp:
        if args.data_parallel > 1:
            raise SystemExit("--graph-parallel and --data-parallel are mutually exclusive here")
        from surfacenetworks_tpu.data import rcm_reorder_sample

        data = [rcm_reorder_sample(s) for s in data]
        if model_key == "dirac":
            from surfacenetworks_tpu.dist import dirac_partition

            for s in data:
                fperm = dirac_partition.sort_faces_for_partition(s["F"])
                s["F"] = np.asarray(s["F"])[fperm]
                s["dirac"] = s["flat_dirac"] = None  # recomputed from sorted faces
    sep = max(1, int(len(data) * 0.8))
    train_data, test_data = data[:sep], data[sep:]
    buckets = Buckets.for_samples(data, multiple=8 * n_gp if n_gp else 8)

    model = (DirVAE if model_key == "dirac" else LapVAE)(
        num_layers=args.num_layers, dtype=jnp.bfloat16 if args.bf16 else None)

    batch_ops = None
    if n_gp:
        from surfacenetworks_tpu.data.batching import _dirac_coeffs_of
        from surfacenetworks_tpu.dist import (
            dirac_partition, edge_partition, graph_parallel, make_mesh,
        )

        gmesh = make_mesh(n_data=1, n_graph=n_gp)
        N = buckets.n_vertices
        if model_key == "dirac":
            l_ops, l_floors = graph_parallel.prepartition_dirac(
                [_dirac_coeffs_of(s) for s in data], n_gp, N, buckets.n_faces,
                max_valence=buckets.max_valence,
            )
            f_ops, f_floors = graph_parallel.prepartition_dirac(
                [_dirac_coeffs_of(s, "flat_dirac") for s in data], n_gp, N,
                buckets.n_faces, max_valence=buckets.max_valence,
            )
            _stack = dirac_partition.stack_partitioned_dirac
        else:
            l_ops, l_floors = graph_parallel.prepartition_ell(
                [s["L"] for s in data], n_gp, n_rows=N, k=buckets.ell_k
            )
            f_ops, f_floors = graph_parallel.prepartition_ell(
                [s["flat_L"] for s in data], n_gp, n_rows=N, k=buckets.ell_k
            )
            _stack = edge_partition.stack_partitioned
        _lc = {id(s): o for s, o in zip(data, l_ops)}
        _fc = {id(s): o for s, o in zip(data, f_ops)}

        def batch_ops(samples):
            return (
                _stack([_lc[id(s)] for s in samples], **l_floors),
                _stack([_fc[id(s)] for s in samples], **f_floors),
            )

    op_cache = OperatorCache()

    def make_batch(samples, plain=False):
        if batch_ops and not plain:
            op, fop = batch_ops(samples)
            return vae_batch(
                samples, buckets, model=model_key, operator=op, flat_operator=fop,
                cache=op_cache,
            )
        return vae_batch(samples, buckets, model=model_key, cache=op_cache)

    b0 = make_batch(train_data[: args.batch_size], plain=bool(n_gp))

    def unpack(b):
        return (
            jnp.asarray(b.inputs),
            jnp.asarray(b.aux["flat_inputs"]),
            b.operator,
            b.aux["flat_operator"],
            jnp.asarray(b.mask),
        )

    x, fx, op, fop, mask = unpack(b0)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, x, fx, op, fop, mask
    )["params"]
    log("Num parameters {}".format(count_params(params)))
    state = TrainState.create(params, optim.adam(args.lr, weight_decay=1e-5))

    if n_gp:
        # encoder + decoder inside one shard_map: vertex rows of x/fx/mask
        # and both partitioned operators shard over 'graph'; the pooled
        # latent stats psum to replicated values (parallel_context)
        from jax.sharding import PartitionSpec as P

        from surfacenetworks_tpu import parallel_context

        _row = P(None, "graph")

        def _local_apply(params, rng, x, fx, op, fop, mask):
            with parallel_context.sharded_axes(vertex_axis="graph"):
                return model.apply(
                    {"params": params}, x, fx, op, fop, mask, rngs={"sample": rng}
                )

        def apply_fn(params, rng, x, fx, op, fop, mask):
            return jax.shard_map(
                _local_apply,
                mesh=gmesh,
                in_specs=(P(), P(), _row, _row, _row, _row, _row),
                out_specs=(_row, _row, P(), P(), P()),
            )(params, rng, x, fx, op, fop, mask)
    else:
        def apply_fn(params, rng, x, fx, op, fop, mask):
            return model.apply({"params": params}, x, fx, op, fop, mask, rngs={"sample": rng})

    @jax.jit
    def train_step(state, rng, x, fx, op, fop, mask, kld_weight):
        def objective(params):
            recon_mu, recon_logvar, z, mu, logvar = apply_fn(params, rng, x, fx, op, fop, mask)
            bce, kld = losses.vae_elbo_terms(recon_mu, recon_logvar, mask, x, z, mu, logvar)
            return bce + kld * kld_weight, (bce, kld, recon_mu)

        (loss, (bce, kld, recon)), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads), loss, bce, kld, recon

    @jax.jit
    def decode(params, fx, noise, fop, mask):
        return model.apply({"params": params}, fx, noise, fop, mask, method=type(model).decode)

    n_dp = args.data_parallel if args.data_parallel > 1 else 0
    if n_dp:
        if args.batch_size % n_dp:
            raise SystemExit(f"batch size {args.batch_size} not divisible by --data-parallel {n_dp}")
        from surfacenetworks_tpu.dist import make_dp_train_step, make_mesh, replicate, shard_batch

        dmesh = make_mesh(n_data=n_dp, n_graph=1)
        state = replicate(dmesh, state)

        def dp_apply(params, b):
            return model.apply(
                {"params": params}, b["x"], b["fx"], b["op"], b["fop"], b["mask"],
                rngs={"sample": b["rng"]},
            )

        def dp_loss(outputs, b):
            recon_mu, recon_logvar, z, mu, logvar = outputs
            bce, kld = losses.vae_elbo_terms(
                recon_mu, recon_logvar, b["mask"], b["x"], z, mu, logvar
            )
            return bce + kld * b["kld_weight"], {"bce": bce, "kld": kld}

        dp_step = make_dp_train_step(dp_apply, dp_loss, dmesh, donate=False)

    def run_train_step(state, sub, x, fx, op, fop, mask, kw, train=True):
        if n_dp:
            sb = shard_batch(dmesh, {
                "x": x, "fx": fx, "op": op, "fop": fop, "mask": mask,
                "rng": sub, "kld_weight": kw,
            })
            new_state, metrics = dp_step(state, sb)
            out_state = new_state if train else state
            return out_state, metrics["loss"], metrics["bce"], metrics["kld"], None
        result = train_step(state, sub, x, fx, op, fop, mask, kw)
        if not train:
            return (state,) + result[1:]
        return result

    rng = jax.random.key(args.seed)
    fixed_noise = jax.random.normal(jax.random.key(999), (args.batch_size, 1, 100))
    train_sampler = EpochSampler(train_data, args.batch_size, seed=args.seed)
    test_sampler = EpochSampler(test_data, args.batch_size, shuffle=False)
    steps = max(len(train_data) // args.batch_size, 1)
    test_steps = max(len(test_data) // args.batch_size, 1)

    # device-resident dataset + one-dispatch steps (single-device path):
    # batch gather, per-step sample key, and ELBO-term sums all inside the
    # step's executable
    store = None
    if not (n_gp or n_dp or args.no_device_store):
        from surfacenetworks_tpu.data import DeviceDataset, IndexedBatch

        store = DeviceDataset.build(data, lambda s: make_batch([s], plain=True))

    # device-resident GRAPH-PARALLEL store (round-5): both partitioned
    # operator families (lifted + flat) of EVERY sample stack once onto the
    # ('data' x 'graph') mesh, rows sharded over 'graph'; a GP batch is a
    # [B]-index gather fused inside the jit'd step — steady-state GP steps
    # ship only the index vector + per-step sample key.  The round-4 route
    # re-stacked + re-uploaded both operator pytrees every step.
    # Scales src/mesh_mnist/main_vae.py:150-200's loop.
    gp_store = None
    if n_gp and not args.no_device_store:
        from surfacenetworks_tpu.dist import GraphStore

        # cheap byte estimate off one sample before stacking everything
        op1 = (_stack([l_ops[0]], **l_floors), _stack([f_ops[0]], **f_floors))
        b1 = make_batch([data[0]], plain=True)
        per_sample = sum(
            getattr(leaf, "nbytes", 0) for leaf in jax.tree_util.tree_leaves(op1)
        ) + b1.inputs.nbytes + b1.aux["flat_inputs"].nbytes + b1.mask.nbytes
        if per_sample * len(data) <= 6 << 30:
            bs = [make_batch([s], plain=True) for s in data]
            arrays = {
                "inputs": np.concatenate([np.asarray(b.inputs) for b in bs], 0),
                "flat_inputs": np.concatenate(
                    [np.asarray(b.aux["flat_inputs"]) for b in bs], 0
                ),
                "mask": np.concatenate([np.asarray(b.mask) for b in bs], 0),
            }
            gp_store = GraphStore.build(
                gmesh, data,
                (_stack(l_ops, **l_floors), _stack(f_ops, **f_floors)),
                arrays,
            )
    if gp_store is not None:
        log(gp_store.stats())

        @functools.partial(jax.jit, donate_argnums=(0, 7))
        def train_step_gp_idx(state, rng_epoch, u, ops, arrs, idx, kw, sums):
            sub = jax.random.fold_in(rng_epoch, u)
            (l_b, f_b), arr_b = gp_store.gather(ops, arrs, idx, batch_axis=None)
            new_state, loss, bce, kld, _ = train_step(
                state, sub, arr_b["inputs"], arr_b["flat_inputs"], l_b, f_b,
                arr_b["mask"], kw,
            )
            return new_state, (sums[0] + loss, sums[1] + bce, sums[2] + kld)

        @jax.jit
        def eval_step_gp_idx(state, rng_epoch, u, ops, arrs, idx, sums):
            sub = jax.random.fold_in(rng_epoch, 1 << 20 | u)
            (l_b, f_b), arr_b = gp_store.gather(ops, arrs, idx, batch_axis=None)
            _, loss, bce, kld, _ = train_step(
                state, sub, arr_b["inputs"], arr_b["flat_inputs"], l_b, f_b,
                arr_b["mask"], jnp.float32(1.0),
            )
            return (sums[0] + loss, sums[1] + bce, sums[2] + kld)

    if store is not None:

        @functools.partial(jax.jit, donate_argnums=(0, 6))
        def train_step_idx(state, rng_epoch, u, tree, idx, kw, sums):
            sub = jax.random.fold_in(rng_epoch, u)
            b = IndexedBatch.gather(tree, idx)
            new_state, loss, bce, kld, _ = train_step(
                state, sub, b["inputs"], b["aux"]["flat_inputs"], b["operator"],
                b["aux"]["flat_operator"], b["mask"], kw,
            )
            return new_state, (sums[0] + loss, sums[1] + bce, sums[2] + kld)

        @jax.jit
        def eval_step_idx(state, rng_epoch, u, tree, idx, sums):
            sub = jax.random.fold_in(rng_epoch, 1 << 20 | u)
            b = IndexedBatch.gather(tree, idx)
            _, loss, bce, kld, _ = train_step(
                state, sub, b["inputs"], b["aux"]["flat_inputs"], b["operator"],
                b["aux"]["flat_operator"], b["mask"], jnp.float32(1.0),
            )
            return (sums[0] + loss, sums[1] + bce, sums[2] + kld)

    metrics_log = MetricsLogger(args.result_prefix, os.path.join(args.result_dir, "log"))
    for epoch in range(args.num_epoch):
        tl = tb = tk = 0.0
        kw = jnp.asarray(min(epoch / 10.0, 1.0), jnp.float32)
        if store is not None:
            rng, rng_epoch = jax.random.split(rng)
            sums = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
            for u in range(steps):
                b = store.batch(train_sampler.next_batch())
                state, sums = train_step_idx(state, rng_epoch, u, b.tree, b.idx, kw, sums)
                if u % 64 == 63:
                    jax.block_until_ready(sums[0])
            tl, tb, tk = (float(s) for s in sums)
        elif gp_store is not None:
            rng, rng_epoch = jax.random.split(rng)
            sums = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
            for u in range(steps):
                idx = jnp.asarray(
                    gp_store.indices(train_sampler.next_batch()), jnp.int32
                )
                state, sums = train_step_gp_idx(
                    state, rng_epoch, u, gp_store.op, gp_store.arrays, idx, kw, sums
                )
                if u % 64 == 63:
                    jax.block_until_ready(sums[0])
            tl, tb, tk = (float(s) for s in sums)
        else:
            fetch = MetricFetcher()

            def accum(vals):
                nonlocal tl, tb, tk
                if vals is not None:
                    tl += vals[0]; tb += vals[1]; tk += vals[2]

            for b in prefetch_over(train_sampler, make_batch, steps):
                rng, sub = jax.random.split(rng)
                x, fx, op, fop, mask = unpack(b)
                state, loss, bce, kld, recon = run_train_step(state, sub, x, fx, op, fop, mask, kw)
                accum(fetch.push(loss, bce, kld))
            accum(fetch.flush())
        log(f"Train epoch {epoch}, loss {tl/steps}, bce {tb/steps}, kld {tk/steps}")
        metrics_log.write(epoch, "train", loss=tl / steps, bce=tb / steps, kld=tk / steps)

        tl = tb = tk = 0.0
        if store is not None:
            sums = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
            for u in range(test_steps):
                b = store.batch(test_sampler.next_batch())
                sums = eval_step_idx(state, rng_epoch, u, b.tree, b.idx, sums)
            tl, tb, tk = (float(s) for s in sums)
        elif gp_store is not None:
            sums = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
            for u in range(test_steps):
                idx = jnp.asarray(
                    gp_store.indices(test_sampler.next_batch()), jnp.int32
                )
                sums = eval_step_gp_idx(
                    state, rng_epoch, u, gp_store.op, gp_store.arrays, idx, sums
                )
            tl, tb, tk = (float(s) for s in sums)
        else:
            for _ in range(test_steps):
                rng, sub = jax.random.split(rng)
                b = make_batch(test_sampler.next_batch())
                x, fx, op, fop, mask = unpack(b)
                _, loss, bce, kld, recon = run_train_step(
                    state, sub, x, fx, op, fop, mask, jnp.asarray(1.0), train=False
                )
                tl += float(loss); tb += float(bce); tk += float(kld)
        log(f"Test epoch {epoch}, loss {tl/test_steps}, bce {tb/test_steps}, kld {tk/test_steps}")
        metrics_log.write(
            epoch, "test", loss=tl / test_steps, bce=tb / test_steps, kld=tk / test_steps
        )
        metrics_log.plot()

        if args.dump_ply:
            # generative decode uses plain operators (single-device path)
            b = make_batch(test_sampler.next_batch(), plain=True)
            x, fx, op, fop, mask = unpack(b)
            noise = jnp.repeat(fixed_noise[: x.shape[0]], x.shape[1], axis=1)
            fake, _ = decode(state.params, fx, noise, fop, mask)
            out_dir = os.path.join(args.result_dir, f"results_{args.model}")
            os.makedirs(out_dir, exist_ok=True)
            for k in range(min(args.dump_ply, x.shape[0])):
                geo.save_ply(
                    os.path.join(out_dir, f"samples_epoch_{k:03d}_{epoch:03d}.ply"),
                    np.asarray(fake[k]),
                    np.asarray(b.faces[k]) if b.faces is not None else np.zeros((0, 3), np.int32),
                )
        checkpoint.save_checkpoint(
            os.path.join(args.result_dir, "pts", f"{args.result_prefix}.msgpack"),
            state.params, state.opt_state, epoch, int(state.step),
        )


if __name__ == "__main__":
    main()
