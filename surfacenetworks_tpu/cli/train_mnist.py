"""Mesh-MNIST classification trainer (reference: src/mesh_mnist/main.py).

Data: either ``--synthetic N`` height-field meshes (blob-count labels) or a
``--data-path`` pickle in the reference's ``train_plus.np`` layout.
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

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
from surfacenetworks_tpu.data import Buckets, OperatorCache, datasets, mnist_batch, prefetch
from surfacenetworks_tpu.models import mnist_models
from surfacenetworks_tpu.train import TrainState, checkpoint, losses, optim

parser = argparse.ArgumentParser(description="Mesh-MNIST classifier (TPU)")
parser.add_argument("--batch-size", type=int, default=64)
parser.add_argument("--num-epoch", type=int, default=1000)
parser.add_argument("--model", default="lap", help="lap | avg | mlp | dirac")
parser.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 activations/matmuls, "
                         "fp32 params, optimizer state and BN statistics")
parser.add_argument("--layer", type=int, default=5)
parser.add_argument("--synthetic", type=int, default=0)
parser.add_argument("--synthetic-classes", type=int, default=10,
                    help="label count for --synthetic (3 = distinguishable blob "
                         "counts, the convergence-evidence task)")
parser.add_argument("--synthetic-points", type=int, default=120,
                    help="points per synthetic mesh (more points = better-resolved blobs)")
parser.add_argument("--data-path", default=None, help="train_plus.np-style pickle")
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--result-prefix", default="mnist")
parser.add_argument("--result-dir", default="results/mesh_mnist")
parser.add_argument("--data-parallel", type=int, default=0,
                    help="shard the mesh batch across this many devices on the "
                         "'data' mesh axis (params replicated; batch size divisible)")
parser.add_argument("--graph-parallel", type=int, default=0,
                    help="edge-partition each mesh's operator rows across this many "
                         "devices on the 'graph' mesh axis (lap and dirac models; "
                         "mnist meshes are ~300 vertices so this is a symmetry/"
                         "correctness path, not a throughput one)")
parser.add_argument("--seed", type=int, default=17)
config.add_config_flags(parser)


MODELS = {
    "lap": mnist_models.Model,
    "avg": mnist_models.AvgModel,
    "mlp": mnist_models.MlpModel,
    "dirac": mnist_models.DirModel,
}


def load_data(args):
    if args.synthetic:
        data = datasets.synthetic_mnist_dataset(
            args.synthetic, seed=args.seed, n_classes=args.synthetic_classes,
            n_points=args.synthetic_points,
        )
    else:
        data = datasets.load_mnist_mesh_pickle(args.data_path)
    sep = max(1, int(len(data) * 0.8))
    return data[:sep], data[sep:]


def main(argv=None):
    args = config.parse_with_config(parser, argv)
    log = make_logger(args.result_prefix, os.path.join(args.result_dir, "log"))
    log(args)
    enable_compilation_cache()
    log_environment(log)

    train_data, test_data = load_data(args)
    model_key = "dirac" if args.model.startswith("dir") else args.model
    n_gp = args.graph_parallel if args.graph_parallel > 1 else 0
    if n_gp and model_key not in ("lap", "dirac"):
        raise SystemExit("--graph-parallel supports the lap and dirac models")
    if n_gp and args.data_parallel > 1:
        raise SystemExit("--graph-parallel and --data-parallel are mutually exclusive here")
    if n_gp:
        from surfacenetworks_tpu.data import rcm_reorder_sample

        train_data = [rcm_reorder_sample(s) for s in train_data]
        test_data = [rcm_reorder_sample(s) for s in test_data]
        if model_key == "dirac":
            from surfacenetworks_tpu.dist import dirac_partition

            for s in train_data + test_data:
                fperm = dirac_partition.sort_faces_for_partition(s["F"])
                s["F"] = np.asarray(s["F"])[fperm]
                s.pop("dirac", None)  # stale coeffs: they bake in face order
    buckets = Buckets.for_samples(train_data + test_data, multiple=8 * n_gp if n_gp else 8)
    model = MODELS[model_key](layers=args.layer, dtype=jnp.bfloat16 if args.bf16 else None)
    op_cache = OperatorCache()

    batch_operator = None
    if n_gp:
        from surfacenetworks_tpu.dist import (
            dirac_partition, edge_partition, graph_parallel, make_mesh,
        )

        gmesh = make_mesh(n_data=1, n_graph=n_gp)
        all_data = train_data + test_data
        if model_key == "dirac":
            from surfacenetworks_tpu import native

            def _coeffs(s):
                c = s.get("dirac")
                return c if c is not None else native.dirac_coeffs(s["V"], s["F"])

            pops, floors = graph_parallel.prepartition_dirac(
                [_coeffs(s) for s in all_data], n_gp,
                buckets.n_vertices, buckets.n_faces, max_valence=buckets.max_valence,
            )
            _pcache = {id(s): o for s, o in zip(all_data, pops)}

            def batch_operator(samples):
                return dirac_partition.stack_partitioned_dirac(
                    [_pcache[id(s)] for s in samples], **floors
                )
        else:
            pops, floors = graph_parallel.prepartition_ell(
                [s["L"] for s in all_data], n_gp,
                n_rows=buckets.n_vertices, k=buckets.ell_k,
            )
            _pcache = {id(s): o for s, o in zip(all_data, pops)}

            def batch_operator(samples):
                return edge_partition.stack_partitioned(
                    [_pcache[id(s)] for s in samples], **floors
                )

    def make_batch(samples, plain=False):
        op = batch_operator(samples) if (batch_operator and not plain) else None
        return mnist_batch(samples, buckets, model=model_key, cache=op_cache, operator=op)

    b0 = make_batch(train_data[: args.batch_size], plain=True)
    params = model.init(
        {"params": jax.random.key(0)},
        jnp.asarray(b0.inputs), b0.operator, jnp.asarray(b0.mask), deterministic=True,
    )["params"]
    log("Num parameters {}".format(count_params(params)))
    state = TrainState.create(params, optim.adam(args.lr, weight_decay=1e-5))

    @jax.jit
    def train_step(state, rng, operator, inputs, mask, targets):
        def objective(params):
            logp = model.apply(
                {"params": params}, inputs, operator, mask,
                deterministic=False, rngs={"dropout": rng},
            )
            return losses.nll_loss(logp, targets), losses.accuracy(logp, targets)

        (loss, acc), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, acc

    @jax.jit
    def eval_step(params, operator, inputs, mask, targets):
        logp = model.apply({"params": params}, inputs, operator, mask, deterministic=True)
        return losses.nll_loss(logp, targets), losses.accuracy(logp, targets)

    if n_gp:
        # whole-model graph-sharded execution: per-vertex body row-sharded
        # over 'graph', psum'd global pooling, replicated classifier head
        # (the dropout rng rides along replicated so every shard drops the
        # same pooled features)
        gp_train_apply = graph_parallel.make_graph_sharded_apply(
            gmesh,
            lambda p, op, mk, x, r: model.apply(
                {"params": p}, x, op, mk, deterministic=False, rngs={"dropout": r}
            ),
            out_vertex_sharded=False,
        )
        gp_eval_apply = graph_parallel.make_graph_sharded_apply(
            gmesh,
            lambda p, op, mk, x: model.apply({"params": p}, x, op, mk, deterministic=True),
            out_vertex_sharded=False,
        )

        @jax.jit
        def gp_train_step(state, rng_, operator, inputs, mask, targets):
            def objective(params):
                logp = gp_train_apply(params, operator, mask, inputs, rng_)
                return losses.nll_loss(logp, targets), losses.accuracy(logp, targets)

            (loss, acc), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
            return state.apply_gradients(grads), loss, acc

        @jax.jit
        def gp_eval_step(params, operator, inputs, mask, targets):
            logp = gp_eval_apply(params, operator, mask, inputs)
            return losses.nll_loss(logp, targets), losses.accuracy(logp, targets)

        def gp_place(b):
            op_d, arrs = graph_parallel.place_graph_batch(
                gmesh, b.operator,
                {"inputs": np.asarray(b.inputs), "mask": np.asarray(b.mask)},
            )
            return op_d, arrs

    n_dp = args.data_parallel if (args.data_parallel > 1 and not n_gp) else 0
    if n_dp:
        if args.batch_size % n_dp:
            raise SystemExit(f"batch size {args.batch_size} not divisible by --data-parallel {n_dp}")
        from surfacenetworks_tpu.dist import make_dp_train_step, make_mesh, replicate, shard_batch

        dmesh = make_mesh(n_data=n_dp, n_graph=1)
        state = replicate(dmesh, state)

        def dp_apply(params, b):
            return model.apply(
                {"params": params}, b["inputs"], b["operator"], b["mask"],
                deterministic=False, rngs={"dropout": b["rng"]},
            )

        def dp_loss(logp, b):
            return losses.nll_loss(logp, b["targets"]), {"acc": losses.accuracy(logp, b["targets"])}

        dp_step = make_dp_train_step(dp_apply, dp_loss, dmesh, donate=False)

    def run_train_step(state, sub, b):
        if n_gp:
            op_d, arrs = gp_place(b)
            return gp_train_step(
                state, sub, op_d, arrs["inputs"], arrs["mask"], jnp.asarray(b.targets)
            )
        if n_dp:
            sb = shard_batch(dmesh, {
                "operator": b.operator, "inputs": jnp.asarray(b.inputs),
                "mask": jnp.asarray(b.mask), "targets": jnp.asarray(b.targets),
                "rng": sub,
            })
            new_state, metrics = dp_step(state, sb)
            return new_state, metrics["loss"], metrics["acc"]
        return train_step(
            state, sub, b.operator, jnp.asarray(b.inputs), jnp.asarray(b.mask),
            jnp.asarray(b.targets),
        )

    rng = jax.random.key(args.seed)
    train_sampler = EpochSampler(train_data, args.batch_size, seed=args.seed)
    test_sampler = EpochSampler(test_data, args.batch_size, shuffle=False)
    steps_per_epoch = max(len(train_data) // args.batch_size, 1)
    test_steps = max(len(test_data) // args.batch_size, 1)
    metrics_log = MetricsLogger(args.result_prefix, os.path.join(args.result_dir, "log"))

    # device-resident dataset + one-dispatch steps (single-device path): the
    # batch gather, the per-step dropout key (fold_in of the step counter)
    # and the metric sums all live inside the step's executable
    store = None
    if not (n_gp or n_dp):
        from surfacenetworks_tpu.data import DeviceDataset, IndexedBatch

        store = DeviceDataset.build(
            train_data + test_data, lambda s: make_batch([s], plain=True)
        )

    if store is not None:

        @functools.partial(jax.jit, donate_argnums=(0, 5))
        def train_step_idx(state, rng_epoch, u, tree, idx, sums):
            sub = jax.random.fold_in(rng_epoch, u)
            b = IndexedBatch.gather(tree, idx)
            new_state, loss, acc = train_step(
                state, sub, b["operator"], b["inputs"], b["mask"], b["targets"]
            )
            return new_state, (sums[0] + loss, sums[1] + acc)

        @jax.jit
        def eval_step_idx(params, tree, idx):
            b = IndexedBatch.gather(tree, idx)
            return eval_step(params, b["operator"], b["inputs"], b["mask"], b["targets"])

    for epoch in range(args.num_epoch):
        loss_sum = acc_sum = 0.0
        if store is not None:
            rng, rng_epoch = jax.random.split(rng)
            sums = (jnp.float32(0), jnp.float32(0))
            for u in range(steps_per_epoch):
                b = store.batch(train_sampler.next_batch())
                state, sums = train_step_idx(state, rng_epoch, u, b.tree, b.idx, sums)
                if u % 64 == 63:
                    jax.block_until_ready(sums[0])
            loss_sum, acc_sum = (float(s) for s in sums)
        else:
            fetch = MetricFetcher()

            def accum(vals):
                nonlocal loss_sum, acc_sum
                if vals is not None:
                    loss_sum += vals[0]
                    acc_sum += vals[1]

            for b in prefetch(
                lambda _i: make_batch(train_sampler.next_batch()), steps_per_epoch
            ):
                rng, sub = jax.random.split(rng)
                state, loss, acc = run_train_step(state, sub, b)
                accum(fetch.push(loss, acc))
            accum(fetch.flush())
        log(f"Train epoch {epoch}, loss {loss_sum / steps_per_epoch}, acc {acc_sum / steps_per_epoch}")
        metrics_log.write(
            epoch, "train", loss=loss_sum / steps_per_epoch, acc=acc_sum / steps_per_epoch
        )

        if epoch > 20 and epoch % 10 == 0:
            pass  # LR halving folded into optimizer schedule when requested

        loss_sum = acc_sum = 0.0
        for _ in range(test_steps):
            if store is not None:
                b = store.batch(test_sampler.next_batch())
                loss, acc = eval_step_idx(state.params, b.tree, b.idx)
            elif n_gp:
                b = make_batch(test_sampler.next_batch())
                op_d, arrs = gp_place(b)
                loss, acc = gp_eval_step(
                    state.params, op_d, arrs["inputs"], arrs["mask"], jnp.asarray(b.targets)
                )
            else:
                b = make_batch(test_sampler.next_batch())
                loss, acc = eval_step(
                    state.params, b.operator, jnp.asarray(b.inputs), jnp.asarray(b.mask),
                    jnp.asarray(b.targets),
                )
            loss_sum += float(loss)
            acc_sum += float(acc)
        log(f"Test epoch {epoch}, loss {loss_sum / test_steps}, acc {acc_sum / test_steps}")
        metrics_log.write(
            epoch, "test", loss=loss_sum / test_steps, acc=acc_sum / test_steps
        )
        metrics_log.plot()
        checkpoint.save_checkpoint(
            os.path.join(args.result_dir, "pts", f"{args.result_prefix}.msgpack"),
            state.params, state.opt_state, epoch, int(state.step),
        )


if __name__ == "__main__":
    main()
