"""ARAP temporal-deformation trainer (reference: src/as_rigid_as_possible/main.py).

2 input frames -> 40 predicted frames, operator from the last input frame,
masked smooth-L1 sum loss, LR halved every 10 epochs past 50.
"""

from __future__ import annotations

import argparse
import functools
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from surfacenetworks_tpu import config
from surfacenetworks_tpu.cli.common import (
    MetricFetcher,
    MetricsLogger,
    Throughput,
    count_params,
    enable_compilation_cache,
    log_environment,
    make_logger,
)
from surfacenetworks_tpu.data import Buckets, OperatorCache, arap_batch, datasets, prefetch
from surfacenetworks_tpu.models import arap_models
from surfacenetworks_tpu.train import TrainState, checkpoint, losses, optim

parser = argparse.ArgumentParser(description="As Rigid As Possible (TPU)")
parser.add_argument("--batch-size", type=int, default=32)
parser.add_argument("--num-epoch", type=int, default=110)
parser.add_argument("--num-updates", type=int, default=1000)
parser.add_argument("--model", default="lap", help="lap | dir | avg | mlp | gcn")
parser.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 activations/matmuls, "
                         "fp32 params, optimizer state and BN statistics")
parser.add_argument("--layer", type=int, default=15)
parser.add_argument("--dense", action="store_true")
parser.add_argument("--first100", action="store_true")
parser.add_argument("--synthetic", type=int, default=0, help="N synthetic sequences")
parser.add_argument("--data-path", default="as_rigid_as_possible/data_plus")
parser.add_argument("--id", dest="result_prefix", default="test")
parser.add_argument("--result-dir", default="results/arap")
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--data-parallel", type=int, default=0,
                    help="shard the sequence batch across this many devices on the "
                         "'data' mesh axis (params replicated; batch size divisible)")
parser.add_argument("--graph-parallel", type=int, default=0,
                    help="edge-partition every per-frame operator's rows across this "
                         "many devices on the 'graph' mesh axis (lap and dir models; "
                         "ring halo exchange per apply, overlapped with interior compute)")
parser.add_argument("--seed", type=int, default=17)
parser.add_argument("--no-device-store", action="store_true",
                    help="disable the device-resident pick store (single-device "
                         "AND graph-parallel fast paths); keep the host "
                         "assemble-and-upload route, mainly for A/B timing")
parser.add_argument("--dump-rollout", default=None, metavar="DIR",
                    help="after training, render a predicted 2->40-frame rollout of a "
                         "test sequence as a GIF (viz.animate_sequence) + .npy dump "
                         "(the headless analogue of draw_meshes.py)")
config.add_config_flags(parser)

MODELS = {
    "lap": arap_models.Model,
    "avg": arap_models.AvgModel,
    "mlp": arap_models.MlpModel,
    "dir": arap_models.DirModel,
    "gcn": arap_models.GCNModel,
}

INPUT_FRAMES = 2
OUTPUT_FRAMES = 40


def load_sequences(args):
    if args.synthetic:
        return datasets.synthetic_arap_sequences(args.synthetic, seed=args.seed)
    files = sorted(glob.glob(os.path.join(args.data_path, "*.npy")))
    if args.first100:
        files = files[:100]
    return [datasets.load_arap_sequence(f) for f in files]


def main(argv=None):
    args = config.parse_with_config(parser, argv)
    log = make_logger(args.result_prefix, os.path.join(args.result_dir, "log"))
    log(args)
    enable_compilation_cache()
    log_environment(log)

    sequences = load_sequences(args)
    n_train = max(len(sequences) * 8 // 10, 1)
    n_gp = args.graph_parallel if args.graph_parallel > 1 else 0
    if n_gp:
        if args.model not in ("lap", "dir"):
            raise SystemExit("--graph-parallel supports the lap and dir models")
        if args.dense:
            raise SystemExit("--graph-parallel partitions sparse operators; drop --dense")
        if args.data_parallel > 1:
            raise SystemExit("--graph-parallel and --data-parallel are mutually exclusive here")
        from surfacenetworks_tpu.data import rcm_reorder_sequence

        sequences = [rcm_reorder_sequence(s) for s in sequences]
        if args.model == "dir":
            from surfacenetworks_tpu.dist import dirac_partition

            for seq in sequences:
                fperm = dirac_partition.sort_faces_for_partition(seq[0]["F"])
                for f in seq:
                    f["F"] = np.asarray(f["F"])[fperm]
                    f.pop("dirac", None)
    buckets = Buckets.for_samples(
        [{"V": s[0]["V"], "F": s[0]["F"]} for s in sequences],
        multiple=8 * n_gp if n_gp else 8,
    )
    rng_np = np.random.default_rng(args.seed)

    model = MODELS[args.model](layers=args.layer, dtype=jnp.bfloat16 if args.bf16 else None)

    batch_operator = None
    if n_gp:
        from surfacenetworks_tpu import native
        from surfacenetworks_tpu.dist import (
            dirac_partition, edge_partition, graph_parallel, make_mesh,
        )

        gmesh = make_mesh(n_data=1, n_graph=n_gp)
        # operator frames: the reference computes operators on the first 10
        # frames only; every pick's operator frame lands in [1, 9]
        op_frames = [
            (si, fi)
            for si, seq in enumerate(sequences)
            for fi in range(min(10, len(seq)))
            if (args.model == "dir" or "L" in seq[fi])
        ]
        if args.model == "dir":
            def _coeffs(f):
                c = f.get("dirac")
                return c if c is not None else native.dirac_coeffs(f["V"], f["F"])

            pops, floors = graph_parallel.prepartition_dirac(
                [_coeffs(sequences[si][fi]) for si, fi in op_frames],
                n_gp, buckets.n_vertices, buckets.n_faces,
                max_valence=buckets.max_valence,
            )
            _pcache = dict(zip(op_frames, pops))

            def batch_operator(picks):
                return dirac_partition.stack_partitioned_dirac(
                    [_pcache[(si, off + INPUT_FRAMES - 1)] for si, off in picks], **floors
                )
        else:
            pops, floors = graph_parallel.prepartition_ell(
                [sequences[si][fi]["L"] for si, fi in op_frames],
                n_gp, n_rows=buckets.n_vertices, k=buckets.ell_k,
            )
            _pcache = dict(zip(op_frames, pops))

            def batch_operator(picks):
                return edge_partition.stack_partitioned(
                    [_pcache[(si, off + INPUT_FRAMES - 1)] for si, off in picks], **floors
                )

    op_cache = OperatorCache()

    def _batch_of(picks, plain=False):
        op = batch_operator(picks) if (batch_operator and not plain) else None
        return arap_batch(
            sequences, picks, buckets, model="dirac" if args.model == "dir" else "lap",
            fmt="dense" if args.dense else "ell", operator=op, cache=op_cache,
        )

    def _valid_offsets(seq):
        # operators exist only on the first 10 frames (reference pipeline)
        mo = min(len(seq) - INPUT_FRAMES - OUTPUT_FRAMES, 10 - INPUT_FRAMES)
        return range(max(mo, 1))

    def sample_train_picks():
        picks = []
        for _ in range(args.batch_size):
            ind = int(rng_np.integers(0, n_train))
            max_off = len(sequences[ind]) - INPUT_FRAMES - OUTPUT_FRAMES
            max_off = min(max_off, 10 - INPUT_FRAMES)
            picks.append((ind, int(rng_np.integers(0, max(max_off, 1)))))
        return picks

    def sample_train():
        return _batch_of(sample_train_picks())

    test_counter = [0]

    def sample_test_picks():
        picks = []
        for _ in range(args.batch_size):
            ind = n_train + (test_counter[0] % max(len(sequences) - n_train, 1))
            off = test_counter[0] % max(
                min(len(sequences[ind]) - INPUT_FRAMES - OUTPUT_FRAMES, 10 - INPUT_FRAMES), 1
            )
            test_counter[0] += 1
            picks.append((ind, off))
        return picks

    def sample_test():
        return _batch_of(sample_test_picks())

    # init with a plain operator (param shapes are operator-representation
    # independent; partitioned ops only work inside the shard_map)
    b0 = _batch_of([(0, 0)] * args.batch_size, plain=True) if n_gp else sample_train()
    params = model.init(
        jax.random.key(0), b0.operator, jnp.asarray(b0.mask), jnp.asarray(b0.inputs)
    )["params"]
    log("Num parameters {}".format(count_params(params)))
    lr = optim.epoch_halving_schedule(args.lr, args.num_updates, 50, 10)
    state = TrainState.create(params, optim.adam(lr, weight_decay=1e-5))

    if n_gp:
        apply_fn = graph_parallel.make_graph_sharded_apply(
            gmesh,
            lambda p, op, mk, x: model.apply({"params": p}, op, mk, x),
            batch_axis=None,
        )
    else:
        def apply_fn(p, op, mk, x):
            return model.apply({"params": p}, op, mk, x)

    @jax.jit
    def train_step(state, operator, mask, inputs, targets):
        def objective(params):
            out = apply_fn(params, operator, mask, inputs)
            out = out * jnp.broadcast_to(mask, out.shape)
            return losses.smooth_l1_sum(out, targets, inputs.shape[0]), ()

        (loss, _), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(params, operator, mask, inputs, targets):
        out = apply_fn(params, operator, mask, inputs)
        out = out * jnp.broadcast_to(mask, out.shape)
        return losses.smooth_l1_sum(out, targets, inputs.shape[0])

    n_dp = args.data_parallel if args.data_parallel > 1 else 0
    if n_dp:
        if args.batch_size % n_dp:
            raise SystemExit(f"batch size {args.batch_size} not divisible by --data-parallel {n_dp}")
        from surfacenetworks_tpu.dist import make_dp_train_step, make_mesh, replicate, shard_batch

        dmesh = make_mesh(n_data=n_dp, n_graph=1)
        state = replicate(dmesh, state)

        def dp_apply(params, b):
            out = model.apply({"params": params}, b["operator"], b["mask"], b["inputs"])
            return out * jnp.broadcast_to(b["mask"], out.shape)

        def dp_loss(out, b):
            return losses.smooth_l1_sum(out, b["targets"], b["inputs"].shape[0]), {}

        dp_step = make_dp_train_step(dp_apply, dp_loss, dmesh, donate=False)

    def run_train_step(state, b):
        if n_dp:
            sb = shard_batch(dmesh, {
                "operator": b.operator, "mask": jnp.asarray(b.mask),
                "inputs": jnp.asarray(b.inputs), "targets": jnp.asarray(b.targets),
            })
            new_state, metrics = dp_step(state, sb)
            return new_state, metrics["loss"]
        return train_step(
            state, b.operator, jnp.asarray(b.mask), jnp.asarray(b.inputs),
            jnp.asarray(b.targets),
        )

    # device-resident pick store (single-device path): every valid
    # (sequence, offset) pick's packed single batch uploads once; steps
    # gather by pick index with the smooth-L1 sum riding inside the step's
    # executable.  Falls back to the host path past the HBM budget (real
    # ARAP datasets have thousands of picks; synthetic/evidence runs fit).
    store = None
    all_picks = [
        (si, off) for si in range(len(sequences)) for off in _valid_offsets(sequences[si])
    ]
    if not (n_gp or n_dp or args.dense or args.no_device_store):
        from surfacenetworks_tpu.data import DeviceDataset, IndexedBatch

        store = DeviceDataset.build(
            all_picks, lambda pick: _batch_of([pick]), value_keys=True
        )

    # device-resident GRAPH-PARALLEL pick store (round-5, the GP analogue):
    # the round-4 GP route re-stacked + re-uploaded each batch's partitioned
    # operator pytree every step.  Here every valid pick's partitioned
    # operator frame + padded arrays stack ONCE onto the ('data' x 'graph')
    # mesh (rows sharded over 'graph') and a GP batch is a [B]-index gather
    # fused inside the jit'd step — steady-state GP steps ship only the
    # index vector.  Scales src/as_rigid_as_possible/main.py:124-156's loop.
    gp_store = None
    if n_gp and not args.no_device_store:
        from surfacenetworks_tpu.dist import GraphStore

        # cheap byte estimate off one pick before stacking everything
        op1 = batch_operator([all_picks[0]])
        b1 = _batch_of([all_picks[0]], plain=True)
        per_pick = sum(
            getattr(leaf, "nbytes", 0) for leaf in jax.tree_util.tree_leaves(op1)
        ) + b1.mask.nbytes + b1.inputs.nbytes + b1.targets.nbytes
        if per_pick * len(all_picks) <= 6 << 30:
            op_stacked = batch_operator(all_picks)
            bs = [_batch_of([p], plain=True) for p in all_picks]
            arrays = {
                "mask": np.concatenate([np.asarray(b.mask) for b in bs], 0),
                "inputs": np.concatenate([np.asarray(b.inputs) for b in bs], 0),
                "targets": np.concatenate([np.asarray(b.targets) for b in bs], 0),
            }
            gp_store = GraphStore.build(gmesh, all_picks, op_stacked, arrays)
    if gp_store is not None:
        gp_pick_index = {p: i for i, p in enumerate(all_picks)}
        log(gp_store.stats())

        @functools.partial(jax.jit, donate_argnums=(0, 4))
        def train_step_gp_idx(state, op_s, arr_s, idx, sums):
            op_b, arr_b = gp_store.gather(op_s, arr_s, idx, batch_axis=None)
            new_state, loss = train_step(
                state, op_b, arr_b["mask"], arr_b["inputs"], arr_b["targets"]
            )
            return new_state, sums + loss

        @jax.jit
        def eval_step_gp_idx(params, op_s, arr_s, idx):
            op_b, arr_b = gp_store.gather(op_s, arr_s, idx, batch_axis=None)
            return eval_step(
                params, op_b, arr_b["mask"], arr_b["inputs"], arr_b["targets"]
            )

    if store is not None:

        @functools.partial(jax.jit, donate_argnums=(0, 3))
        def train_step_idx(state, tree, idx, sums):
            b = IndexedBatch.gather(tree, idx)
            new_state, loss = train_step(
                state, b["operator"], b["mask"], b["inputs"], b["targets"]
            )
            return new_state, sums + loss

    metrics_log = MetricsLogger(args.result_prefix, os.path.join(args.result_dir, "log"))
    for epoch in range(args.num_epoch):
        loss_sum = 0.0
        meter = Throughput()
        if store is not None:
            sums = jnp.float32(0)
            for u in range(args.num_updates):
                b = store.batch(sample_train_picks(), value_keys=True)
                state, sums = train_step_idx(state, b.tree, b.idx, sums)
                if u % 64 == 63:
                    jax.block_until_ready(sums)
                meter.tick(b.padded_vertex_count())
            loss_sum = float(sums)
        elif gp_store is not None:
            sums = jnp.float32(0)
            for u in range(args.num_updates):
                idx = jnp.asarray(
                    [gp_pick_index[p] for p in sample_train_picks()], jnp.int32
                )
                state, sums = train_step_gp_idx(
                    state, gp_store.op, gp_store.arrays, idx, sums
                )
                if u % 64 == 63:
                    jax.block_until_ready(sums)
                meter.tick(args.batch_size * buckets.n_vertices)
            loss_sum = float(sums)
        else:
            fetch = MetricFetcher()

            def accum(vals):
                nonlocal loss_sum
                if vals is not None:
                    loss_sum += vals[0]

            for b in prefetch(lambda _i: sample_train(), args.num_updates):
                state, loss = run_train_step(state, b)
                accum(fetch.push(loss))
                meter.tick(b.inputs.shape[0] * b.inputs.shape[1])
            accum(fetch.flush())
        log(f"Train epoch {epoch}, loss {loss_sum / args.num_updates}, {meter.report()}")
        metrics_log.write(
            epoch, "train", loss=loss_sum / args.num_updates, steps_per_s=meter.steps_per_s
        )

        test_trials = max(len(sequences) // 5 // args.batch_size, 1)
        loss_sum = 0.0
        for _ in range(test_trials):
            if gp_store is not None:
                idx = jnp.asarray(
                    [gp_pick_index[p] for p in sample_test_picks()], jnp.int32
                )
                loss_sum += float(
                    eval_step_gp_idx(state.params, gp_store.op, gp_store.arrays, idx)
                )
                continue
            b = sample_test()
            loss_sum += float(
                eval_step(
                    state.params, b.operator, jnp.asarray(b.mask), jnp.asarray(b.inputs),
                    jnp.asarray(b.targets),
                )
            )
        log(f"Test epoch {epoch}, loss {loss_sum / test_trials}")
        metrics_log.write(epoch, "test", loss=loss_sum / test_trials)
        metrics_log.plot()
        checkpoint.save_checkpoint(
            os.path.join(
                args.result_dir, "pts", f"{args.result_prefix}_{args.layer}_{args.model}.msgpack"
            ),
            state.params, state.opt_state, epoch, int(state.step),
        )

    if args.dump_rollout:
        from surfacenetworks_tpu import viz

        os.makedirs(args.dump_rollout, exist_ok=True)
        test_counter[0] = 0
        b = sample_test()
        out = model.apply(
            {"params": state.params}, b.operator, jnp.asarray(b.mask), jnp.asarray(b.inputs)
        )
        out = np.asarray(out * jnp.broadcast_to(jnp.asarray(b.mask), out.shape))
        seq = sequences[n_train if len(sequences) > n_train else 0]
        n = seq[0]["V"].shape[0]
        F = np.asarray(seq[0]["F"], np.int32)
        gt = [b.targets[0, :n, 3 * i : 3 * (i + 1)] for i in range(OUTPUT_FRAMES)]
        pred = [out[0, :n, 3 * i : 3 * (i + 1)] for i in range(OUTPUT_FRAMES)]
        np.save(os.path.join(args.dump_rollout, "rollout_pred.npy"), np.stack(pred))
        np.save(os.path.join(args.dump_rollout, "rollout_gt.npy"), np.stack(gt))
        gif = viz.animate_sequence(
            gt, F, os.path.join(args.dump_rollout, "rollout.gif"), pred_frames=pred
        )
        log(f"rollout dumped to {gif}")


if __name__ == "__main__":
    main()
