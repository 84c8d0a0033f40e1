"""Normal-prediction trainer CLI (reference: src/normal_predict/train_4_normal.py
+ the run_normal.py launcher).

Example (synthetic data, quick):
    python -m surfacenetworks_tpu.cli.train_normal --synthetic 8 \
        --model lap --layer 3 --num-epoch 2 --num-updates 10 --batch-size 2

With reference-style data (a directory tree of .obj files):
    python -m surfacenetworks_tpu.cli.train_normal --data-path /path/objs --model dirac
"""

from __future__ import annotations

import argparse
import functools
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from surfacenetworks_tpu import config
from surfacenetworks_tpu import models as zoo
from surfacenetworks_tpu.cli.common import (
    EpochSampler,
    MetricsLogger,
    Throughput,
    add_multihost_flags,
    count_params,
    enable_compilation_cache,
    log_environment,
    make_logger,
    maybe_initialize_multihost,
)
from surfacenetworks_tpu.data import (
    MetricAccumulator,
    OperatorCache,
    choose_operator_format,
    datasets,
    dirac_batch,
    laplacian_batch,
    prefetch_over,
    rcm_reorder_sample,
    round_up,
)
from surfacenetworks_tpu.train import TrainState, checkpoint, losses, optim

parser = argparse.ArgumentParser(description="Normal Predictor (TPU)")
parser.add_argument("--model", default="lap", help="lap | dirac | avg | mlp | id | gat | cas")
parser.add_argument("--layer", type=int, default=15)
parser.add_argument("--batch-size", type=int, default=1)
parser.add_argument("--num-epoch", type=int, default=500)
parser.add_argument("--start-epoch", type=int, default=0)
parser.add_argument("--num-updates", type=int, default=500)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
parser.add_argument("--half-lr", type=int, default=-1, help="halve LR every N epochs past 100")
parser.add_argument("--data-path", default=None, help="obj tree root")
parser.add_argument("--test-path", default="@")
parser.add_argument("--synthetic", type=int, default=0, help="use N synthetic meshes instead of files")
parser.add_argument("--synthetic-points", type=int, default=150,
                    help="points per synthetic mesh (use 1000-2000 for "
                         "flagship-scale evidence runs)")
parser.add_argument("--no-test", action="store_true")
parser.add_argument("--uniform-mesh", action="store_true")
parser.add_argument("--additional-opt", default=[], action="append",
                    choices=["hack1", "hack0", "amsgrad", "intrinsic", ""])
parser.add_argument("--operator-format", default="auto", choices=["auto", "ell", "bsr", "dense"])
parser.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 activations/matmuls, "
                         "fp32 params, optimizer state and BN statistics")
parser.add_argument("--data-parallel", type=int, default=0,
                    help="shard the mesh batch across this many devices on the 'data' "
                         "mesh axis (params replicated, GSPMD gradient all-reduce); "
                         "batch size must be divisible by it")
parser.add_argument("--graph-parallel", type=int, default=0,
                    help="edge-partition every operator's rows across this many devices "
                         "on the 'graph' mesh axis (lap and dirac models; ring halo "
                         "exchange per apply, overlapped with interior compute)")
parser.add_argument("--buckets", type=int, default=1,
                    help="number of size tiers for multi-bucket padding (each batch "
                         "pads to the smallest tier that fits; costs one XLA "
                         "compilation per tier)")
parser.add_argument("--cascade-levels", type=int, default=4, help="pyramid depth for --model cas")
parser.add_argument("--result-prefix", default="debug")
parser.add_argument("--result-dir", default="results/normal_predict")
parser.add_argument("--deser", default=None)
parser.add_argument("--only-forward-test", action="store_true")
parser.add_argument("--dump-dir", default="/tmp")
parser.add_argument("--debug", action="store_true")
parser.add_argument("--no-device-store", action="store_true",
                    help="disable the device-resident dataset fast path "
                         "(host batch assembly every step; for A/B checks)")
parser.add_argument("--rotate-augment", action="store_true",
                    help="random 3D rotation per mesh per TRAIN step, applied "
                         "to inputs AND normal targets INSIDE the jit'd step "
                         "(keyed off the optimizer step — zero per-step H2D); "
                         "the normals task is rotation-covariant, so this is "
                         "the natural analogue of the reference's FAUST "
                         "xz/xy-rotation augmentation")
parser.add_argument("--flip-variants", type=int, default=0, metavar="K",
                    help="append K constrained-edge-flip variants of every "
                         "train mesh at startup (geometry.repair."
                         "constrained_edge_flip — the reference's "
                         "geom_utils:39-108 augmentation), with recomputed "
                         "operators and normal targets; variants live in the "
                         "device store like any sample, so augmentation costs "
                         "nothing per step")
parser.add_argument("--seed", type=int, default=17)
parser.add_argument("--jax-profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the first training epoch")
add_multihost_flags(parser)
config.add_config_flags(parser)


def build_model(args):
    dt = jnp.bfloat16 if getattr(args, "bf16", False) else None
    if args.model == "cas":
        from surfacenetworks_tpu.models.cascade import EfficientCascade

        return EfficientCascade(3, 3, cascade_levels=args.cascade_levels, dtype=dt)
    if "avg" in args.model:
        return zoo.AvgModel(3, 3, args.layer, dtype=dt)
    if args.model == "mlp":
        return zoo.MlpModel(3, 3, args.layer, dtype=dt)
    if args.model == "id":
        return zoo.IdDeepModel(3, 3, args.layer, dtype=dt)
    if args.model == "gat":
        return zoo.GatDeepModel(3, 3, args.layer, dtype=dt)
    if args.model.startswith("dirac"):
        return zoo.DirDeepModel(3, 3, args.layer, dtype=dt)
    return zoo.LapDeepModel(3, 3, layers=args.layer, dtype=dt)


def load_samples(args, log):
    operator = "dirac" if args.model.startswith("dirac") else "lap"
    hack = 0.0 if "hack0" in args.additional_opt else 1.0
    if args.synthetic:
        samples = datasets.synthetic_normal_dataset(
            args.synthetic, n_points=args.synthetic_points, seed=args.seed,
            operator=operator, hack=hack,
        )
        random.shuffle(samples)
        sep = max(1, int(len(samples) * 0.8))
        return samples[:sep], samples[sep:]
    names = datasets.scan_mesh_tree(args.data_path)
    log(f"SEQ:{len(names)}")
    if args.test_path != "@":
        train_names, test_names = names, datasets.scan_mesh_tree(args.test_path)
    else:
        sep = len(names) // 10 * 8
        random.shuffle(names)
        train_names, test_names = names[:sep], names[sep:]

    def load_all(paths):
        out = []
        for p in paths:
            if p.endswith(".npz"):  # preprocessed offline (cli.preprocess normal)
                s = datasets.load_normal_npz(p)
            else:
                s = datasets.load_normal_sample(
                    p, operator=operator, hack=hack, uniform_mesh=args.uniform_mesh
                )
            if s is not None:
                out.append(s)
        return out

    return load_all(train_names), load_all(test_names)


def main(argv=None):
    args = config.parse_with_config(parser, argv)
    random.seed(args.seed)
    log = make_logger(args.result_prefix, os.path.join(args.result_dir, "log"), args.debug)
    log(args)
    enable_compilation_cache()
    maybe_initialize_multihost(args, log)
    log_environment(log)
    if not args.debug:
        config.dump_config(
            args, os.path.join(args.result_dir, "cfg", f"{args.result_prefix}.json")
        )

    train_samples, test_samples = load_samples(args, log)
    if args.flip_variants > 0:
        from surfacenetworks_tpu import geometry as geo
        from surfacenetworks_tpu.geometry import repair

        hack = 0.0 if "hack0" in args.additional_opt else 1.0
        rng_f = np.random.default_rng(args.seed + 101)
        extra = []
        for s in train_samples:
            for k in range(args.flip_variants):
                _, F2 = repair.constrained_edge_flip(
                    s["V"], s["F"], num_flipped_edges=max(s["F"].shape[0] // 10, 4),
                    rng=rng_f,
                )
                v = {
                    "V": s["V"], "F": np.asarray(F2, dtype=np.asarray(s["F"]).dtype),
                    "input": s["input"],
                    "target": geo.vertex_normals(s["V"], F2).astype(np.float32),
                    "name": f"{s.get('name', 'mesh')}_flip{k}",
                }
                if args.model.startswith("dirac"):
                    from surfacenetworks_tpu import native

                    v["dirac"] = native.dirac_coeffs(v["V"], v["F"])
                else:
                    v["L"] = geo.igl_style_laplacian(v["V"], v["F"], hack=hack)
                extra.append(v)
        train_samples = train_samples + extra
        log(f"flip augmentation: +{len(extra)} variants "
            f"({args.flip_variants} per train mesh)")
    log(f"Train size: {len(train_samples)} Test size: {len(test_samples)}")

    is_dirac = args.model.startswith("dirac")
    n_gp = args.graph_parallel if args.graph_parallel > 1 else 0
    if args.operator_format == "auto" and args.model == "lap" and not n_gp:
        # resolve 'auto' against the DATASET shape so the BSR/MXU fast path
        # (13x the ELL fallback at FAUST scale) is the default, not opt-in:
        # lap models above the dense window get RCM-reordered BSR operators
        nv_all = max((s["V"].shape[0] for s in train_samples + test_samples), default=0)
        args.operator_format = choose_operator_format(
            args.batch_size, round_up(nv_all, 8), rcm_ok=True
        )
        log(f"operator format auto -> {args.operator_format}")
    if args.model == "gat" and args.operator_format != "ell":
        args.operator_format = "ell"  # attention scores sample the ELL pattern
        log("operator format -> ell (gat attends over the operator pattern)")
    gp_interior = "ell"
    gp_dp = args.data_parallel if (n_gp and args.data_parallel > 1) else 0
    if n_gp:
        if args.model not in ("lap", "dirac", "gat"):
            raise SystemExit("--graph-parallel supports the lap, dirac and gat models")
        if gp_dp and args.batch_size % gp_dp:
            raise SystemExit(
                f"batch size {args.batch_size} not divisible by --data-parallel {gp_dp}"
            )
        if args.operator_format == "bsr" and not is_dirac:
            gp_interior = "bsr"  # MXU block interior of the partitioned operator
        elif args.operator_format not in ("auto", "ell"):
            raise SystemExit("--graph-parallel supports ell or bsr operator formats")
        args.operator_format = "ell"
    if (args.operator_format == "bsr" and not is_dirac) or n_gp or args.model == "gat":
        # gat: RCM gives the ELL pattern a tight banded window, which routes
        # attention through the banded-window formulation (nn.blocks
        # _gat_attend_banded — no HBM gathers) instead of per-slot gathers
        train_samples = [rcm_reorder_sample(s) for s in train_samples]
        test_samples = [rcm_reorder_sample(s) for s in test_samples]
    if n_gp and is_dirac:
        # narrow Dirac halos need face index correlated with vertex index
        from surfacenetworks_tpu.dist import dirac_partition

        for s in train_samples + test_samples:
            fperm = dirac_partition.sort_faces_for_partition(s["F"])
            s["F"] = np.asarray(s["F"])[fperm]
            s.pop("dirac", None)  # stale coeffs: they bake in face order

    all_samples = train_samples + test_samples
    n_tiers = max(args.buckets, 1)
    if n_tiers > 1 and args.model == "cas":
        raise SystemExit("--buckets > 1 does not support the cascade model "
                         "(one pyramid bucket chain per run)")
    from surfacenetworks_tpu.data import BucketSet

    bucketset = BucketSet.for_samples(
        all_samples,
        n_tiers=n_tiers,
        multiple=128 if args.operator_format == "bsr" else (
            (128 if gp_interior == "bsr" else 8) * n_gp if n_gp else 8
        ),
    )
    buckets = bucketset.tiers[-1]  # dataset-max tier (cascade/init paths)
    if args.operator_format == "bsr" and not is_dirac:
        from surfacenetworks_tpu.data.batching import fit_bsr_k

        fit_bsr_k([s for s in all_samples if "L" in s], bucketset)
    if len(bucketset.tiers) > 1:
        log(f"bucket tiers: {[(b.n_vertices, b.n_faces) for b in bucketset.tiers]}")
    # pack-once operator cache: every sample's operator is converted to its
    # device format exactly once per tier and reused across all epochs (the
    # reference preloads once, train_4_normal.py:195-218; round-3 trainers
    # re-packed from scipy every step and ran >90% host-bound)
    op_cache = OperatorCache()
    if args.model == "cas":
        # fine bucket must be divisible by 2**(levels-1) for the pool chain
        from surfacenetworks_tpu.data import cascade_batch

        n_bucket = round_up(buckets.n_vertices, 2 ** (args.cascade_levels - 1))

        def make_batch(samples):
            return cascade_batch(samples, args.cascade_levels, n_bucket, cache=op_cache)
    else:
        batch_operator = None
        if n_gp:
            # Pre-partition every sample once AT ITS OWN TIER's row count
            # (shared per-tier halos and boundary floors -> one jit
            # compilation per tier); per batch, stack the cached per-mesh
            # partitions.  n_tiers == 1 degenerates to the dataset-wide
            # single-compilation layout.
            from surfacenetworks_tpu.dist import (
                dirac_partition, edge_partition, graph_parallel, make_mesh,
            )

            # DP x GP composition: mesh batch over 'data', vertex rows over
            # 'graph' (the dryrun-proven ('data','graph') layout, now a
            # trainer capability)
            gmesh = make_mesh(n_data=max(gp_dp, 1), n_graph=n_gp)
            if is_dirac:
                from surfacenetworks_tpu import native

                def _coeffs(s):
                    c = s.get("dirac")
                    return c if c is not None else native.dirac_coeffs(s["V"], s["F"])

            _pcache: dict = {}
            _tier_floors: list = []
            for ti, tb in enumerate(bucketset.tiers):
                tier_samples = [
                    s for s in all_samples if bucketset.tier_index([s]) == ti
                ]
                if not tier_samples:
                    _tier_floors.append(None)
                    continue
                if is_dirac:
                    pops, floors = graph_parallel.prepartition_dirac(
                        [_coeffs(s) for s in tier_samples], n_gp,
                        tb.n_vertices, tb.n_faces, max_valence=tb.max_valence,
                    )
                else:
                    pops, floors = graph_parallel.prepartition_ell(
                        [s["L"] for s in tier_samples], n_gp,
                        n_rows=tb.n_vertices, k=tb.ell_k, interior_fmt=gp_interior,
                    )
                _tier_floors.append(floors)
                _pcache.update({id(s): o for s, o in zip(tier_samples, pops)})

            def batch_operator(samples):
                floors = _tier_floors[bucketset.tier_index(samples)]
                pops = [_pcache[id(s)] for s in samples]
                if is_dirac:
                    return dirac_partition.stack_partitioned_dirac(pops, **floors)
                return edge_partition.stack_partitioned(pops, **floors)

        def make_batch(samples, plain=False):
            op = batch_operator(samples) if (batch_operator and not plain) else None
            b = bucketset.select(samples) if len(bucketset.tiers) > 1 else buckets
            if is_dirac:
                return dirac_batch(samples, b, operator=op, cache=op_cache)
            return laplacian_batch(
                samples, b, fmt=args.operator_format, operator=op,
                op_dtype=jnp.bfloat16
                if (args.bf16 and args.operator_format == "bsr")
                else None,
                cache=op_cache,
            )

    model = build_model(args)
    init_samples = train_samples[: args.batch_size] or all_samples[: args.batch_size]
    init_batch = (
        make_batch(init_samples, plain=True) if n_gp else make_batch(init_samples)
    )
    params = model.init(
        jax.random.key(0),
        init_batch.operator,
        jnp.asarray(init_batch.mask),
        jnp.asarray(init_batch.inputs),
    )["params"]
    log("Num parameters {}".format(count_params(params)))

    if args.half_lr > 0:
        lr = optim.epoch_halving_schedule(args.lr, args.num_updates, 100, args.half_lr)
    else:
        lr = args.lr
    if args.optimizer == "adam":
        tx = optim.adam(lr, amsgrad="amsgrad" in args.additional_opt)
    else:
        tx = optim.sgd(lr)
    state = TrainState.create(params, tx)

    ckpt_path = os.path.join(args.result_dir, "pts", f"{args.result_prefix}_normal_state.msgpack")
    start_epoch = args.start_epoch
    if args.deser:
        log("Continue...")
        params, opt_state, start_epoch, step = checkpoint.restore_training(
            args.deser, state.params, state.opt_state
        )
        state = state.replace(params=params, step=jnp.asarray(step, jnp.int32))
        if opt_state is not None:
            state = state.replace(opt_state=opt_state)
        else:
            log("Warning: Optimizer is not loaded")

    if n_gp:
        apply_fn = graph_parallel.make_graph_sharded_apply(
            gmesh,
            lambda p, op, mk, x: model.apply({"params": p}, op, mk, x),
            batch_axis="data" if gp_dp else None,
        )
    else:
        def apply_fn(p, op, mk, x):
            return model.apply({"params": p}, op, mk, x)

    def _rand_rotations(key, B):
        """[B, 3, 3] random rotations (XYZ Euler composition) — in-jit
        train-time augmentation; normals are rotation-covariant so targets
        rotate with the mesh."""
        ang = jax.random.uniform(key, (B, 3), maxval=2 * np.pi)
        c, s = jnp.cos(ang), jnp.sin(ang)
        z = jnp.zeros_like(c[:, 0])
        one = jnp.ones_like(z)

        def rows(r0, r1, r2):
            return jnp.stack(
                [jnp.stack(r0, -1), jnp.stack(r1, -1), jnp.stack(r2, -1)], -2
            )

        Rx = rows([one, z, z], [z, c[:, 0], -s[:, 0]], [z, s[:, 0], c[:, 0]])
        Ry = rows([c[:, 1], z, s[:, 1]], [z, one, z], [-s[:, 1], z, c[:, 1]])
        Rz = rows([c[:, 2], -s[:, 2], z], [s[:, 2], c[:, 2], z], [z, z, one])
        return Rz @ Ry @ Rx

    def _maybe_rotate(step, inputs, targets):
        if not args.rotate_augment:
            return inputs, targets
        key = jax.random.fold_in(jax.random.key(args.seed), step)
        R = _rand_rotations(key, inputs.shape[0])
        return (
            jnp.einsum("bnc,bcd->bnd", inputs, R),
            jnp.einsum("bnc,bcd->bnd", targets, R),
        )

    @jax.jit
    def train_step(state, operator, mask, inputs, targets):
        inputs, targets = _maybe_rotate(state.step, inputs, targets)

        def objective(params):
            out = apply_fn(params, operator, mask, inputs)
            loss = losses.normal_cosine_loss(out, mask, targets)
            mad = losses.mean_angle_deviation(out, mask, targets)
            return loss, mad

        (loss, mad), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, mad

    n_dp = args.data_parallel if (args.data_parallel > 1 and not n_gp) else 0
    if n_dp:
        if args.model == "cas":
            raise SystemExit("--data-parallel does not support the cascade model")
        if args.batch_size % n_dp:
            raise SystemExit(f"batch size {args.batch_size} not divisible by --data-parallel {n_dp}")
        from surfacenetworks_tpu.dist import make_dp_train_step, make_mesh, replicate, shard_batch

        dmesh = make_mesh(n_data=n_dp, n_graph=1)
        state = replicate(dmesh, state)

        def dp_apply(params, b):
            return model.apply({"params": params}, b["operator"], b["mask"], b["inputs"])

        def dp_loss(out, b):
            loss = losses.normal_cosine_loss(out, b["mask"], b["targets"])
            return loss, {"mad": losses.mean_angle_deviation(out, b["mask"], b["targets"])}

        dp_step = make_dp_train_step(dp_apply, dp_loss, dmesh, donate=False)

    if n_gp and jax.process_count() > 1:
        # multihost graph parallel: params replicated globally, batches
        # placed row-sharded across the process-spanning mesh
        from surfacenetworks_tpu.dist import replicate as _replicate

        state = _replicate(gmesh, state)

    def gp_place(batch):
        op_d, arrs = graph_parallel.place_graph_batch(
            gmesh,
            batch.operator,
            {
                "mask": np.asarray(batch.mask),
                "inputs": np.asarray(batch.inputs),
                "targets": np.asarray(batch.targets),
            },
            batch_axis="data" if gp_dp else None,
        )
        return op_d, arrs

    def run_train_step(state, batch):
        # host-path dispatch only: IndexedBatch steps go straight through
        # train_step_idx in the epoch loop (they carry the metric sums)
        if n_dp:
            b = shard_batch(dmesh, {
                "operator": batch.operator,
                "mask": jnp.asarray(batch.mask),
                "inputs": jnp.asarray(batch.inputs),
                "targets": jnp.asarray(batch.targets),
            })
            new_state, metrics = dp_step(state, b)
            return new_state, metrics["loss"], metrics["mad"]
        if n_gp:
            op_d, arrs = gp_place(batch)
            return train_step(state, op_d, arrs["mask"], arrs["inputs"], arrs["targets"])
        return train_step(
            state,
            batch.operator,
            jnp.asarray(batch.mask),
            jnp.asarray(batch.inputs),
            jnp.asarray(batch.targets),
        )

    @jax.jit
    def eval_step(params, operator, mask, inputs, targets):
        out = apply_fn(params, operator, mask, inputs)
        return (
            losses.normal_cosine_loss(out, mask, targets),
            losses.mean_angle_deviation(out, mask, targets),
            out,
        )

    if len(bucketset.tiers) > 1:
        from surfacenetworks_tpu.cli.common import TieredSampler

        train_sampler = TieredSampler(train_samples, bucketset, args.batch_size, seed=args.seed)
        test_sampler = (
            TieredSampler(test_samples, bucketset, args.batch_size, shuffle=False)
            if test_samples
            else EpochSampler(test_samples, args.batch_size, shuffle=False)
        )
    else:
        train_sampler = EpochSampler(train_samples, args.batch_size, seed=args.seed)
        test_sampler = EpochSampler(test_samples, args.batch_size, shuffle=False)

    # Whole-dataset device residency: every sample's packed batch uploads
    # once as stacked [S, ...] arrays; a training batch is an [B]-index
    # gather fused INSIDE the jit'd step, so steady-state steps ship only
    # the index vector.  One dataset per bucket tier (tier shapes differ).
    # Under --data-parallel the dataset replicates over the mesh and the
    # step's sharding constraints split the gathered batch on 'data'.  The
    # GP path keeps the host route (row-sharded placement per batch).
    store_tiers = None
    if not n_gp and not args.no_device_store:
        from surfacenetworks_tpu.data import DeviceDataset

        place = None
        if n_dp:
            from surfacenetworks_tpu.dist import replicate as _replicate_tree

            place = lambda t: _replicate_tree(dmesh, t)
        store_tiers = {}
        for ti in range(len(bucketset.tiers)):
            tier_samples = [
                s for s in all_samples if bucketset.tier_index([s]) == ti
            ] if len(bucketset.tiers) > 1 else all_samples
            if not tier_samples:
                continue
            ds = DeviceDataset.build(tier_samples, lambda s: make_batch([s]), place=place)
            if ds is None:  # over the HBM budget: keep the host path
                store_tiers = None
                break
            store_tiers[ti] = ds

    # Device-resident GRAPH-PARALLEL store (round-5): the round-4 GP path
    # re-placed each batch's partitioned operator pytree with put_global
    # every step — the largest arrays in the step shipped host->device per
    # batch.  Here each tier's samples stack their pre-partitioned
    # operators + padded arrays ONCE onto the ('data' x 'graph') mesh
    # (sample axis replicated, rows sharded) and a batch is a [B]-index
    # gather fused inside the jit'd step — zero per-step H2D beyond the
    # index vector, matching the DP fast path's structure.
    gp_stores = None
    if n_gp and not args.no_device_store and not args.only_forward_test:
        from surfacenetworks_tpu.dist import GraphStore

        gp_stores = {}
        for ti in range(len(bucketset.tiers)):
            tier_samples = [
                s for s in all_samples if bucketset.tier_index([s]) == ti
            ] if len(bucketset.tiers) > 1 else all_samples
            if not tier_samples:
                continue
            op_stacked = batch_operator(tier_samples)
            bs = [make_batch([s], plain=True) for s in tier_samples]
            arrays = {
                "mask": np.concatenate([np.asarray(b.mask) for b in bs], 0),
                "inputs": np.concatenate([np.asarray(b.inputs) for b in bs], 0),
                "targets": np.concatenate([np.asarray(b.targets) for b in bs], 0),
            }
            st = GraphStore.build(gmesh, tier_samples, op_stacked, arrays)
            if st is None:  # over the HBM budget: keep the host route
                gp_stores = None
                break
            gp_stores[ti] = st

    if args.rotate_augment and n_dp and store_tiers is None:
        raise SystemExit("--rotate-augment under --data-parallel needs the "
                         "device-store fast path (dataset exceeded the HBM "
                         "budget); the host DP route has no step counter to "
                         "key the in-jit rotation off")

    def batch_fn(samples):
        if store_tiers is None:
            return make_batch(samples)
        ti = bucketset.tier_index(samples) if len(bucketset.tiers) > 1 else 0
        return store_tiers[ti].batch(samples)

    from surfacenetworks_tpu.data import IndexedBatch, padded_vertex_count

    if n_dp and store_tiers is not None:
        # DP fast path: dataset replicated over the mesh; the gathered batch
        # is constrained to batch-axis sharding so GSPMD splits the model
        # compute across 'data' and all-reduces the gradients — still one
        # dispatch per step, zero per-step H2D beyond the index vector
        from jax.sharding import NamedSharding, PartitionSpec as P

        _batch_sh = NamedSharding(dmesh, P("data"))
        _rep_sh = NamedSharding(dmesh, P())

        @functools.partial(jax.jit, donate_argnums=(0, 3))
        def train_step_idx(state, tree, idx, sums):
            b = IndexedBatch.gather(tree, idx)
            b = jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(a, _batch_sh), b
            )
            b["inputs"], b["targets"] = _maybe_rotate(
                state.step, b["inputs"], b["targets"]
            )

            def objective(params):
                out = apply_fn(params, b["operator"], b["mask"], b["inputs"])
                loss = losses.normal_cosine_loss(out, b["mask"], b["targets"])
                mad = losses.mean_angle_deviation(out, b["mask"], b["targets"])
                return loss, mad

            (loss, mad), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
            grads = jax.lax.with_sharding_constraint(
                grads, jax.tree_util.tree_map(lambda _: _rep_sh, grads)
            )
            return state.apply_gradients(grads), (sums[0] + loss, sums[1] + mad)
    else:

        @functools.partial(jax.jit, donate_argnums=(0, 3))
        def train_step_idx(state, tree, idx, sums):
            # batch gather AND metric accumulation fused into the step's
            # single executable: a steady-state step is exactly one dispatch,
            # no tiny eager adds (each would cost a separate device launch).
            # state and sums are donated (aliased in place): measured -30%
            # step wall at flagship scale (no param/opt-state copy per step)
            b = IndexedBatch.gather(tree, idx)
            new_state, loss, mad = train_step(
                state, b["operator"], b["mask"], b["inputs"], b["targets"]
            )
            return new_state, (sums[0] + loss, sums[1] + mad)

    @jax.jit
    def eval_step_idx(params, tree, idx):
        b = IndexedBatch.gather(tree, idx)
        return eval_step(params, b["operator"], b["mask"], b["inputs"], b["targets"])

    if gp_stores is not None:
        _gp_gather = next(iter(gp_stores.values())).gather
        _gp_batch_axis = "data" if gp_dp else None

        @functools.partial(jax.jit, donate_argnums=(0, 4))
        def train_step_gp_idx(state, op_s, arr_s, idx, sums):
            op_b, arr_b = _gp_gather(op_s, arr_s, idx, batch_axis=_gp_batch_axis)
            new_state, loss, mad = train_step(
                state, op_b, arr_b["mask"], arr_b["inputs"], arr_b["targets"]
            )
            return new_state, (sums[0] + loss, sums[1] + mad)

        @jax.jit
        def eval_step_gp_idx(params, op_s, arr_s, idx):
            op_b, arr_b = _gp_gather(op_s, arr_s, idx, batch_axis=_gp_batch_axis)
            return eval_step(
                params, op_b, arr_b["mask"], arr_b["inputs"], arr_b["targets"]
            )

    metrics_log = MetricsLogger(args.result_prefix, os.path.join(args.result_dir, "log"), args.debug)
    profiling = False
    for epoch in range(start_epoch, args.num_epoch):
        if args.jax_profile and epoch == start_epoch and not args.only_forward_test:
            jax.profiler.start_trace(args.jax_profile)
            profiling = True
        if not args.only_forward_test:
            meter = Throughput()
            if store_tiers is not None:
                # Device-dataset path: batch assembly is a 0.1 ms index
                # lookup (no prefetch thread — it would only add GIL handoff
                # latency) and the metric sums ride INSIDE the step's
                # executable, so a steady-state step is one dispatch and the
                # epoch costs one device sync at the end.
                sums = (jnp.float32(0), jnp.float32(0))
                for u in range(args.num_updates):
                    batch = batch_fn(train_sampler.next_batch())
                    state, sums = train_step_idx(state, batch.tree, batch.idx, sums)
                    if u % 64 == 63:
                        # bound dispatch-ahead depth; a readiness check is a
                        # full device round trip, so sync sparsely
                        jax.block_until_ready(sums[0])
                    meter.tick(padded_vertex_count(batch))
                loss_sum, mad_sum = (float(s) for s in sums)
            elif gp_stores is not None:
                # GP device-store path: per step only the [B] sample-index
                # vector ships; the partitioned operators live row-sharded
                # on the mesh (placed once at startup)
                sums = (jnp.float32(0), jnp.float32(0))
                for u in range(args.num_updates):
                    samples = train_sampler.next_batch()
                    ti = bucketset.tier_index(samples) if len(bucketset.tiers) > 1 else 0
                    st = gp_stores[ti]
                    state, sums = train_step_gp_idx(
                        state, st.op, st.arrays, jnp.asarray(st.indices(samples)), sums
                    )
                    if u % 64 == 63:
                        jax.block_until_ready(sums[0])
                    meter.tick(len(samples) * bucketset.tiers[ti].n_vertices)
                loss_sum, mad_sum = (float(s) for s in sums)
            else:
                # host path (DP/GP): batch t+1 assembles on a background
                # thread while the device runs step t; metrics accumulate on
                # device with one fetch per epoch
                acc = MetricAccumulator()
                for batch in prefetch_over(train_sampler, batch_fn, args.num_updates):
                    state, loss, mad = run_train_step(state, batch)
                    acc.add(loss, mad)
                    meter.tick(padded_vertex_count(batch))
                loss_sum, mad_sum = acc.sums()
            if not np.isfinite(loss_sum):
                raise FloatingPointError(f"NaN loss at epoch {epoch}")
            log(
                "Train {}, loss {}, mad {}, {}".format(
                    epoch, loss_sum / args.num_updates, mad_sum / args.num_updates, meter.report()
                )
            )
            metrics_log.write(
                epoch, "train", loss=loss_sum / args.num_updates,
                mad=mad_sum / args.num_updates, steps_per_s=meter.steps_per_s,
            )
            if epoch == start_epoch:
                log(
                    " + ".join(d.stats() for d in store_tiers.values())
                    if store_tiers else (
                        " + ".join(d.stats() for d in gp_stores.values())
                        if gp_stores is not None else op_cache.stats()
                    )
                )
            if profiling:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
                log(f"jax profiler trace written to {args.jax_profile}")

        if not args.no_test and test_samples:
            trials = max(int(np.ceil(len(test_samples) / args.batch_size)), 1)
            loss_sum = mad_sum = 0.0
            for _ in range(trials):
                samples_t = test_sampler.next_batch()
                if gp_stores is not None:
                    ti = bucketset.tier_index(samples_t) if len(bucketset.tiers) > 1 else 0
                    st = gp_stores[ti]
                    loss, mad, out = eval_step_gp_idx(
                        state.params, st.op, st.arrays, jnp.asarray(st.indices(samples_t))
                    )
                    loss_sum += float(loss)
                    mad_sum += float(mad)
                    continue
                batch = batch_fn(samples_t)
                if isinstance(batch, IndexedBatch):
                    loss, mad, out = eval_step_idx(state.params, batch.tree, batch.idx)
                elif n_gp:
                    op_d, arrs = gp_place(batch)
                    loss, mad, out = eval_step(
                        state.params, op_d, arrs["mask"], arrs["inputs"], arrs["targets"]
                    )
                else:
                    loss, mad, out = eval_step(
                        state.params,
                        batch.operator,
                        jnp.asarray(batch.mask),
                        jnp.asarray(batch.inputs),
                        jnp.asarray(batch.targets),
                    )
                loss_sum += float(loss)
                mad_sum += float(mad)
                if args.only_forward_test:
                    os.makedirs(os.path.join(args.dump_dir, args.result_prefix), exist_ok=True)
                    for name, pred in zip(batch.names, np.asarray(out)):
                        base = os.path.basename(str(name))
                        np.savetxt(
                            os.path.join(args.dump_dir, args.result_prefix, base + ".csv"),
                            pred,
                            delimiter=",",
                        )
            log("Eval {}, loss {}, mad {}".format(epoch, loss_sum / trials, mad_sum / trials))
            metrics_log.write(epoch, "test", loss=loss_sum / trials, mad=mad_sum / trials)

        metrics_log.plot()
        if args.only_forward_test:
            return
        if epoch % 10 == 9 and not args.debug:
            checkpoint.save_checkpoint(ckpt_path, state.params, state.opt_state, epoch, int(state.step))

    checkpoint.save_checkpoint(ckpt_path, state.params, state.opt_state, args.num_epoch - 1, int(state.step))
    log("done")


if __name__ == "__main__":
    main()
