"""FAUST dense-correspondence siamese trainer (reference:
src/dense_correspondence/main.py).

Two shapes per step through a shared trunk; loss over FA@FB^T logits vs the
aggregated geodesic cost (sl1 | cel | dcel); optional random XZ/XY rotation
augmentation; auto-deserialize from the conventional checkpoint path.
"""

from __future__ import annotations

import argparse
import functools
import glob
import itertools
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from surfacenetworks_tpu import config
from surfacenetworks_tpu.cli.common import (
    MetricFetcher,
    MetricsLogger,
    Throughput,
    add_multihost_flags,
    count_params,
    enable_compilation_cache,
    log_environment,
    make_logger,
    maybe_initialize_multihost,
)
from surfacenetworks_tpu.data import Buckets, correspondence_batch, datasets
from surfacenetworks_tpu.models import SiameseModel
from surfacenetworks_tpu.train import TrainState, checkpoint, losses, optim

parser = argparse.ArgumentParser(description="Dense correspondence (TPU)")
parser.add_argument("--batch-size", type=int, default=1)
parser.add_argument("--datapath", default="train_FAUST_npz/")
parser.add_argument("--synthetic", type=int, default=0)
parser.add_argument("--synthetic-points", type=int, default=200,
                    help="points per synthetic FAUST-like mesh (use ~7000 for "
                         "flagship-scale evidence runs)")
parser.add_argument("--layer", type=int, default=15)
parser.add_argument("--loss", default="dcel", choices=["sl1", "cel", "dcel"])
parser.add_argument("--lr", default="1e-3")
parser.add_argument("--model", default="lap", help="lap | dir | avg | mlp | amp")
parser.add_argument("--num-epoch", type=int, default=110)
parser.add_argument("--num-updates", type=int, default=100)
parser.add_argument("--result-prefix", default="test")
parser.add_argument("--result-dir", default="results/dense_correspondence")
parser.add_argument("--xz-rotate", action="store_true")
parser.add_argument("--xy-rotate", action="store_true")
parser.add_argument("--complete-test", action="store_true")
parser.add_argument("--full-train", action="store_true")
parser.add_argument("--deser-option", default="auto", choices=["auto", "no", "force"])
parser.add_argument("--deser-path", default=None)
parser.add_argument("--num-vertices", type=int, default=7000)
parser.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 activations/matmuls, "
                         "fp32 params, optimizer state and BN statistics")
parser.add_argument("--operator-format", default="auto", choices=["auto", "ell", "bsr"],
                    help="bsr = RCM-reordered MXU block-sparse operators (lap trunks); "
                         "auto picks bsr above 2048 vertices — the 13x fast path is "
                         "the default at FAUST scale, not opt-in")
parser.add_argument("--streaming-head", action="store_true",
                    help="compute the dcel loss AND eval metrics block-wise from "
                         "the trunk features without materializing the N x N "
                         "logits (O(block*N) peak memory; dcel only; the DEFAULT "
                         "at >= 4096 bucket vertices — measured faster AND leaner "
                         "at the 7k FAUST flagship; --no-streaming-head opts out)")
parser.add_argument("--no-streaming-head", action="store_true",
                    help="force the dense N x N logits head at any size")
parser.add_argument("--remat", action="store_true",
                    help="rematerialize trunk blocks in the backward pass (memory for compute)")
parser.add_argument("--intrinsic", action="store_true",
                    help="use the intrinsic-Delaunay Laplacian (reference lap default, main.py:87)")
parser.add_argument("--graph-parallel", type=int, default=0,
                    help="edge-partition each trunk operator's rows across this many "
                         "devices on the 'graph' mesh axis (lap and dir trunks; ring "
                         "halo exchange per apply, overlapped with interior compute; "
                         "needs >= that many JAX devices)")
parser.add_argument("--smooth-reg", type=float, default=0.0,
                    help="weight of the mesh-neighborhood feature-smoothness "
                         "regularizer (losses.corr_feature_smoothness) — the "
                         "SDDMM consumer: trunk-feature cosine scores sampled "
                         "only at the operator pattern, no N x N matrix; "
                         "single-device fast path only")
parser.add_argument("--eval-only", action="store_true",
                    help="no training: restore the checkpoint and report "
                         "FAUST metrics over the test pairs with HOST-side "
                         "metric computation (O(N) memory — works at 50k "
                         "vertices where the [N, N] device eval cannot)")
parser.add_argument("--no-epoch-scan", action="store_true",
                    help="opt out of the pair-grouped chunk dispatch (dcel "
                         "fast path only) and dispatch each update "
                         "separately — for debugging; the chunked path runs "
                         "the same update multiset per epoch (identical "
                         "order when a single train pair exists)")
parser.add_argument("--seed", type=int, default=17)
add_multihost_flags(parser)
config.add_config_flags(parser)

LOSSES = {
    "sl1": losses.corr_smooth_l1,
    "cel": losses.corr_softmin_cross_entropy,
    "dcel": losses.corr_delta_cross_entropy,
}

# test hook: force the light (host-target) fast path regardless of size
_FORCE_LIGHT = False


def _rotate(V, rng, xz, xy):
    if xz:
        t = rng.uniform(0, 2 * np.pi)
        R = np.array(
            [[np.cos(t), 0, np.sin(t)], [0, 1, 0], [-np.sin(t), 0, np.cos(t)]], np.float32
        )
        V = V @ R
    if xy:
        t = rng.uniform(0, 2 * np.pi)
        R = np.array(
            [[np.cos(t), np.sin(t), 0], [-np.sin(t), np.cos(t), 0], [0, 0, 1]], np.float32
        )
        V = V @ R
    return V


def main(argv=None):
    args = config.parse_with_config(parser, argv)
    log = make_logger(args.result_prefix, os.path.join(args.result_dir, "log"))
    log(args)
    enable_compilation_cache()
    maybe_initialize_multihost(args, log)
    log_environment(log)
    config.dump_config(
        args, os.path.join(args.result_dir, "cfg", f"{args.result_prefix}.json")
    )
    rng_np = np.random.default_rng(args.seed)

    if args.synthetic:
        data = datasets.synthetic_correspondence_dataset(
            args.synthetic, n_points=args.synthetic_points, seed=args.seed
        )
    else:
        files = sorted(glob.glob(os.path.join(args.datapath, "*.npz")))
        data = [datasets.load_faust_npz(f) for f in files]
    n_train = len(data) if args.full_train else max(len(data) * 8 // 10, 1)
    model_key = "dirac" if "dir" in args.model else ("amp" if "amp" in args.model else "lap")
    if args.intrinsic and model_key == "lap":
        from surfacenetworks_tpu.geometry import intrinsic

        for s_ in data:
            s_["L"] = intrinsic.intrinsic_laplacian(s_["V"], s_["F"])
    if model_key == "amp":
        from surfacenetworks_tpu import geometry as geo_

        for s_ in data:
            s_["L_pyr"] = geo_.amp_pyramid(s_["L"], levels=3)
    n_gp = args.graph_parallel if args.graph_parallel > 1 else 0
    if args.operator_format == "auto":
        # resolve against the dataset shape with the SAME policy as
        # train_normal (batching.choose_operator_format): the BSR/MXU fast
        # path (20 vs 278 us/apply at FAUST scale, BENCH r03) is the default
        # above the dense window, not opt-in (round-3 verdict item 2); this
        # trainer has no dense trunk path, so the dense window maps to ell
        from surfacenetworks_tpu.data import choose_operator_format, round_up

        nv_max = max(s["V"].shape[0] for s in data)
        resolved = choose_operator_format(
            1, round_up(nv_max, 8), rcm_ok=(model_key == "lap" and not n_gp)
        )
        args.operator_format = "bsr" if resolved == "bsr" else "ell"
        log(f"operator format auto -> {args.operator_format}")
    use_bsr = args.operator_format == "bsr" and model_key == "lap"
    if n_gp and model_key not in ("lap", "dirac"):
        raise SystemExit("--graph-parallel supports the lap and dir trunks")
    # with graph parallelism, 'bsr' selects the MXU block interior of the
    # partitioned operator (boundary side table stays ELL)
    gp_interior = "bsr" if (n_gp and use_bsr) else "ell"
    if n_gp:
        use_bsr = False
    if use_bsr or n_gp:
        from surfacenetworks_tpu.data import rcm_reorder_sample

        data = [rcm_reorder_sample(s) for s in data]
    if n_gp and model_key == "dirac":
        # narrow Dirac halos need face index to correlate with (RCM-ordered)
        # vertex index; face order is arbitrary in every workload
        from surfacenetworks_tpu.dist import dirac_partition

        for s_ in data:
            fperm = dirac_partition.sort_faces_for_partition(s_["F"])
            s_["F"] = np.asarray(s_["F"])[fperm]
            s_.pop("dirac", None)  # stale coeffs: they bake in face order
    buckets = Buckets.for_samples(
        data,
        multiple=128 if use_bsr else (
            (128 if gp_interior == "bsr" else 8) * n_gp if n_gp else 8
        ),
    )
    if model_key == "amp":
        kmax = max(
            int(np.diff(Lk.tocsr().indptr).max())
            for s_ in data
            for Lk in s_["L_pyr"]
        )
        buckets.ell_k = buckets.ell_k_t = max(buckets.ell_k, kmax)
    if use_bsr:
        from surfacenetworks_tpu.data.batching import fit_bsr_k

        fit_bsr_k([s_["L"] for s_ in data], buckets)
    model = SiameseModel(model=args.model, layers=args.layer, remat=args.remat,
                         dtype=jnp.bfloat16 if args.bf16 else None)

    # Operators depend only on the mesh, not on the rotation augmentation —
    # pack each sample's operator once and reuse it every step (host-side
    # ELL/BSR packing of a 7000-vertex mesh per step would dominate epoch
    # time; the reference caches the torch operator the same way,
    # dense_correspondence/main.py:106-191).
    _op_cache: dict = {}

    gmesh = None
    if n_gp:
        # graph-parallel: each sample's (RCM-banded) operator is row-partitioned
        # over the 'graph' mesh axis with the narrowest sufficient halo; the
        # whole trunk runs inside one shard_map (ring ppermute per SpMM,
        # psum'd global_average / BN statistics) — SURVEY.md §2.9's
        # context-parallel analogue for the FAUST hot spot (main.py:193,320).
        from surfacenetworks_tpu.dist import (
            dirac_partition, edge_partition, graph_parallel, make_mesh,
        )

        gmesh = make_mesh(n_data=1, n_graph=n_gp)

        def partitioned_op_of(sample):
            N = buckets.n_vertices
            if model_key == "dirac":
                from surfacenetworks_tpu import native

                coeffs = sample.get("dirac")
                if coeffs is None:
                    coeffs = native.dirac_coeffs(sample["V"], sample["F"])
                pop = graph_parallel.partition_batch_dirac(
                    [coeffs], n_gp, N, buckets.n_faces, max_valence=buckets.max_valence
                )
                return dirac_partition.shard_partitioned_dirac(gmesh, pop)
            halo = min(edge_partition.suggest_halo(sample["L"]), N // n_gp)
            pop = graph_parallel.partition_batch_operator(
                [sample["L"]], n_gp, n_rows=N, halo=halo, k=buckets.ell_k,
                interior_fmt=gp_interior,
            )
            return edge_partition.shard_partitioned(gmesh, pop)

    def batch_of(sample):
        s = dict(sample)
        s["input"] = _rotate(np.asarray(s["input"], np.float32), rng_np, args.xz_rotate, args.xy_rotate)
        op = _op_cache.get(id(sample))
        if op is None and n_gp:
            op = partitioned_op_of(sample)
        batch = correspondence_batch(
            s, buckets, model=model_key, fmt="bsr" if use_bsr else "ell",
            operator=op,
            op_dtype=jnp.bfloat16 if (args.bf16 and use_bsr) else None,
        )
        _op_cache.setdefault(id(sample), batch.operator)
        return batch

    b0 = batch_of(data[0])
    if n_gp:
        # init with a plain ELL operator (param shapes don't depend on the
        # operator representation; the partitioned op only works in shard_map)
        b_init = correspondence_batch(dict(data[0]), buckets, model=model_key, fmt="ell")
        op_a = (b_init.operator, jnp.asarray(b_init.mask))
        init_inputs = jnp.asarray(b_init.inputs)
    else:
        op_a = (b0.operator, jnp.asarray(b0.mask))
        init_inputs = jnp.asarray(b0.inputs)
    params = model.init(
        jax.random.key(0), op_a, op_a, init_inputs, init_inputs
    )["params"]
    log("Num parameters {}".format(count_params(params)))
    state = TrainState.create(params, optim.adam(float(args.lr), weight_decay=1e-5))

    ckpt_path = os.path.join(args.result_dir, "pts", f"{args.result_prefix}_state.msgpack")
    if args.deser_option != "no":
        path = args.deser_path or ckpt_path
        if os.path.isfile(path):
            log("Continue...")
            params, opt_state, _, step = checkpoint.restore_training(
                path, state.params, state.opt_state
            )
            state = state.replace(params=params, step=jnp.asarray(step, jnp.int32))
            if opt_state is not None:
                state = state.replace(opt_state=opt_state)

    loss_fn = LOSSES[args.loss]
    use_stream = bool(args.streaming_head)
    if use_stream and args.loss != "dcel":
        raise SystemExit("--streaming-head supports --loss dcel only")
    if (
        not use_stream
        and not args.no_streaming_head
        and args.loss == "dcel"
        and buckets.n_vertices >= 4096
    ):
        # production default: the block-tiled head is strictly better at
        # FAUST scale and above — equal loss/grads (tests/test_streaming_head
        # .py), measured 3.27 vs 3.98 ms/step and -37% temp memory at the 7k
        # flagship (BENCH r03); at >=16k the dense [N, N] logits would cost
        # >= 1 GB forward alone.  --no-streaming-head restores the dense head.
        use_stream = True
        log("streaming head ON by default (bucket >= 4096 vertices; "
            "--no-streaming-head opts out)")

    if n_gp:
        def trunk_apply(params, op, mask, x):
            return model.apply(
                {"params": params}, op, mask, x,
                method=lambda m, o, mk, xx: m.trunk(o, mk, xx),
            )

        sharded_trunk = graph_parallel.make_graph_sharded_apply(
            gmesh, trunk_apply, batch_axis=None
        )

        def features(params, opx, maskx, inx, opy, masky, iny):
            return (
                sharded_trunk(params, opx, maskx, inx),
                sharded_trunk(params, opy, masky, iny),
            )

        def forward(params, opx, maskx, inx, opy, masky, iny):
            fa, fb = features(params, opx, maskx, inx, opy, masky, iny)
            return jnp.einsum("bnc,bmc->bnm", fa, fb, preferred_element_type=jnp.float32)
    else:
        def features(params, opx, maskx, inx, opy, masky, iny):
            return model.apply(
                {"params": params}, (opx, maskx), (opy, masky), inx, iny,
                method=SiameseModel.features,
            )

        def forward(params, opx, maskx, inx, opy, masky, iny):
            return model.apply({"params": params}, (opx, maskx), (opy, masky), inx, iny)

    @jax.jit
    def train_step(state, opx, maskx, inx, opy, masky, iny, GAB, na, nb):
        def objective(params):
            if use_stream:
                fa, fb = features(params, opx, maskx, inx, opy, masky, iny)
                target = jnp.argmin(GAB, axis=-1)
                # fp32 logsumexp regardless of --bf16 (the tile matmuls run
                # at MXU bf16 rate either way via default precision)
                return losses.corr_dcel_streaming(
                    fa[0].astype(jnp.float32), fb[0].astype(jnp.float32), target
                ), ()
            out = forward(params, opx, maskx, inx, opy, masky, iny)
            logits = out[0]
            return loss_fn(logits, GAB), ()

        (loss, _), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(params, opx, maskx, inx, opy, masky, iny, GAB, lA, lB, liB, GB):
        if use_stream:
            # eval without the [N, M] score matrix either: streaming argmax
            # predictions + streaming dcel loss value
            fa, fb = features(params, opx, maskx, inx, opy, masky, iny)
            fa0 = fa[0].astype(jnp.float32)
            fb0 = fb[0].astype(jnp.float32)
            pred = losses.streaming_corr_argmax(fa0, fb0, masky[0, :, 0])
            metrics = losses.corr_metrics_from_pred(
                pred, lA, lB, liB, GB, maskx[0, :, 0]
            )
            target = jnp.argmin(GAB, axis=-1)
            return losses.corr_dcel_streaming(fa0, fb0, target), metrics
        out = forward(params, opx, maskx, inx, opy, masky, iny)
        logits = out[0]
        metrics = losses.corr_accuracy_metrics(
            logits[0] if logits.ndim == 3 else logits,
            lA, lB, liB, GB, maskx[0, :, 0], masky[0, :, 0],
        )
        return loss_fn(logits, GAB), metrics

    # multihost graph parallel (BASELINE config 5: FAUST full-res across >=2
    # hosts): params replicated globally; per-pair arrays placed as global
    # jax.Arrays (every process assembles the same pair — shared RNG seed)
    if n_gp and jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from surfacenetworks_tpu.dist import replicate as _replicate
        from surfacenetworks_tpu.dist.mesh_setup import put_global

        state = _replicate(gmesh, state)
        _row_sh = NamedSharding(gmesh, P(None, "graph"))
        _rep_sh = NamedSharding(gmesh, P())
        place_rows = lambda x: put_global(np.asarray(x), _row_sh)
        place_rep = lambda x: put_global(np.asarray(x), _rep_sh)
    elif n_gp:
        # single-process GP: place per-sample arrays row-sharded ONCE so the
        # cached entries carry their step shardings (no per-step reshard)
        from jax.sharding import NamedSharding, PartitionSpec as P

        _row_sh = NamedSharding(gmesh, P(None, "graph"))
        _rep_sh = NamedSharding(gmesh, P())
        place_rows = lambda x: jax.device_put(jnp.asarray(x), _row_sh)
        place_rep = lambda x: jax.device_put(jnp.asarray(x), _rep_sh)
    else:
        place_rows = jnp.asarray
        place_rep = jnp.asarray

    def _pad_labels(l, N):
        out = np.zeros(N, np.int32)
        out[: l.shape[0]] = l
        return place_rep(np.asarray(out))

    # ------------------------------------------------------------------
    # Fast single-device path: per-sample device cache + one-dispatch steps.
    # Every sample's packed operator, mask, (unrotated) inputs, padded
    # geodesic matrix and label tables upload ONCE; the train step does the
    # rotation augmentation, the padded GAB aggregation, the loss and the
    # metric sum all inside one executable.  Falls back to the host path
    # under graph-parallel / multihost or past the HBM budget.
    # ------------------------------------------------------------------
    N_b = buckets.n_vertices
    est_bytes = len(data) * (N_b * N_b * 4 + 40 * N_b * 4)
    fits_device = est_bytes < (10 << 30)
    # 'light' fast path: when the per-sample [N, N] geodesic matrices exceed
    # the HBM budget but the loss is dcel, only the per-pair argmin TARGETS
    # (computed host-side, chunked) go on device — training cost becomes
    # O(N) in memory, which is what lets 50k-vertex meshes train end-to-end
    # on one chip (the reference caps at 7000)
    # Graph-parallel joins the fast path for dcel (round-5): the round-4 GP
    # route re-assembled and re-uploaded the [N, N] aggregated geodesic cost
    # EVERY step ( ~200 MB at 7k vertices) — with dcel its only use is the
    # per-pair argmin target, which is constant, computed host-side (the
    # light-path chunked aggregation) and cached row-replicated on the mesh.
    # Operators/masks/inputs place row-sharded once like GraphStore does for
    # train_normal.
    use_fast = jax.process_count() == 1 and (
        (not n_gp and fits_device) or args.loss == "dcel"
    )
    light = use_fast and args.loss == "dcel" and (not fits_device or _FORCE_LIGHT)
    if light:
        log(f"light fast path: geodesic matrices stay on host "
            f"(est {est_bytes / 1e9:.1f} GB > HBM budget); dcel targets "
            "computed host-side per pair and cached on device")
    smooth_w = float(args.smooth_reg)
    if smooth_w > 0 and (not use_fast or n_gp):
        raise SystemExit("--smooth-reg requires the single-device fast path "
                         "(no --graph-parallel / --multihost)")

    # ------------------------------------------------------------------
    # Flat train state (round-5): the tunnel's dispatch cost is ~13 us per
    # ARGUMENT LEAF (measured: 64 single-pair chunk dispatches with the
    # ~470-leaf arg tree cost ~5.7 ms each; 4-pair super-chunks with ~4x
    # the leaves cost ~27 ms each — leaf-proportional, not call-count-
    # proportional).  The 15-layer TrainState is ~450 of those leaves, so
    # the fast path trains on ravel_pytree'd FLAT params — the optimizer
    # state becomes three [P] vectors, the step unravels inside the jit
    # (free: XLA slices), and a chunk dispatch carries ~30 leaves.
    # Checkpoints stay in TREE form (save/restore convert), so artifacts
    # interoperate with --eval-only, serving export and older rounds.
    # ------------------------------------------------------------------
    _flat_mode = use_fast
    if _flat_mode:
        import optax
        from jax.flatten_util import ravel_pytree

        flat0, _unravel = ravel_pytree(state.params)

        def _map_moments(o, f):
            if isinstance(o, optax.ScaleByAdamState):
                return o._replace(mu=f(o.mu), nu=f(o.nu))
            if isinstance(o, tuple):
                items = [_map_moments(x, f) for x in o]
                return type(o)(*items) if hasattr(o, "_fields") else tuple(items)
            return o

        def _moments_flat(o):
            return _map_moments(o, lambda t: ravel_pytree(t)[0])

        def _moments_tree(o):
            return _map_moments(o, _unravel)

        state = TrainState.create(
            flat0, optim.adam(float(args.lr), weight_decay=1e-5)
        ).replace(opt_state=_moments_flat(state.opt_state), step=state.step)
        params_of = _unravel
    else:
        params_of = lambda p: p

    def save_ckpt(epoch_):
        if _flat_mode:
            checkpoint.save_checkpoint(
                ckpt_path, params_of(state.params), _moments_tree(state.opt_state),
                epoch_, int(state.step),
            )
        else:
            checkpoint.save_checkpoint(
                ckpt_path, state.params, state.opt_state, epoch_, int(state.step)
            )

    _dev_cache: dict = {}

    def dev_sample(sample):
        """-> (device tree, true vertex count), cached per sample.  Under
        graph parallelism the operator is the row-partitioned/sharded one
        and mask/inputs place row-sharded, G/labels replicated — the GP
        analogue of train_normal's GraphStore (placed once, zero per-step
        H2D)."""
        key = id(sample)
        hit = _dev_cache.get(key)
        if hit is not None and hit[0] is sample:
            return hit[1], hit[2]
        gp_op = None
        if n_gp:
            gp_op = _op_cache.get(key)
            if gp_op is None:
                gp_op = partitioned_op_of(sample)
        pack = correspondence_batch(
            sample, buckets, model=model_key, fmt="bsr" if use_bsr else "ell",
            operator=gp_op,
            op_dtype=jnp.bfloat16 if (args.bf16 and use_bsr) else None,
        )
        G, lab, li = pack.targets
        n = sample["V"].shape[0]
        tree = {
            "op": pack.operator,
            "mask": pack.mask,
            "inputs": pack.inputs,
        }
        if not light:
            G_pad = np.zeros((N_b, N_b), np.float32)
            G_pad[: G.shape[0], : G.shape[1]] = G
            lab_pad = np.zeros(N_b, np.int32)
            lab_pad[: lab.shape[0]] = lab
            li_pad = np.zeros(N_b, np.int32)
            li_pad[: li.shape[0]] = li
            tree.update({"G": G_pad, "l": lab_pad, "li": li_pad})
        if smooth_w > 0:
            # ELL pattern operator for the SDDMM smoothness regularizer
            # (the trunk may run BSR; the pattern stays ELL)
            from surfacenetworks_tpu.data.batching import _fixed_k_operator
            from surfacenetworks_tpu.sparse import stack_operators

            tree["reg_op"] = stack_operators(
                [_fixed_k_operator(sample["L"], buckets, N_b)]
            )
        if n_gp:
            entry = {
                k: (
                    v if k == "op"  # already sharded by partitioned_op_of
                    else place_rows(v) if k in ("mask", "inputs")
                    else place_rep(v)
                )
                for k, v in tree.items()
            }
        else:
            entry = jax.device_put(tree)
        _dev_cache[key] = (sample, entry, n)
        _op_cache.setdefault(key, entry["op"])  # eval path reuses the device op
        return entry, n

    def _rot_matrix(txz, txy):
        c1, s1 = jnp.cos(txz), jnp.sin(txz)
        c2, s2 = jnp.cos(txy), jnp.sin(txy)
        z = jnp.zeros_like(c1)
        one = jnp.ones_like(c1)
        Rxz = jnp.stack([
            jnp.stack([c1, z, s1]), jnp.stack([z, one, z]), jnp.stack([-s1, z, c1])
        ])
        Rxy = jnp.stack([
            jnp.stack([c2, s2, z]), jnp.stack([-s2, c2, z]), jnp.stack([z, z, one])
        ])
        return Rxz @ Rxy  # V @ Rxz then @ Rxy == V @ (Rxz @ Rxy)

    def _aggregate_padded(GA, lA, liA, GB, lB, liB, na, nb):
        """In-jit padded replica of the eager GAB construction: GAB_real on
        [:na, :nb], zeros on rows >= na, +1e9 on cols >= nb (so argmin /
        softmin ignore padded columns) — bit-identical semantics to the
        host path (dense_correspondence/main.py:197-210 + column masking)."""
        cols = liA[lB]
        rows = liB[lA]
        agg = GA[:, cols] + GB[rows, :]
        r = jnp.arange(N_b)
        valid = (r[:, None] < na) & (r[None, :] < nb)
        GAB = jnp.where(valid, agg, 0.0)
        return jnp.where(r[None, :] >= nb, 1e9, GAB)

    @jax.jit
    def _pair_target(da, db, na, nb):
        """Per-pair dcel target: argmin over the aggregated geodesic cost.
        Constant w.r.t. params AND rotation, so it is computed once per
        (shape A, shape B) pair and cached on device — removing the [N, N]
        aggregation (~5.6 ms at 7k, measured) from every train step."""
        GAB = _aggregate_padded(
            da["G"], da["l"], da["li"], db["G"], db["l"], db["li"], na, nb
        )
        return jnp.argmin(GAB, axis=-1).astype(jnp.int32)

    def _host_pair_target(sa, sb):
        """Chunked host replica of _pair_target for the light path: argmin of
        ``GA[:, liA[lB]] + GB[liB[lA], :]`` over the valid columns, row
        blocks bounded to ~512 MB so 50k-vertex pairs never materialize the
        [N, N] sum.  Rows >= na keep target 0 — identical to the padded
        device semantics (zeros rows, +1e9 padded columns)."""
        GA = np.asarray(sa["G"], np.float32)
        GB = np.asarray(sb["G"], np.float32)
        lA = np.asarray(sa["label"])
        liA = np.asarray(sa["label_inv"])
        lB = np.asarray(sb["label"])
        liB = np.asarray(sb["label_inv"])
        na, nb = GA.shape[0], GB.shape[0]
        cols = liA[lB]  # [nb]
        rows = liB[lA]  # [na]
        target = np.zeros(N_b, np.int32)
        chunk = max(1, (128 << 20) // max(nb * 4, 1))
        for i0 in range(0, na, chunk):
            i1 = min(i0 + chunk, na)
            block = GA[i0:i1][:, cols] + GB[rows[i0:i1], :]
            target[i0:i1] = np.argmin(block, axis=1).astype(np.int32)
        return target

    _target_cache: dict = {}

    def pair_target(ia, ib):
        key = (ia, ib)
        t = _target_cache.get(key)
        if t is None:
            if light:
                t = place_rep(jnp.asarray(_host_pair_target(data[ia], data[ib])))
            else:
                da, na = dev_sample(data[ia])
                db, nb = dev_sample(data[ib])
                t = _pair_target(da, db, na, nb)
            _target_cache[key] = t
        return t

    # ------------------------------------------------------------------
    # Pair-grouped chunk dispatch (dcel fast path).  The per-step dispatch
    # of the fast path costs ~3-5 ms of host time through the remote-TPU
    # tunnel (two operator pytrees + masks + inputs + six scalar uploads
    # per call), capping the 7k FAUST flagship at ~156 wall steps/s against
    # a ~280 steps/s device ceiling (round-4 bench).  Design notes, all
    # MEASURED on the round-5 rig:
    #   * a lax.scan over the epoch with per-iteration operator GATHERS
    #     from a stacked device store runs the step at 6.9 ms vs 3.7 ms —
    #     a dynamically-sliced operator consumed under value_and_grad
    #     defeats XLA's loop-invariant treatment of the SpMM operands
    #     (~+16 us per fwd+bwd apply x ~100 applies); forward-only applies
    #     show NO such penalty, and neither stop_gradient, bf16 block
    #     storage, one-hot gathers nor optimization_barrier recover it;
    #   * operators passed as loop-INVARIANT jit arguments keep the step
    #     at its 3.7 ms compiled cost.
    # So: group the epoch's updates by (shape A, shape B) pair and dispatch
    # ONE executable per distinct pair — a fori_loop with a RUNTIME trip
    # count (one compile for every chunk length) whose body replays exactly
    # the per-step math over that pair's updates (each update keeps its own
    # rotation draw).  The epoch's update multiset is identical to the
    # per-step path's — only the within-epoch ORDER is permuted (exactly
    # identical when one pair exists, e.g. n_train == 1; pinned by
    # tests/test_corr_metrics.py).  Host cost: ~n_pairs dispatches per
    # epoch instead of num_updates, each overlapping device compute.
    # Reference hot loop this collapses: dense_correspondence/main.py:312-326.
    # ------------------------------------------------------------------
    use_chunks = use_fast and args.loss == "dcel" and not args.no_epoch_scan
    # pair-groups per executable.  Measured at the 7k flagship (200
    # updates over ~64 distinct pairs, exact-fit BSR k): P=1 206 steps/s,
    # P=4 197 steps/s — batching groups into one executable does NOT help
    # (the residual wall gap tracks device work, not dispatch count), so
    # P stays 1; the machinery generalizes if a future rig shows
    # dispatch-count-bound behavior.  Likewise the flat train state below
    # measured neutral THROUGH THE TUNNEL (185 vs 187) but is kept: it
    # collapses the per-dispatch arg tree ~450 -> ~30 leaves, which is the
    # dominant per-step host cost on a local-host TPU VM.
    P_CHUNK = 1

    def _chunk_update(state, sums, da, db, rots, target):
        """One training update against fixed pair entries — the body shared
        by every group of the super-chunk executable."""
        Ra = _rot_matrix(rots[0], rots[1])
        Rb = _rot_matrix(rots[2], rots[3])
        inx = da["inputs"] @ Ra
        iny = db["inputs"] @ Rb

        def objective(flat_or_tree):
            params = params_of(flat_or_tree)
            if use_stream or smooth_w > 0:
                fa, fb = features(
                    params, da["op"], da["mask"], inx, db["op"], db["mask"], iny
                )
            if use_stream:
                loss = losses.corr_dcel_streaming(
                    fa[0].astype(jnp.float32), fb[0].astype(jnp.float32), target
                )
            else:
                if smooth_w > 0:
                    out = jnp.einsum(
                        "bnc,bmc->bnm", fa, fb, preferred_element_type=jnp.float32
                    )
                else:
                    out = forward(
                        params, da["op"], da["mask"], inx, db["op"], db["mask"], iny
                    )
                loss = losses.corr_delta_cross_entropy_from_target(out[0], target)
            if smooth_w > 0:
                loss = loss + smooth_w * (
                    losses.corr_feature_smoothness(da["reg_op"], fa)
                    + losses.corr_feature_smoothness(db["reg_op"], fb)
                )
            return loss, ()

        (loss, _), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), sums + loss

    @functools.partial(jax.jit, donate_argnums=(0, 6))
    def train_superchunk(state, das, dbs, rots_v, ks, targets, sums):
        """P_CHUNK pair-groups, each a fori_loop with a RUNTIME trip count
        (zero-length pad groups cost nothing at run time), one dispatch."""
        for g in range(P_CHUNK):
            da, db, target = das[g], dbs[g], targets[g]

            def body(i, carry, da=da, db=db, target=target, g=g):
                state, sums = carry
                return _chunk_update(state, sums, da, db, rots_v[g, i], target)

            state, sums = jax.lax.fori_loop(0, ks[g], body, (state, sums))
        return state, sums

    def _epoch_plan():
        """The epoch's (pair indices, rotation angles), drawn with the SAME
        rng call order as the per-step loop so both paths see the same
        update multiset."""
        pair_idx = np.zeros((args.num_updates, 2), np.int32)
        rots_v = np.zeros((args.num_updates, 4), np.float32)
        for u in range(args.num_updates):
            pair_idx[u] = rng_np.integers(0, n_train, size=2)
            rots_v[u] = _angles() + _angles()
        return pair_idx, rots_v

    @functools.partial(jax.jit, donate_argnums=(0, 7))
    def train_step_fast(state, da, db, rots, target, na, nb, sums):
        Ra = _rot_matrix(rots[0], rots[1])
        Rb = _rot_matrix(rots[2], rots[3])
        inx = da["inputs"] @ Ra
        iny = db["inputs"] @ Rb
        dcel = args.loss == "dcel"
        if not dcel:
            # sl1/cel consume the full aggregated cost matrix every step
            GAB = _aggregate_padded(
                da["G"], da["l"], da["li"], db["G"], db["l"], db["li"], na, nb
            )

        def objective(flat_or_tree):
            params = params_of(flat_or_tree)
            if use_stream or smooth_w > 0:
                fa, fb = features(
                    params, da["op"], da["mask"], inx, db["op"], db["mask"], iny
                )
            if use_stream:
                loss = losses.corr_dcel_streaming(
                    fa[0].astype(jnp.float32), fb[0].astype(jnp.float32), target
                )
            else:
                if smooth_w > 0:
                    out = jnp.einsum(
                        "bnc,bmc->bnm", fa, fb, preferred_element_type=jnp.float32
                    )
                else:
                    out = forward(
                        params, da["op"], da["mask"], inx, db["op"], db["mask"], iny
                    )
                if dcel:
                    loss = losses.corr_delta_cross_entropy_from_target(out[0], target)
                else:
                    loss = loss_fn(out[0], GAB)
            if smooth_w > 0:
                loss = loss + smooth_w * (
                    losses.corr_feature_smoothness(da["reg_op"], fa)
                    + losses.corr_feature_smoothness(db["reg_op"], fb)
                )
            return loss, ()

        (loss, _), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), sums + loss

    @jax.jit
    def eval_step_fast(params, da, db, rots, na, nb):
        """Eval against the device-cached sample entries: no per-pair host
        transfer of the [N, N] geodesic matrices (the round-4 eval wall)."""
        params = params_of(params)
        Ra = _rot_matrix(rots[0], rots[1])
        Rb = _rot_matrix(rots[2], rots[3])
        inx = da["inputs"] @ Ra
        iny = db["inputs"] @ Rb
        GAB = _aggregate_padded(
            da["G"], da["l"], da["li"], db["G"], db["l"], db["li"], na, nb
        )
        if use_stream:
            fa, fb = features(
                params, da["op"], da["mask"], inx, db["op"], db["mask"], iny
            )
            fa0 = fa[0].astype(jnp.float32)
            fb0 = fb[0].astype(jnp.float32)
            pred = losses.streaming_corr_argmax(fa0, fb0, db["mask"][0, :, 0])
            metrics = losses.corr_metrics_from_pred(
                pred, da["l"], db["l"], db["li"], db["G"], da["mask"][0, :, 0]
            )
            target = jnp.argmin(GAB, axis=-1)
            return losses.corr_dcel_streaming(fa0, fb0, target), metrics
        out = forward(params, da["op"], da["mask"], inx, db["op"], db["mask"], iny)
        logits = out[0]
        metrics = losses.corr_accuracy_metrics(
            logits[0] if logits.ndim == 3 else logits,
            da["l"], db["l"], db["li"], db["G"],
            da["mask"][0, :, 0], db["mask"][0, :, 0],
        )
        return loss_fn(logits, GAB), metrics

    def assemble_pair(sa, sb):
        """Host-side pair assembly (rotation, padding, GT cost aggregation);
        runs on the prefetch thread so it overlaps the device step."""
        ba, bb = batch_of(sa), batch_of(sb)
        GA, lA, liA = ba.targets
        GB, lB, liB = bb.targets
        GAB_real = losses.aggregate_G(
            jnp.asarray(GA), jnp.asarray(lA), jnp.asarray(liA),
            jnp.asarray(GB), jnp.asarray(lB), jnp.asarray(liB),
        )
        N = buckets.n_vertices
        GAB = jnp.zeros((N, N), jnp.float32)
        GAB = GAB.at[: GAB_real.shape[0], : GAB_real.shape[1]].set(GAB_real)
        # padded logits columns get +inf cost so argmin/softmin ignore them
        GAB = GAB.at[:, GAB_real.shape[1]:].set(1e9)
        return ba, bb, place_rep(GAB)

    def run_pair(sa, sb, train=True, pre=None):
        ba, bb, GAB = pre if pre is not None else assemble_pair(sa, sb)
        GA, lA, liA = ba.targets
        GB, lB, liB = bb.targets
        N = buckets.n_vertices
        nonlocal state
        if train:
            state, loss = train_step(
                state, ba.operator, place_rows(ba.mask), place_rows(ba.inputs),
                bb.operator, place_rows(bb.mask), place_rows(bb.inputs),
                GAB, GA.shape[0], GB.shape[0],
            )
            return loss
        GB_pad = np.zeros((N, N), np.float32)
        GB_pad[: GB.shape[0], : GB.shape[1]] = GB
        loss, metrics = eval_step(
            state.params,
            ba.operator, place_rows(ba.mask), place_rows(ba.inputs),
            bb.operator, place_rows(bb.mask), place_rows(bb.inputs),
            GAB, _pad_labels(lA, N), _pad_labels(lB, N), _pad_labels(liB, N),
            place_rep(GB_pad),
        )
        return float(loss), {k: float(v) for k, v in metrics.items()}

    from surfacenetworks_tpu.data import prefetch

    metrics_log = MetricsLogger(args.result_prefix, os.path.join(args.result_dir, "log"))
    def _angles():
        return (
            np.float32(rng_np.uniform(0, 2 * np.pi)) if args.xz_rotate else np.float32(0),
            np.float32(rng_np.uniform(0, 2 * np.pi)) if args.xy_rotate else np.float32(0),
        )

    if args.eval_only:
        # Offline eval: streaming argmax predictions on device (block-tiled,
        # no [N, N] scores), metrics on the HOST via O(N) fancy indexing —
        # the eval story for light-mode (50k-vertex) checkpoints whose
        # geodesic matrices never fit HBM.
        if not use_fast:
            raise SystemExit("--eval-only needs the single-device fast path")

        @jax.jit
        def _predict(params, da, db):
            params = params_of(params)
            fa, fb = features(
                params, da["op"], da["mask"], da["inputs"],
                db["op"], db["mask"], db["inputs"],
            )
            return losses.streaming_corr_argmax(
                fa[0].astype(jnp.float32), fb[0].astype(jnp.float32),
                db["mask"][0, :, 0],
            )

        def _host_metrics(pred, sa, sb):
            lA = np.asarray(sa["label"])
            lB = np.asarray(sb["label"])
            liB = np.asarray(sb["label_inv"])
            GB = np.asarray(sb["G"], np.float32)
            na = lA.shape[0]
            p = np.asarray(pred)[:na]
            exact = float((lB[p] == lA).mean())
            geo = GB[liB[lA], p]
            return {
                "exact": exact,
                "geo_mean": float(geo.mean()),
                "geo_q25": float(np.quantile(geo, 0.25)),
                "geo_q50": float(np.quantile(geo, 0.50)),
                "geo_q75": float(np.quantile(geo, 0.75)),
            }

        eval_ids = list(range(n_train, len(data))) or list(range(len(data)))
        pairs = list(itertools.product(eval_ids, repeat=2))
        msum: dict = {}
        for i, j in pairs:
            da, _ = dev_sample(data[i])
            db, _ = dev_sample(data[j])
            pred = _predict(state.params, da, db)
            for k, v in _host_metrics(pred, data[i], data[j]).items():
                msum[k] = msum.get(k, 0.0) + v
        mstr = " ".join(f"{k} {msum[k] / len(pairs):.4f}" for k in sorted(msum))
        log(f"Eval-only over {len(pairs)} pairs: {mstr}")
        return

    # Dispatch-queue guard for the chunked path: past ~128 queued
    # executions the tunnel's dispatch pipeline degrades badly (measured:
    # dispatching two 87-chunk epochs ahead collapsed throughput 184 -> ~80
    # steps/s).  Normal epochs (<= 128 distinct pairs) never trip it; a
    # huge-pair-count epoch pays one ~24 ms host round trip per excess
    # chunk, which is the cheaper failure mode.  NOTE a one-epoch-deferred
    # loss fetch was tried and measured WORSE than the per-epoch float()
    # (each block_until_ready round-trips ~24 ms even on ready arrays).
    _inflight: list = []

    def _throttle(handle, depth=128):
        _inflight.append(handle)
        if len(_inflight) > depth:
            jax.block_until_ready(_inflight.pop(0))

    for epoch in range(args.num_epoch):
        loss_sum = 0.0
        meter = Throughput()
        if use_chunks:
            pair_idx, rots_v = _epoch_plan()
            groups: dict = {}
            for u, (ia, ib) in enumerate(pair_idx):
                groups.setdefault((int(ia), int(ib)), []).append(u)
            items = list(groups.items())
            sums = jnp.float32(0)
            for c0 in range(0, len(items), P_CHUNK):
                blk = items[c0: c0 + P_CHUNK]
                while len(blk) < P_CHUNK:  # zero-length pad groups
                    blk.append((blk[0][0], []))
                das, dbs, rvs, ks, tgts = [], [], [], [], []
                for (ia, ib), rows in blk:
                    da, _na = dev_sample(data[ia])
                    db, _nb = dev_sample(data[ib])
                    das.append(da)
                    dbs.append(db)
                    # fixed [num_updates, 4] aval so every chunk length
                    # shares one executable (trip counts are runtime data)
                    rv = np.zeros((args.num_updates, 4), np.float32)
                    rv[: len(rows)] = rots_v[rows]
                    rvs.append(rv)
                    ks.append(len(rows))
                    tgts.append(pair_target(ia, ib) if rows else tgts[0])
                state, sums = train_superchunk(
                    state, tuple(das), tuple(dbs),
                    jnp.asarray(np.stack(rvs)), jnp.asarray(ks, jnp.int32),
                    tuple(tgts), sums,
                )
                _throttle(sums)
            loss_sum = float(sums)
            _inflight.clear()
            meter.steps += args.num_updates
        elif use_fast:
            sums = jnp.float32(0)
            zero_target = jnp.zeros(buckets.n_vertices, jnp.int32)
            for u in range(args.num_updates):
                ia, ib = rng_np.integers(0, n_train, size=2)
                da, na = dev_sample(data[int(ia)])
                db, nb = dev_sample(data[int(ib)])
                target = (
                    pair_target(int(ia), int(ib)) if args.loss == "dcel" else zero_target
                )
                rots = _angles() + _angles()
                state, sums = train_step_fast(state, da, db, rots, target, na, nb, sums)
                if u % 64 == 63:
                    jax.block_until_ready(sums)
                meter.tick()
            loss_sum = float(sums)
        else:
            fetch = MetricFetcher()

            def accum(vals):
                nonlocal loss_sum
                if vals is not None:
                    loss_sum += vals[0]

            def make_train_item(_i):
                ia, ib = rng_np.integers(0, n_train, size=2)
                return assemble_pair(data[int(ia)], data[int(ib)])

            for item in prefetch(make_train_item, args.num_updates):
                loss = run_pair(None, None, train=True, pre=item)
                accum(fetch.push(loss))
                meter.tick()
            accum(fetch.flush())
        if loss_sum is not None:
            log(f"Train epoch {epoch}, loss {loss_sum / args.num_updates}, {meter.report()}")
            metrics_log.write(
                epoch, "train", loss=loss_sum / args.num_updates, steps_per_s=meter.steps_per_s
            )

        n_test_lo = n_train
        test_ids = list(range(n_test_lo, len(data)))
        if test_ids and light:
            if epoch == 0:
                log("light fast path: per-epoch eval skipped — the [N, N] "
                    "geodesic aggregation exceeds device memory at this scale; "
                    "train with --full-train and evaluate offline from the "
                    "checkpoint")
            test_ids = []
        if test_ids:
            pairs = list(itertools.product(test_ids, repeat=2))
            if not args.complete_test:
                pairs = random.Random(epoch).choices(pairs, k=min(20, len(pairs)))
            loss_sum = 0.0
            msum: dict = {}
            for i, j in pairs:
                if use_fast and not light:
                    da, na = dev_sample(data[i])
                    db, nb = dev_sample(data[j])
                    rots = _angles() + _angles()
                    loss_d, metrics_d = eval_step_fast(
                        state.params, da, db, rots, na, nb
                    )
                    loss = float(loss_d)
                    metrics = {k: float(v) for k, v in metrics_d.items()}
                else:
                    loss, metrics = run_pair(data[i], data[j], train=False)
                loss_sum += loss
                for k, v in metrics.items():
                    msum[k] = msum.get(k, 0.0) + v
            mstr = " ".join(f"{k} {msum[k] / len(pairs):.4f}" for k in sorted(msum))
            log(f"Test epoch {epoch}, loss {loss_sum / len(pairs)}, {mstr}")
            metrics_log.write(
                epoch, "test", loss=loss_sum / len(pairs),
                **{k: msum[k] / len(pairs) for k in msum},
            )
        metrics_log.plot()

        if epoch % 10 == 9:
            save_ckpt(epoch)

    # final save regardless of epoch count (short runs and --eval-only
    # round-trips need it; matches train_normal's end-of-run checkpoint)
    save_ckpt(args.num_epoch - 1)


if __name__ == "__main__":
    main()
