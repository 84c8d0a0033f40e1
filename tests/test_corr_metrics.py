"""FAUST correspondence accuracy metrics (north-star "FAUST accuracy",
BASELINE.json): %-exact and geodesic-error quantiles of argmax predictions.

The reference logs loss only (dense_correspondence/main.py:330-356); the
metric here follows the standard FAUST protocol — exact-label hit rate and
geodesic error on the target shape between prediction and ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from surfacenetworks_tpu import models as zoo
from surfacenetworks_tpu.data import Buckets, correspondence_batch, datasets
from surfacenetworks_tpu.train import TrainState, losses, optim


def _pad_labels(l, N):
    out = np.zeros(N, np.int32)
    out[: l.shape[0]] = l
    return jnp.asarray(out)


def _metric_inputs(sa, sb, N):
    lA, liA = sa["label"], sa["label_inv"]
    lB, liB = sb["label"], sb["label_inv"]
    GB = np.zeros((N, N), np.float32)
    GB[: sb["G"].shape[0], : sb["G"].shape[1]] = sb["G"]
    mask_a = np.zeros(N, np.float32)
    mask_a[: sa["V"].shape[0]] = 1
    mask_b = np.zeros(N, np.float32)
    mask_b[: sb["V"].shape[0]] = 1
    return (
        _pad_labels(lA, N),
        _pad_labels(lB, N),
        _pad_labels(liB, N),
        jnp.asarray(GB),
        jnp.asarray(mask_a),
        jnp.asarray(mask_b),
    )


def test_corr_metrics_perfect_prediction():
    samples = datasets.synthetic_correspondence_dataset(2, n_points=40, seed=11)
    sa, sb = samples
    n = sa["V"].shape[0]
    N = n + 8  # padded bucket
    lA, lB, liB, GB, mask_a, mask_b = _metric_inputs(sa, sb, N)

    # perfect logits: one-hot at the true correspondent liB[lA[i]]
    gt = np.asarray(liB)[np.asarray(lA)]
    logits = np.full((N, N), -5.0, np.float32)
    logits[np.arange(N), gt] = 5.0

    m = losses.corr_accuracy_metrics(jnp.asarray(logits), lA, lB, liB, GB, mask_a, mask_b)
    assert float(m["exact"]) == 1.0
    assert float(m["geo_mean"]) == 0.0
    assert float(m["geo_q50"]) == 0.0


def test_corr_metrics_shifted_prediction():
    samples = datasets.synthetic_correspondence_dataset(2, n_points=40, seed=12)
    sa, sb = samples
    n = sa["V"].shape[0]
    N = n + 8
    lA, lB, liB, GB, mask_a, mask_b = _metric_inputs(sa, sb, N)

    # shift every prediction to the *next* scan vertex of B (mod n): zero
    # exact hits, strictly positive geodesic error
    gt = np.asarray(liB)[np.asarray(lA)]
    pred = (gt + 1) % n
    logits = np.full((N, N), -5.0, np.float32)
    logits[np.arange(N), pred] = 5.0

    m = losses.corr_accuracy_metrics(jnp.asarray(logits), lA, lB, liB, GB, mask_a, mask_b)
    assert float(m["exact"]) == 0.0
    assert float(m["geo_mean"]) > 0.0
    # quantiles are ordered
    assert float(m["geo_q25"]) <= float(m["geo_q50"]) <= float(m["geo_q75"])
    # mean error matches the hand computation over valid rows
    expect = float(np.mean(np.asarray(sb["G"])[gt[:n], pred[:n]]))
    np.testing.assert_allclose(float(m["geo_mean"]) * N / n, expect * N / n, rtol=1e-5)


def test_correspondence_training_reaches_accuracy():
    """Training on one synthetic pair drives exact-match accuracy far above
    chance (~1/n) — quantified-accuracy criterion for the siamese workload."""
    samples = datasets.synthetic_correspondence_dataset(2, n_points=50, seed=5)
    buckets = Buckets.for_samples(samples)
    model = zoo.SiameseModel(model="lap", layers=3)

    bx = correspondence_batch(samples[0], buckets)
    by = correspondence_batch(samples[1], buckets)
    opx = (bx.operator, jnp.asarray(bx.mask))
    opy = (by.operator, jnp.asarray(by.mask))
    inx, iny = jnp.asarray(bx.inputs), jnp.asarray(by.inputs)
    params = model.init(jax.random.key(0), opx, opy, inx, iny)["params"]
    state = TrainState.create(params, optim.adam(1e-3, weight_decay=1e-5))

    GA, lA, liA = bx.targets
    GB, lB, liB = by.targets
    GAB = losses.aggregate_G(
        jnp.asarray(GA), jnp.asarray(lA), jnp.asarray(liA),
        jnp.asarray(GB), jnp.asarray(lB), jnp.asarray(liB),
    )
    n = samples[0]["V"].shape[0]
    N = buckets.n_vertices
    lA_p, lB_p, liB_p, GB_p, mask_a, mask_b = _metric_inputs(samples[0], samples[1], N)

    @jax.jit
    def step(state):
        def objective(params):
            out = model.apply({"params": params}, opx, opy, inx, iny)
            return losses.corr_delta_cross_entropy(out[0, :n, :n], GAB), out[0]

        (loss, logits), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, logits

    @jax.jit
    def metrics_of(logits):
        return losses.corr_accuracy_metrics(logits, lA_p, lB_p, liB_p, GB_p, mask_a, mask_b)

    for _ in range(120):
        state, loss, logits = step(state)
    m = metrics_of(logits)
    # chance level is ~1/n; trained accuracy must be near-perfect on the
    # overfit pair
    assert float(m["exact"]) > 0.9, float(m["exact"])
    assert float(m["geo_q50"]) == 0.0
    assert float(m["geo_q50"]) <= float(m["geo_q75"])


def test_light_path_matches_full_fast_path(monkeypatch, tmp_path):
    """The light fast path (host-side chunked dcel targets, no [N, N]
    device residency) reproduces the full fast path's training losses —
    i.e. the chunked host argmin equals the in-jit padded aggregation."""
    import surfacenetworks_tpu.cli.train_correspondence as mod

    common = [
        "--synthetic", "3", "--layer", "2", "--num-epoch", "1",
        "--num-updates", "4", "--deser-option", "no", "--full-train",
        "--seed", "23",
    ]

    def run(force_light, tag):
        monkeypatch.setattr(mod, "_FORCE_LIGHT", force_light)
        mod.main(common + ["--result-dir", str(tmp_path / tag), "--result-prefix", tag])
        txt = open(tmp_path / tag / "log" / f"{tag}.log").read()
        for line in txt.splitlines():
            if "Train epoch 0" in line:
                return float(line.split("loss ")[1].split(",")[0])
        raise AssertionError(txt)

    full = run(False, "full")
    light = run(True, "lite")
    assert abs(full - light) < 1e-4 * max(abs(full), 1e-6), (full, light)


def test_eval_only_roundtrip(tmp_path):
    """Train briefly, then --eval-only restores the final checkpoint and
    reports host-computed FAUST metrics consistent with the in-training
    eval (the O(N)-memory eval story for light-mode checkpoints)."""
    from surfacenetworks_tpu.cli import train_correspondence

    common = ["--synthetic", "3", "--layer", "2", "--seed", "29"]
    train_correspondence.main(
        common + [
            "--num-epoch", "1", "--num-updates", "6", "--deser-option", "no",
            "--result-prefix", "t", "--result-dir", str(tmp_path),
        ]
    )
    train_correspondence.main(
        common + [
            "--eval-only", "--deser-path", str(tmp_path / "pts" / "t_state.msgpack"),
            "--result-prefix", "e", "--result-dir", str(tmp_path),
        ]
    )
    txt = open(tmp_path / "log" / "e.log").read()
    assert "Eval-only over" in txt
    exact = float(txt.split("exact ")[1].split(" ")[0])
    assert 0.0 <= exact <= 1.0


def test_epoch_scan_matches_per_step_path(tmp_path):
    """The pair-grouped chunk dispatch (round-5 dispatch-gap fix) reproduces
    the per-step fast path's training losses exactly when a single train
    pair exists (grouping is then the identity ordering): same rng draw
    order, same per-step math, rotation augmentation included."""
    from surfacenetworks_tpu.cli import train_correspondence

    common = [
        "--synthetic", "1", "--synthetic-points", "200", "--layer", "2",
        "--num-epoch", "2", "--num-updates", "5", "--deser-option", "no",
        "--full-train", "--xz-rotate", "--xy-rotate", "--seed", "31",
    ]

    def losses_of(tag, extra):
        train_correspondence.main(
            common + extra + [
                "--result-dir", str(tmp_path / tag), "--result-prefix", tag,
            ]
        )
        txt = open(tmp_path / tag / "log" / f"{tag}.log").read()
        return [
            float(line.split("loss ")[1].split(",")[0])
            for line in txt.splitlines()
            if "Train epoch" in line
        ]

    scan = losses_of("scan", [])
    step = losses_of("step", ["--no-epoch-scan"])
    assert len(scan) == 2 and len(step) == 2
    for a, b in zip(scan, step):
        assert abs(a - b) < 1e-4 * max(abs(a), 1e-6), (scan, step)
