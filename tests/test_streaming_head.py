"""Streaming correspondence head: dcel loss without the N x N logits.

`losses.streaming_corr_delta_cross_entropy` must equal the dense
`corr_delta_cross_entropy(fa @ fb.T, GAB)` in value AND gradients (it is the
same math, tiled — the flash-attention-style FLOPs-for-memory trade), across
unaligned row counts, rectangular N != M, batch layout, and through the
SiameseModel.features path the trainer uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfacenetworks_tpu.train import losses


def _rand(n, m, c, seed=0):
    rng = np.random.default_rng(seed)
    fa = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    GAB = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
    return fa, fb, GAB


@pytest.mark.parametrize("n,m,block", [(300, 280, 128), (256, 256, 256), (97, 410, 64)])
def test_streaming_dcel_matches_dense(n, m, block):
    fa, fb, GAB = _rand(n, m, 32, seed=n)
    tgt = jnp.argmin(GAB, axis=-1)

    def dense(fa, fb):
        return losses.corr_delta_cross_entropy(fa @ fb.T, GAB)

    def stream(fa, fb):
        return losses.streaming_corr_delta_cross_entropy(fa, fb, tgt, block)

    ld, (gda, gdb) = jax.value_and_grad(dense, argnums=(0, 1))(fa, fb)
    ls, (gsa, gsb) = jax.value_and_grad(stream, argnums=(0, 1))(fa, fb)
    assert abs(float(ld) - float(ls)) < 1e-5 * max(1.0, abs(float(ld)))
    np.testing.assert_allclose(np.asarray(gda), np.asarray(gsa), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gdb), np.asarray(gsb), rtol=1e-4, atol=1e-6)


def test_streaming_dcel_batched_layout():
    fa, fb, GAB = _rand(200, 200, 16, seed=7)
    tgt = jnp.argmin(GAB, axis=-1)
    flat = losses.corr_dcel_streaming(fa, fb, tgt, 64)
    batched = losses.corr_dcel_streaming(fa[None], fb[None], tgt[None], 64)
    dense = losses.corr_delta_cross_entropy((fa @ fb.T)[None], GAB[None])
    assert abs(float(flat) - float(batched)) < 1e-6
    assert abs(float(batched) - float(dense)) < 1e-5


def test_streaming_argmax_and_metrics_match_dense():
    """streaming_corr_argmax + corr_metrics_from_pred == corr_accuracy_metrics
    on the dense logits (same masked argmax, same quantiles)."""
    rng = np.random.default_rng(11)
    N, C = 300, 24
    fa = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    n_valid = 277
    mask = jnp.asarray((np.arange(N) < n_valid).astype(np.float32))
    lA = jnp.asarray(rng.integers(0, n_valid, N).astype(np.int32))
    lB = jnp.asarray(rng.integers(0, n_valid, N).astype(np.int32))
    liB = jnp.asarray(rng.integers(0, n_valid, N).astype(np.int32))
    GB = jnp.asarray(rng.uniform(size=(N, N)).astype(np.float32))

    logits = fa @ fb.T
    dense = losses.corr_accuracy_metrics(logits, lA, lB, liB, GB, mask, mask)
    pred = losses.streaming_corr_argmax(fa, fb, mask, block=128)
    stream = losses.corr_metrics_from_pred(pred, lA, lB, liB, GB, mask)
    for k in dense:
        np.testing.assert_allclose(
            np.asarray(dense[k]), np.asarray(stream[k]), rtol=1e-6, err_msg=k
        )


def test_streaming_head_graph_parallel_smoke(tmp_path):
    """--streaming-head composes with --graph-parallel trunks (features come
    from the shard_map'd trunk; the head tiles over gathered rows)."""
    import jax as _jax

    if len(_jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main(
        [
            "--synthetic", "3", "--layer", "2", "--num-epoch", "1",
            "--num-updates", "3", "--num-vertices", "300",
            "--streaming-head", "--graph-parallel", "2",
            "--deser-option", "no", "--result-dir", str(tmp_path),
        ]
    )
    log = (tmp_path / "log" / "test.log").read_text()
    assert "Test epoch 0" in log


def test_streaming_head_trainer_smoke(tmp_path):
    """CLI path: --streaming-head trains and the loss falls."""
    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main(
        [
            "--synthetic", "3", "--layer", "2", "--num-epoch", "1",
            "--num-updates", "4", "--num-vertices", "300",
            "--streaming-head", "--deser-option", "no",
            "--result-dir", str(tmp_path),
        ]
    )
    log = (tmp_path / "log" / "test.log").read_text()
    assert "Train epoch 0" in log


def test_streaming_head_rejects_non_dcel(tmp_path):
    from surfacenetworks_tpu.cli import train_correspondence

    with pytest.raises(SystemExit, match="dcel"):
        train_correspondence.main(
            [
                "--synthetic", "2", "--loss", "sl1", "--streaming-head",
                "--num-vertices", "300", "--deser-option", "no",
                "--result-dir", str(tmp_path),
            ]
        )
