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
