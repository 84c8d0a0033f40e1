"""Task losses and metrics (all masked, all pure functions).

Parity map:
* cosine-squared normal loss + mean angle deviation —
  normal_predict/train_4_normal.py:113-123
* smooth-L1 (sum / batch) — as_rigid_as_possible/main.py:226
* Gaussian VAE ELBO (masked diag-Gaussian NLL + KLD, warm-up handled by the
  caller) — mesh_mnist/main_vae.py:150-167
* NLL classification — mesh_mnist/main.py:159
* correspondence losses sl1 / cel / dcel —
  dense_correspondence/main.py:197-240
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``values [B,N]`` over entries where ``mask [B,N,1]`` is 1."""
    m = mask[..., 0]
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def normal_cosine_loss(outputs: jnp.ndarray, mask: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """mean over valid vertices of ``1 - <n_hat, n>^2`` with L2-normalized
    predictions (train_4_normal.py:113-117)."""
    eps = 1e-12
    n = outputs / jnp.maximum(jnp.linalg.norm(outputs, axis=-1, keepdims=True), eps)
    inner = jnp.sum(n * targets, axis=-1)
    return _masked_mean(1.0 - inner**2, mask)


def mean_angle_deviation(outputs: jnp.ndarray, mask: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """mean over valid vertices of ``acos |<n_hat, n>|`` (train_4_normal.py:118-123)."""
    eps = 1e-12
    n = outputs / jnp.maximum(jnp.linalg.norm(outputs, axis=-1, keepdims=True), eps)
    inner = jnp.clip(jnp.abs(jnp.sum(n * targets, axis=-1)), 0.0, 1.0)
    return _masked_mean(jnp.arccos(inner), mask)


def smooth_l1_sum(outputs: jnp.ndarray, targets: jnp.ndarray, batch_size: int) -> jnp.ndarray:
    """torch ``F.smooth_l1_loss(reduction='sum') / batch`` (huber delta=1)."""
    d = jnp.abs(outputs - targets)
    per = jnp.where(d < 1.0, 0.5 * d**2, d - 0.5)
    return jnp.sum(per) / batch_size


def log_normal_diag(z, mu, logvar):
    """Elementwise diagonal-Gaussian log density (main_vae.py:150-151)."""
    return -0.5 * (math.log(2 * math.pi) + logvar + (z - mu) ** 2 / jnp.exp(logvar))


def vae_elbo_terms(recon_mu, recon_logvar, mask, x, z, mu, logvar):
    """(BCE, KLD) exactly as main_vae.py:153-167: masked reconstruction NLL
    summed per-sample then batch-meaned; KLD vs standard normal."""
    b = x.shape[0]
    xf = x.reshape(b, -1)
    rm = recon_mu.reshape(b, -1)
    rl = recon_logvar.reshape(b, -1)
    mk = jnp.repeat(mask, x.shape[-1], axis=-1).reshape(b, -1)
    bce = -jnp.mean(jnp.sum(log_normal_diag(xf, rm, rl) * mk, axis=1))
    log_q = log_normal_diag(z, mu, logvar)
    log_p = log_normal_diag(z, jnp.zeros_like(z), jnp.zeros_like(z))
    kld = jnp.mean(jnp.sum(log_q - log_p, axis=1))
    return bce, kld


def nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """NLL over log-softmax outputs (mesh_mnist/main.py:159)."""
    return -jnp.mean(jnp.take_along_axis(log_probs, targets[:, None], axis=1))


def accuracy(log_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(log_probs, axis=1) == targets).astype(jnp.float32))


# ---------------------------------------------------------------------------
# dense correspondence losses
# ---------------------------------------------------------------------------


def aggregate_G(GA, lA, liA, GB, lB, liB):
    """Ground-truth correspondence cost ``GA[:, liA[lB]] + GB[liB[lA], :]``
    (dense_correspondence/main.py:197-210, per sample)."""
    return GA[:, liA[lB]] + GB[liB[lA], :]


def corr_feature_smoothness(op, f):
    """Mesh-neighborhood feature-smoothness regularizer — the SDDMM consumer.

    ``R = - sum_{(i,j) in pattern(op)} |w_ij| <f_i/|f_i|, f_j/|f_j|> / sum |w|``:
    encourages neighboring scan vertices to carry similar (cosine-close)
    trunk features, a standard smoothness prior for dense correspondence.
    The pairwise scores are evaluated ONLY at the operator's sparsity
    pattern via :func:`surfacenetworks_tpu.sparse.sddmm` (the Pallas kernel
    that wins 2x over the XLA gather formulation, BENCH r03) — no ``[N, N]``
    score matrix is ever materialized.  ``op`` is the batched EllOperator
    whose values (cotan weights) double as edge weights; padding slots have
    value 0 and drop out.  ``f [B, N, C]``.
    """
    from surfacenetworks_tpu.sparse import sddmm

    fn = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-9)
    scores = sddmm(op, fn, fn)  # [B, N, K] at the pattern slots
    # exclude the Laplacian's diagonal self-entries: cos(f_i, f_i) == 1 is a
    # constant with zero gradient, and |diag| carries ~half the cotan weight
    # mass — keeping it would dilute the neighbor signal ~2x and offset the
    # reported value
    cols = op.fwd.cols
    rows = jnp.arange(cols.shape[-2])[:, None]
    w = jnp.abs(op.fwd.vals) * (cols != rows)
    return -jnp.sum(w * scores) / (jnp.sum(w) + 1e-9)


def corr_smooth_l1(outputs, GAB):
    """smooth-L1 between logits and the aggregated geodesic cost, element-mean
    then / batch (main.py:212-214)."""
    d = jnp.abs(outputs - GAB)
    per = jnp.where(d < 1.0, 0.5 * d**2, d - 0.5)
    return jnp.mean(per) / outputs.shape[0]


def corr_softmin_cross_entropy(outputs, GAB):
    """softmin(GAB) soft-target cross-entropy (main.py:216-227, batch=1 form)."""
    G = jax.nn.softmax(-GAB, axis=1)
    logp = jax.nn.log_softmax(outputs, axis=-1)
    return -jnp.sum(G * logp)


def corr_delta_cross_entropy(outputs, GAB):
    """argmin-target cross-entropy — the reference default 'dcel'
    (main.py:229-240)."""
    return corr_delta_cross_entropy_from_target(outputs, jnp.argmin(GAB, axis=-1))


def corr_delta_cross_entropy_from_target(outputs, target):
    """dcel from a precomputed argmin target — the target depends only on
    the (shape A, shape B) pair, so trainers cache it per pair on device and
    skip the per-step [N, N] cost aggregation entirely."""
    logp = jax.nn.log_softmax(outputs, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))


def _pad_rows_to(a, block):
    n = a.shape[0]
    np_ = (n + block - 1) // block * block
    if np_ == n:
        return a, n
    pad = [(0, np_ - n)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def streaming_corr_delta_cross_entropy(fa, fb, target, block: int = 512):
    """dcel loss WITHOUT materializing the ``[N, M]`` logits.

    Numerically equal to ``corr_delta_cross_entropy(fa @ fb.T, GAB)`` with
    ``target = argmin(GAB, -1)`` (batch=1 semantics: ``fa [N, C]``,
    ``fb [M, C]``, ``target [N]`` int) — but the logits exist only one
    ``[block, M]`` tile at a time inside a scan, so peak memory is
    O(block*M) instead of O(N*M): the full FAUST head at 7k vertices stores
    205 MB of logits (and its backward several times that); this form
    removes that wall entirely, which is what lets the correspondence head
    run at 25k+ vertices (see benchmarks/large_mesh.py).

    The backward recomputes each tile's logits from the saved per-row
    logsumexp (one extra matmul pass — FLOPs for memory, the standard
    flash-attention trade; reference contract:
    dense_correspondence/main.py:229-240).
    """
    lse, tlogit, _ = _stream_lse(fa, fb, target, block)
    return -jnp.mean(tlogit - lse)


def _stream_lse(fa, fb, target, block):
    n = fa.shape[0]
    fa_p, _ = _pad_rows_to(fa, block)
    tgt_p, _ = _pad_rows_to(target, block)
    nb = fa_p.shape[0] // block

    def body(_, blk):
        fa_b, tgt_b = blk
        logits = fa_b @ fb.T  # [block, M] — the only live tile
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, tgt_b[:, None], axis=-1)[:, 0]
        return None, (lse, tl)

    _, (lse, tlogit) = jax.lax.scan(
        body, None, (fa_p.reshape(nb, block, -1), tgt_p.reshape(nb, block))
    )
    return lse.reshape(-1)[:n], tlogit.reshape(-1)[:n], n


def _sdcel_fwd(fa, fb, target, block):
    lse, tlogit, n = _stream_lse(fa, fb, target, block)
    return -jnp.mean(tlogit - lse), (fa, fb, target, lse)


def _sdcel_bwd(block, res, g):
    fa, fb, target, lse = res
    n = fa.shape[0]
    scale = g / n  # d(-mean)/drow
    fa_p, _ = _pad_rows_to(fa, block)
    tgt_p, _ = _pad_rows_to(target, block)
    lse_p, _ = _pad_rows_to(lse, block)
    nb = fa_p.shape[0] // block
    row_valid = (jnp.arange(fa_p.shape[0]) < n).astype(fa.dtype)

    def body(dfb_acc, blk):
        fa_b, tgt_b, lse_b, valid_b = blk
        logits = fa_b @ fb.T
        p = jnp.exp(logits - lse_b[:, None]) * valid_b[:, None]  # softmax rows
        # dL/dfa_row = scale * (softmax_row @ fb - fb[target_row])
        dfa_b = scale * (p @ fb - jnp.take(fb, tgt_b, axis=0) * valid_b[:, None])
        # dL/dfb accumulates scale * (softmax^T @ fa - scatter(target, fa))
        dfb_acc = dfb_acc + scale * (p.T @ fa_b)
        return dfb_acc, dfa_b

    dfb0 = jnp.zeros_like(fb)
    dfb, dfa = jax.lax.scan(
        body,
        dfb0,
        (
            fa_p.reshape(nb, block, -1),
            tgt_p.reshape(nb, block),
            lse_p.reshape(nb, block),
            row_valid.reshape(nb, block),
        ),
    )
    dfa = dfa.reshape(-1, fa.shape[-1])[:n]
    # the -fb[target] term of dfa has a mirror in dfb: -scatter_add(fa at target)
    dfb = dfb - scale * jax.ops.segment_sum(fa, target, num_segments=fb.shape[0])
    dtarget = np.zeros(target.shape, dtype=jax.dtypes.float0)
    return dfa, dfb, dtarget


streaming_corr_delta_cross_entropy.defvjp(_sdcel_fwd, _sdcel_bwd)


def corr_dcel_streaming(fa, fb, target, block: int = 512):
    """Batched front-end for :func:`streaming_corr_delta_cross_entropy`:
    accepts ``[B, N, C]`` features / ``[B, N]`` targets (the trainer's
    batch=1 layout) or the flat 2-D form.  Equal sample sizes make the
    mean-of-per-sample-means equal the dense all-rows mean."""
    if fa.ndim == 3:
        per = jax.vmap(
            lambda a, b, t: streaming_corr_delta_cross_entropy(a, b, t, block)
        )(fa, fb, target)
        return jnp.mean(per)
    return streaming_corr_delta_cross_entropy(fa, fb, target, block)


def streaming_corr_argmax(fa, fb, mask_b, block: int = 512):
    """``argmax_j <fa_i, fb_j>`` over valid columns, block-tiled: the eval
    side of the streaming head — predictions for
    :func:`corr_metrics_from_pred` without the ``[N, M]`` score matrix.
    ``fa [N, C]``, ``fb [M, C]``, ``mask_b [M]`` -> int32 ``[N]``."""
    fa_p, n = _pad_rows_to(fa, block)
    nb = fa_p.shape[0] // block
    col_ok = mask_b > 0

    def body(_, fa_b):
        logits = fa_b @ fb.T
        logits = jnp.where(col_ok[None, :], logits, -jnp.inf)
        return None, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    _, pred = jax.lax.scan(body, None, fa_p.reshape(nb, block, -1))
    return pred.reshape(-1)[:n]


def corr_metrics_from_pred(pred, lA, lB, liB, GB, mask_a):
    """FAUST accuracy metrics from precomputed argmax predictions (shared by
    the dense and streaming eval paths); see :func:`corr_accuracy_metrics`."""
    gt = liB[lA]  # ground-truth correspondent on B, per A vertex
    valid = mask_a > 0
    nvalid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    exact = jnp.sum(jnp.where(valid, (lB[pred] == lA), False)) / nvalid
    geo = GB[gt, pred]
    geo_mean = jnp.sum(jnp.where(valid, geo, 0.0)) / nvalid
    geo_sorted = jnp.sort(jnp.where(valid, geo, jnp.inf))

    def q(p):
        idx = jnp.clip(
            jnp.floor(p * (nvalid - 1).astype(jnp.float32)).astype(jnp.int32),
            0,
            geo.shape[0] - 1,
        )
        return geo_sorted[idx]

    return {
        "exact": exact,
        "geo_mean": geo_mean,
        "geo_q25": q(0.25),
        "geo_q50": q(0.5),
        "geo_q75": q(0.75),
    }


def corr_accuracy_metrics(logits, lA, lB, liB, GB, mask_a, mask_b):
    """FAUST correspondence accuracy of ``argmax`` predictions.

    The north-star metric the reference reports in the paper (repo logs loss
    only, dense_correspondence/main.py:330-356): for every valid vertex ``i``
    of shape A the prediction is ``argmax_j logits[i, j]``; it is *exact*
    when the predicted vertex carries A's ground-truth label
    (``lB[pred] == lA[i]``), and its *geodesic error* is the distance on B
    between the prediction and the ground-truth vertex
    (``GB[liB[lA[i]], pred]`` — the Princeton / FAUST protocol).

    All inputs are padded to the bucket size; ``mask_a/mask_b [N]`` select
    valid rows / columns.  jit-safe (static shapes, dynamic counts).

    Returns dict: exact (fraction), geo_mean, geo_q25/q50/q75 (quantiles of
    the geodesic-error CDF over valid vertices).
    """
    logits = jnp.where(mask_b[None, :] > 0, logits, -jnp.inf)
    pred = jnp.argmax(logits, axis=-1)  # [N]
    return corr_metrics_from_pred(pred, lA, lB, liB, GB, mask_a)
