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

import math

import jax
import jax.numpy as jnp


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
    target = jnp.argmin(GAB, axis=-1)
    logp = jax.nn.log_softmax(outputs, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))


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
