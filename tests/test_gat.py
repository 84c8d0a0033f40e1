"""GAT baseline (revived from the reference's dead GatDeepModel,
normal_predict/models.py:85-124): masked multi-head attention over the
operator's ELL neighborhood pattern."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch
from surfacenetworks_tpu.models import GatDeepModel
from surfacenetworks_tpu.nn.blocks import gat_attend


def _op(n_points=60, seed=0):
    rng = np.random.default_rng(seed)
    V, F = datasets.random_blob_mesh(rng, n_points)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    return sps.operator_from_scipy(L), L


def test_gat_attend_matches_dense_softmax():
    """gat_attend equals the dense masked-softmax attention over the same
    pattern."""
    op, L = _op()
    n = L.shape[0]
    H, ch = 2, 8
    rng = np.random.default_rng(1)
    xh = rng.normal(size=(n, H, ch)).astype(np.float32)
    s_src = rng.normal(size=(n, H)).astype(np.float32)
    s_dst = rng.normal(size=(n, H)).astype(np.float32)

    got = np.asarray(gat_attend(op, jnp.asarray(xh), jnp.asarray(s_src), jnp.asarray(s_dst)))

    pattern = (np.asarray(L.todense()) != 0).astype(np.float32)
    want = np.zeros_like(xh)
    for h in range(H):
        E = s_src[:, h][:, None] + s_dst[:, h][None, :]
        E = np.where(E > 0, E, 0.2 * E)  # leaky_relu
        E = np.where(pattern > 0, E, -1e9)
        A = np.exp(E - E.max(axis=1, keepdims=True))
        A = A / A.sum(axis=1, keepdims=True)
        want[:, h, :] = A @ xh[:, h, :]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gat_attention_rows_sum_to_one_and_grads_flow():
    op, L = _op(seed=2)
    n = L.shape[0]
    model = GatDeepModel(3, 3, layers=2, heads=4)
    bop = sps.stack_operators([op])
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, n, 3)), jnp.float32)
    mask = jnp.ones((1, n, 1), jnp.float32)
    params = model.init(jax.random.key(0), bop, mask, x)["params"]
    out = model.apply({"params": params}, bop, mask, x)
    assert out.shape == (1, n, 3)
    g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, bop, mask, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # attention params receive gradient
    att = [np.abs(np.asarray(l)).max() for l in leaves]
    assert max(att) > 0


def test_gat_trainer_smoke(tmp_path):
    from surfacenetworks_tpu.cli import train_normal

    train_normal.main(
        [
            "--synthetic", "6", "--model", "gat", "--layer", "2",
            "--num-epoch", "1", "--num-updates", "4", "--batch-size", "2",
            "--result-dir", str(tmp_path), "--debug",
        ]
    )


def test_gat_padded_rows_stay_zero():
    """Bucket-padded rows (no valid slots) must output exact zeros — not
    vertex 0's features — so they cannot leak into unmasked BatchNorm
    statistics (round-4 review finding)."""
    op, L = _op(seed=6)
    n = L.shape[0]
    N = n + 24  # pad the bucket
    import scipy.sparse as sp_

    Lp = sp_.csr_matrix((L.data, L.indices, np.concatenate([L.indptr, [L.indptr[-1]] * 24])), shape=(N, N))
    opp = sps.operator_from_scipy(Lp)
    H, ch = 2, 4
    rng = np.random.default_rng(2)
    xh = rng.normal(size=(N, H, ch)).astype(np.float32)
    s = rng.normal(size=(N, H)).astype(np.float32)
    out = np.asarray(gat_attend(opp, jnp.asarray(xh), jnp.asarray(s), jnp.asarray(s)))
    assert np.abs(out[n:]).max() == 0.0
    assert np.abs(out[:n]).max() > 0.0


def test_gat_banded_matches_gather():
    """The banded-window attention (round-5: band-resident scores, window
    softmax, MXU aggregation — no HBM gathers) equals the per-slot gather
    formulation on an RCM-ordered pattern, including non-128-multiple row
    counts (internal padding) and bucket-padded rows."""
    rng = np.random.default_rng(3)
    V, F = datasets.random_blob_mesh(rng, 300)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    perm = sps.rcm_permutation(L)
    L = L[perm][:, perm].tocsr()
    n_pad = 328  # 8-multiple bucket, NOT a 128 multiple
    op = sps.stack_operators([sps.EllOperator(
        fwd=sps.ell_from_scipy(L, n_rows=n_pad, n_cols=n_pad),
        bwd=sps.ell_from_scipy(L.T.tocsr(), n_rows=n_pad, n_cols=n_pad),
    )])
    assert op.fwd.window > 0
    H, ch = 4, 8
    xh = jnp.asarray(rng.normal(size=(1, n_pad, H, ch)).astype(np.float32))
    s_src = jnp.asarray(rng.normal(size=(1, n_pad, H)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(1, n_pad, H)).astype(np.float32))

    banded = gat_attend(op, xh, s_src, s_dst,
                        precision=jax.lax.Precision.HIGHEST)
    gathered = gat_attend(op, xh, s_src, s_dst, force_gather=True)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(gathered),
                               rtol=2e-4, atol=2e-5)

    # grads agree too (the banded backward is plain autodiff over the band)
    def loss(fn_kwargs):
        def f(x):
            return jnp.sum(gat_attend(op, x, s_src, s_dst, **fn_kwargs) ** 2)
        return jax.grad(f)(xh)

    g_b = loss({"precision": jax.lax.Precision.HIGHEST})
    g_g = loss({"force_gather": True})
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_g),
                               rtol=2e-3, atol=2e-4)
