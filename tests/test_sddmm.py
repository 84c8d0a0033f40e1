"""SDDMM: sampled dense-dense matmul at an operator pattern (north-star
"SpMM and SDDMM Pallas kernels", BASELINE.json).

Verification contract mirrors the SpMM tests: sparse kernel output equals the
dense ``a @ b^T`` sampled at the pattern, forward and backward, XLA path and
windowed Pallas kernel.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu.data import datasets
from surfacenetworks_tpu.sparse import (
    ell_from_scipy,
    operator_from_scipy,
    sddmm,
    stack_operators,
)
from surfacenetworks_tpu.sparse.ops import _sddmm_xla


def _mesh_operator(n_points=60, seed=0, **kw):
    rng = np.random.default_rng(seed)
    V, F = datasets.random_blob_mesh(rng, n_points)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    return L, operator_from_scipy(L, **kw), rng


def _dense_sampled(L, a, b):
    full = a @ b.T
    return full * (np.asarray(L.todense()) != 0)


def test_sddmm_matches_dense():
    L, op, rng = _mesh_operator()
    n = L.shape[0]
    C = 16
    a = rng.normal(size=(n, C)).astype(np.float32)
    b = rng.normal(size=(n, C)).astype(np.float32)

    out = sddmm(op, jnp.asarray(a), jnp.asarray(b))  # [R, K] ELL values
    # reassemble to dense at the pattern
    got = np.zeros((n, n), np.float32)
    cols = np.asarray(op.fwd.cols)
    valid = np.asarray(op.fwd.vals) != 0
    for r in range(n):
        for k in range(cols.shape[1]):
            if valid[r, k]:
                got[r, cols[r, k]] = np.asarray(out)[r, k]
    np.testing.assert_allclose(got, _dense_sampled(L, a, b), rtol=1e-5, atol=1e-5)


def test_sddmm_grads_match_dense():
    L, op, rng = _mesh_operator(seed=1)
    n = L.shape[0]
    C = 8
    a = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))
    pat = jnp.asarray((np.asarray(L.todense()) != 0).astype(np.float32))

    def f_sparse(a, b):
        return jnp.sum(jnp.sin(sddmm(op, a, b)))

    def f_dense(a, b):
        vals = (a @ b.T) * pat
        # sin(0)=0 at non-pattern entries, so the padded slots match exactly
        return jnp.sum(jnp.sin(vals))

    gs = jax.grad(f_sparse, argnums=(0, 1))(a, b)
    gd = jax.grad(f_dense, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]), rtol=1e-5, atol=1e-5)


def test_sddmm_batched():
    L1, op1, rng = _mesh_operator(seed=2, k=12, n_rows=72, n_cols=72)
    L2, op2, _ = _mesh_operator(seed=3, k=12, n_rows=72, n_cols=72)
    op = stack_operators([op1, op2])
    C = 8
    a = rng.normal(size=(2, 72, C)).astype(np.float32)
    b = rng.normal(size=(2, 72, C)).astype(np.float32)
    out = sddmm(op, jnp.asarray(a), jnp.asarray(b))
    assert out.shape == (2, 72, 12)
    for i, L in enumerate((L1, L2)):
        ref = _sddmm_xla(
            jnp.asarray(op.fwd.cols[i]), jnp.asarray(op.fwd.vals[i]),
            jnp.asarray(a[i]), jnp.asarray(b[i]),
        )
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref), rtol=1e-5)


def test_sddmm_pallas_matches_xla():
    from surfacenetworks_tpu.sparse import pallas_kernels

    L, op, rng = _mesh_operator(n_points=90, seed=4)
    m = op.fwd
    assert m.window > 0
    C = 128
    a = jnp.asarray(rng.normal(size=(m.cols.shape[0], C)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(m.n_cols, C)).astype(np.float32))
    ref = _sddmm_xla(jnp.asarray(m.cols), jnp.asarray(m.vals), a, b)
    got = pallas_kernels.sddmm(jnp.asarray(m.cols), jnp.asarray(m.vals), a, b, m.window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_sddmm_pallas_rejects_window0():
    from surfacenetworks_tpu.sparse import pallas_kernels

    with pytest.raises(ValueError):
        pallas_kernels.sddmm(
            jnp.zeros((8, 2), jnp.int32), jnp.zeros((8, 2)), jnp.zeros((8, 4)),
            jnp.zeros((8, 4)), 0,
        )


def test_corr_feature_smoothness_matches_dense():
    """The SDDMM consumer (losses.corr_feature_smoothness) equals the dense
    masked computation: -sum |w_ij| cos(f_i, f_j) / sum |w| over the
    operator pattern."""
    from surfacenetworks_tpu.train import losses

    L, op, _ = _mesh_operator(50, seed=4)
    bop = stack_operators([op])
    rng = np.random.default_rng(1)
    f = rng.normal(size=(1, L.shape[0], 16)).astype(np.float32)

    got = float(losses.corr_feature_smoothness(bop, jnp.asarray(f)))

    fn = f[0] / np.maximum(np.linalg.norm(f[0], axis=-1, keepdims=True), 1e-9)
    W = np.abs(L.toarray())
    np.fill_diagonal(W, 0.0)  # self-cosine is constant: excluded
    S = fn @ fn.T
    want = -float((W * S).sum() / (W.sum() + 1e-9))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_corr_feature_smoothness_grad_flows():
    from surfacenetworks_tpu.train import losses

    L, op, _ = _mesh_operator(50, seed=5)
    bop = stack_operators([op])
    f = jnp.asarray(np.random.default_rng(2).normal(size=(1, L.shape[0], 8)), jnp.float32)
    g = jax.grad(lambda x: losses.corr_feature_smoothness(bop, x))(f)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_smooth_reg_trainer_smoke(tmp_path):
    """--smooth-reg exercises sparse.ops.sddmm end-to-end through the FAUST
    trainer's fast path (round-3 verdict item 7)."""
    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main(
        [
            "--synthetic", "3", "--layer", "2", "--num-epoch", "1",
            "--num-updates", "3", "--deser-option", "no",
            "--smooth-reg", "0.1", "--result-dir", str(tmp_path),
        ]
    )
