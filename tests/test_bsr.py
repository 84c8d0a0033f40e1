"""BSR (block-ELL / MXU) sparse path: correctness vs scipy, RCM plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch
from surfacenetworks_tpu.data.batching import rcm_reorder_sample

BS = 8  # small block size for CPU tests


def _mesh_L(n=60, seed=0):
    rng = np.random.default_rng(seed)
    V, F = datasets.random_blob_mesh(rng, n)
    return V, F, geo.igl_style_laplacian(V, F, hack=1.0)


def test_bsr_spmm_matches_dense():
    V, F, L = _mesh_L()
    op = sps.bsr_operator_from_scipy(L, block_size=BS)
    n_pad = op.fwd.n_rows
    x = np.zeros((n_pad, 16), dtype=np.float32)
    x[: L.shape[0]] = np.random.default_rng(1).normal(size=(L.shape[0], 16))
    out = np.asarray(sps.bsr_spmm(op, jnp.asarray(x)))
    np.testing.assert_allclose(out[: L.shape[0]], L @ x[: L.shape[0]], rtol=1e-4, atol=1e-4)


def test_bsr_grad_is_transpose():
    _, _, L = _mesh_L(seed=2)
    op = sps.bsr_operator_from_scipy(L, block_size=BS)
    n_pad = op.fwd.n_rows
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(n_pad, 8)).astype(np.float32))
    w = rng.normal(size=(n_pad, 8)).astype(np.float32)
    g = jax.grad(lambda x: jnp.sum(sps.bsr_spmm(op, x) * w))(x)
    Lp = sp.csr_matrix(L.copy())
    Lp.resize((n_pad, n_pad))
    np.testing.assert_allclose(np.asarray(g), Lp.T @ w, rtol=1e-4, atol=1e-4)


def test_bsr_batched():
    _, _, L = _mesh_L(seed=4)
    op1 = sps.bsr_operator_from_scipy(L, block_size=BS, k=8, k_bwd=8)
    batched = sps.stack_bsr_operators([op1, op1])
    n_pad = op1.fwd.n_rows
    x = np.random.default_rng(5).normal(size=(2, n_pad, 8)).astype(np.float32)
    out = np.asarray(sps.bsr_spmm(batched, jnp.asarray(x)))
    for b in range(2):
        single = np.asarray(sps.bsr_spmm(op1, jnp.asarray(x[b])))
        np.testing.assert_allclose(out[b], single, rtol=1e-5, atol=1e-5)


def test_rcm_reduces_bandwidth():
    _, _, L = _mesh_L(n=200, seed=6)
    coo = L.tocoo()
    bw0 = np.abs(coo.row - coo.col).max()
    perm = sps.rcm_permutation(L)
    Lp = L.tocsr()[perm][:, perm].tocoo()
    bw1 = np.abs(Lp.row - Lp.col).max()
    assert bw1 < bw0


def test_rcm_reorder_sample_preserves_model_semantics():
    """A permuted sample must give permuted-but-equal model outputs."""
    samples = datasets.synthetic_normal_dataset(1, 60, seed=7, operator="lap")
    s = samples[0]
    s2 = rcm_reorder_sample(s)
    perm = s2["rcm_perm"]
    # L' x' == (L x)[perm]
    x = np.random.default_rng(8).normal(size=(s["V"].shape[0], 4)).astype(np.float32)
    lhs = s2["L"] @ x[perm]
    rhs = (s["L"] @ x)[perm]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-5)
    # faces still index the same geometric vertices
    np.testing.assert_allclose(s2["V"][s2["F"][0]], s["V"][s["F"][0]])


def test_laplacian_batch_bsr_matches_ell():
    samples = [rcm_reorder_sample(s) for s in datasets.synthetic_normal_dataset(2, 60, seed=9)]
    buckets = Buckets.for_samples(samples, multiple=BS)
    buckets.bsr_block = BS
    buckets.bsr_k = 16
    b_ell = laplacian_batch(samples, buckets, fmt="ell")
    b_bsr = laplacian_batch(samples, buckets, fmt="bsr")
    b_dense = laplacian_batch(samples, buckets, fmt="dense")
    x = jnp.asarray(b_ell.inputs)
    out_ell = np.asarray(sps.spmm(b_ell.operator, x))
    out_bsr = np.asarray(sps.bsr_spmm(b_bsr.operator, x))
    out_dense = np.einsum("bnm,bmc->bnc", b_dense.operator, b_ell.inputs)
    np.testing.assert_allclose(out_bsr, out_ell, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out_dense, out_ell, rtol=1e-3, atol=1e-4)


def test_model_forward_same_under_bsr():
    from surfacenetworks_tpu import models as zoo

    samples = [rcm_reorder_sample(s) for s in datasets.synthetic_normal_dataset(2, 60, seed=10)]
    buckets = Buckets.for_samples(samples, multiple=BS)
    buckets.bsr_block = BS
    buckets.bsr_k = 16
    b_ell = laplacian_batch(samples, buckets, fmt="ell")
    b_bsr = laplacian_batch(samples, buckets, fmt="bsr")
    model = zoo.LapDeepModel(3, 3, layers=2)
    params = model.init(
        jax.random.key(0), b_ell.operator, jnp.asarray(b_ell.mask), jnp.asarray(b_ell.inputs)
    )
    out1 = model.apply(params, b_ell.operator, jnp.asarray(b_ell.mask), jnp.asarray(b_ell.inputs))
    out2 = model.apply(params, b_bsr.operator, jnp.asarray(b_bsr.mask), jnp.asarray(b_bsr.inputs))
    # float32 accumulation-order differences are amplified through BN chains
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-2, atol=1e-3)
