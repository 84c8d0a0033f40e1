"""Sparse runtime tests: ELL SpMM and Dirac applies vs scipy dense, fwd + bwd.

This is the framework-ified version of the reference's de-facto verification
contract ("sparse kernel output == dense matmul output within fp32 tolerance,
forward and backward", utils/cuda/sparse_bmm.py:65-94 self-checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps


def _random_sparse(rng, r, c, density=0.2):
    M = sp.random(r, c, density=density, random_state=np.random.RandomState(0))
    return M.tocsr()


def test_ell_roundtrip():
    M = _random_sparse(None, 13, 9)
    ell = sps.ell_from_scipy(M, n_rows=16, n_cols=16, k_multiple=4)
    dense = np.zeros((16, 16), dtype=np.float32)
    r, c = M.nonzero()
    dense[r, c] = np.asarray(M[r, c]).ravel()
    rebuilt = np.zeros((16, 16), dtype=np.float32)
    for i in range(16):
        for k in range(ell.k):
            rebuilt[i, ell.cols[i, k]] += ell.vals[i, k]
    np.testing.assert_allclose(rebuilt, dense, atol=1e-7)


def test_ell_k_too_small():
    M = sp.csr_matrix(np.ones((4, 4)))
    with pytest.raises(ValueError):
        sps.ell_from_scipy(M, k=2)


def test_spmm_matches_dense():
    M = _random_sparse(None, 20, 15)
    op = sps.operator_from_scipy(M)
    x = np.random.default_rng(1).normal(size=(15, 8)).astype(np.float32)
    out = sps.spmm(op, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), M @ x, rtol=1e-5, atol=1e-5)


def test_spmm_padded():
    M = _random_sparse(None, 20, 15)
    op = sps.operator_from_scipy(M, n_rows=32, n_cols=24, k_multiple=8)
    x = np.zeros((24, 8), dtype=np.float32)
    x[:15] = np.random.default_rng(1).normal(size=(15, 8))
    out = np.asarray(sps.spmm(op, jnp.asarray(x)))
    np.testing.assert_allclose(out[:20], M @ x[:15], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[20:], 0.0)


def test_spmm_batched_matches_blockdiag():
    """Batched ELL == the reference's sparse_diag_cat block-diagonal matmul."""
    mats = [_random_sparse(None, 12, 12, 0.3) for _ in range(3)]
    ops = [sps.operator_from_scipy(m, k=8) for m in mats]
    batched = sps.stack_operators(ops)
    x = np.random.default_rng(2).normal(size=(3, 12, 5)).astype(np.float32)
    out = np.asarray(sps.spmm(batched, jnp.asarray(x)))
    blockdiag = sp.block_diag(mats).tocsr()
    expected = (blockdiag @ x.reshape(36, 5)).reshape(3, 12, 5)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_spmm_grad_is_transpose():
    M = _random_sparse(None, 10, 10, 0.3)
    op = sps.operator_from_scipy(M)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(10, 4)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(4).normal(size=(10, 4)).astype(np.float32))

    def f(x):
        return jnp.sum(sps.spmm(op, x) * w)

    g = jax.grad(f)(x)
    expected = M.T @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4, atol=1e-5)


def test_spmm_jit_and_grad_under_jit():
    M = _random_sparse(None, 16, 16, 0.2)
    op = sps.operator_from_scipy(M, k_multiple=8)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(16, 8)).astype(np.float32))

    @jax.jit
    def f(op, x):
        return jax.grad(lambda x: jnp.sum(sps.spmm(op, x) ** 2))(x)

    g = f(op, x)
    dense = M.toarray()
    expected = dense.T @ (2 * (dense @ np.asarray(x)))
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4, atol=1e-4)


def test_quaternion_mul_matches_matrix():
    rng = np.random.default_rng(6)
    q = rng.normal(size=(5, 4)).astype(np.float32)
    x = rng.normal(size=(5, 4, 3)).astype(np.float32)
    out = np.asarray(sps.quaternion_mul(jnp.asarray(q), jnp.asarray(x)))
    for i in range(5):
        expected = geo.quaternion_matrix(q[i]) @ x[i]
        np.testing.assert_allclose(out[i], expected, rtol=1e-5, atol=1e-5)


def test_dirac_apply_matches_csr(random_mesh):
    V, F = random_mesh
    n, m = V.shape[0], F.shape[0]
    D, DA = geo.dirac(V, F)
    coeffs = geo.dirac_coeffs(V, F)
    op = sps.dirac_from_coeffs(coeffs)

    rng = np.random.default_rng(7)
    C = 8
    v = rng.normal(size=(n, C)).astype(np.float32)
    f = rng.normal(size=(m, C)).astype(np.float32)

    out_f = np.asarray(sps.dirac_apply_vf(op, jnp.asarray(v)))
    # CSR reference: reshape [N, C] -> [N, 4, C/4] -> [4N, C/4]
    expected_f = (D @ v.reshape(n * 4, C // 4)).reshape(m, C)
    np.testing.assert_allclose(out_f, expected_f, rtol=1e-4, atol=1e-4)

    out_v = np.asarray(sps.dirac_apply_fv(op, jnp.asarray(f)))
    expected_v = (DA @ f.reshape(m * 4, C // 4)).reshape(n, C)
    np.testing.assert_allclose(out_v, expected_v, rtol=1e-4, atol=1e-4)


def test_dirac_apply_padded_and_batched(random_mesh):
    V, F = random_mesh
    n, m = V.shape[0], F.shape[0]
    coeffs = geo.dirac_coeffs(V, F)
    Np, Mp = n + 7, m + 5
    op1 = sps.dirac_from_coeffs(coeffs, n_vertices=Np, n_faces=Mp, max_valence=16)
    batched = sps.stack_dirac([op1, op1])

    rng = np.random.default_rng(8)
    v = np.zeros((2, Np, 8), dtype=np.float32)
    v[:, :n] = rng.normal(size=(2, n, 8))
    out = np.asarray(sps.dirac_apply_vf(batched, jnp.asarray(v)))
    D, _ = geo.dirac(V, F)
    for b in range(2):
        expected = (D @ v[b, :n].reshape(n * 4, 2)).reshape(m, 8)
        np.testing.assert_allclose(out[b, :m], expected, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(out[b, m:], 0.0, atol=1e-6)


def test_dirac_grads_match_csr_transpose(random_mesh):
    V, F = random_mesh
    n, m = V.shape[0], F.shape[0]
    D, DA = geo.dirac(V, F)
    op = sps.dirac_from_coeffs(geo.dirac_coeffs(V, F))
    rng = np.random.default_rng(9)
    C = 8
    v = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))
    w = rng.normal(size=(m, C)).astype(np.float32)

    g = jax.grad(lambda v: jnp.sum(sps.dirac_apply_vf(op, v) * w))(v)
    expected = (D.T @ w.reshape(m * 4, C // 4)).reshape(n, C)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4, atol=1e-4)

    f = jnp.asarray(rng.normal(size=(m, C)).astype(np.float32))
    w2 = rng.normal(size=(n, C)).astype(np.float32)
    g2 = jax.grad(lambda f: jnp.sum(sps.dirac_apply_fv(op, f) * w2))(f)
    expected2 = (DA.T @ w2.reshape(n * 4, C // 4)).reshape(m, C)
    np.testing.assert_allclose(np.asarray(g2), expected2, rtol=1e-4, atol=1e-4)


def test_dense_bmm():
    rng = np.random.default_rng(10)
    L = rng.normal(size=(2, 6, 6)).astype(np.float32)
    x = rng.normal(size=(2, 6, 3)).astype(np.float32)
    out = np.asarray(sps.dense_bmm(jnp.asarray(L), jnp.asarray(x)))
    np.testing.assert_allclose(out, L @ x, rtol=1e-5, atol=1e-5)


def test_auto_format_selection():
    from surfacenetworks_tpu.data import choose_operator_format

    assert choose_operator_format(4, 1024) == "dense"
    assert choose_operator_format(1, 2048) == "dense"
    assert choose_operator_format(32, 2048) == "ell"  # memory budget
    assert choose_operator_format(1, 7168) == "ell"  # too many vertices


def test_auto_batch_matches_ell_batch():
    import jax.numpy as jnp

    from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch
    from surfacenetworks_tpu.sparse import ops

    samples = datasets.synthetic_normal_dataset(2, 60, seed=5, operator="lap")
    buckets = Buckets.for_samples(samples)
    b_auto = laplacian_batch(samples, buckets, fmt="auto")
    b_ell = laplacian_batch(samples, buckets, fmt="ell")
    assert isinstance(b_auto.operator, np.ndarray)  # dense chosen
    x = jnp.asarray(b_ell.inputs)
    y_dense = ops.dense_bmm(jnp.asarray(b_auto.operator), x)
    y_ell = ops.spmm(b_ell.operator, x)
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_ell), rtol=1e-4, atol=1e-4)


def test_dirac_packed_valence_matches_unpacked():
    """Packed-valence tables (base + overflow scatter) are numerically
    identical to the full-valence tables, forward and backward (the fv
    apply and the vf VJP both ride the vertex-side tables)."""
    import jax

    from surfacenetworks_tpu import geometry as geo
    from surfacenetworks_tpu.data import datasets
    from surfacenetworks_tpu.sparse import dirac_from_coeffs, stack_dirac
    from surfacenetworks_tpu.sparse import dirac_apply_fv, dirac_apply_vf

    rng = np.random.default_rng(3)
    V, F = datasets.random_blob_mesh(rng, 80)
    coeffs = geo.dirac_coeffs(V, F)
    kv = coeffs.vf_face.shape[1]
    assert kv > 5, "mesh too regular to exercise the overflow path"
    n, m = 96, 176
    full = dirac_from_coeffs(coeffs, n_vertices=n, n_faces=m, max_valence=kv)
    packed = dirac_from_coeffs(
        coeffs, n_vertices=n, n_faces=m, max_valence=kv, base_valence=5, n_overflow=64
    )
    assert packed.vf_face.shape[1] == 5
    assert packed.ov_face.shape == (64, kv - 5)
    assert (np.asarray(packed.q_ov_vf) != 0).any(), "overflow not exercised"

    v = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(m, 16)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(dirac_apply_fv(packed, f)),
        np.asarray(dirac_apply_fv(full, f)),
        rtol=1e-5, atol=1e-6,
    )

    def loss_vf(op, v):
        return jnp.sum(jnp.sin(dirac_apply_vf(op, v)))

    gv_full = jax.grad(loss_vf, argnums=1)(full, v)
    gv_packed = jax.grad(loss_vf, argnums=1)(packed, v)
    np.testing.assert_allclose(np.asarray(gv_packed), np.asarray(gv_full), rtol=1e-5, atol=1e-6)

    def loss_fv(op, f):
        return jnp.sum(jnp.sin(dirac_apply_fv(op, f)))

    gf_full = jax.grad(loss_fv, argnums=1)(full, f)
    gf_packed = jax.grad(loss_fv, argnums=1)(packed, f)
    np.testing.assert_allclose(np.asarray(gf_packed), np.asarray(gf_full), rtol=1e-5, atol=1e-6)

    # batched (stacked) packed operators
    b = stack_dirac([packed, packed])
    vb = jnp.stack([v, v * 0.5])
    out = dirac_apply_vf(b, vb)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(dirac_apply_vf(full, v)), rtol=1e-5, atol=1e-6
    )
