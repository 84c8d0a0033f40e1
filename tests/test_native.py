"""Native C++ runtime (csrc/snx_native.cc) vs NumPy-reference parity.

The NumPy implementations in geometry.mesh_ops / sparse.ell are the oracle;
the native library must agree on every output buffer.  This mirrors the
reference's own verification contract for its native layer — CUDA kernel
output vs dense torch (utils/cuda/sparse_bmm.py:65-94) — applied to the host
runtime.
"""

import numpy as np
import pytest

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import native
from surfacenetworks_tpu.data import datasets
from surfacenetworks_tpu.geometry import mesh_ops
from surfacenetworks_tpu.sparse import ell

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _meshes():
    V, F = geo.load_ply("/root/reference/meshes/cube.ply")
    yield "cube", V, F
    for seed, n in [(0, 80), (1, 300)]:
        Vb, Fb = datasets.random_blob_mesh(np.random.default_rng(seed), n)
        yield f"blob{n}", Vb, Fb


def _ell_dense(cols, vals, n_cols):
    out = np.zeros((cols.shape[0], n_cols), np.float64)
    for r in range(cols.shape[0]):
        for c, v in zip(cols[r], vals[r]):
            out[r, c] += v
    return out


@pytest.mark.parametrize("hack", [1.0, 0.0, None])
def test_igl_laplacian_parity(hack):
    for name, V, F in _meshes():
        L = mesh_ops.igl_style_laplacian(V, F, hack=hack).tocsr()
        n = geo.round_up(L.shape[0], 8) if hasattr(geo, "round_up") else L.shape[0]
        n = L.shape[0] + 5  # padded bucket
        ref = ell.operator_from_scipy(L, k=24, n_rows=n, n_cols=n, k_multiple=1)
        got = native.igl_laplacian_ell_arrays(V, F, n, 24, 24, hack=hack)
        assert got is not None
        fc, fv, bc, bv = got
        np.testing.assert_allclose(
            _ell_dense(fc, fv, n), _ell_dense(ref.fwd.cols, ref.fwd.vals, n),
            rtol=1e-6, atol=1e-6, err_msg=f"{name} fwd",
        )
        np.testing.assert_allclose(
            _ell_dense(bc, bv, n), _ell_dense(ref.bwd.cols, ref.bwd.vals, n),
            rtol=1e-6, atol=1e-6, err_msg=f"{name} bwd",
        )


def test_igl_laplacian_hack_clamps_degenerate():
    # a zero-area face drives cot -> inf; the clamp must fire identically
    V = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [0.5, 1, 0]], float)
    F = np.array([[0, 1, 3], [1, 2, 3], [0, 2, 1]], np.int32)  # last is collinear
    L = mesh_ops.igl_style_laplacian(V, F, hack=1.0).tocsr()
    got = native.igl_laplacian_ell_arrays(V, F, 4, 8, hack=1.0)
    fc, fv, _, _ = got
    np.testing.assert_allclose(
        _ell_dense(fc, fv, 4), L.toarray().astype(np.float64), rtol=1e-6, atol=1e-6
    )
    assert np.isfinite(fv).all()


def test_mesh_laplacian_parity():
    for name, V, F in _meshes():
        L = mesh_ops.mesh_laplacian(V, F).tocsr().astype(np.float32)
        n = L.shape[0] + 3
        ref = ell.operator_from_scipy(L, k=24, n_rows=n, n_cols=n)
        got = native.mesh_laplacian_ell_arrays(V, F, n, 24, 24)
        fc, fv, bc, bv = got
        np.testing.assert_allclose(
            _ell_dense(fc, fv, n), _ell_dense(ref.fwd.cols, ref.fwd.vals, n),
            rtol=1e-5, atol=1e-6, err_msg=f"{name} fwd",
        )
        np.testing.assert_allclose(
            _ell_dense(bc, bv, n), _ell_dense(ref.bwd.cols, ref.bwd.vals, n),
            rtol=1e-5, atol=1e-6, err_msg=f"{name} bwd",
        )


def test_ell_k_too_small_raises():
    V, F = next(iter(_meshes()))[1:]
    with pytest.raises(ValueError, match="k too small"):
        native.igl_laplacian_ell_arrays(V, F, V.shape[0], 2, 2)


def test_dirac_coeffs_parity():
    for name, V, F in _meshes():
        ref = mesh_ops.dirac_coeffs(V, F)
        got = native.dirac_coeffs(V, F)
        np.testing.assert_allclose(got.q_fv, ref.q_fv, rtol=1e-6, atol=1e-7, err_msg=name)
        np.testing.assert_array_equal(got.vf_face, ref.vf_face)
        np.testing.assert_array_equal(got.vf_corner, ref.vf_corner)
        np.testing.assert_allclose(got.q_vf, ref.q_vf, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(got.q_bwd_v, ref.q_bwd_v, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(got.q_bwd_f, ref.q_bwd_f, rtol=1e-6, atol=1e-7)


def test_csr_to_ell_parity():
    rng = np.random.default_rng(0)
    import scipy.sparse as sp

    M = sp.random(50, 40, density=0.1, random_state=rng, format="csr", dtype=np.float32)
    ref = ell.ell_from_scipy(M, k=16, n_rows=56, n_cols=40)
    got = native.csr_to_ell_arrays(M, 56, 16)
    cols, vals = got
    np.testing.assert_allclose(_ell_dense(cols, vals, 40), _ell_dense(ref.cols, ref.vals, 40))


def test_ell_operator_from_csr_parity():
    rng = np.random.default_rng(3)
    import scipy.sparse as sp

    M = sp.random(60, 60, density=0.12, random_state=rng, format="csr", dtype=np.float32)
    ref_f = ell.ell_from_scipy(M, k=20, n_rows=64, n_cols=64)
    ref_b = ell.ell_from_scipy(M.T.tocsr(), k=20, n_rows=64, n_cols=64)
    got = native.ell_operator_from_csr(M, 64, 20, 20)
    np.testing.assert_allclose(
        _ell_dense(got.fwd.cols, got.fwd.vals, 64), _ell_dense(ref_f.cols, ref_f.vals, 64)
    )
    np.testing.assert_allclose(
        _ell_dense(got.bwd.cols, got.bwd.vals, 64), _ell_dense(ref_b.cols, ref_b.vals, 64)
    )


def test_vertex_normals_parity():
    for name, V, F in _meshes():
        ref = mesh_ops.vertex_normals(V, F)
        got = native.vertex_normals(V, F)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6, err_msg=name)


def test_laplacian_ell_operator_end_to_end():
    """Native-assembled operator must drive the same SpMM as the scipy path."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from surfacenetworks_tpu.sparse import ops

    V, F = datasets.random_blob_mesh(np.random.default_rng(2), 120)
    n = 128
    op_native = native.laplacian_ell_operator(V, F, n, 24, convention="igl", hack=1.0)
    L = mesh_ops.igl_style_laplacian(V, F, hack=1.0).tocsr()
    op_scipy = ell.operator_from_scipy(L, k=24, n_rows=n, n_cols=n)
    x = np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32)
    y_native = ops.spmm(op_native, jnp.asarray(x))
    y_scipy = ops.spmm(op_scipy, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_native), np.asarray(y_scipy), rtol=1e-5, atol=1e-5)
