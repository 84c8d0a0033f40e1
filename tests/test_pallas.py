"""Pallas kernel correctness (interpret mode on CPU; same code path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import datasets
from surfacenetworks_tpu.sparse import pallas_kernels


def test_pallas_bsr_matmul_matches_scipy():
    rng = np.random.default_rng(0)
    V, F = datasets.random_blob_mesh(rng, 100)
    L = geo.igl_style_laplacian(V, F, hack=1.0)
    op = sps.bsr_operator_from_scipy(L, block_size=8)
    n_pad = op.fwd.n_rows
    x = rng.normal(size=(n_pad, 16)).astype(np.float32)
    out = np.asarray(
        pallas_kernels.bsr_matmul(
            jnp.asarray(op.fwd.block_cols), jnp.asarray(op.fwd.block_vals), jnp.asarray(x)
        )
    )
    ref = np.zeros_like(x)
    ref[: L.shape[0]] = L @ x[: L.shape[0]]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_ell_matmul_matches_scipy():
    rng = np.random.default_rng(2)
    V, F = datasets.random_blob_mesh(rng, 150)  # n_rows not a tile multiple
    L = geo.igl_style_laplacian(V, F, hack=1.0)
    op = sps.operator_from_scipy(L)
    assert op.fwd.window > 0
    x = rng.normal(size=(op.fwd.n_cols, 16)).astype(np.float32)
    out = np.asarray(
        pallas_kernels.ell_matmul(
            jnp.asarray(op.fwd.cols), jnp.asarray(op.fwd.vals), jnp.asarray(x), op.fwd.window
        )
    )
    np.testing.assert_allclose(out, L @ x, rtol=1e-4, atol=1e-4)


def test_pallas_ell_spmm_switch_batched_and_grad():
    rng = np.random.default_rng(3)
    ops = []
    for i in range(2):
        V, F = datasets.random_blob_mesh(rng, 90)
        L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr().astype(np.float32)
        ops.append(
            sps.EllOperator(
                fwd=sps.ell_from_scipy(L, k=16, n_rows=96, n_cols=96),
                bwd=sps.ell_from_scipy(L.T.tocsr(), k=16, n_rows=96, n_cols=96),
            )
        )
    op = sps.stack_operators(ops)
    op = jax.tree_util.tree_map(jnp.asarray, op)
    x = jnp.asarray(rng.normal(size=(2, 96, 8)).astype(np.float32))

    def loss(x):
        return jnp.sum(sps.spmm(op, x) ** 2)

    out_xla, g_xla = jax.value_and_grad(loss)(x)
    sps.set_default_implementation("pallas")
    try:
        out_pl, g_pl = jax.value_and_grad(loss)(x)
    finally:
        sps.set_default_implementation("xla")
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla), rtol=1e-4)
    g_xla = np.asarray(g_xla)
    # MXU matmul vs gather-sum reduce in different orders; tolerance scales
    # with the gradient magnitude.
    np.testing.assert_allclose(
        np.asarray(g_pl), g_xla, rtol=1e-3, atol=1e-4 * np.abs(g_xla).max()
    )


def test_pallas_via_implementation_switch():
    rng = np.random.default_rng(1)
    V, F = datasets.random_blob_mesh(rng, 80)
    L = geo.igl_style_laplacian(V, F, hack=1.0)
    op = sps.bsr_operator_from_scipy(L, block_size=8)
    x = jnp.asarray(rng.normal(size=(op.fwd.n_rows, 8)).astype(np.float32))
    out_xla = np.asarray(sps.bsr_spmm(op, x))
    sps.set_default_implementation("pallas")
    try:
        out_pl = np.asarray(sps.bsr_spmm(op, x))
    finally:
        sps.set_default_implementation("xla")
    np.testing.assert_allclose(out_pl, out_xla, rtol=1e-4, atol=1e-4)
