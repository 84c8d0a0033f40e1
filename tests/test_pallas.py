"""Pallas kernel correctness (interpret mode on CPU; same code path on TPU)."""

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
