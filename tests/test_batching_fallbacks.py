"""On-the-fly operator fallbacks in the batching layer.

Round-1 verdict: the ``native.dirac_coeffs`` fallback branches in
``arap_batch`` / ``correspondence_batch`` / ``dirac_batch`` were dead,
untested code (every synthetic dataset precomputes ``"dirac"``) and crashed
with a NameError.  These tests batch samples *without* precomputed
coefficients and pin the result against the precomputed path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from surfacenetworks_tpu import native
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import (
    Buckets,
    arap_batch,
    correspondence_batch,
    datasets,
    dirac_batch,
)


def _strip(sample):
    out = {k: v for k, v in sample.items() if k not in ("dirac", "flat_dirac")}
    return out


def _assert_dirac_ops_equal(a, b):
    # precomputed coeffs may have been built from float64 V; the on-the-fly
    # path sees the stored float32 V — identical tables up to fp32 rounding
    for field in ("faces", "vf_face"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)), err_msg=field
        )
    for field in ("q_fv", "q_vf", "q_bwd_v", "q_bwd_f"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            rtol=1e-4, atol=1e-5, err_msg=field,
        )


def test_dirac_batch_computes_coeffs_on_the_fly():
    samples = datasets.synthetic_normal_dataset(2, 60, seed=0, operator="dirac")
    buckets = Buckets.for_samples(samples)
    with_pre = dirac_batch(samples, buckets)
    on_fly = dirac_batch([_strip(s) for s in samples], buckets)
    _assert_dirac_ops_equal(with_pre.operator, on_fly.operator)


def test_arap_batch_dirac_on_the_fly():
    seqs = datasets.synthetic_arap_sequences(1, n_frames=8, n_points=60, seed=1)
    buckets = Buckets.for_samples(seqs[0])
    with_pre = arap_batch(seqs, [(0, 0)], buckets, model="dirac", output_frames=4)
    stripped = [[_strip(f) for f in seq] for seq in seqs]
    on_fly = arap_batch(stripped, [(0, 0)], buckets, model="dirac", output_frames=4)
    _assert_dirac_ops_equal(with_pre.operator, on_fly.operator)
    np.testing.assert_array_equal(with_pre.inputs, on_fly.inputs)


def test_correspondence_batch_dirac_on_the_fly():
    samples = datasets.synthetic_correspondence_dataset(1, n_points=60, seed=2)
    s = samples[0]
    buckets = Buckets.for_samples(samples)
    s_pre = dict(s)
    s_pre["dirac"] = native.dirac_coeffs(s["V"], s["F"])
    with_pre = correspondence_batch(s_pre, buckets, model="dirac")
    on_fly = correspondence_batch(_strip(s), buckets, model="dirac")
    _assert_dirac_ops_equal(with_pre.operator, on_fly.operator)


def test_stack_operators_window_zero_poisons_batch():
    # any member without a verified banded bound (window=0) forces the whole
    # batch onto the XLA path (ADVICE round 1: max() silently dropped
    # out-of-window nonzeros for that member)
    rng = np.random.default_rng(0)
    V, F = datasets.random_blob_mesh(rng, 60)
    from surfacenetworks_tpu import geometry as geo

    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    N = 64
    op = sps.operator_from_scipy(L, n_rows=N, n_cols=N, k_multiple=8)
    assert op.fwd.window > 0
    from surfacenetworks_tpu.sparse.ell import EllMatrix, EllOperator

    unbounded = EllOperator(
        fwd=EllMatrix(cols=op.fwd.cols, vals=op.fwd.vals, n_cols=N, window=0),
        bwd=EllMatrix(cols=op.bwd.cols, vals=op.bwd.vals, n_cols=N, window=0),
    )
    batch = sps.stack_operators([op, unbounded])
    assert batch.fwd.window == 0
    assert batch.bwd.window == 0
    batch_ok = sps.stack_operators([op, op])
    assert batch_ok.fwd.window == op.fwd.window


def test_ell_matmul_rejects_window_zero():
    from surfacenetworks_tpu.sparse import pallas_kernels

    cols = jnp.zeros((8, 4), jnp.int32)
    vals = jnp.zeros((8, 4), jnp.float32)
    x = jnp.zeros((8, 8), jnp.float32)
    with pytest.raises(ValueError, match="window"):
        pallas_kernels.ell_matmul(cols, vals, x, 0)
