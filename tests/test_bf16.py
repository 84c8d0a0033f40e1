"""Mixed-precision (bf16) training path.

The `dtype` attribute threads flax's computation-dtype convention through the
model zoo: matmuls and activations run bf16, params / optimizer state / BN
statistics / losses stay fp32.  These tests pin the contract:

* params and grads are fp32 regardless of dtype,
* every custom-VJP sparse op returns cotangents in the primal dtype,
* bf16 training converges on the synthetic normal task (the decisive check —
  BatchNorm amplifies bf16 rounding by |mean|/std per channel, so *output*
  parity with fp32 at a random init is intentionally NOT asserted; see
  nn/layers.py module docstring),
* all model families construct and run under dtype=bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from surfacenetworks_tpu import models as zoo
from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch, dirac_batch
from surfacenetworks_tpu.train import TrainState, losses, optim


@pytest.fixture(scope="module")
def lap_batch():
    samples = datasets.synthetic_normal_dataset(2, 80, seed=0, operator="lap")
    buckets = Buckets.for_samples(samples)
    batch = laplacian_batch(samples, buckets, fmt="ell")
    return (
        jax.device_put(batch.operator),
        jnp.asarray(batch.mask),
        jnp.asarray(batch.inputs),
        jnp.asarray(batch.targets),
    )


def test_params_and_grads_stay_fp32(lap_batch):
    op, mask, inputs, targets = lap_batch
    model = zoo.LapDeepModel(3, 3, layers=3, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), op, mask, inputs)["params"]
    assert all(a.dtype == jnp.float32 for a in jtu.tree_leaves(params))

    def obj(p):
        out = model.apply({"params": p}, op, mask, inputs)
        assert out.dtype == jnp.float32  # residual head promotes
        return losses.normal_cosine_loss(out, mask, targets)

    loss, grads = jax.value_and_grad(obj)(params)
    assert loss.dtype == jnp.float32
    assert all(a.dtype == jnp.float32 for a in jtu.tree_leaves(grads))
    assert np.isfinite(float(loss))


def test_bf16_training_converges(lap_batch):
    """The decisive mixed-precision check: the bf16 loss curve must track the
    fp32 one (same init, same data) to a small multiple, not diverge."""
    op, mask, inputs, targets = lap_batch
    m32 = zoo.LapDeepModel(3, 3, layers=3)
    m16 = zoo.LapDeepModel(3, 3, layers=3, dtype=jnp.bfloat16)
    p0 = m32.init(jax.random.key(0), op, mask, inputs)["params"]

    finals = {}
    for name, model in (("fp32", m32), ("bf16", m16)):
        state = TrainState.create(p0, optim.adam(1e-3))

        @jax.jit
        def step(state, model=model):
            def obj(p):
                out = model.apply({"params": p}, op, mask, inputs)
                return losses.normal_cosine_loss(out, mask, targets)

            loss, grads = jax.value_and_grad(obj)(state.params)
            return state.apply_gradients(grads), loss

        first = None
        for _ in range(40):
            state, loss = step(state)
            first = float(loss) if first is None else first
        finals[name] = float(loss)
        assert finals[name] < 0.5 * first, (name, first, finals[name])
    # same convergence regime: within 3x of the fp32 loss (measured ~1.5x)
    assert finals["bf16"] < 3.0 * finals["fp32"] + 1e-3, finals


def test_bf16_bsr_forward_backward():
    samples = datasets.synthetic_normal_dataset(1, 100, seed=1, operator="lap")
    from surfacenetworks_tpu.data.batching import rcm_reorder_sequence

    samples = rcm_reorder_sequence(samples)
    buckets = Buckets.for_samples(samples, multiple=128)
    batch = laplacian_batch(samples, buckets, fmt="bsr")
    op = jax.device_put(batch.operator)
    mask, inputs, targets = (
        jnp.asarray(batch.mask),
        jnp.asarray(batch.inputs),
        jnp.asarray(batch.targets),
    )
    model = zoo.LapDeepModel(3, 3, layers=2, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), op, mask, inputs)["params"]

    def obj(p):
        out = model.apply({"params": p}, op, mask, inputs)
        return losses.normal_cosine_loss(out, mask, targets)

    loss, grads = jax.value_and_grad(obj)(params)
    assert np.isfinite(float(loss))
    assert all(a.dtype == jnp.float32 for a in jtu.tree_leaves(grads))


def test_bf16_dirac_model():
    samples = datasets.synthetic_normal_dataset(2, 60, seed=2, operator="dirac")
    buckets = Buckets.for_samples(samples)
    batch = dirac_batch(samples, buckets)
    op = jax.device_put(batch.operator)
    mask, inputs, targets = (
        jnp.asarray(batch.mask),
        jnp.asarray(batch.inputs),
        jnp.asarray(batch.targets),
    )
    model = zoo.DirDeepModel(3, 3, layers=2, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), op, mask, inputs)["params"]
    assert all(a.dtype == jnp.float32 for a in jtu.tree_leaves(params))

    def obj(p):
        out = model.apply({"params": p}, op, mask, inputs)
        return losses.normal_cosine_loss(out, mask, targets)

    loss, grads = jax.value_and_grad(obj)(params)
    assert np.isfinite(float(loss))
    assert all(a.dtype == jnp.float32 for a in jtu.tree_leaves(grads))


def test_bf16_siamese_logits_fp32(lap_batch):
    op, mask, inputs, _ = lap_batch
    from surfacenetworks_tpu.models.correspondence import SiameseModel

    model = SiameseModel(model="lap", layers=2, dtype=jnp.bfloat16)
    opx = (op, mask)
    params = model.init(jax.random.key(0), opx, opx, inputs, inputs)["params"]
    logits = model.apply({"params": params}, opx, opx, inputs, inputs)
    assert logits.dtype == jnp.float32  # loss softmax always full precision
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_bf16_bsr_operator_storage():
    """op_dtype=bf16 halves the BSR block stream; numerics stay within the
    MXU's own bf16 input rounding (~4e-3 for cotan Laplacian values)."""
    from surfacenetworks_tpu.data.batching import rcm_reorder_sequence
    from surfacenetworks_tpu.sparse import bsr_spmm

    samples = rcm_reorder_sequence(
        datasets.synthetic_normal_dataset(1, 100, seed=1, operator="lap")
    )
    buckets = Buckets.for_samples(samples, multiple=128)
    b32 = laplacian_batch(samples, buckets, fmt="bsr")
    b16 = laplacian_batch(samples, buckets, fmt="bsr", op_dtype=jnp.bfloat16)
    assert b16.operator.fwd.block_vals.dtype == jnp.bfloat16
    x = jax.random.normal(jax.random.key(0), (1, buckets.n_vertices, 64))
    y32 = bsr_spmm(jax.device_put(b32.operator), x)
    y16 = bsr_spmm(jax.device_put(b16.operator), x)
    rel = float(jnp.max(jnp.abs(y32 - y16)) / (jnp.max(jnp.abs(y32)) + 1e-30))
    assert rel < 2e-2, rel


@pytest.mark.parametrize("family", ["mnist", "vae", "arap"])
def test_bf16_other_families_construct_and_run(family, lap_batch):
    op, mask, inputs, _ = lap_batch
    if family == "mnist":
        from surfacenetworks_tpu.models import mnist_models

        model = mnist_models.Model(layers=1, dtype=jnp.bfloat16)
        params = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            inputs, op, mask,
        )["params"]
        out = model.apply(
            {"params": params}, inputs, op, mask, True,
        )
        assert out.dtype == jnp.float32
    elif family == "vae":
        from surfacenetworks_tpu.models.vae import LapVAE

        model = LapVAE(num_layers=1, dtype=jnp.bfloat16)
        params = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            inputs, inputs, op, op, mask,
        )["params"]
        recon_mu, recon_logvar, z, mu, logvar = model.apply(
            {"params": params}, inputs, inputs, op, op, mask,
            rngs={"sample": jax.random.key(2)},
        )
        assert recon_mu.dtype == jnp.float32 and mu.dtype == jnp.float32
    else:
        from surfacenetworks_tpu.models import arap_models

        x2 = jnp.concatenate([inputs, inputs], axis=-1)
        model = arap_models.Model(layers=2, dtype=jnp.bfloat16)
        params = model.init(jax.random.key(0), op, mask, x2)["params"]
        out = model.apply({"params": params}, op, mask, x2)
        assert out.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out if family != "vae" else recon_mu)))
