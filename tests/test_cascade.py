"""Coarsening pyramid + multiresolution model tests."""

import numpy as np

import jax
import jax.numpy as jnp

from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch
from surfacenetworks_tpu.data.batching import cascade_batch
from surfacenetworks_tpu.geometry import coarsening
from surfacenetworks_tpu.models.cascade import EfficientCascade, GlobalLocalModel, LapMATModel
from surfacenetworks_tpu.train import TrainState, losses, optim

LEVELS = 3
NB = 64  # finest bucket (divisible by 2**(LEVELS-1))


def _samples(n=2, points=50, seed=0):
    return datasets.synthetic_normal_dataset(n, points, seed=seed, operator="lap")


def test_pyramid_shapes_and_ordering():
    s = _samples(1)[0]
    p = coarsening.build_pyramid(s["V"], s["F"], LEVELS, n_bucket=NB)
    assert len(p.levels) == LEVELS
    sizes = [lvl.L.shape[0] for lvl in p.levels]
    assert sizes == [NB // 4, NB // 2, NB]  # coarsest..finest
    # ordering covers each original vertex exactly once
    order = p.perm
    real = order[order >= 0]
    assert len(np.unique(real)) == s["V"].shape[0]
    # reordered data round-trips
    data = np.arange(s["V"].shape[0], dtype=np.float32)[:, None]
    re = coarsening.reorder_fine_data(p, data)
    mask = coarsening.pyramid_mask(p)
    assert (re[mask[:, 0] == 0] == 0).all()
    np.testing.assert_allclose(np.sort(re[mask[:, 0] == 1, 0]), np.sort(data[:, 0]))


def test_pyramid_laplacian_annihilates_constants():
    s = _samples(1, seed=1)[0]
    p = coarsening.build_pyramid(s["V"], s["F"], LEVELS, n_bucket=NB)
    for lvl in p.levels:
        ones = np.zeros(lvl.L.shape[0])
        # constant over REAL vertices; fake slots are zero rows anyway
        ones[:] = 1.0
        r = lvl.L @ ones
        np.testing.assert_allclose(r, 0.0, atol=1e-5)


def test_cascade_forward_and_train():
    samples = _samples(2, seed=2)
    batch = cascade_batch(samples, LEVELS, NB)
    model = EfficientCascade(3, 3, cascade_levels=LEVELS, inner_layers=1)
    inputs = jnp.asarray(batch.inputs)
    mask = jnp.asarray(batch.mask)
    targets = jnp.asarray(batch.targets)
    params = model.init(jax.random.key(0), batch.operator, mask, inputs)["params"]
    out = model.apply({"params": params}, batch.operator, mask, inputs)
    assert out.shape == inputs.shape

    state = TrainState.create(params, optim.adam(1e-3))

    @jax.jit
    def step(state):
        def objective(params):
            out = model.apply({"params": params}, batch.operator, mask, inputs)
            return losses.normal_cosine_loss(out, mask, targets), ()

        (loss, _), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    hist = [float(step(state)[1])]
    for _ in range(8):
        state, loss = step(state)
        hist.append(float(loss))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0], hist


def test_cascade_learned_pooling():
    samples = _samples(1, seed=3)
    batch = cascade_batch(samples, LEVELS, NB)
    model = EfficientCascade(3, 3, cascade_levels=LEVELS, inner_layers=1, naive_pool=False)
    inputs = jnp.asarray(batch.inputs)
    mask = jnp.asarray(batch.mask)
    params = model.init(jax.random.key(0), batch.operator, mask, inputs)["params"]
    out = model.apply({"params": params}, batch.operator, mask, inputs)
    assert out.shape == inputs.shape


def test_global_local_model():
    samples = _samples(2, seed=4)
    cb = cascade_batch(samples, LEVELS, NB)
    # local branch on the same bucket (plain order is fine for smoke test)
    buckets = Buckets(n_vertices=NB)
    lb = laplacian_batch(samples, buckets)
    model = GlobalLocalModel(3, 1, cascade_levels=LEVELS, local_layers=2)
    inputs = jnp.asarray(cb.inputs)
    params = model.init(
        jax.random.key(0),
        (cb.operator, lb.operator),
        (jnp.asarray(cb.mask), jnp.asarray(lb.mask)),
        inputs,
    )["params"]
    out = model.apply(
        {"params": params},
        (cb.operator, lb.operator),
        (jnp.asarray(cb.mask), jnp.asarray(lb.mask)),
        inputs,
    )
    assert out.shape == (2, 3 * NB, 1)  # global/local/final stacked on vertex axis


def test_lap_mat_model():
    samples = _samples(2, seed=5)
    buckets = Buckets(n_vertices=NB)
    batch = laplacian_batch(samples, buckets)
    mass = jnp.ones((2, NB, 1))
    model = LapMATModel(3, 2, layers=2)
    inputs = jnp.asarray(batch.inputs)
    mask = jnp.asarray(batch.mask)
    params = model.init(jax.random.key(0), (batch.operator, mass), mask, inputs)["params"]
    out = model.apply({"params": params}, (batch.operator, mass), mask, inputs)
    assert out.shape == (2, NB, 2)
    assert bool(jnp.isfinite(out).all())


def test_cascade_cli_smoke(tmp_path):
    from surfacenetworks_tpu.cli import train_normal

    train_normal.main(
        [
            "--synthetic", "4", "--model", "cas", "--cascade-levels", "3",
            "--batch-size", "2", "--num-epoch", "1", "--num-updates", "2", "--debug",
            "--result-dir", str(tmp_path),
        ]
    )
