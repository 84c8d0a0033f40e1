"""Model-zoo parity + end-to-end training smoke tests (normal prediction)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surfacenetworks_tpu import models as zoo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import Buckets, datasets, dirac_batch, laplacian_batch
from surfacenetworks_tpu.train import TrainState, checkpoint, losses, make_train_step, optim

LAYERS = 3  # small depth for CPU tests (reference default is 15)


def _lap_batch(n_meshes=3, n_points=60, seed=0):
    samples = datasets.synthetic_normal_dataset(n_meshes, n_points, seed=seed, operator="lap")
    buckets = Buckets.for_samples(samples)
    return laplacian_batch(samples, buckets), buckets


def test_lapdeep_forward_shapes():
    batch, _ = _lap_batch()
    model = zoo.LapDeepModel(3, 3, layers=LAYERS)
    params = model.init(
        jax.random.key(0), batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    )
    out = model.apply(params, batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs))
    assert out.shape == batch.inputs.shape


def test_lapdeep_parity_vs_reference():
    """Full-model forward allclose vs the reference LapDeepModel."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/src")
    from normal_predict import models as ref_models
    import oracle
    import scipy.sparse as sp

    samples = datasets.synthetic_normal_dataset(2, 50, seed=1, operator="lap")
    buckets = Buckets.for_samples(samples, multiple=1)  # exact sizes: torch pads to batch max
    batch = laplacian_batch(samples, buckets)

    tm = ref_models.LapDeepModel(3, 3, layers=LAYERS).train()
    mats = []
    for s in samples:
        L = sp.csr_matrix(s["L"], dtype=np.float32).copy()
        L.resize((buckets.n_vertices, buckets.n_vertices))
        mats.append(L)
    torch_L = oracle.to_torch_sparse(sp.block_diag(mats).tocoo())
    t_out = tm(torch_L, torch.from_numpy(batch.mask), torch.from_numpy(batch.inputs))

    jm = zoo.LapDeepModel(3, 3, layers=LAYERS)
    params = {"params": oracle.copy_deep_model(tm)}
    j_out = jm.apply(params, batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs))
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.detach().numpy(), rtol=3e-3, atol=3e-4
    )


def test_dirdeep_parity_vs_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/src")
    from normal_predict import models as ref_models
    import oracle
    import scipy.sparse as sp
    from surfacenetworks_tpu import geometry as geo

    samples = datasets.synthetic_normal_dataset(2, 50, seed=2, operator="dirac")
    buckets = Buckets.for_samples(samples, multiple=1)
    batch = dirac_batch(samples, buckets)

    tm = ref_models.DirDeepModel(3, 3, layers=LAYERS).train()
    Dis, DiAs = [], []
    for s in samples:
        D, DA = geo.dirac(s["V"], s["F"])
        D = sp.csr_matrix(D, dtype=np.float32)
        DA = sp.csr_matrix(DA, dtype=np.float32)
        D.resize((4 * buckets.n_faces, 4 * buckets.n_vertices))
        DA.resize((4 * buckets.n_vertices, 4 * buckets.n_faces))
        Dis.append(D)
        DiAs.append(DA)
    t_Di = oracle.to_torch_sparse(sp.block_diag(Dis).tocoo())
    t_DiA = oracle.to_torch_sparse(sp.block_diag(DiAs).tocoo())
    t_out = tm((t_Di, t_DiA), torch.from_numpy(batch.mask), torch.from_numpy(batch.inputs))

    jm = zoo.DirDeepModel(3, 3, layers=LAYERS)
    params = {"params": oracle.copy_deep_model(tm)}
    j_out = jm.apply(params, batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs))
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.detach().numpy(), rtol=3e-3, atol=3e-4
    )


def _train_steps(model, batch, n_steps=12, lr=1e-3):
    params = model.init(
        jax.random.key(0), batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    )["params"]
    tx = optim.adam(lr)
    state = TrainState.create(params, tx)

    def apply_fn(params, b):
        return model.apply({"params": params}, b["operator"], b["mask"], b["inputs"])

    def loss_fn(outputs, b):
        loss = losses.normal_cosine_loss(outputs, b["mask"], b["targets"])
        mad = losses.mean_angle_deviation(outputs, b["mask"], b["targets"])
        return loss, {"mad": mad}

    step = make_train_step(apply_fn, loss_fn, donate=False)
    b = {
        "operator": batch.operator,
        "mask": jnp.asarray(batch.mask),
        "inputs": jnp.asarray(batch.inputs),
        "targets": jnp.asarray(batch.targets),
    }
    hist = []
    for _ in range(n_steps):
        state, metrics = step(state, b)
        hist.append(float(metrics["loss"]))
    return hist


def test_train_normal_lap_loss_decreases():
    batch, _ = _lap_batch(n_meshes=2, n_points=50, seed=3)
    model = zoo.LapDeepModel(3, 3, layers=LAYERS)
    hist = _train_steps(model, batch)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0], hist


def test_train_normal_dirac_loss_decreases():
    samples = datasets.synthetic_normal_dataset(2, 50, seed=4, operator="dirac")
    buckets = Buckets.for_samples(samples)
    batch = dirac_batch(samples, buckets)
    model = zoo.DirDeepModel(3, 3, layers=LAYERS)
    hist = _train_steps(model, batch)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0], hist


def test_checkpoint_roundtrip_and_fuzzy(tmp_path):
    batch, _ = _lap_batch(n_meshes=2, n_points=50, seed=5)
    model = zoo.LapDeepModel(3, 3, layers=LAYERS)
    params = model.init(
        jax.random.key(1), batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    )["params"]
    path = str(tmp_path / "ck.msgpack")
    checkpoint.save_checkpoint(path, params, epoch=7, step=4321)
    params2 = jax.tree.map(jnp.zeros_like, params)
    restored, _, epoch, step = checkpoint.restore_training(path, params2)
    assert epoch == 7
    assert step == 4321  # schedule-correct resume (TrainState.step roundtrips)
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(restored)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # fuzzy: a model with different depth keeps matching layers only
    model3 = zoo.LapDeepModel(3, 3, layers=LAYERS + 2)
    params3 = model3.init(
        jax.random.key(2), batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    )["params"]
    merged, _, _, _ = checkpoint.restore_training(path, params3)
    np.testing.assert_allclose(
        np.asarray(merged["conv1"]["fc"]["kernel"]),
        np.asarray(params["conv1"]["fc"]["kernel"]),
    )


def test_remat_matches_no_remat():
    """jax.checkpoint'd blocks must be numerically identical fwd and bwd.

    BN-free config: the batch-norm gradient's cancellation amplifies f32
    rounding across fusion changes (verified exact to 1e-11 in f64), so the
    strict comparison is done without BN."""
    import jax
    import jax.numpy as jnp

    from surfacenetworks_tpu import models as zoo
    from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch

    samples = datasets.synthetic_normal_dataset(2, 50, seed=3, operator="lap")
    batch = laplacian_batch(samples, Buckets.for_samples(samples))
    mask, inputs = jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    m0 = zoo.LapDeepModel(3, 3, layers=4, bnmode=None)
    m1 = zoo.LapDeepModel(3, 3, layers=4, bnmode=None, remat=True)
    params = m0.init(jax.random.key(0), batch.operator, mask, inputs)
    y0 = m0.apply(params, batch.operator, mask, inputs)
    y1 = m1.apply(params, batch.operator, mask, inputs)
    assert jnp.allclose(y0, y1, atol=1e-5)
    g0 = jax.grad(lambda p: m0.apply(p, batch.operator, mask, inputs).sum())(params)
    g1 = jax.grad(lambda p: m1.apply(p, batch.operator, mask, inputs).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        assert jnp.allclose(a, b, atol=1e-4, rtol=1e-4)
