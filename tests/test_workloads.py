"""Remaining workloads: VAE, mesh-MNIST classification, ARAP, FAUST siamese.

Each gets (a) parity vs the reference oracle where deterministically
comparable, and (b) an end-to-end "loss decreases" training run on synthetic
data.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surfacenetworks_tpu import models as zoo
from surfacenetworks_tpu.data import (
    Buckets,
    arap_batch,
    correspondence_batch,
    datasets,
    mnist_batch,
    vae_batch,
)
from surfacenetworks_tpu.train import TrainState, losses, optim

sys.path.insert(0, "/root/reference/src")


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _vae_data(n=2, points=50, seed=0):
    samples = datasets.synthetic_mnist_dataset(n, seed=seed, n_points=points)
    buckets = Buckets.for_samples(samples)
    return vae_batch(samples, buckets, model="lap"), samples, buckets


def test_vae_encoder_decoder_parity():
    torch = pytest.importorskip("torch")
    import oracle
    import scipy.sparse as sp

    ref_vae = oracle.load_reference_module("mesh_mnist", "models_vae")

    batch, samples, buckets = _vae_data()
    N = buckets.n_vertices
    mats = []
    for s in samples:
        L = sp.csr_matrix(s["L"])
        L.resize((N, N))
        mats.append(L)
    torch_L = oracle.to_torch_sparse(sp.block_diag(mats).tocoo())

    tm = ref_vae.LapEncoder().train()
    t_mu, t_logvar = tm(
        torch.from_numpy(batch.inputs), torch_L, torch.from_numpy(batch.mask)
    )

    jm = zoo.vae.LapEncoder()
    params = {"conv1": oracle.copy_graphconv(tm.conv1),
              "bn_conv2": oracle.copy_graphconv(tm.bn_conv2),
              "fc_mu": {"kernel": jnp.asarray(tm.fc_mu.weight.detach().numpy().T),
                        "bias": jnp.asarray(tm.fc_mu.bias.detach().numpy())},
              "fc_logvar": {"kernel": jnp.asarray(tm.fc_logvar.weight.detach().numpy().T),
                            "bias": jnp.asarray(tm.fc_logvar.bias.detach().numpy())}}
    for name, sub in tm.named_children():
        if name.startswith("rn"):
            params[name] = oracle.copy_two_conv_block(sub)
    j_mu, j_logvar = jm.apply(
        {"params": params}, jnp.asarray(batch.inputs), batch.operator, jnp.asarray(batch.mask)
    )
    np.testing.assert_allclose(np.asarray(j_mu), t_mu.detach().numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_logvar), t_logvar.detach().numpy(), rtol=2e-3, atol=2e-4)


def test_vae_training_elbo_decreases():
    batch, samples, buckets = _vae_data()
    model = zoo.LapVAE(num_layers=2)
    b = {
        "inputs": jnp.asarray(batch.inputs),
        "flat_inputs": jnp.asarray(batch.aux["flat_inputs"]),
        "mask": jnp.asarray(batch.mask),
        "op": batch.operator,
        "flat_op": batch.aux["flat_operator"],
    }
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        b["inputs"], b["flat_inputs"], b["op"], b["flat_op"], b["mask"],
    )["params"]
    state = TrainState.create(params, optim.adam(1e-3, weight_decay=1e-5))

    @jax.jit
    def step(state, rng):
        def objective(params):
            recon_mu, recon_logvar, z, mu, logvar = model.apply(
                {"params": params},
                b["inputs"], b["flat_inputs"], b["op"], b["flat_op"], b["mask"],
                rngs={"sample": rng},
            )
            bce, kld = losses.vae_elbo_terms(
                recon_mu, recon_logvar, b["mask"], b["inputs"], z, mu, logvar
            )
            return bce + kld, (bce, kld)

        (loss, (bce, kld)), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    # fixed sampling key -> deterministic objective, so decrease is monotonic-ish
    hist = []
    sub = jax.random.key(2)
    for i in range(12):
        state, loss = step(state, sub)
        hist.append(float(loss))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0], hist

    # generative path runs
    fake, _ = model.apply(
        {"params": state.params},
        b["flat_inputs"],
        jnp.zeros((b["inputs"].shape[0], b["inputs"].shape[1], 100), jnp.float32),
        b["flat_op"],
        b["mask"],
        method=zoo.LapVAE.decode,
    )
    assert fake.shape == b["inputs"].shape


# ---------------------------------------------------------------------------
# mesh-MNIST classification
# ---------------------------------------------------------------------------


def test_mnist_classifier_trains():
    samples = datasets.synthetic_mnist_dataset(8, seed=1, n_points=60)
    buckets = Buckets.for_samples(samples)
    batch = mnist_batch(samples, buckets, model="lap")
    model = zoo.mnist_models.Model(layers=2)
    inputs = jnp.asarray(batch.inputs)
    mask = jnp.asarray(batch.mask)
    targets = jnp.asarray(batch.targets)
    params = model.init(
        {"params": jax.random.key(0)}, inputs, batch.operator, mask, deterministic=True
    )["params"]
    state = TrainState.create(params, optim.adam(1e-3, weight_decay=1e-5))

    @jax.jit
    def step(state, rng):
        def objective(params):
            logp = model.apply(
                {"params": params}, inputs, batch.operator, mask,
                deterministic=False, rngs={"dropout": rng},
            )
            return losses.nll_loss(logp, targets), losses.accuracy(logp, targets)

        (loss, acc), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, acc

    rng = jax.random.key(3)
    hist = []
    for _ in range(15):
        rng, sub = jax.random.split(rng)
        state, loss, acc = step(state, sub)
        hist.append(float(loss))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


# ---------------------------------------------------------------------------
# ARAP
# ---------------------------------------------------------------------------


def test_arap_model_parity_dense():
    torch = pytest.importorskip("torch")
    import oracle

    ref_arap = oracle.load_reference_module("as_rigid_as_possible", "models")

    seqs = datasets.synthetic_arap_sequences(1, n_frames=45, n_points=40, seed=2)
    buckets = Buckets.for_samples([{"V": seqs[0][0]["V"], "F": seqs[0][0]["F"]}], multiple=1)
    batch = arap_batch(seqs, [(0, 1)], buckets, model="lap", fmt="dense")

    tm = ref_arap.Model(3, dense=True).train()
    t_out = tm(
        torch.from_numpy(batch.operator),
        torch.from_numpy(batch.mask),
        torch.from_numpy(batch.inputs),
    )

    jm = zoo.arap_models.Model(layers=3)
    params = {"params": oracle.copy_deep_model(tm)}
    j_out = jm.apply(
        params, jnp.asarray(batch.operator), jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(), rtol=3e-3, atol=3e-4)


def test_arap_training_decreases():
    seqs = datasets.synthetic_arap_sequences(2, n_frames=45, n_points=40, seed=3)
    buckets = Buckets.for_samples([{"V": s[0]["V"], "F": s[0]["F"]} for s in seqs])
    batch = arap_batch(seqs, [(0, 0), (1, 2)], buckets, model="lap", fmt="ell")
    model = zoo.arap_models.Model(layers=3)
    inputs = jnp.asarray(batch.inputs)
    mask = jnp.asarray(batch.mask)
    targets = jnp.asarray(batch.targets)
    params = model.init(jax.random.key(0), batch.operator, mask, inputs)["params"]
    state = TrainState.create(params, optim.adam(1e-3, weight_decay=1e-5))

    @jax.jit
    def step(state):
        def objective(params):
            out = model.apply({"params": params}, batch.operator, mask, inputs)
            out = out * jnp.broadcast_to(mask, out.shape)
            return losses.smooth_l1_sum(out, targets, inputs.shape[0]), ()

        (loss, _), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    hist = [float(step(state)[1])]
    for _ in range(10):
        state, loss = step(state)
        hist.append(float(loss))
    assert hist[-1] < hist[0], hist


# ---------------------------------------------------------------------------
# FAUST correspondence
# ---------------------------------------------------------------------------


def test_siamese_trunk_parity():
    torch = pytest.importorskip("torch")
    import oracle
    import scipy.sparse as sp

    ref_corr = oracle.load_reference_module("dense_correspondence", "models")

    samples = datasets.synthetic_correspondence_dataset(1, n_points=50, seed=4)
    s = samples[0]
    buckets = Buckets.for_samples([s], multiple=1)
    batch = correspondence_batch(s, buckets, model="lap")

    tm = ref_corr.Model(3).train()
    L = sp.csr_matrix(s["L"])
    L.resize((buckets.n_vertices, buckets.n_vertices))
    t_out = tm(
        oracle.to_torch_sparse(L.tocoo()),
        torch.from_numpy(batch.mask),
        torch.from_numpy(batch.inputs),
    )

    jm = zoo.correspondence.Model(layers=3)
    params = {"params": oracle.copy_deep_model(tm)}
    j_out = jm.apply(params, batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs))
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(), rtol=3e-3, atol=3e-4)


def test_correspondence_dcel_decreases():
    samples = datasets.synthetic_correspondence_dataset(4, n_points=50, seed=5)
    buckets = Buckets.for_samples(samples)
    model = zoo.SiameseModel(model="lap", layers=3)

    bx = correspondence_batch(samples[0], buckets)
    by = correspondence_batch(samples[1], buckets)
    params = model.init(
        jax.random.key(0),
        (bx.operator, jnp.asarray(bx.mask)),
        (by.operator, jnp.asarray(by.mask)),
        jnp.asarray(bx.inputs),
        jnp.asarray(by.inputs),
    )["params"]
    state = TrainState.create(params, optim.adam(1e-3, weight_decay=1e-5))

    GA, lA, liA = bx.targets
    GB, lB, liB = by.targets
    GAB = losses.aggregate_G(
        jnp.asarray(GA), jnp.asarray(lA), jnp.asarray(liA),
        jnp.asarray(GB), jnp.asarray(lB), jnp.asarray(liB),
    )
    n = samples[0]["V"].shape[0]

    @jax.jit
    def step(state):
        def objective(params):
            out = model.apply(
                {"params": params},
                (bx.operator, jnp.asarray(bx.mask)),
                (by.operator, jnp.asarray(by.mask)),
                jnp.asarray(bx.inputs),
                jnp.asarray(by.inputs),
            )
            return losses.corr_delta_cross_entropy(out[0, :n, :n], GAB), ()

        (loss, _), grads = jax.value_and_grad(objective, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    hist = [float(step(state)[1])]
    for _ in range(10):
        state, loss = step(state)
        hist.append(float(loss))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0], hist


def test_dense_dirac_pair_matches_structured():
    """Reference --dense Dirac parity: the padded dense (Di, DiA) pair must
    produce the same model output as the structured quaternion tables."""
    import jax
    import jax.numpy as jnp

    from surfacenetworks_tpu import models as zoo
    from surfacenetworks_tpu.data import Buckets, datasets, dirac_batch

    samples = datasets.synthetic_normal_dataset(2, 50, seed=7, operator="dirac")
    buckets = Buckets.for_samples(samples)
    b_struct = dirac_batch(samples, buckets)
    b_dense = dirac_batch(samples, buckets, fmt="dense")
    mask, inputs = jnp.asarray(b_struct.mask), jnp.asarray(b_struct.inputs)
    model = zoo.DirDeepModel(3, 3, layers=2)
    params = model.init(jax.random.key(0), b_struct.operator, mask, inputs)
    y_struct = model.apply(params, b_struct.operator, mask, inputs)
    y_dense = model.apply(
        params, tuple(jnp.asarray(a) for a in b_dense.operator), mask, inputs
    )
    np.testing.assert_allclose(
        np.asarray(y_dense), np.asarray(y_struct), rtol=1e-4, atol=1e-4
    )
    # gradients flow through the dense pair too
    g = jax.grad(
        lambda p: model.apply(p, tuple(jnp.asarray(a) for a in b_dense.operator), mask, inputs).sum()
    )(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_rcm_reorder_preserves_correspondence_semantics():
    """label/label_inv/G must stay mutually consistent through RCM reorder."""
    from surfacenetworks_tpu.data import datasets, rcm_reorder_sample

    s = datasets.synthetic_correspondence_dataset(1, n_points=80, seed=9)[0]
    r = rcm_reorder_sample(dict(s))
    n = s["V"].shape[0]
    # label_inv must still invert label: scan vertex of template id t
    for t in range(0, n, 7):
        assert r["label"][r["label_inv"][t]] == t
    # geodesic matrix rows follow the vertices
    perm = r["rcm_perm"]
    np.testing.assert_allclose(r["G"], s["G"][perm][:, perm])
    np.testing.assert_allclose(r["V"], s["V"][perm])


def test_correspondence_cli_bsr_smoke(tmp_path):
    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main(
        [
            "--synthetic", "3", "--layer", "2", "--num-epoch", "1",
            "--num-updates", "2", "--operator-format", "bsr",
            "--deser-option", "no", "--result-dir", str(tmp_path),
        ]
    )


def test_correspondence_cli_graph_parallel_smoke(tmp_path):
    """--graph-parallel 4: whole siamese training loop with each trunk
    operator row-partitioned over 4 devices (ring halo exchange per SpMM)."""
    import jax as _jax

    if len(_jax.devices()) < 4:
        import pytest as _pytest

        _pytest.skip("needs 4 virtual devices")
    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main(
        [
            "--synthetic", "3", "--layer", "2", "--num-epoch", "1",
            "--num-updates", "2", "--graph-parallel", "4",
            "--deser-option", "no", "--result-dir", str(tmp_path),
        ]
    )


def test_correspondence_cli_graph_parallel_dirac_smoke(tmp_path):
    """--graph-parallel 4 --model dir: the Dirac trunk (quaternion v/f
    coupling) training loop with BOTH incidence tables row-partitioned over
    4 devices (two-sided halo exchange, overlapped interior gathers)."""
    import jax as _jax

    if len(_jax.devices()) < 4:
        import pytest as _pytest

        _pytest.skip("needs 4 virtual devices")
    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main(
        [
            "--synthetic", "3", "--layer", "2", "--num-epoch", "1",
            "--num-updates", "2", "--graph-parallel", "4", "--model", "dir",
            "--deser-option", "no", "--result-dir", str(tmp_path),
        ]
    )


def test_amp_pyramid_semantics():
    """amp pyramid parity with the reference construction
    (dense_correspondence/main.py:73-84)."""
    import scipy.sparse as sp_

    from surfacenetworks_tpu import geometry as geo
    from surfacenetworks_tpu.data import datasets

    s = datasets.synthetic_correspondence_dataset(1, n_points=60, seed=11)[0]
    L = s["L"].tocsr().astype(np.float32)
    pyr = geo.amp_pyramid(L, levels=3)
    assert len(pyr) == 3
    idp = L.indptr
    d = 1.0 / np.sqrt(np.maximum(idp[1:] - idp[:-1] - 1, 0))
    d[~np.isfinite(d)] = 0.0
    Dsq = sp_.diags(d).astype(np.float32)
    L0 = (Dsq @ L @ Dsq).astype(np.float32)
    np.testing.assert_allclose(pyr[0].toarray(), L0.toarray(), rtol=1e-5, atol=1e-6)
    L1 = (Dsq @ L0 @ Dsq).astype(np.float32)
    L1 = (L1 @ L1).tocsr()
    np.testing.assert_allclose(pyr[1].toarray(), L1.toarray(), rtol=1e-4, atol=1e-5)


def test_correspondence_cli_amp_and_intrinsic(tmp_path):
    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main(
        [
            "--synthetic", "3", "--model", "amp", "--layer", "2", "--num-epoch", "1",
            "--num-updates", "2", "--deser-option", "no", "--result-dir", str(tmp_path / "amp"),
        ]
    )
    train_correspondence.main(
        [
            "--synthetic", "3", "--model", "lap", "--intrinsic", "--layer", "2",
            "--num-epoch", "1", "--num-updates", "2", "--deser-option", "no",
            "--result-dir", str(tmp_path / "intr"),
        ]
    )


def test_normal_cli_dp_x_gp_smoke(tmp_path):
    """--data-parallel 2 --graph-parallel 4: the ('data','graph') composed
    mesh as a trainer capability — batch over 'data', vertex rows over
    'graph', params replicated, one shard_map."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 virtual devices")
    from surfacenetworks_tpu.cli import train_normal

    train_normal.main(
        [
            "--synthetic", "6", "--num-epoch", "1", "--num-updates", "2",
            "--layer", "2", "--batch-size", "4",
            "--graph-parallel", "4", "--data-parallel", "2",
            "--result-dir", str(tmp_path), "--debug",
        ]
    )


def test_arap_cli_graph_parallel_dir_smoke(tmp_path):
    """ARAP --graph-parallel 4 --model dir: per-frame partitioned Dirac
    operators (RCM + face-sorted sequences), whole temporal model in one
    shard_map."""
    import jax as _jax

    if len(_jax.devices()) < 4:
        import pytest as _pytest

        _pytest.skip("needs 4 virtual devices")
    from surfacenetworks_tpu.cli import train_arap

    train_arap.main(
        [
            "--synthetic", "3", "--num-epoch", "1", "--num-updates", "2",
            "--layer", "2", "--batch-size", "2", "--model", "dir",
            "--graph-parallel", "4", "--result-dir", str(tmp_path),
        ]
    )


def test_vae_cli_graph_parallel_smoke(tmp_path):
    """VAE --graph-parallel 2: lifted AND flat operators partitioned;
    encoder+decoder (pooled latent psum) in one shard_map."""
    import jax as _jax

    if len(_jax.devices()) < 2:
        import pytest as _pytest

        _pytest.skip("needs 2 virtual devices")
    from surfacenetworks_tpu.cli import train_vae

    train_vae.main(
        [
            "--synthetic", "4", "--num-epoch", "1", "--num-layers", "2",
            "--batch-size", "2", "--graph-parallel", "2",
            "--result-dir", str(tmp_path),
        ]
    )


def test_normal_cli_augmentation_smoke(tmp_path):
    """--rotate-augment (in-jit random rotations keyed off the optimizer
    step, covariant targets) + --flip-variants (constrained-edge-flip
    dataset expansion, geom_utils:39-108 analogue) train end-to-end; the
    flip variants materialize as extra device-store samples."""
    from surfacenetworks_tpu.cli import train_normal

    train_normal.main(
        [
            "--synthetic", "5", "--synthetic-points", "200", "--layer", "2",
            "--num-epoch", "1", "--num-updates", "2", "--batch-size", "2",
            "--rotate-augment", "--flip-variants", "1",
            "--result-dir", str(tmp_path),
        ]
    )
    txt = open(tmp_path / "log" / "debug.log").read()
    assert "flip augmentation: +4 variants" in txt, txt
    assert "Train 0" in txt and "Eval 0" in txt
