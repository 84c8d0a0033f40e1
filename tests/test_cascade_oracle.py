"""Torch-oracle parity for the multiresolution cascade family.

Ports reference weights (normal_predict/models.py:529-643) into the flax
modules and asserts allclose on identical pyramid operators — the same
oracle criterion used for LapDeep/DirDeep in test_block_parity /
test_models_train.  Pooling, pair-ordering, skip-add and the
repeating-expand head are exactly the semantics that could silently drift.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch
from surfacenetworks_tpu.data.batching import cascade_batch
from surfacenetworks_tpu.geometry import coarsening
from surfacenetworks_tpu.models.cascade import EfficientCascade, GlobalLocalModel

LEVELS = 3
NB = 64


def _copy_cascade(tm):
    import oracle

    params = {
        "conv1": oracle.copy_graphconv(tm.conv1),
        "conv2": oracle.copy_graphconv(tm.conv2),
        "lap0": oracle.copy_two_conv_block(tm.lap0),
    }
    for name, sub in tm.named_children():
        if name.startswith("down_rn") or name.startswith("up_rn"):
            params[name] = oracle.copy_two_conv_block(sub)
    return params


def _torch_laps(pyramid, torch):
    """Dense per-level Laplacians [1, n_l, n_l] (reference strided/bmm path)."""
    return [
        torch.from_numpy(np.asarray(lvl.L.todense(), np.float32))[None]
        for lvl in pyramid.levels
    ]


def test_efficient_cascade_oracle_parity():
    torch = pytest.importorskip("torch")
    import oracle

    ref = oracle.load_reference_module("normal_predict", "models")

    s = datasets.synthetic_normal_dataset(1, 50, seed=7, operator="lap")[0]
    batch = cascade_batch([s], LEVELS, NB)
    pyramid = coarsening.build_pyramid(s["V"], s["F"], LEVELS, n_bucket=NB)

    tm = ref.EfficientCascade(3, 3, cascade_levels=LEVELS, inner_layers=2, bnmode="").train()
    t_out = tm(
        _torch_laps(pyramid, torch),
        torch.from_numpy(batch.mask),
        torch.from_numpy(batch.inputs),
    )

    jm = EfficientCascade(3, 3, cascade_levels=LEVELS, inner_layers=2, bnmode="")
    params = {"params": _copy_cascade(tm)}
    j_out = jm.apply(params, batch.operator, jnp.asarray(batch.mask), jnp.asarray(batch.inputs))

    np.testing.assert_allclose(
        np.asarray(j_out), t_out.detach().numpy(), rtol=3e-3, atol=3e-4
    )


def test_global_local_oracle_parity():
    """Parity on the global (cascade) and local (LapDeep) branch outputs.

    The *final* gated third intentionally differs: the reference slices the
    gate as ``swg[:, :, :-1]`` which for out_features=1 is the score channel
    itself (models.py:630-631, an evident bug); ours gates with the
    dedicated extra channel (models/cascade.py docstring).
    """
    torch = pytest.importorskip("torch")
    import oracle

    ref = oracle.load_reference_module("normal_predict", "models")

    s = datasets.synthetic_normal_dataset(1, 50, seed=8, operator="lap")[0]
    cb = cascade_batch([s], LEVELS, NB)
    pyramid = coarsening.build_pyramid(s["V"], s["F"], LEVELS, n_bucket=NB)
    buckets = Buckets(n_vertices=NB)
    lb = laplacian_batch([s], buckets)

    import scipy.sparse as sp

    L = sp.csr_matrix(s["L"])
    L.resize((NB, NB))

    tm = ref.GlobalLocalModel(
        3, 1,
        global_opts={"cascade_levels": LEVELS, "inner_layers": 2},
        local_opts={"layers": 3},
    ).train()
    t_out = tm(
        [_torch_laps(pyramid, torch), oracle.to_torch_sparse(L.tocoo())],
        [torch.from_numpy(cb.mask), torch.from_numpy(lb.mask)],
        torch.from_numpy(cb.inputs),
    )

    jm = GlobalLocalModel(3, 1, cascade_levels=LEVELS, local_layers=3)
    params = {
        "params": {
            "global_net": _copy_cascade(tm.global_net),
            "local_net": oracle.copy_deep_model(tm.local_net),
        }
    }
    j_out = jm.apply(
        params,
        (cb.operator, lb.operator),
        (jnp.asarray(cb.mask), jnp.asarray(lb.mask)),
        jnp.asarray(cb.inputs),
    )

    t_np = t_out.detach().numpy()
    j_np = np.asarray(j_out)
    assert j_np.shape == t_np.shape == (1, 3 * NB, 1)
    # score_global rows and score_local rows must match the oracle exactly
    np.testing.assert_allclose(j_np[:, : 2 * NB], t_np[:, : 2 * NB], rtol=3e-3, atol=3e-4)
    # our final third follows the documented fixed gate
    sg, sl = j_np[:, :NB], j_np[:, NB : 2 * NB]
    # recompute the gate from the global branch's extra channel
    swg = EfficientCascade(3, 2, cascade_levels=LEVELS, inner_layers=2).apply(
        {"params": _copy_cascade(tm.global_net)},
        cb.operator, jnp.asarray(cb.mask), jnp.asarray(cb.inputs),
    )
    w = jax.nn.sigmoid(np.asarray(swg)[..., -1:])
    np.testing.assert_allclose(
        j_np[:, 2 * NB :], w * sg + (1 - w) * sl, rtol=1e-4, atol=1e-5
    )
