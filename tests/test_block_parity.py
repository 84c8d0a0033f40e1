"""Per-block numerical parity vs the reference PyTorch implementation.

The reference repo (read-only at /root/reference) is imported as a *test
oracle*: we instantiate its torch modules, copy their weights into our flax
modules, and require allclose on forward outputs and input gradients.  This
covers BASELINE.json config 1 (cube.ply single LapResNet block, CPU) and
extends it to every block type.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import nn as snn
from surfacenetworks_tpu import sparse as sps

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/src")
try:
    from utils import utils_pt as ref_utils
except Exception:  # pragma: no cover
    ref_utils = None

pytestmark = pytest.mark.skipif(ref_utils is None, reason="reference oracle unavailable")

D = 8  # block width (divisible by 4 for the Dirac block)
B = 2  # batch size


def _cube_operator(batch):
    V, F = geo.load_ply("/root/reference/meshes/cube.ply")
    L = geo.mesh_laplacian(V, F).astype(np.float32)
    op = sps.operator_from_scipy(L, k_multiple=8)
    ops = sps.stack_operators([op] * batch)
    import scipy.sparse as sp

    torch_L = _to_torch_sparse(sp.block_diag([L] * batch).tocoo())
    return V, F, ops, torch_L


def _to_torch_sparse(coo):
    idx = torch.from_numpy(np.stack([coo.row, coo.col]).astype(np.int64))
    return torch.sparse_coo_tensor(idx, torch.from_numpy(coo.data.astype(np.float32)), coo.shape).coalesce()


def _copy_graphconv(tm, name_prefix=""):
    """Flax params for our GraphConv1x1 from a torch GraphConv1x1."""
    out = {"fc": {"kernel": jnp.asarray(tm.fc.weight.detach().numpy().T),
                  "bias": jnp.asarray(tm.fc.bias.detach().numpy())}}
    if getattr(tm, "batch_norm", None) in ("pre", "post"):
        out["bn"] = {"scale": jnp.asarray(tm.bn.weight.detach().numpy()),
                     "bias": jnp.asarray(tm.bn.bias.detach().numpy())}
    return out


def _copy_graphbn(tm):
    return {"scale": jnp.asarray(tm.bn.weight.detach().numpy()),
            "bias": jnp.asarray(tm.bn.bias.detach().numpy())}


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def _mask(batch, n, n_valid=None):
    m = np.zeros((batch, n, 1), dtype=np.float32)
    m[:, : (n_valid if n_valid is not None else n)] = 1.0
    return m


def test_lap_resnet2_parity_cube():
    """BASELINE config 1: one LapResNet block on cube.ply, allclose fwd+bwd."""
    V, F, ops, torch_L = _cube_operator(B)
    n = V.shape[0]
    rng = np.random.default_rng(0)
    x = _rand(rng, B, n, D)
    mask = _mask(B, n)

    tm = ref_utils.LapResNet2(D).train()
    with torch.no_grad():
        tx = torch.from_numpy(x).requires_grad_(True)
    tx = torch.from_numpy(x).requires_grad_(True)
    t_out = tm(torch_L, torch.from_numpy(mask), tx)
    t_out.sum().backward()

    jm = snn.LapResNet2(D)
    params = {"params": {"bn_fc0": _copy_graphconv(tm.bn_fc0), "bn_fc1": _copy_graphconv(tm.bn_fc1)}}
    j_out = jm.apply(params, ops, jnp.asarray(mask), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(), rtol=2e-4, atol=2e-5)

    g = jax.grad(lambda x: jnp.sum(jm.apply(params, ops, jnp.asarray(mask), x)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), tx.grad.numpy(), rtol=2e-4, atol=2e-5)


def test_lap_resnet2_parity_dense():
    V, F, ops, _ = _cube_operator(B)
    n = V.shape[0]
    L = geo.mesh_laplacian(V, F).astype(np.float32).toarray()
    dense_L = np.stack([L] * B)
    rng = np.random.default_rng(1)
    x = _rand(rng, B, n, D)
    mask = _mask(B, n)

    tm = ref_utils.DenseLapResNet2(D).train()
    tx = torch.from_numpy(x).requires_grad_(True)
    t_out = tm(torch.from_numpy(dense_L), torch.from_numpy(mask), tx)

    jm = snn.LapResNet2(D)
    params = {"params": {"bn_fc0": _copy_graphconv(tm.bn_fc0), "bn_fc1": _copy_graphconv(tm.bn_fc1)}}
    j_out = jm.apply(params, jnp.asarray(dense_L), jnp.asarray(mask), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(), rtol=2e-4, atol=2e-5)


def test_avg_resnet2_parity_with_padding():
    V, F, ops, torch_L = _cube_operator(B)
    n = V.shape[0]
    rng = np.random.default_rng(2)
    x = _rand(rng, B, n, D)
    mask = _mask(B, n, n_valid=6)  # padded rows leak into BN stats on both sides
    x = x * mask  # padded rows zero, as the data layer produces

    tm = ref_utils.AvgResNet2(D).train()
    tx = torch.from_numpy(x).requires_grad_(True)
    t_out = tm(None, torch.from_numpy(mask), tx)
    t_out.sum().backward()

    jm = snn.AvgResNet2(D)
    params = {"params": {"bn_fc0": _copy_graphconv(tm.bn_fc0), "bn_fc1": _copy_graphconv(tm.bn_fc1)}}
    j_out = jm.apply(params, None, jnp.asarray(mask), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(), rtol=2e-4, atol=2e-5)

    g = jax.grad(lambda x: jnp.sum(jm.apply(params, None, jnp.asarray(mask), x)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), tx.grad.numpy(), rtol=2e-4, atol=2e-5)


def test_mlp_resnet2_parity():
    rng = np.random.default_rng(3)
    n = 10
    x = _rand(rng, B, n, D)
    mask = _mask(B, n)

    tm = ref_utils.MlpResNet2(D).train()
    tx = torch.from_numpy(x).requires_grad_(True)
    t_out = tm(None, torch.from_numpy(mask), tx)

    jm = snn.MlpResNet2(D)
    params = {"params": {
        "bn0": _copy_graphbn(tm.bn0),
        "bn1": _copy_graphbn(tm.bn1),
        "fc0": _copy_graphconv(tm.fc0),
        "fc1": _copy_graphconv(tm.fc1),
    }}
    j_out = jm.apply(params, None, jnp.asarray(mask), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(), rtol=2e-4, atol=2e-5)


def test_dir_resnet2_parity_cube():
    """Dirac block vs reference 2-D block-diag sparse path (batch=1)."""
    V, F = geo.load_ply("/root/reference/meshes/cube.ply")
    n, m = V.shape[0], F.shape[0]
    Dm, DAm = geo.dirac(V, F)
    rng = np.random.default_rng(4)
    v = _rand(rng, 1, n, D)
    f = _rand(rng, 1, m, D)

    t_Di = _to_torch_sparse(Dm.astype(np.float32).tocoo())
    t_DiA = _to_torch_sparse(DAm.astype(np.float32).tocoo())
    tm = ref_utils.DirResNet2(D).train()
    tv = torch.from_numpy(v).requires_grad_(True)
    tf = torch.from_numpy(f).requires_grad_(True)
    t_vout, t_fout = tm(t_Di, t_DiA, tv, tf)
    (t_vout.sum() + t_fout.sum()).backward()

    dop = sps.stack_dirac([sps.dirac_from_coeffs(geo.dirac_coeffs(V, F))])
    jm = snn.DirResNet2(D)
    params = {"params": {"bn_fc0": _copy_graphconv(tm.bn_fc0), "bn_fc1": _copy_graphconv(tm.bn_fc1)}}
    j_vout, j_fout = jm.apply(params, dop, jnp.asarray(v), jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(j_vout), t_vout.detach().numpy(), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(j_fout), t_fout.detach().numpy(), rtol=3e-4, atol=3e-5)

    def loss(v, f):
        vo, fo = jm.apply(params, dop, v, f)
        return jnp.sum(vo) + jnp.sum(fo)

    gv, gf = jax.grad(loss, argnums=(0, 1))(jnp.asarray(v), jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gf), tf.grad.numpy(), rtol=3e-4, atol=3e-5)


def test_dir_resnet2_ell_path_matches_structured():
    """Generic ELL Dirac pair == structured quaternion path."""
    V, F = geo.load_ply("/root/reference/meshes/cube.ply")
    n, m = V.shape[0], F.shape[0]
    Dm, DAm = geo.dirac(V, F)
    rng = np.random.default_rng(5)
    v = jnp.asarray(_rand(rng, 1, n, D))

    dop = sps.stack_dirac([sps.dirac_from_coeffs(geo.dirac_coeffs(V, F))])
    di_ell = sps.stack_operators([sps.operator_from_scipy(Dm.astype(np.float32))])
    out_structured = snn.apply_dirac_vf(dop, v)
    out_ell = snn.apply_dirac_vf((di_ell, None), v)
    np.testing.assert_allclose(
        np.asarray(out_structured), np.asarray(out_ell), rtol=1e-5, atol=1e-5
    )


def test_global_average_parity():
    rng = np.random.default_rng(6)
    x = _rand(rng, B, 7, 5)
    mask = _mask(B, 7, n_valid=4)
    t = ref_utils.global_average(torch.from_numpy(x), torch.from_numpy(mask))
    j = snn.global_average(jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=1e-5, atol=1e-6)


def test_graph_conv1x1_post_bn_parity():
    rng = np.random.default_rng(7)
    x = _rand(rng, B, 9, D)
    tm = ref_utils.GraphConv1x1(D, 2 * D, batch_norm="post").train()
    t_out = tm(torch.from_numpy(x))
    jm = snn.GraphConv1x1(D, 2 * D, "post")
    params = {"params": _copy_graphconv(tm)}
    j_out = jm.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.detach().numpy(), rtol=2e-4, atol=2e-5)
