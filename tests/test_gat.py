"""GAT baseline (revived from the reference's dead GatDeepModel,
normal_predict/models.py:85-124): masked multi-head attention over the
operator's ELL neighborhood pattern."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch
from surfacenetworks_tpu.models import GatDeepModel
from surfacenetworks_tpu.nn.blocks import gat_attend


def _op(n_points=60, seed=0):
    rng = np.random.default_rng(seed)
    V, F = datasets.random_blob_mesh(rng, n_points)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    return sps.operator_from_scipy(L), L


def test_gat_attend_matches_dense_softmax():
    """gat_attend equals the dense masked-softmax attention over the same
    pattern."""
    op, L = _op()
    n = L.shape[0]
    H, ch = 2, 8
    rng = np.random.default_rng(1)
    xh = rng.normal(size=(n, H, ch)).astype(np.float32)
    s_src = rng.normal(size=(n, H)).astype(np.float32)
    s_dst = rng.normal(size=(n, H)).astype(np.float32)

    got = np.asarray(gat_attend(op, jnp.asarray(xh), jnp.asarray(s_src), jnp.asarray(s_dst)))

    pattern = (np.asarray(L.todense()) != 0).astype(np.float32)
    want = np.zeros_like(xh)
    for h in range(H):
        E = s_src[:, h][:, None] + s_dst[:, h][None, :]
        E = np.where(E > 0, E, 0.2 * E)  # leaky_relu
        E = np.where(pattern > 0, E, -1e9)
        A = np.exp(E - E.max(axis=1, keepdims=True))
        A = A / A.sum(axis=1, keepdims=True)
        want[:, h, :] = A @ xh[:, h, :]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gat_attention_rows_sum_to_one_and_grads_flow():
    op, L = _op(seed=2)
    n = L.shape[0]
    model = GatDeepModel(3, 3, layers=2, heads=4)
    bop = sps.stack_operators([op])
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, n, 3)), jnp.float32)
    mask = jnp.ones((1, n, 1), jnp.float32)
    params = model.init(jax.random.key(0), bop, mask, x)["params"]
    out = model.apply({"params": params}, bop, mask, x)
    assert out.shape == (1, n, 3)
    g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, bop, mask, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # attention params receive gradient
    att = [np.abs(np.asarray(l)).max() for l in leaves]
    assert max(att) > 0


def test_gat_trainer_smoke(tmp_path):
    from surfacenetworks_tpu.cli import train_normal

    train_normal.main(
        [
            "--synthetic", "6", "--model", "gat", "--layer", "2",
            "--num-epoch", "1", "--num-updates", "4", "--batch-size", "2",
            "--result-dir", str(tmp_path), "--debug",
        ]
    )


def test_gat_padded_rows_stay_zero():
    """Bucket-padded rows (no valid slots) must output exact zeros — not
    vertex 0's features — so they cannot leak into unmasked BatchNorm
    statistics (round-4 review finding)."""
    op, L = _op(seed=6)
    n = L.shape[0]
    N = n + 24  # pad the bucket
    import scipy.sparse as sp_

    Lp = sp_.csr_matrix((L.data, L.indices, np.concatenate([L.indptr, [L.indptr[-1]] * 24])), shape=(N, N))
    opp = sps.operator_from_scipy(Lp)
    H, ch = 2, 4
    rng = np.random.default_rng(2)
    xh = rng.normal(size=(N, H, ch)).astype(np.float32)
    s = rng.normal(size=(N, H)).astype(np.float32)
    out = np.asarray(gat_attend(opp, jnp.asarray(xh), jnp.asarray(s), jnp.asarray(s)))
    assert np.abs(out[n:]).max() == 0.0
    assert np.abs(out[:n]).max() > 0.0


def test_gat_banded_matches_gather():
    """The banded-window attention (round-5: band-resident scores, window
    softmax, MXU aggregation — no HBM gathers) equals the per-slot gather
    formulation on an RCM-ordered pattern, including non-128-multiple row
    counts (internal padding) and bucket-padded rows."""
    rng = np.random.default_rng(3)
    V, F = datasets.random_blob_mesh(rng, 300)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    perm = sps.rcm_permutation(L)
    L = L[perm][:, perm].tocsr()
    n_pad = 328  # 8-multiple bucket, NOT a 128 multiple
    op = sps.stack_operators([sps.EllOperator(
        fwd=sps.ell_from_scipy(L, n_rows=n_pad, n_cols=n_pad),
        bwd=sps.ell_from_scipy(L.T.tocsr(), n_rows=n_pad, n_cols=n_pad),
    )])
    assert op.fwd.window > 0
    H, ch = 4, 8
    xh = jnp.asarray(rng.normal(size=(1, n_pad, H, ch)).astype(np.float32))
    s_src = jnp.asarray(rng.normal(size=(1, n_pad, H)).astype(np.float32))
    s_dst = jnp.asarray(rng.normal(size=(1, n_pad, H)).astype(np.float32))

    banded = gat_attend(op, xh, s_src, s_dst,
                        precision=jax.lax.Precision.HIGHEST)
    gathered = gat_attend(op, xh, s_src, s_dst, force_gather=True)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(gathered),
                               rtol=2e-4, atol=2e-5)

    # grads agree too (the banded backward is plain autodiff over the band)
    def loss(fn_kwargs):
        def f(x):
            return jnp.sum(gat_attend(op, x, s_src, s_dst, **fn_kwargs) ** 2)
        return jax.grad(f)(xh)

    g_b = loss({"precision": jax.lax.Precision.HIGHEST})
    g_g = loss({"force_gather": True})
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_g),
                               rtol=2e-3, atol=2e-4)


def test_gat_graph_parallel_matches_single_device(tmp_path, monkeypatch):
    """GAT under --graph-parallel (round-5: partitioned attention — the
    PartitionedEll split is softmax-exact because every row's complete slot
    list lives in exactly one table; payload halo-exchanged per attend).

    The partitioned attend is exact vs the gather formulation (fwd 1e-7,
    grads 1e-6 — see also the shard_map micro-parity below), but a few
    Adam steps amplify ~1e-6 reduction-order noise chaotically on tiny
    tasks, so the trainer check pins: identical FIRST loss (forward/batch/
    init exact), one-update loss within 1e-4, and finite decreasing
    training after that.  Both runs force the gather formulation."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import surfacenetworks_tpu.nn.blocks as blocks
    from surfacenetworks_tpu.cli import train_normal

    monkeypatch.setattr(blocks, "_GAT_BANDED_MAX_WINDOW", 0)

    common = [
        "--synthetic", "6", "--synthetic-points", "320", "--model", "gat",
        "--num-epoch", "3", "--num-updates", "1", "--layer", "2",
        "--batch-size", "2", "--seed", "11", "--no-test",
    ]

    def losses_of(tag, extra):
        train_normal.main(common + extra + ["--result-dir", str(tmp_path / tag)])
        txt = open(tmp_path / tag / "log" / "debug.log").read()
        return [
            float(line.split("loss ")[1].split(",")[0])
            for line in txt.splitlines()
            if "Train" in line and "loss" in line
        ]

    gp = losses_of("gp", ["--graph-parallel", "4"])
    single = losses_of("single", [])
    assert len(gp) == len(single) == 3, (gp, single)
    assert gp[0] == single[0], (gp, single)  # forward/batch/init exact
    assert abs(gp[1] - single[1]) < 1e-4 * abs(single[1]), (gp, single)
    assert np.isfinite(gp).all() and gp[2] < gp[0], gp


def test_gat_partitioned_attend_matches_gather_shardmap():
    """The partitioned attend inside a shard_map equals the single-device
    gather formulation bit-tightly — values AND input gradients (the
    trainer-level chaos above is formulation-independent fp noise)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from surfacenetworks_tpu import parallel_context
    from surfacenetworks_tpu import sparse as sps
    from surfacenetworks_tpu.data import round_up
    from surfacenetworks_tpu.dist import edge_partition, graph_parallel, make_mesh
    from jax.sharding import PartitionSpec as P

    n_parts = 4
    rng = np.random.default_rng(0)
    V, F = datasets.random_blob_mesh(rng, 300)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    perm = sps.rcm_permutation(L)
    L = L[perm][:, perm].tocsr()
    N = round_up(L.shape[0], 8 * n_parts)
    halo = min(edge_partition.suggest_halo(L), N // n_parts)
    pop = graph_parallel.partition_batch_operator([L], n_parts, n_rows=N, halo=halo, k=16)
    ell = sps.operator_from_scipy(L, n_rows=N, n_cols=N, k_multiple=8)
    ell = jax.tree_util.tree_map(lambda a: a[None], ell)

    H, ch = 2, 8
    xh = jnp.asarray(rng.normal(size=(1, N, H, ch)).astype(np.float32))
    ss = jnp.asarray(rng.normal(size=(1, N, H)).astype(np.float32))
    sd = jnp.asarray(rng.normal(size=(1, N, H)).astype(np.float32))
    ref = gat_attend(ell, xh, ss, sd, force_gather=True)

    mesh = make_mesh(n_data=1, n_graph=n_parts)

    def local_fn(op, xh, ss, sd):
        with parallel_context.sharded_axes(vertex_axis="graph", batch_axis=None):
            return gat_attend(op, xh, ss, sd)

    row = P(None, "graph")
    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh, in_specs=(row, row, row, row), out_specs=row,
    ))
    got = fn(pop, xh, ss, sd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(lambda x: jnp.sum(gat_attend(ell, x, ss, sd, force_gather=True) ** 2))(xh)
    g_gp = jax.grad(lambda x: jnp.sum(fn(pop, x, ss, sd) ** 2))(xh)
    np.testing.assert_allclose(np.asarray(g_gp), np.asarray(g_ref), rtol=2e-4, atol=2e-4)
