"""Edge-partitioned Dirac operators on the virtual 8-device CPU mesh.

Completes graph-parallel coverage for the Dirac family: vertex->face and
face->vertex applies (fwd + adjoint-table VJPs) through two-sided halo
exchange are pinned against the single-device structured applies, and a full
DirDeepModel (Dirac + Avg blocks, BN collectives) runs partitioned.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import datasets
from surfacenetworks_tpu.dist import dirac_partition, graph_parallel, make_mesh
from surfacenetworks_tpu.sparse.ops import dirac_apply_fv, dirac_apply_vf

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _partition_ready_mesh(n_points=400, seed=0):
    """Blob mesh with RCM-ordered vertices and faces sorted by min vertex."""
    rng = np.random.default_rng(seed)
    V, F = datasets.random_blob_mesh(rng, n_points)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    perm = sps.rcm_permutation(L)
    inv = geo.invert_permutation(perm)
    V, F = V[perm].astype(np.float32), inv[F].astype(np.int32)
    F = F[dirac_partition.sort_faces_for_partition(F)]
    return V, F


def _pad_to(n, n_parts, multiple=8):
    m = n_parts * multiple
    return (n + m - 1) // m * m


def _setup(n_points=400, seed=0, n_parts=4):
    V, F = _partition_ready_mesh(n_points, seed)
    n, m = V.shape[0], F.shape[0]
    N, M = _pad_to(n, n_parts), _pad_to(m, n_parts)
    coeffs = geo.dirac_coeffs(V, F)
    ref_op = sps.dirac_from_coeffs(coeffs, N, M)
    part_op = dirac_partition.partition_dirac(coeffs, n_parts, N, M)
    return V, F, N, M, ref_op, part_op


def test_halos_are_narrow():
    # RCM + min-vertex face sort keeps both halos well under a partition
    _, _, N, M, _, part_op = _setup(n_points=800, seed=1)
    assert part_op.halo_v < (N // part_op.n_parts) // 2, (part_op.halo_v, N)
    assert part_op.halo_f < (M // part_op.n_parts) // 2, (part_op.halo_f, M)


def test_partitioned_vf_fv_forward_match():
    n_parts = 4
    V, F, N, M, ref_op, part_op = _setup(n_parts=n_parts)
    mesh = make_mesh(n_data=2, n_graph=n_parts)
    rng = np.random.default_rng(2)
    v = rng.normal(size=(N, 16)).astype(np.float32)
    f = rng.normal(size=(M, 16)).astype(np.float32)

    ref_vf = dirac_apply_vf(ref_op, jnp.asarray(v))
    ref_fv = dirac_apply_fv(ref_op, jnp.asarray(f))

    from jax.sharding import PartitionSpec as P

    with mesh:
        op_d = dirac_partition.shard_partitioned_dirac(mesh, part_op)
        vf = jax.jit(
            jax.shard_map(
                dirac_partition.partitioned_dirac_vf,
                mesh=mesh,
                in_specs=(P("graph"), P("graph")),
                out_specs=P("graph"),
            )
        )(op_d, jnp.asarray(v))
        fv = jax.jit(
            jax.shard_map(
                dirac_partition.partitioned_dirac_fv,
                mesh=mesh,
                in_specs=(P("graph"), P("graph")),
                out_specs=P("graph"),
            )
        )(op_d, jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(ref_vf), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(ref_fv), rtol=1e-5, atol=1e-5)


def test_partitioned_vf_fv_grads_match():
    n_parts = 4
    V, F, N, M, ref_op, part_op = _setup(seed=3, n_parts=n_parts)
    mesh = make_mesh(n_data=2, n_graph=n_parts)
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    w_f = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    w_v = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))

    ref_gv = jax.grad(lambda x: jnp.sum(dirac_apply_vf(ref_op, x) * w_f))(v)
    ref_gf = jax.grad(lambda x: jnp.sum(dirac_apply_fv(ref_op, x) * w_v))(f)

    from jax.sharding import PartitionSpec as P

    with mesh:
        op_d = dirac_partition.shard_partitioned_dirac(mesh, part_op)

        def vf_loss(op, x, w):
            return jnp.sum(dirac_partition.partitioned_dirac_vf(op, x) * w)

        def fv_loss(op, x, w):
            return jnp.sum(dirac_partition.partitioned_dirac_fv(op, x) * w)

        # psum the per-shard partial sums so grads see the global objective
        def run_grad(loss, op, x, w):
            def local(op, x, w):
                return jax.grad(
                    lambda x: jax.lax.psum(loss(op, x, w), "graph"), argnums=0
                )(x)

            return jax.jit(
                jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(P("graph"), P("graph"), P("graph")),
                    out_specs=P("graph"),
                )
            )(op, x, w)

        gv = run_grad(vf_loss, op_d, v, jax.device_put(w_f))
        gf = run_grad(fv_loss, op_d, f, jax.device_put(w_v))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ref_gv), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ref_gf), rtol=1e-4, atol=1e-5)


def test_partitioned_dirdeep_model_matches_single_device():
    """Full DirDeepModel through partitioned Dirac == single-device structured
    path (f64: BN trunks amplify fp32 roundoff chaotically, masking real
    structural errors — same rationale as test_graph_parallel)."""
    from surfacenetworks_tpu.models import DirDeepModel

    n_parts = 4
    with jax.enable_x64():
        V, F = _partition_ready_mesh(300, seed=5)
        n, m = V.shape[0], F.shape[0]
        N, M = _pad_to(n, n_parts), _pad_to(m, n_parts)
        coeffs = geo.dirac_coeffs(V, F)
        ref_op = sps.dirac_from_coeffs(coeffs, N, M)
        ref_op = jax.tree_util.tree_map(
            lambda a: a[None] if hasattr(a, "ndim") else a, ref_op
        )
        part_op = graph_parallel.partition_batch_dirac([coeffs], n_parts, N, M)

        inputs = np.zeros((1, N, 4), np.float64)
        inputs[0, :n, :3] = V
        mask = np.zeros((1, N, 1), np.float64)
        mask[0, :n] = 1.0

        model = DirDeepModel(4, 4, layers=3)
        params = model.init(
            jax.random.key(0), ref_op, jnp.asarray(mask), jnp.asarray(inputs)
        )
        ref = model.apply(params, ref_op, jnp.asarray(mask), jnp.asarray(inputs))

        mesh = make_mesh(n_data=2, n_graph=n_parts)
        sharded_apply = graph_parallel.make_graph_sharded_apply(
            mesh, model.apply, batch_axis=None
        )
        with mesh:
            op_d, arrs = graph_parallel.place_graph_batch(
                mesh, part_op, {"mask": jnp.asarray(mask), "inputs": jnp.asarray(inputs)}
            )
            out = jax.jit(sharded_apply)(params, op_d, arrs["mask"], arrs["inputs"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-9, atol=1e-10)
