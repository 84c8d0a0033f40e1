"""Dataflow proof of halo/compute overlap readiness (BASELINE north star).

XLA's TPU latency-hiding scheduler overlaps an async collective-permute with
any compute that does not depend on the permuted data.  The CPU test backend
lowers ppermute synchronously, so a trace/HLO cannot demonstrate the overlap
here — but the property the kernel owes is dataflow independence, and THAT
is backend-invariant and checkable on the jaxpr (dist/analysis.py).

Each partitioned apply must show:
* >= 1 aggregation contraction independent of every ppermute (the interior,
  free to run while the halo is in flight),
* >= 1 dependent on them (the boundary rows),
* a final output that consumes the halo (the exchange is not dead code).

A deliberately serialized formulation (interior computed from the exchanged
frame) is the negative control: the checker must report zero independent
work for it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import datasets
from surfacenetworks_tpu.dist import dirac_partition, edge_partition, make_mesh
from surfacenetworks_tpu.dist.analysis import check_overlap_structure

N_PARTS = 4


def _lap_setup(n_points=1200, interior_fmt="ell"):
    rng = np.random.default_rng(0)
    V, F = datasets.random_blob_mesh(rng, n_points)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    perm = sps.rcm_permutation(L)
    L = L[perm][:, perm].tocsr()
    halo = edge_partition.suggest_halo(L)
    N = ((L.shape[0] + N_PARTS * 128 - 1) // (N_PARTS * 128)) * (N_PARTS * 128)
    pop = edge_partition.partition_operator(
        L, N_PARTS, halo=halo, n_rows=N, interior_fmt=interior_fmt
    )
    x = jnp.asarray(rng.normal(size=(N, 64)).astype(np.float32))
    return pop, x


@pytest.mark.parametrize("interior_fmt", ["ell", "bsr"])
def test_partitioned_spmm_overlap_structure(interior_fmt):
    pop, x = _lap_setup(interior_fmt=interior_fmt)
    mesh = make_mesh(n_graph=N_PARTS)
    fn = jax.shard_map(
        edge_partition.partitioned_spmm,
        mesh=mesh,
        in_specs=(P("graph"), P("graph")),
        out_specs=P("graph"),
    )
    with mesh:
        r = check_overlap_structure(fn, pop, x)
    assert r["n_ppermute"] >= 2, r  # bidirectional ring exchange
    assert r["interior_indep"] >= 1, r  # overlappable interior aggregation
    assert r["boundary_dep"] >= 1, r  # boundary rows wait for the halo
    assert r["output_depends_on_halo"], r  # exchange is live


def test_serialized_formulation_is_detected():
    """Negative control: computing the interior from the exchanged frame
    serializes everything behind the permute — the checker must see it."""
    pop, x = _lap_setup()
    mesh = make_mesh(n_graph=N_PARTS)
    m = pop.fwd

    def serialized(op, x_loc):
        mm = op.fwd
        x_ext = edge_partition._halo_exchange(x_loc, mm.halo, mm.axis)
        x_mid = x_ext[..., mm.halo : x_ext.shape[-2] - mm.halo, :]
        y = edge_partition._ell_local(mm.cols, mm.vals, x_mid)
        y_bnd = edge_partition._ell_local(mm.bnd_cols, mm.bnd_vals, x_ext)
        return edge_partition._scatter_add_rows(y, mm.bnd_rows, y_bnd)

    fn = jax.shard_map(
        serialized, mesh=mesh, in_specs=(P("graph"), P("graph")), out_specs=P("graph")
    )
    with mesh:
        r = check_overlap_structure(fn, pop, x)
    assert r["n_ppermute"] >= 2, r
    assert r["interior_indep"] == 0, r  # nothing left to overlap


def _pad_to(n, n_parts, multiple=8):
    m = n_parts * multiple
    return (n + m - 1) // m * m


def test_partitioned_dirac_overlap_structure():
    rng = np.random.default_rng(1)
    V, F = datasets.random_blob_mesh(rng, 800)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    perm = sps.rcm_permutation(L)
    inv = geo.invert_permutation(perm)
    V, F = V[perm].astype(np.float32), inv[np.asarray(F)].astype(np.int32)
    F = F[dirac_partition.sort_faces_for_partition(F)]
    N, M = _pad_to(V.shape[0], N_PARTS), _pad_to(F.shape[0], N_PARTS)
    coeffs = geo.dirac_coeffs(V, F)
    pd = dirac_partition.partition_dirac(coeffs, N_PARTS, N, M)
    mesh = make_mesh(n_graph=N_PARTS)
    v = jnp.asarray(rng.normal(size=(N, 64)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(M, 64)).astype(np.float32))

    for apply_fn, feat in (
        (dirac_partition.partitioned_dirac_vf, v),
        (dirac_partition.partitioned_dirac_fv, f),
    ):
        fn = jax.shard_map(
            apply_fn,
            mesh=mesh,
            in_specs=(P("graph"), P("graph")),
            out_specs=P("graph"),
        )
        with mesh:
            r = check_overlap_structure(fn, pd, feat)
        assert r["n_ppermute"] >= 2, (apply_fn, r)
        assert r["interior_indep"] >= 1, (apply_fn, r)
        assert r["boundary_dep"] >= 1, (apply_fn, r)
        assert r["output_depends_on_halo"], (apply_fn, r)
