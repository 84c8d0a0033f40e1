"""Repair, sampling, spectral, edge-flip, and intrinsic-Delaunay tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu.data import datasets
from surfacenetworks_tpu.geometry import intrinsic, repair, sampling, spectral


def _blob(n=80, seed=0):
    return datasets.random_blob_mesh(np.random.default_rng(seed), n)


# --------------------------------------------------------------------- repair


def test_fix_degenerate_cleans_collinear_face():
    V = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0, 0], [0.5, 1, 0], [1.5, 1, 0], [1, -1, 0]], float
    )
    F = np.array([[0, 1, 3], [1, 4, 3], [1, 2, 4], [0, 2, 1], [0, 1, 5], [1, 2, 5]])
    # face [0,2,1] is collinear (zero area)
    assert len(repair.degenerate_faces(V, F)) == 1
    V2, F2, ok = repair.fix_degenerate(V, F)
    assert ok
    assert len(repair.degenerate_faces(V2, F2)) == 0


def test_largest_component():
    V1, F1 = _blob(40, seed=1)
    V2, F2 = _blob(30, seed=2)
    V = np.concatenate([V1, V2 + 5.0])
    F = np.concatenate([F1, F2 + V1.shape[0]])
    Vo, Fo, kept = repair.largest_component(V, F)
    assert Fo.shape[0] == F1.shape[0]
    assert Vo.shape[0] == V1.shape[0]


def test_collapse_and_remove_unreferenced():
    V, F = _blob(40, seed=3)
    V2, F2 = repair.collapse_edge(V, F, int(F[0, 0]), int(F[0, 1]))
    assert F2.shape[0] < F.shape[0]
    V3, F3, kept = repair.remove_unreferenced(V2, F2)
    assert F3.max() < V3.shape[0]


def test_constrained_edge_flip_preserves_topology():
    V, F = _blob(100, seed=4)
    euler = V.shape[0] - (3 * F.shape[0] // 2) + F.shape[0]
    V2, F2 = repair.constrained_edge_flip(V, F.copy(), 30, rng=np.random.default_rng(0))
    assert F2.shape == F.shape
    # closed manifold invariants: every edge still shared by exactly 2 faces
    TT, _ = geo.triangle_triangle_adjacency(F2)
    assert (TT >= 0).all()
    euler2 = V2.shape[0] - (3 * F2.shape[0] // 2) + F2.shape[0]
    assert euler2 == euler
    assert not np.array_equal(F2, F)  # some flips actually happened


# ------------------------------------------------------------------- sampling


def test_poisson_disc_spacing():
    pts = sampling.poisson_disc_2d(1.5, 27, 27, rng=np.random.default_rng(0))
    assert len(pts) > 100
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 1.5 - 1e-9


def test_poisson_disc_nd_spacing():
    # dimension-generic sampler (reference poisson_disc.py Grid is n-D)
    for d, r, extent, min_pts in [(1, 0.8, 20.0, 15), (3, 2.5, 10.0, 40)]:
        pts = sampling.poisson_disc(r, (extent,) * d, rng=np.random.default_rng(d))
        assert pts.shape[1] == d
        assert len(pts) > min_pts
        assert pts.min() >= 0 and pts.max() <= extent
        dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(dist, np.inf)
        assert dist.min() >= r - 1e-9


def test_image_to_mesh_and_operators():
    rng = np.random.default_rng(1)
    img = np.zeros((28, 28))
    img[8:20, 8:20] = 255.0
    sample = sampling.image_to_mesh(img, label=3, rng=rng)
    assert sample is not None
    assert sample["V"].shape[1] == 3
    assert sample["V"][:, 2].max() <= 1.0
    full = sampling.add_operators(sample)
    assert full["L"].shape[0] == sample["V"].shape[0]
    assert np.isfinite(full["L"].data).all()
    ones = np.ones(full["L"].shape[0])
    # Row sums are exactly zero in float64; after the float32 storage cast the
    # residual is bounded by rounding relative to the largest row entry.
    row_mag = np.abs(full["L"]).max(axis=1).toarray().ravel()
    resid = np.abs(full["L"] @ ones)
    assert (resid <= 1e-4 + 1e-5 * row_mag).all()


# ------------------------------------------------------------------- spectral


def test_eigendecomp_basics():
    V, F = _blob(60, seed=5)
    vals, vecs = spectral.laplacian_eigendecomp(V, F, k=10)
    # closed surface: first eigenvalue ~ 0 (constant eigenfunction)
    assert abs(vals[0]) < 1e-6
    assert vecs.shape == (V.shape[0], 10)


def test_wks_finite_and_shaped():
    V, F = _blob(60, seed=6)
    W = spectral.compute_wks(V, F, n_descriptors=16, k=30)
    assert W.shape == (V.shape[0], 16)
    assert np.isfinite(W).all()


def test_normalized_laplacian():
    V, F = _blob(50, seed=7)
    L = spectral.normalized_laplacian(V, F)
    assert L is not None
    assert abs(sp.linalg.norm(L) - 1.0) < 1e-5


def test_hks():
    V, F = _blob(50, seed=8)
    H = spectral.heat_kernel_signature(V, F, k=20)
    assert H.shape[0] == V.shape[0]
    assert np.isfinite(H).all()


# ------------------------------------------------------------------ intrinsic


def test_intrinsic_noop_on_delaunay_plane():
    # a Delaunay triangulation of the plane is already intrinsically Delaunay
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 1, size=(40, 2))
    tri = Delaunay(pts)
    V = np.concatenate([pts, np.zeros((40, 1))], axis=1)
    F = np.asarray(tri.simplices, np.int32)
    F2, L2, flips = intrinsic.intrinsic_delaunay(V, F)
    assert flips == 0
    Lc = intrinsic.intrinsic_laplacian(V, F)
    Lc_ref, _ = spectral.cot_and_mass(V, F)
    np.testing.assert_allclose(Lc.toarray(), Lc_ref.toarray(), rtol=1e-5, atol=1e-7)


def test_intrinsic_makes_weights_nonnegative():
    """After intrinsic Delaunay flips, all off-diagonal cot weights are >= 0
    (the defining property of the intrinsic Delaunay triangulation)."""
    V, F = _blob(120, seed=10)
    # extrinsic cotmatrix generally has negative off-diagonals on obtuse pairs
    Lc0, _ = spectral.cot_and_mass(V, F)
    off0 = Lc0 - sp.diags(Lc0.diagonal())
    assert off0.toarray().min() < -1e-8  # mesh actually has obtuse configs
    Lc = intrinsic.intrinsic_laplacian(V, F)
    off = (Lc - sp.diags(Lc.diagonal())).toarray()
    assert off.min() >= -1e-5
    # still a Laplacian: symmetric, rows sum to zero
    np.testing.assert_allclose(Lc.toarray(), Lc.toarray().T, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Lc @ np.ones(V.shape[0]), 0.0, atol=1e-4)


def test_intrinsic_spectrum_close_to_extrinsic_on_nice_mesh():
    """On a mesh with few obtuse angles the intrinsic and extrinsic operators
    should be close (flips only affect non-Delaunay pairs)."""
    V, F = _blob(100, seed=11)
    Lc_int = intrinsic.intrinsic_laplacian(V, F).toarray()
    Lc_ext, _ = spectral.cot_and_mass(V, F)
    # compare smallest nonzero generalized eigenvalues loosely
    w_int = np.sort(np.linalg.eigvalsh(-Lc_int))[:5]
    w_ext = np.sort(np.linalg.eigvalsh(-Lc_ext.toarray()))[:5]
    np.testing.assert_allclose(w_int, w_ext, rtol=0.2, atol=1e-4)
