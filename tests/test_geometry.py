"""Geometry-layer unit tests: vectorized operators vs naive loop formulas.

The naive implementations here re-derive the math from first principles
(Heron areas, per-permutation cotangent accumulation, quaternion blocks) as an
independent oracle for the vectorized builders.
"""

import itertools

import numpy as np
import pytest
import scipy.sparse as sp

from surfacenetworks_tpu import geometry as geo


# ---------------------------------------------------------------------------
# naive oracles (loop-based, straight from the published formulas)
# ---------------------------------------------------------------------------


def naive_areas(V, F):
    areas = np.zeros(F.shape[0])
    for f in range(F.shape[0]):
        i, j, k = F[f]
        lij = np.linalg.norm(V[i] - V[j])
        ljk = np.linalg.norm(V[j] - V[k])
        lki = np.linalg.norm(V[k] - V[i])
        s = (lij + ljk + lki) / 2
        prod = s * (s - lij) * (s - ljk) * (s - lki)
        areas[f] = np.sqrt(prod) if prod > 0 else 1e-6
    return areas


def naive_cotangent(V, F):
    n = V.shape[0]
    areas = naive_areas(V, F)
    W = np.zeros((n, n))
    A = np.zeros(n)
    for f in range(F.shape[0]):
        for i, j, k in itertools.permutations(F[f].tolist()):
            lij = np.linalg.norm(V[i] - V[j])
            ljk = np.linalg.norm(V[j] - V[k])
            lki = np.linalg.norm(V[k] - V[i])
            W[i, j] += (-(lij**2) + ljk**2 + lki**2) / (8 * areas[f] + 1e-6)
            A[i] += areas[f] / 12.0
    return W, A


def naive_laplacian(V, F):
    W, A = naive_cotangent(V, F)
    D = np.diag(W.sum(axis=0))
    return np.diag(1.0 / (A + 1e-9)) @ (D - W)


def quat_mat(q):
    a, b, c, d = q
    return np.array([[a, -b, -c, -d], [b, a, -d, c], [c, d, a, -b], [d, -c, b, a]])


def naive_dirac(V, F):
    n, m = V.shape[0], F.shape[0]
    areas = naive_areas(V, F)
    Av = np.zeros(n)
    for f in range(m):
        for j in F[f]:
            Av[j] += areas[f] / 3.0
    D = np.zeros((4 * m, 4 * n))
    DA = np.zeros((4 * n, 4 * m))
    for f in range(m):
        for ind in range(3):
            j = F[f, ind]
            e1 = V[F[f, (ind + 1) % 3]]
            e2 = V[F[f, (ind + 2) % 3]]
            e = np.array([0.0, e1[0] - e2[0], e1[1] - e2[1], e1[2] - e2[2]])
            mat = -quat_mat(e) / (2 * areas[f])
            D[4 * f : 4 * f + 4, 4 * j : 4 * j + 4] = mat
            DA[4 * j : 4 * j + 4, 4 * f : 4 * f + 4] = mat.T * areas[f] / Av[j]
    return D, DA


# ---------------------------------------------------------------------------


def test_cube_ply_loads(cube_mesh):
    V, F = cube_mesh
    assert V.shape == (8, 3)
    assert F.shape == (12, 3)
    assert F.max() == 7


def test_face_areas(random_mesh):
    V, F = random_mesh
    np.testing.assert_allclose(geo.face_areas(V, F), naive_areas(V, F), rtol=1e-10)


def test_cotangent_weights(random_mesh):
    V, F = random_mesh
    W, A_inv = geo.cotangent_weights(V, F)
    Wn, An = naive_cotangent(V, F)
    np.testing.assert_allclose(W.toarray(), Wn, atol=1e-9)
    np.testing.assert_allclose(A_inv.diagonal(), 1.0 / (An + 1e-9), rtol=1e-9)


def test_mesh_laplacian(random_mesh):
    V, F = random_mesh
    L = geo.mesh_laplacian(V, F)
    np.testing.assert_allclose(L.toarray(), naive_laplacian(V, F), atol=1e-6)
    # constant functions are in the kernel of D - W (rows of W sum to diag)
    ones = np.ones(V.shape[0])
    np.testing.assert_allclose(L @ ones, 0.0, atol=1e-6)


def test_dirac_matches_naive(random_mesh):
    V, F = random_mesh
    D, DA = geo.dirac(V, F)
    Dn, DAn = naive_dirac(V, F)
    np.testing.assert_allclose(D.toarray(), Dn, atol=1e-9)
    np.testing.assert_allclose(DA.toarray(), DAn, atol=1e-9)


def test_dirac_on_cube(cube_mesh):
    V, F = cube_mesh
    D, DA = geo.dirac(V, F)
    Dn, DAn = naive_dirac(V.astype(np.float64), F)
    np.testing.assert_allclose(D.toarray(), Dn, atol=1e-9)
    np.testing.assert_allclose(DA.toarray(), DAn, atol=1e-9)


def test_dirac_coeffs_consistent_with_csr(random_mesh):
    """The structured quaternion form must reproduce the CSR operator."""
    V, F = random_mesh
    n, m = V.shape[0], F.shape[0]
    D, DA = geo.dirac(V, F)
    coeffs = geo.dirac_coeffs(V, F)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4 * n,))
    # structured apply of Di: out[f] = sum_c q_fv[f,c] (x) v[F[f,c]]
    xq = x.reshape(n, 4)

    def qprod(q, p):
        a1, b1, c1, d1 = q
        a2, b2, c2, d2 = p
        return np.array(
            [
                a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
                a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
                a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
                a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
            ]
        )

    out = np.zeros((m, 4))
    for f in range(m):
        for c in range(3):
            out[f] += qprod(coeffs.q_fv[f, c], xq[F[f, c]])
    np.testing.assert_allclose(out.reshape(-1), D @ x, atol=1e-5)

    # structured apply of DiA via the vertex incidence table
    y = rng.normal(size=(4 * m,))
    yq = y.reshape(m, 4)
    out_v = np.zeros((n, 4))
    for v in range(n):
        for s in range(coeffs.vf_face.shape[1]):
            q = coeffs.q_vf[v, s]
            if not np.any(q):
                continue
            out_v[v] += qprod(q, yq[coeffs.vf_face[v, s]])
    np.testing.assert_allclose(out_v.reshape(-1), DA @ y, atol=1e-5)


def test_igl_style_laplacian_finite(random_mesh):
    V, F = random_mesh
    L = geo.igl_style_laplacian(V, F, hack=1.0)
    assert np.isfinite(L.data).all()
    # rows sum to ~0 for the cot part: L @ const = 0
    ones = np.ones(V.shape[0])
    np.testing.assert_allclose(L @ ones, 0.0, atol=1e-4)


def test_hackit():
    M = sp.csr_matrix(np.array([[np.inf, 1.0], [2.0, -np.inf]]))
    out = geo.hackit(M.copy(), 7.0)
    assert (out.toarray() == np.array([[7.0, 1.0], [2.0, 7.0]])).all()


def test_vertex_normals_sphereish(random_mesh):
    V, F = random_mesh
    N = geo.vertex_normals(V, F)
    np.testing.assert_allclose(np.linalg.norm(N, axis=1), 1.0, atol=1e-6)


def test_gaussian_curvature_flat():
    # planar grid interior vertices have zero angle defect
    xs, ys = np.meshgrid(np.arange(4.0), np.arange(4.0))
    V = np.stack([xs.ravel(), ys.ravel(), np.zeros(16)], axis=1)
    from scipy.spatial import Delaunay

    F = np.asarray(Delaunay(V[:, :2]).simplices, dtype=np.int32)
    K = geo.gaussian_curvature(V, F)
    interior = [5, 6, 9, 10]
    np.testing.assert_allclose(K[interior], 0.0, atol=1e-8)


def test_graph_laplacian_forms(random_mesh):
    V, F = random_mesh
    A = geo.vertex_adjacency(F)
    L = geo.graph_laplacian(A, normalized=False)
    np.testing.assert_allclose(L @ np.ones(A.shape[0]), 0.0, atol=1e-9)
    Ls = geo.graph_laplacian(A, normalized=True, symmetric=True)
    assert abs(Ls - Ls.T).max() < 1e-9
    Lrw = geo.graph_laplacian(A, normalized=True, symmetric=False)
    np.testing.assert_allclose(Lrw @ np.ones(A.shape[0]), 0.0, atol=1e-9)


def test_tt_adjacency_cube(cube_mesh):
    _, F = cube_mesh
    TT, TTi = geo.triangle_triangle_adjacency(F)
    # closed cube: every edge has a neighbour
    assert (TT >= 0).all()
    # involution: TT[TT[f,e], TTi[f,e]] == f
    for f in range(F.shape[0]):
        for e in range(3):
            assert TT[TT[f, e], TTi[f, e]] == f


def test_unit_bounding_box():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(10, 3)) * 5 + 3
    out, scale = geo.unit_bounding_box(A.copy())
    assert np.abs(out).max() <= 0.5 + 1e-6
    assert (out.max(axis=0) + out.min(axis=0) == pytest.approx(0.0, abs=1e-6))
