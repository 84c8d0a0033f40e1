"""Experiment: where do the 320us of the Dirac roundtrip go, and can a
coefficient-plane BSR/MXU formulation beat the flat-lane gather path?"""
import time, statistics, functools
import numpy as np
import jax, jax.numpy as jnp
import scipy.sparse as sp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import datasets, round_up

N_SHORT, N_LONG = 32, 544

def per_apply(fn, args, iters=6):
    def timed(n):
        float(fn(*args, jnp.asarray(n, jnp.int32)))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*args, jnp.asarray(n, jnp.int32)))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)
    t_s, t_l = timed(N_SHORT), timed(N_LONG)
    d = t_l - t_s
    return (t_l / N_LONG) if d < 0.2 * t_l else d / (N_LONG - N_SHORT)

rng = np.random.default_rng(0)
V, F = datasets.random_blob_mesh(rng, 7000)
# RCM-order vertices (as the BSR lap path does), faces sorted by min vertex
L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
perm = sps.rcm_permutation(L)
inv = np.empty_like(perm); inv[perm] = np.arange(len(perm))
V = V[perm]; F = inv[F]
F = F[np.argsort(F.min(axis=1), kind="stable")]

coeffs = geo.dirac_coeffs(V, F)
n_v = round_up(V.shape[0], 128)
n_f = round_up(F.shape[0], 128)
dop = jax.device_put(sps.dirac_from_coeffs(coeffs, n_vertices=n_v, n_faces=n_f))
C = 128
v = jnp.asarray(rng.normal(size=(n_v, C)).astype(np.float32))
f0 = jnp.asarray(rng.normal(size=(n_f, C)).astype(np.float32))

# --- current path, split directions -------------------------------------
@jax.jit
def vf_iter(dop, v, n):
    def body(_, y):
        return v * 0.01 + 0  # placeholder
    return 0
@jax.jit
def vf_only(dop, v, f0, n):
    def body(i, carry):
        f = sps.dirac_apply_vf(dop, v * (0.999 + 1e-6 * i.astype(jnp.float32)))
        return carry * 1e-6 + f
    return jnp.sum(jax.lax.fori_loop(0, n, body, f0))
@jax.jit
def fv_only(dop, v, f0, n):
    def body(i, carry):
        return carry * 1e-6 + sps.dirac_apply_fv(dop, f0 * (0.999 + 1e-6 * i.astype(jnp.float32)))
    return jnp.sum(jax.lax.fori_loop(0, n, body, v))
@jax.jit
def roundtrip(dop, v, n):
    def body(_, y):
        f = sps.dirac_apply_vf(dop, y)
        return sps.dirac_apply_fv(dop, f) * 0.2 + v * 0.01
    return jnp.sum(jax.lax.fori_loop(0, n, body, v))

print("vf_only  us:", round(per_apply(vf_only, (dop, v, f0)) * 1e6, 2))
print("fv_only  us:", round(per_apply(fv_only, (dop, v, f0)) * 1e6, 2))
print("roundtrip us:", round(per_apply(roundtrip, (dop, v)) * 1e6, 2))

# --- coefficient-plane BSR formulation -----------------------------------
# A_a (F x N): A_a[f, F[f,s]] = q_fv[f, s, a]; shared sparsity across a.
M_faces = F.shape[0]
def plane(a):
    rows = np.repeat(np.arange(M_faces), 3)
    cols = F.reshape(-1)
    vals = coeffs.q_fv[:, :, a].reshape(-1)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(M_faces, V.shape[0])).tocsr()
    return sps.bsr_from_scipy(A, block_size=128, n_rows=n_f, n_cols=n_v)

planes = [plane(a) for a in range(4)]
K = max(p.block_cols.shape[1] for p in planes)
print("vf plane KB:", [p.block_cols.shape[1] for p in planes])
# shared block structure: use union pattern by rebuilding with fixed k
def plane_k(a, k):
    rows = np.repeat(np.arange(M_faces), 3)
    cols = F.reshape(-1)
    vals = coeffs.q_fv[:, :, a].reshape(-1)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(M_faces, V.shape[0])).tocsr()
    return sps.bsr_from_scipy(A, block_size=128, k=K, n_rows=n_f, n_cols=n_v)
planes = [plane_k(a, K) for a in range(4)]
# NOTE: block_cols may differ across planes if a comp has empty blocks; for
# the experiment gather per-plane (upper bound on cost); fused packing would
# share the gather.
bc = jnp.asarray(np.stack([p.block_cols for p in planes]))   # [4, NB, KB]
bv = jnp.asarray(np.stack([p.block_vals for p in planes]))   # [4, NB, KB, bs, bs]

def plane_apply(bc, bv, x, dtype=None):
    bs = bv.shape[-1]
    n, c = x.shape
    xb = x.reshape(n // bs, bs, c)
    if dtype is not None:
        bv = bv.astype(dtype); xb = xb.astype(dtype)
    gathered = jnp.take(xb, bc, axis=0)  # [4, NB, KB, bs, C]
    out = jnp.einsum("ankij,ankjc->anic", bv, gathered, preferred_element_type=jnp.float32)
    return out.reshape(4, -1, c)

c4 = C // 4
def quarters(g):
    return [g[..., i * c4:(i + 1) * c4] for i in range(4)]

def combine(G):
    Gw, Gx, Gy, Gz = G[0], G[1], G[2], G[3]
    w = quarters(Gw); x = quarters(Gx); y = quarters(Gy); z = quarters(Gz)
    return jnp.concatenate([
        w[0] - x[1] - y[2] - z[3],
        w[1] + x[0] + y[3] - z[2],
        w[2] - x[3] + y[0] + z[1],
        w[3] + x[2] - y[1] + z[0],
    ], axis=-1)

@functools.partial(jax.jit, static_argnames=("dtype",))
def vf_bsr(bc, bv, v, f0, n, dtype=None):
    def body(i, carry):
        G = plane_apply(bc, bv, v * (0.999 + 1e-6 * i.astype(jnp.float32)), dtype)
        return carry * 1e-6 + combine(G)
    return jnp.sum(jax.lax.fori_loop(0, n, body, f0))

# correctness check vs structured path
ref = sps.dirac_apply_vf(dop, v)
G = plane_apply(bc, bv, v)
got = combine(G)
err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
print("vf plane-BSR rel err:", err)
print("vf plane-BSR f32 us:", round(per_apply(lambda *a: vf_bsr(*a), (bc, bv, v, f0)) * 1e6, 2))
print("vf plane-BSR bf16 us:", round(per_apply(lambda bc, bv, v, f0, n: vf_bsr(bc, bv, v, f0, n, dtype=jnp.bfloat16), (bc, bv, v, f0)) * 1e6, 2))
G16 = plane_apply(bc, bv, v, jnp.bfloat16)
err16 = float(jnp.max(jnp.abs(combine(G16) - ref)) / jnp.max(jnp.abs(ref)))
print("vf plane-BSR bf16 rel err:", err16)
