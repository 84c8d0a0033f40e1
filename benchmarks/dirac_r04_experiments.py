"""Round-4 Dirac push experiments (VERDICT r3 item 4).

Three candidates against the shipped packed-valence gather apply
(sparse/ops.py, 237.6 us roundtrip @ 0.79 of the measured pure-gather
roofline, BENCH r03):

(a) scatter formulation of the fv apply — face-major segment_sum reusing
    Di's [M, 3] incidence: instead of Kv row-gathers per vertex, stream the
    3M Hamilton-weighted face rows and segment-sum them into vertices.
(b) fused vf+fv roundtrip in one jit region (shares nothing structurally —
    measured to check whether XLA finds cross-apply scheduling wins).
(c) deeper valence packing: base = p90 valence instead of p95 (one fewer
    base gather, more overflow rows).

Usage: python benchmarks/dirac_r04_experiments.py  (runs on the visible
device; results printed as JSON and appended to results/scale/ by hand).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from surfacenetworks_tpu import geometry as geo
from surfacenetworks_tpu import sparse as sps
from surfacenetworks_tpu.data import datasets, round_up
from surfacenetworks_tpu.dist.dirac_partition import sort_faces_for_partition


def _build(n_points=7000, channels=128, base_pct=95):
    rng = np.random.default_rng(0)
    V, F = datasets.random_blob_mesh(rng, n_points)
    Lx = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    perm = sps.rcm_permutation(Lx)
    inv = geo.invert_permutation(perm)
    V, F = V[perm], inv[F]
    F = F[sort_faces_for_partition(F)]
    coeffs = geo.dirac_coeffs(V, F)
    n_v, n_f = round_up(V.shape[0], 128), round_up(F.shape[0], 128)
    val = np.bincount(np.asarray(F).reshape(-1), minlength=V.shape[0])
    base = int(np.percentile(val[val > 0], base_pct))
    base = max(4, base + (base % 2))
    over = int((val > base).sum())
    dop = sps.dirac_from_coeffs(
        coeffs, n_vertices=n_v, n_faces=n_f,
        base_valence=base, n_overflow=round_up(max(over, 1), 8),
    )
    v = rng.normal(size=(n_v, channels)).astype(np.float32)
    return jax.device_put(dop), jnp.asarray(v), coeffs, n_v, n_f, base, over


def _per_apply(fn, args, iters=6):
    fn(*args, 2).block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args, 40).block_until_ready()
        t1 = time.perf_counter()
        fn(*args, 80).block_until_ready()
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / 40)
    return float(np.median(ts))


def main():
    out = {}
    dop, v, coeffs, n_v, n_f, base95, over95 = _build(base_pct=95)
    out["base_p95"] = base95
    out["overflow_p95"] = over95

    @jax.jit
    def roundtrip(dop, v, n):
        def body(_, y):
            f = sps.dirac_apply_vf(dop, y)
            return sps.dirac_apply_fv(dop, f) * 0.2 + v * 0.01

        return jnp.sum(jax.lax.fori_loop(0, n, body, v))

    out["shipped_roundtrip_us"] = round(_per_apply(roundtrip, (dop, v)) * 1e6, 2)

    # (a) scatter fv: out[F[i,c]] += q_scatter[i,c] (x) f[i] via segment_sum
    # over the 3M face-slot rows.  Build the scatter-side quaternion table
    # from the same coefficients the gather tables encode.
    faces_flat = np.asarray(dop.faces).reshape(-1)  # [3M] vertex ids
    # q_vf maps (vertex, slot) -> quaternion for the incident face; for the
    # scatter form we need (face, corner) -> quaternion, which is q_fv's
    # layout but with the ADJOINT coefficients of DiA.  Recover it from the
    # vertex-side table by inverting the incidence.
    M3 = faces_flat.shape[0]
    q_sc = np.zeros((M3, 4), np.float32)
    vf_face = np.asarray(dop.vf_face)
    q_vf = np.asarray(dop.q_vf)
    Fh = np.asarray(dop.faces)
    # map (vertex j, face i) -> q; fill per corner
    lut = {}
    for j in range(vf_face.shape[0]):
        for s in range(vf_face.shape[1]):
            if np.any(q_vf[j, s] != 0):
                lut[(j, vf_face[j, s])] = q_vf[j, s]
    if dop.ov_rows is not None:
        ov_rows = np.asarray(dop.ov_rows)
        ov_face = np.asarray(dop.ov_face)
        q_ov = np.asarray(dop.q_ov_vf)
        for p in range(ov_rows.shape[0]):
            j = ov_rows[p]
            for s in range(ov_face.shape[1]):
                if np.any(q_ov[p, s] != 0):
                    lut[(int(j), int(ov_face[p, s]))] = q_ov[p, s]
    for i in range(Fh.shape[0]):
        for c in range(3):
            j = int(Fh[i, c])
            q = lut.get((j, i))
            if q is not None:
                q_sc[i * 3 + c] = q
    q_sc_d = jnp.asarray(q_sc)
    seg_d = jnp.asarray(faces_flat.astype(np.int32))

    def _ham(q, x):
        c4 = x.shape[-1] // 4
        xw, xx, xy, xz = (x[..., i * c4 : (i + 1) * c4] for i in range(4))
        a, b, c, d = (q[:, i : i + 1] for i in range(4))
        return jnp.concatenate(
            [
                a * xw - b * xx - c * xy - d * xz,
                a * xx + b * xw + c * xz - d * xy,
                a * xy - b * xz + c * xw + d * xx,
                a * xz + b * xy - c * xx + d * xw,
            ],
            axis=-1,
        )

    @jax.jit
    def roundtrip_scatter_fv(dop, q_sc, seg, v, n):
        def body(_, y):
            f = sps.dirac_apply_vf(dop, y)  # [Mf, C]
            rows = jnp.repeat(f, 3, axis=0)  # [3M, C] face rows per corner
            w = _ham(q_sc, rows)
            out = jax.ops.segment_sum(w, seg, num_segments=n_v)
            return out * 0.2 + v * 0.01

        return jnp.sum(jax.lax.fori_loop(0, n, body, v))

    # numerics gate
    f_ref = sps.dirac_apply_vf(dop, v)
    out_ref = sps.dirac_apply_fv(dop, f_ref)
    rows = jnp.repeat(f_ref, 3, axis=0)
    out_sc = jax.ops.segment_sum(_ham(q_sc_d, rows), seg_d, num_segments=n_v)
    err = float(jnp.max(jnp.abs(out_sc - out_ref)) / (jnp.max(jnp.abs(out_ref)) + 1e-30))
    out["scatter_fv_max_rel_err"] = round(err, 6)
    out["scatter_fv_roundtrip_us"] = round(
        _per_apply(roundtrip_scatter_fv, (dop, q_sc_d, seg_d, v)) * 1e6, 2
    )

    # (c) p90 packing
    dop90, v90, _, _, _, base90, over90 = _build(base_pct=90)
    out["base_p90"] = base90
    out["overflow_p90"] = over90
    if base90 < base95:
        out["p90_roundtrip_us"] = round(_per_apply(roundtrip, (dop90, v90)) * 1e6, 2)
    else:
        out["p90_roundtrip_us"] = None  # same base slot count: no experiment

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
