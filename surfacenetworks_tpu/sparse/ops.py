"""Device-side sparse ops: ELL SpMM and structured Dirac applies.

All ops are jit-safe (static shapes), batched via a leading axis, and carry
custom VJPs that multiply by the *stored transpose* operator — mirroring the
reference's backward (``utils/cuda/sparse_bmm_func.py:53-72``: transpose the
constant operator, SpMM with the cotangent; operator itself gets no gradient).

Implementations:

* ``'xla'``    — gather + multiply + reduce; XLA fuses this well on TPU and it
  is the reference semantics for tests.
* ``'pallas'`` — hand-tiled Pallas kernel (see ``pallas_kernels.py``) for the
  hot path; selected via ``set_default_implementation`` or per-call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from surfacenetworks_tpu.sparse.ell import DiracOperator, EllMatrix, EllOperator

_DEFAULT_IMPL = "xla"


def set_default_implementation(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(impl)
    _DEFAULT_IMPL = impl


def get_default_implementation() -> str:
    return _DEFAULT_IMPL


# ---------------------------------------------------------------------------
# raw ELL matvec (no custom grad) — single matrix [R,K] x dense [N,C]
# ---------------------------------------------------------------------------


def _ell_matmul_xla(cols: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """out[r] = sum_k vals[r,k] * x[cols[r,k]];  cols [R,K], x [N,C] -> [R,C]."""
    gathered = jnp.take(x, cols, axis=0)  # [R, K, C]
    return jnp.sum(vals[..., None] * gathered, axis=-2)


def _ell_matmul(cols, vals, x, window: int = 0, impl: str | None = None):
    impl = impl or _DEFAULT_IMPL
    if impl == "pallas" and window > 0:
        from surfacenetworks_tpu.sparse import pallas_kernels

        return pallas_kernels.ell_matmul(cols, vals, x, window)
    # window == 0 means no banded bound is known (hand-built matrix):
    # the gather formulation is the only safe path.
    return _ell_matmul_xla(cols, vals, x)


# ---------------------------------------------------------------------------
# spmm with transpose-operator VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def spmm(op: EllOperator, x: jnp.ndarray) -> jnp.ndarray:
    """``op.fwd @ x`` with batching.

    Unbatched: ``op.fwd.cols [R,K]``, ``x [N,C]`` -> ``[R,C]``.
    Batched:   ``op.fwd.cols [B,R,K]``, ``x [B,N,C]`` -> ``[B,R,C]`` — the
    TPU equivalent of the reference's block-diagonal ``torch.mm`` on a
    ``[B*N, C]`` view (utils/utils_pt.py:167) and of its batched-CSR CUDA
    ``SparseBMM`` (utils/cuda/sparse_bmm.cu).
    """
    return _spmm_fwd_only(op.fwd, x)


def _spmm_fwd_only(m: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    if m.cols.ndim == 2:
        return _ell_matmul(m.cols, m.vals, x, window=m.window)
    assert m.cols.ndim == 3 and x.ndim == 3, (m.cols.shape, x.shape)
    fn = functools.partial(_ell_matmul, window=m.window)
    return jax.vmap(fn)(m.cols, m.vals, x)


def _spmm_vjp_fwd(op, x):
    # dtype witness: under mixed precision x may be bf16 while the fp32-stored
    # operator makes the forward (and hence g and x_bar) fp32 — the cotangent
    # must be cast back to the primal dtype for custom_vjp to typecheck.
    return spmm(op, x), (op, jnp.zeros((0,), x.dtype))


def _spmm_vjp_bwd(res, g):
    op, wit = res
    x_bar = _spmm_fwd_only(op.bwd, g).astype(wit.dtype)
    op_bar = jax.tree_util.tree_map(jnp.zeros_like, op)
    return (op_bar, x_bar)


spmm.defvjp(_spmm_vjp_fwd, _spmm_vjp_bwd)


def dense_bmm(L: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Dense operator apply on the MXU (reference ``torch.bmm(L, x)`` paths:
    DenseLapResNet2, ARAP ``--dense``)."""
    return jnp.einsum("...nm,...mc->...nc", L, x)


# ---------------------------------------------------------------------------
# SDDMM: sampled dense-dense matmul at an operator's sparsity pattern
# ---------------------------------------------------------------------------


def _sddmm_xla(cols, vals, a, b):
    """out[r,k] = <a[r], b[cols[r,k]]> where vals[r,k] != 0, else 0."""
    gathered = jnp.take(b, cols, axis=0)  # [R, K, C]
    out = jnp.einsum("rc,rkc->rk", a, gathered)
    return jnp.where(vals != 0, out, 0.0)


def _sddmm_raw(cols, vals, a, b, window, impl=None):
    # Unlike SpMM (where the BSR/MXU einsum wins and Pallas stays opt-in),
    # the windowed Pallas SDDMM beats the XLA gather form ~2x at banded
    # patterns on TPU (179 vs 351 us at FAUST shapes, BENCH r02/r03), so it
    # is the DEFAULT whenever a verified window bound exists on TPU.
    if impl is None:
        impl = _DEFAULT_IMPL
        if window > 0:
            try:
                on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            except Exception:  # pragma: no cover
                on_tpu = False
            if on_tpu:
                impl = "pallas"
    if impl == "pallas" and window > 0:
        from surfacenetworks_tpu.sparse import pallas_kernels

        return pallas_kernels.sddmm(cols, vals, a, b, window)
    return _sddmm_xla(cols, vals, a, b)


@jax.custom_vjp
def sddmm(op: EllOperator, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sampled dense-dense matmul: ``(a @ b^T)`` evaluated only at the
    sparsity pattern of ``op.fwd`` — the companion kernel to SpMM named by
    the BASELINE north star.

    ``a [..., R, C]``, ``b [..., N, C]`` -> ``[..., R, K]`` ELL values on
    ``op.fwd.cols``.  A pattern slot exists iff its stored value is nonzero
    (the EllMatrix padding convention) — explicit zero entries are treated
    as padding.

    Gradients flow to BOTH dense factors (unlike ``spmm``, whose operator is
    constant): ``da = (g at pattern) @ b`` is itself an ELL SpMM, and
    ``db[j] = sum_{(r,k): cols[r,k]=j} g[r,k] a[r]`` is the transpose
    scatter (segment-sum).

    Note on the siamese head: the FAUST losses consume the *full*
    ``FA @ FB^T`` logits (softmax over every column,
    dense_correspondence/main.py:216-240), so the dense einsum is the right
    tool there — `bench.py` records the measured crossover.  sddmm is for
    pattern-restricted scores (operator-weighted losses, sparse attention
    over mesh neighborhoods).
    """
    m = op.fwd
    if m.cols.ndim == 2:
        return _sddmm_raw(m.cols, m.vals, a, b, m.window)
    fn = functools.partial(_sddmm_raw, window=m.window)
    return jax.vmap(fn)(m.cols, m.vals, a, b)


def _sddmm_vjp_fwd(op, a, b):
    return sddmm(op, a, b), (op, a, b)


def _sddmm_vjp_bwd(res, g):
    op, a, b = res
    m = op.fwd
    gm = jnp.where(m.vals != 0, g, 0.0)

    def one(cols, gm_, a_, b_):
        da = _ell_matmul_xla(cols, gm_, b_)
        R, K = cols.shape
        contrib = gm_[..., None] * a_[:, None, :]  # [R, K, C]
        db = jax.ops.segment_sum(
            contrib.reshape(R * K, -1), cols.reshape(R * K), num_segments=b_.shape[0]
        )
        return da, db

    if m.cols.ndim == 2:
        da, db = one(m.cols, gm, a, b)
    else:
        da, db = jax.vmap(one)(m.cols, gm, a, b)
    op_bar = jax.tree_util.tree_map(jnp.zeros_like, op)
    return (op_bar, da.astype(a.dtype), db.astype(b.dtype))


sddmm.defvjp(_sddmm_vjp_fwd, _sddmm_vjp_bwd)


# ---------------------------------------------------------------------------
# quaternion algebra (VPU elementwise; channel axis rides the 128-lane dim)
# ---------------------------------------------------------------------------


def quaternion_mul(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``q (x) x`` broadcast over channels.

    ``q [..., 4]`` (coefficients), ``x [..., 4, C]`` (quaternion features) ->
    ``[..., 4, C]``.  Identical to multiplying by the reference's
    ``quaternion_matrix(q)`` (utils/mesh.py:28-33) on the left.
    """
    a, b, c, d = (q[..., i, None] for i in range(4))
    xw, xx, xy, xz = (x[..., i, :] for i in range(4))
    return jnp.stack(
        [
            a * xw - b * xx - c * xy - d * xz,
            a * xx + b * xw + c * xz - d * xy,
            a * xy - b * xz + c * xw + d * xx,
            a * xz + b * xy - c * xx + d * xw,
        ],
        axis=-2,
    )


def to_quaternion_layout(x: jnp.ndarray) -> jnp.ndarray:
    """[..., N, C] -> [..., N, 4, C//4] (parity with the reference's
    ``view(B*N*4, C//4)`` reshape, utils/utils_pt.py:201)."""
    *lead, n, ch = x.shape
    assert ch % 4 == 0, f"channels {ch} not divisible by 4"
    return x.reshape(*lead, n, 4, ch // 4)


def from_quaternion_layout(x: jnp.ndarray) -> jnp.ndarray:
    *lead, n, four, c4 = x.shape
    return x.reshape(*lead, n, four * c4)


# ---------------------------------------------------------------------------
# structured Dirac applies
# ---------------------------------------------------------------------------


def _dirac_gather_apply(idx, q, x):
    """out[r] = sum_s q[r,s] (x) x[idx[r,s]];  idx [R,S], q [R,S,4],
    x [N,C] (C % 4 == 0, quaternion component = leading split of the channel
    axis) -> [R,C].

    TPU layout notes (measured on v5e, 7000-vertex mesh, C=128):

    * the gather stays in the flat ``[N, C]`` layout so each gathered row is
      a full 128-lane vector; the Hamilton product is applied via *static
      lane slices* of width C/4.  Reshaping to ``[N, 4, C/4]`` first (the
      reference's ``view(B*N*4, C/4)``, utils/utils_pt.py:201) puts
      (4, C/4) on the (sublane, lane) axes — an 8x tile-padding waste that
      measured ~5x slower.
    * the slot axis S is *unrolled* (S is 3 for faces, max-valence ~12 for
      vertices): per-slot 2-D ``[R, C]`` gathers + accumulate beat one 3-D
      ``[R, S, C]`` gather by a further 4.6x — XLA keeps the whole
      per-slot chain in registers instead of materializing the 3-D
      intermediate."""
    c4 = x.shape[-1] // 4
    acc = None
    for s in range(idx.shape[1]):
        g = jnp.take(x, idx[:, s], axis=0)  # [R, C]
        xw, xx, xy, xz = (g[..., i * c4 : (i + 1) * c4] for i in range(4))
        a, b, c, d = (q[:, s, i : i + 1] for i in range(4))
        o = jnp.concatenate(
            [
                a * xw - b * xx - c * xy - d * xz,
                a * xx + b * xw + c * xz - d * xy,
                a * xy - b * xz + c * xw + d * xx,
                a * xz + b * xy - c * xx + d * xw,
            ],
            axis=-1,
        )
        acc = o if acc is None else acc + o
    return acc


@jax.custom_vjp
def dirac_apply_vf(op: DiracOperator, v: jnp.ndarray) -> jnp.ndarray:
    """``Di @ v``: vertex features -> face features.

    ``v [..., N, C]`` (C % 4 == 0) -> ``[..., M, C]``.  Parity:
    ``torch.mm(Di, x.view(B*N*4, C//4))`` (utils/utils_pt.py:201-203).
    """
    return _dirac_vf_raw(op.faces, op.q_fv, v)


def _dirac_vf_raw(faces, q_fv, v):
    assert v.shape[-1] % 4 == 0, f"channels {v.shape[-1]} not divisible by 4"
    if faces.ndim == 2:
        return _dirac_gather_apply(faces, q_fv, v)
    return jax.vmap(_dirac_gather_apply)(faces, q_fv, v)


def _vertex_side_apply(vf_face, q_main, ov_rows, ov_face, q_ov, x):
    """Faces -> vertices gather-combine with optional packed-valence
    overflow: base table covers ``base_valence`` slots; the few
    higher-valence vertices add their surplus via a tiny gather + P-row
    scatter-add (padded overflow rows carry q=0 and add zeros at row 0)."""
    out = _dirac_gather_apply(vf_face, q_main, x)
    if ov_rows is not None:
        o = _dirac_gather_apply(ov_face, q_ov, x)
        out = out.at[ov_rows].add(o)
    return out


def _apply_vertex_side(op: DiracOperator, q_main, q_ov, x):
    if op.vf_face.ndim == 2:
        return _vertex_side_apply(op.vf_face, q_main, op.ov_rows, op.ov_face, q_ov, x)
    if op.ov_rows is None:
        fn = lambda t, q, xx: _vertex_side_apply(t, q, None, None, None, xx)
        return jax.vmap(fn)(op.vf_face, q_main, x)
    return jax.vmap(_vertex_side_apply)(
        op.vf_face, q_main, op.ov_rows, op.ov_face, q_ov, x
    )


def _dirac_vf_fwd(op, v):
    return dirac_apply_vf(op, v), (op, jnp.zeros((0,), v.dtype))


def _dirac_vf_bwd(res, g):
    # v_bar[j] = sum over incident (face,corner): conj(q_fv) (x) g[face]
    op, wit = res
    out = _apply_vertex_side(op, op.q_bwd_v, op.q_ov_bwd_v, g).astype(wit.dtype)
    op_bar = jax.tree_util.tree_map(jnp.zeros_like, op)
    return (op_bar, out)


dirac_apply_vf.defvjp(_dirac_vf_fwd, _dirac_vf_bwd)


@jax.custom_vjp
def dirac_apply_fv(op: DiracOperator, f: jnp.ndarray) -> jnp.ndarray:
    """``DiA @ f``: face features -> vertex features.

    ``f [..., M, C]`` -> ``[..., N, C]``.  Parity: utils/utils_pt.py:213-215.
    """
    return _dirac_fv_raw(op, f)


def _dirac_fv_raw(op: DiracOperator, f):
    assert f.shape[-1] % 4 == 0, f"channels {f.shape[-1]} not divisible by 4"
    return _apply_vertex_side(op, op.q_vf, op.q_ov_vf, f)


def _dirac_fv_fwd(op, f):
    return dirac_apply_fv(op, f), (op, jnp.zeros((0,), f.dtype))


def _dirac_fv_bwd(res, g):
    # f_bar[i] = sum_c conj(q_vf at (F[i,c], slot)) (x) g[F[i,c]]
    op, wit = res
    if op.faces.ndim == 2:
        out = _dirac_gather_apply(op.faces, op.q_bwd_f, g)
    else:
        out = jax.vmap(_dirac_gather_apply)(op.faces, op.q_bwd_f, g)
    op_bar = jax.tree_util.tree_map(jnp.zeros_like, op)
    return (op_bar, out.astype(wit.dtype))


dirac_apply_fv.defvjp(_dirac_fv_fwd, _dirac_fv_bwd)
