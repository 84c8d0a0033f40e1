"""Pallas TPU kernels for the sparse hot path.

``bsr_matmul``: block-ELL SpMM (see /opt/skills/guides/pallas_guide.md).

Design: one grid program per block-row; ``block_cols`` is scalar-prefetched
(PrefetchScalarGridSpec); the dense activation ``x`` stays resident in VMEM
for the whole kernel (7168 x 128 f32 = 3.5 MB) so block gathers are VMEM
dynamic slices; the K stored blocks are packed as one ``[bs, K*bs]`` wide
matrix so each program issues a single MXU matmul
``[bs, K*bs] @ [K*bs, C]`` after staging the K x-blocks into scratch.

Measured on TPU v5e (N=7000 cotan Laplacian, RCM-ordered, bs=128, K=5,
C=128): ~33 us/apply vs ~13-18 us/apply for the XLA einsum formulation in
``bsr.py`` — XLA lowers the gathered einsum to ONE large batched MXU matmul
([NB*K, bs, bs] x [NB*K, bs, C]) which a per-block-row Mosaic grid cannot
currently beat, so the XLA path stays the default
(``set_default_implementation('xla')``).  This kernel is kept as the
explicit-DMA implementation: it guarantees no HBM materialization of the
gathered x-copies.

Whole-block fusion verdict (round 2, measured): the previously promised
fused LapResNet2 inner step (ELU -> [x || Lx] -> BN -> GraphConv1x1
weights in one kernel) CANNOT win on this hardware and is intentionally
not shipped.  Measurements at N=7000/C=128 on TPU v5e:

* XLA composition of the full inner step (elu + BSR spmm + concat + BN
  with global batch stats + [N,256]@[256,128] matmul): **25.8 us** — only
  5.3 us above the bare 20.5 us SpMM, i.e. XLA already fuses every
  elementwise/affine op into the matmul pipeline.
* The standalone Pallas BSR SpMM costs 33 us — Mosaic per-tile overhead
  (~0.2-0.4 us x 56 tiles) alone exceeds the 5.3 us fusable surface.
* A single-program fused kernel holding everything in VMEM exceeds the
  16 MB budget (x 3.5 MB + packed operator blocks 18 MB + h [N,256]
  7.3 MB + out 3.5 MB = 31 MB, compiler-verified OOM); a gridded
  two-pass variant must materialize h to HBM for the global BN
  statistics — that round trip (~18 us) alone exceeds the possible win.

Where Pallas DOES win here: the windowed ``sddmm`` below (178 us vs
351 us for the XLA gather formulation at the same shape) — computing a
dense score tile on the MXU and sampling it beats HBM row gathers.

Dirac banded-MXU verdicts (rounds 2-3, measured): MXU formulations of the
Dirac applies CANNOT win and are intentionally not shipped.  The Hamilton
product is linear, so ``Di v`` decomposes into 4 scalar matmuls (one per
quaternion coefficient component) + a fixed quarter-lane recombination —
all MXU work, no HBM gathers.  Two shapes were built and benched at FAUST
scale (N=7000/M=14080/C=128, RCM vertices + min-vertex-sorted faces):

* round 2, windowed Pallas tiles (windows vf=384 / fv=768): roundtrip
  **619 us** default precision / 839 us HIGHEST — per-tile densify + 4
  matmuls dwarf the gathers they replace;
* round 3, 4-component BSR/MXU (the formulation that wins the Laplacian
  bench, full 128-lane width): roundtrip **296 us**, 4.2e-3 rel error
  (bf16 MXU rounding) — still behind the gather path.

The flat-lane gather path (sparse/ops.py) measures **236 us** roundtrip vs
a benched pure-gather roofline of **187.5 us** at the exact same table
shapes (same row gathers, Hamilton product removed — bench.py
``dirac_gather_roofline_us``): the shipped apply runs at **~0.79 of the
gather-issue ceiling**, which is the operative speed-of-light for this
operator shape (replaces the round-2 asserted ~2.4 ns/gather estimate
with a measurement).

Falls back to interpreter mode automatically off-TPU so CPU tests exercise
the same code path.

bf16 and the Dirac roundtrip (measured, r03): bf16 features alone are
neutral (235.8 vs 238.2 us) and bf16 tables+features are WORSE (258.0 us,
extra convert traffic) — consistent with the gather-ISSUE-bound model:
cost scales with gather instruction count, not gathered bytes, so --bf16
leaves the Dirac apply at the fp32 tables it ships with.

Round-4 Dirac verdicts (benchmarks/dirac_r04_experiments.py, measured on
v5e at the same FAUST shapes) — the book is now closed at ~0.79 of the
gather roofline:

* scatter-fv formulation (face-major segment_sum over the 3M Hamilton-
  weighted face rows instead of Kv row-gathers per vertex): numerics exact
  (rel err 0.0) but **471 us roundtrip vs 237.6 shipped** — TPU scatter /
  segment_sum lowering costs far more than the gathers it replaces.
  REJECTED.
* deeper valence packing (p90 base instead of p95): on realistic mesh
  valence distributions p90 == p95 == 8 slots (valence is tightly
  concentrated around 6), so there is no experiment to run — the p95
  packing already sits at the distribution's knee.  NO-OP.
* sharing incidence gathers between Di and the following DiA inside
  DirResNet2: structurally impossible — the vf apply gathers rows of the
  VERTEX tensor by face corner, the fv apply gathers rows of the newly
  computed FACE tensor by vertex incidence; there is no common gathered
  operand.  NOT APPLICABLE.

Round-5 Lap/BSR roofline ledger (bench.py roofline fields, measured on
v5e at the FAUST workload N=7000/K~5/C=128):

* The winning BSR path is MXU-issue bound, not HBM bound: flops are
  2 * NB*K*bs*bs * C ~ 1.15 GFLOP/apply because the format multiplies
  the ENTIRE padded band area (pad ratio vs 12-bytes-per-nnz CSR ~30x)
  — the fraction-of-MXU and fraction-of-HBM numbers are published per
  run in bench.py's `bsr_fraction_of_*` fields with same-run measured
  ceilings (`hbm_bw_measured_gbs`, `mxu_*_tflops`).
* Compact-format candidate, 8x128 RECTANGULAR blocks (round-4 verdict
  item 6): **REJECTED, measured 423 us/apply vs 21.8 shipped (19x
  worse)**.  Two independent reasons: (1) the hoped-for byte saving does
  not exist — after RCM the band width ~640 IS the per-row column
  spread, so an 8-row group spans the same ~5 column-blocks as a
  128-row tile and packs the same ~17 MB of padded block values; (2)
  M=8 matmuls occupy 8/128 of the MXU's systolic rows, so the same
  flops issue ~16x slower.  Block shrinking cannot reduce covered band
  area on banded mesh Laplacians; the real compact path is the scalar
  windowed ELL kernel above (40x fewer bytes), which is VPU-bound and
  measured 4-5x slower than BSR at these shapes — both formats sit at
  their respective (different) rooflines, and BSR's is the faster one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bsr_matmul_call(block_cols, block_vals, x, interpret=False):
    nb, kb, bs, _ = block_vals.shape
    c = x.shape[-1]
    # fp32 activations + fp32 out_shape: parity with _bsr_matmul_xla
    # (bsr.py), which deliberately returns the fp32 MXU accumulation so
    # BatchNorm reads unrounded operator results even under --bf16; also
    # guarantees the store into the fp32 VMEM scratch below is well-typed
    x = x.astype(jnp.float32)
    # pack blocks row-major: [NB, bs, KB*bs]; loop-invariant, hoisted by XLA
    vals_packed = jnp.swapaxes(block_vals, 1, 2).reshape(nb, bs, kb * bs)

    def kernel(cols_ref, vals_ref, x_ref, out_ref, scratch):
        i = pl.program_id(0)
        for k in range(kb):
            col = cols_ref[i, k]
            scratch[pl.ds(k * bs, bs), :] = x_ref[pl.ds(col * bs, bs), :]
        out_ref[...] = jnp.dot(
            vals_ref[0], scratch[...], preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, bs, kb * bs), lambda i, cols: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x fully resident
        ],
        out_specs=pl.BlockSpec((bs, c), lambda i, cols: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kb * bs, c), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * bs, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * kb * bs * bs * c,
            bytes_accessed=block_vals.size * block_vals.dtype.itemsize + x.size * 4,
            transcendentals=0,
        ),
    )(block_cols, vals_packed, x)


def bsr_matmul(block_cols, block_vals, x):
    """Block-ELL SpMM via an explicit Pallas kernel (shapes pre-blocked)."""
    return _bsr_matmul_call(block_cols, block_vals, x, interpret=not _on_tpu())


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("window", "interpret", "precision"))
def _ell_matmul_call(cols, vals, x, window, interpret=False, precision="highest"):
    """Windowed scalar-ELL SpMM: out[r] = sum_k vals[r,k] * x[cols[r,k]].

    TPU-native design (no gather): operators are RCM-reordered at pack time
    (sparse/bsr.py), so every aligned 128-row tile touches only a narrow
    *band* of columns — ``window`` (static, measured host-side by
    ``ell._ell_window``) bounds that band for all tiles.  Each grid program
    (1) computes its tile's band base from the column tile (cheap VPU min),
    (2) slices ``[window, C]`` of the VMEM-resident ``x``, (3) densifies its
    ``[128, K]`` ELL tile into a ``[128, window]`` banded-dense tile via K
    vectorized compare-selects against a lane iota, and (4) issues one MXU
    matmul ``[128, window] @ [window, C]``.  Padding slots (col=0, val=0)
    contribute exact zeros in the densify step.
    """
    R, K = cols.shape
    N, C = x.shape
    TR = 128
    Rp = _round_up(R, TR)
    if Rp != R:
        cols = jnp.pad(cols, ((0, Rp - R), (0, 0)))
        vals = jnp.pad(vals, ((0, Rp - R), (0, 0)))
    W = min(window, N)
    T = Rp // TR

    def kernel(cols_ref, vals_ref, x_ref, out_ref):
        cols_t = cols_ref[...]
        vals_t = vals_ref[...]
        base = jnp.min(jnp.where(vals_t != 0.0, cols_t, N))
        base = jnp.clip((base // 8) * 8, 0, N - W)
        xs = x_ref[pl.ds(base, W), :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (TR, W), 1)
        rel = cols_t - base
        acc = jnp.zeros((TR, W), jnp.float32)
        for k in range(K):
            acc = acc + jnp.where(rel[:, k][:, None] == iota, vals_t[:, k][:, None], 0.0)
        # Precision tiering (round-2 verdict: the round-1 "extra passes are
        # not on the critical path" claim was WRONG — HIGHEST (bf16x3, ~3 MXU
        # passes) measured 116 us vs 87 us at default precision, a 33% tax).
        # 'highest' keeps the fp32 mantissa through the MXU and is the
        # default because the kernel's contract is parity with the fp32
        # gather path; callers that tolerate ~2e-3 relative error (bf16
        # input rounding) pass precision='default' for the fast path.
        out_ref[...] = jnp.dot(
            acc,
            xs,
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if precision == "highest"
                else jax.lax.Precision.DEFAULT
            ),
        ).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, C), x.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((TR, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x fully resident
        ],
        out_specs=pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * W * C,
            bytes_accessed=(cols.size + vals.size) * 4 + x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(cols, vals, x)
    return out[:R] if Rp != R else out


def ell_matmul(cols, vals, x, window, precision: str = "highest"):
    """Scalar-ELL SpMM via the windowed Pallas kernel.

    ``window`` must be a valid banded bound (``EllMatrix.window``); callers
    pass ``window=0`` matrices through the XLA path instead (sparse/ops.py).
    ``precision='default'`` trades fp32 parity for one MXU pass instead of
    three (~2e-3 relative error, ~25% faster at FAUST shapes).
    """
    if int(window) <= 0:
        raise ValueError(
            "ell_matmul requires a positive banded window bound; window=0 "
            "operators (no verified bound) must use the XLA gather path"
        )
    return _ell_matmul_call(
        cols, vals, x, int(window), interpret=not _on_tpu(), precision=precision
    )


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def _sddmm_call(cols, vals, a, b, window, interpret=False):
    """Windowed SDDMM: out[r,k] = <a[r], b[cols[r,k]]> at nonzero slots.

    Same banded-window design as ``_ell_matmul_call`` run in reverse: each
    128-row tile (1) slices the ``[W, C]`` band of the VMEM-resident ``b``,
    (2) issues ONE MXU matmul ``a_tile [128, C] x band^T -> scores
    [128, W]`` (contraction over the 128-lane feature axis — the MXU-native
    direction), then (3) *samples* the K pattern slots out of the score
    tile with compare-selects against a lane iota.  No HBM gather anywhere.
    """
    R, K = cols.shape
    N, C = b.shape
    TR = 128
    Rp = _round_up(R, TR)
    if Rp != R:
        cols = jnp.pad(cols, ((0, Rp - R), (0, 0)))
        vals = jnp.pad(vals, ((0, Rp - R), (0, 0)))
        a = jnp.pad(a, ((0, Rp - R), (0, 0)))
    W = min(window, N)
    T = Rp // TR

    def kernel(cols_ref, vals_ref, a_ref, b_ref, out_ref):
        cols_t = cols_ref[...]
        vals_t = vals_ref[...]
        base = jnp.min(jnp.where(vals_t != 0.0, cols_t, N))
        base = jnp.clip((base // 8) * 8, 0, N - W)
        band = b_ref[pl.ds(base, W), :]  # [W, C]
        scores = jax.lax.dot_general(
            a_ref[...],
            band,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TR, W]
        iota = jax.lax.broadcasted_iota(jnp.int32, (TR, W), 1)
        rel = cols_t - base
        outs = []
        for k in range(K):
            hit = (rel[:, k][:, None] == iota) & (vals_t[:, k][:, None] != 0.0)
            outs.append(jnp.sum(jnp.where(hit, scores, 0.0), axis=1))
        out_ref[...] = jnp.stack(outs, axis=1).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, K), a.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((TR, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b fully resident
        ],
        out_specs=pl.BlockSpec((TR, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * W * C,
            bytes_accessed=(cols.size + vals.size) * 4 + (a.size + b.size) * 4,
            transcendentals=0,
        ),
    )(cols, vals, a, b)
    return out[:R] if Rp != R else out


def sddmm(cols, vals, a, b, window):
    """Sampled dense-dense matmul via the windowed Pallas kernel.

    ``window`` must be a valid banded bound (``EllMatrix.window``); callers
    route window=0 patterns through the XLA gather path (sparse/ops.py).
    """
    if int(window) <= 0:
        raise ValueError(
            "sddmm requires a positive banded window bound; window=0 "
            "patterns (no verified bound) must use the XLA gather path"
        )
    return _sddmm_call(cols, vals, a, b, int(window), interpret=not _on_tpu())
