"""Ahead-of-time model export for serving (jax.export / StableHLO).

The reference has no deployment story: inference means re-instantiating the
torch model and unpickling a checkpoint inside the training repo.  Here the
trained forward pass is exported once to a self-describing StableHLO
artifact and served WITHOUT the model code: the artifact embeds the traced
computation (params are baked in as constants by default — a frozen,
single-file deployable), its input/output shapes+dtypes, and jax.export's
compatibility guarantees across jax versions.  The same artifact runs on
TPU, CPU or GPU — platform lowering happens at load time.

Typical flow::

    blob = serve.export_forward(model, params, operator, mask, example_inputs)
    open("model.snx", "wb").write(blob)
    # ... on the serving host (no surfacenetworks_tpu import needed):
    fn = serve.load(open("model.snx", "rb").read())
    out = fn(inputs)          # [B, N, Cin] -> [B, N, Cout]

The operator (L / Dirac tables) is baked into the artifact together with the
params: Surface Networks operators are per-mesh *constants* (reference
`sparse_bmm_func.py:62` never differentiates them), so a deployment serves
one bucketed mesh topology per artifact — exactly the static-shape contract
the TPU compiler wants.  Export with ``bake_operator=False`` to keep the
operator a runtime argument instead (one artifact, many same-bucket meshes;
ELL/BSR/dense operators all work — the pytree is flattened to arrays).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_forward(
    model,
    params,
    operator: Any,
    mask,
    example_inputs,
    bake_operator: bool = True,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Serialize ``model.apply(params, operator, mask, inputs)`` to a
    StableHLO artifact.

    ``example_inputs`` fixes the served bucket shape ``[B, N, Cin]`` (static
    shapes are the serving contract; use the training bucket).  ``platforms``
    defaults to cross-platform ("tpu", "cpu") so one artifact serves both.
    With ``bake_operator=False`` the per-mesh mask becomes a runtime
    argument alongside the operator leaves (both are mesh-dependent).
    """
    mask = jnp.asarray(mask)
    example_inputs = jnp.asarray(example_inputs)

    if bake_operator:

        def fwd(inputs):
            return model.apply({"params": params}, operator, mask, inputs)

        exp = jax_export.export(
            jax.jit(fwd),
            platforms=list(platforms or ("tpu", "cpu")),
        )(jax.ShapeDtypeStruct(example_inputs.shape, example_inputs.dtype))
    else:
        op_leaves, op_treedef = jax.tree_util.tree_flatten(operator)

        # the mask is as mesh-dependent as the operator (it drives
        # global_average and masked BN), so it is a runtime argument too
        def fwd(inputs, mask_rt, *leaves):
            op = jax.tree_util.tree_unflatten(op_treedef, leaves)
            return model.apply({"params": params}, op, mask_rt, inputs)

        exp = jax_export.export(
            jax.jit(fwd),
            platforms=list(platforms or ("tpu", "cpu")),
        )(
            jax.ShapeDtypeStruct(example_inputs.shape, example_inputs.dtype),
            jax.ShapeDtypeStruct(mask.shape, mask.dtype),
            *(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in map(jnp.asarray, op_leaves)),
        )
    return bytes(exp.serialize())


def load(blob: bytes) -> Callable:
    """Deserialize an exported artifact into a jitted callable.

    The callable takes exactly the arguments the artifact was exported with
    (``inputs`` for a baked artifact; ``inputs, mask, *operator_leaves``
    for ``bake_operator=False``) and runs on whatever platform the current
    backend provides.
    """
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call)


def export_info(blob: bytes) -> dict:
    """Shape/dtype/platform metadata of an artifact (for serving-side
    validation without running it)."""
    exp = jax_export.deserialize(blob)
    return {
        "platforms": list(exp.platforms),
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "nr_devices": exp.nr_devices,
    }
