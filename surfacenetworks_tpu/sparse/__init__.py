"""Static-shape sparse runtime: padded-ELL operators + structured Dirac."""

from surfacenetworks_tpu.sparse.ell import (
    DiracOperator,
    EllMatrix,
    EllOperator,
    EllSpec,
    dirac_from_coeffs,
    ell_from_scipy,
    operator_from_scipy,
    stack_dirac,
    stack_operators,
)
from surfacenetworks_tpu.sparse.ops import (
    dense_bmm,
    dirac_apply_fv,
    dirac_apply_vf,
    from_quaternion_layout,
    get_default_implementation,
    quaternion_mul,
    set_default_implementation,
    spmm,
    to_quaternion_layout,
)

__all__ = [
    "DiracOperator",
    "EllMatrix",
    "EllOperator",
    "EllSpec",
    "dense_bmm",
    "dirac_apply_fv",
    "dirac_apply_vf",
    "dirac_from_coeffs",
    "ell_from_scipy",
    "from_quaternion_layout",
    "get_default_implementation",
    "operator_from_scipy",
    "quaternion_mul",
    "set_default_implementation",
    "spmm",
    "stack_dirac",
    "stack_operators",
    "to_quaternion_layout",
]
