from . import host
from .device import (
    jac,
    jac_add,
    jac_double,
    jac_from_affine,
    jac_infinity,
    jac_neg,
    jac_to_affine,
    is_infinity,
    msm,
    scalar_mul_batched,
)

__all__ = [
    "host",
    "jac",
    "jac_add",
    "jac_double",
    "jac_from_affine",
    "jac_infinity",
    "jac_neg",
    "jac_to_affine",
    "is_infinity",
    "msm",
    "scalar_mul_batched",
]
