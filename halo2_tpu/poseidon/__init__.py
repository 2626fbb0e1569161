from .grain import Grain, generate_constants
from .primitives import (
    ConstantLength,
    Hash,
    MySpec,
    P128Pow5T3,
    Spec,
    hash_device,
    permute,
    permute_device,
    poseidon_hash,
)

__all__ = [
    "Grain",
    "generate_constants",
    "ConstantLength",
    "Hash",
    "MySpec",
    "P128Pow5T3",
    "Spec",
    "hash_device",
    "permute",
    "permute_device",
    "poseidon_hash",
]
