from .failures import (
    CellNotAssigned,
    ConstraintNotSatisfied,
    InRegion,
    Lookup,
    OutsideRegion,
    Permutation,
)
from .mock_prover import MockProver

__all__ = [
    "MockProver",
    "CellNotAssigned",
    "ConstraintNotSatisfied",
    "InRegion",
    "Lookup",
    "OutsideRegion",
    "Permutation",
]
