from .params import ParamsKZG
from .keygen import ProvingKey, VerifyingKey, keygen
from .prover import create_proof
from .verifier import verify_proof
from .transcript import Blake2bRead, Blake2bWrite

__all__ = [
    "ParamsKZG",
    "ProvingKey",
    "VerifyingKey",
    "keygen",
    "create_proof",
    "verify_proof",
    "Blake2bRead",
    "Blake2bWrite",
]
