"""CircuitLayout rendering goldens — the reference's 6 `print_*` tests
(src/circuits/{inclusion_check,merkle_v1,merkle_v2,merkle_v3,poseidon,
merkle_sum_tree}.rs render to prints/*.png).  Here each renders to a
deterministic SVG compared byte-exactly against a committed golden in
`prints/` — a stronger check than the reference's eyeball-a-PNG."""

import os

import pytest

from halo2_tpu.dev.layout import CircuitLayout
from halo2_tpu.field import Fp
from halo2_tpu.plonkish import Value
from halo2_tpu.poseidon import MySpec

PRINTS = os.path.join(os.path.dirname(__file__), "..", "prints")
BLESS = os.environ.get("HALO2_TPU_BLESS_GOLDENS") == "1"


def _check(name: str, k: int, circuit, title: str):
    os.makedirs(PRINTS, exist_ok=True)
    golden_path = os.path.join(PRINTS, name)
    svg = CircuitLayout().render(k, circuit, None, F=Fp, title=title)
    if BLESS or not os.path.exists(golden_path):
        with open(golden_path, "w") as f:
            f.write(svg)
        if BLESS:
            return
        pytest.skip(f"golden {name} created; re-run to compare")
    with open(golden_path) as f:
        assert svg == f.read(), f"layout drift vs committed golden {name}"


def test_print_inclusion_check():
    from halo2_tpu.circuits.inclusion_check import InclusionCheckCircuit

    circuit = InclusionCheckCircuit(
        Fp,
        [Value.known(Fp.zero())] * 10,
        [Value.known(Fp.zero())] * 10,
        2,
    )
    _check("inclusion-check-1-layout.svg", 3, circuit, "Inclusion Check 1 Layout")


def test_print_merkle_tree_1():
    from halo2_tpu.circuits.merkle_v1 import MerkleTreeV1Circuit

    z = Value.known(Fp.zero())
    circuit = MerkleTreeV1Circuit(Fp, z, [z] * 5, [z] * 5)
    _check("merkle-tree-1-layout.svg", 4, circuit, "Merkle Tree 1 Layout")


def test_print_merkle_tree_2():
    from halo2_tpu.circuits.merkle_v2 import MerkleTreeV2Circuit

    z = Value.known(Fp.zero())
    circuit = MerkleTreeV2Circuit(Fp, z, [z] * 5, [z] * 5)
    _check("merkle-tree-2-layout.svg", 4, circuit, "Merkle Tree 2 Layout")


def test_print_merkle_tree_3():
    from halo2_tpu.circuits.merkle_v3 import MerkleTreeV3Circuit

    z = Value.known(Fp.zero())
    circuit = MerkleTreeV3Circuit(Fp, z, [z] * 5, [z] * 5)
    _check("merkle-tree-3-layout.svg", 8, circuit, "Merkle Tree 3 Layout")


def test_print_poseidon():
    from halo2_tpu.circuits.poseidon import PoseidonCircuit

    L = 4
    circuit = PoseidonCircuit(
        Fp, MySpec(5, 4), L, [Value.known(Fp.zero())] * L, Value.known(Fp.zero())
    )
    _check("poseidon-layout.svg", 7, circuit, "Poseidon Layout")


def test_print_merkle_sum_tree():
    from halo2_tpu.circuits.merkle_sum_tree import MerkleSumTreeCircuit

    z = Fp.zero()
    circuit = MerkleSumTreeCircuit(Fp, z, z, [z] * 4, [z] * 4, [z] * 4, z)
    _check("merkle-sum-tree-layout.svg", 8, circuit, "Merkle Sum Tree Layout")
