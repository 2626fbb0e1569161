"""Experiments 5+6 tests — mirror reference src/circuits/merkle_v{1,2}.rs."""

from halo2_tpu.circuits.merkle_v1 import MerkleTreeV1Circuit
from halo2_tpu.circuits.merkle_v2 import MerkleTreeV2Circuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fp
from halo2_tpu.plonkish import Value


def _witness():
    leaf = 99
    elements = [1, 5, 6, 9, 9]
    indices = [0, 0, 0, 0, 0]
    digest = leaf + sum(elements)
    return (
        Value.known(Fp.from_u64(leaf)),
        [Value.known(Fp.from_u64(x)) for x in elements],
        [Value.known(Fp.from_u64(x)) for x in indices],
        [Fp.from_u64(leaf), Fp.from_u64(digest)],
    )


def test_merkle_tree_1():
    leaf, elements, indices, public_input = _witness()
    circuit = MerkleTreeV1Circuit(Fp, leaf, elements, indices)
    prover = MockProver.run(10, circuit, [public_input], F=Fp)
    prover.assert_satisfied()

    # tampered root must fail
    bad = [public_input[0], public_input[1] + Fp.one()]
    prover = MockProver.run(10, circuit, [bad], F=Fp)
    assert prover.verify() != []


def test_merkle_tree_2():
    leaf, elements, indices, public_input = _witness()
    circuit = MerkleTreeV2Circuit(Fp, leaf, elements, indices)
    prover = MockProver.run(10, circuit, [public_input], F=Fp)
    prover.assert_satisfied()

    bad = [public_input[0], public_input[1] + Fp.one()]
    prover = MockProver.run(10, circuit, [bad], F=Fp)
    assert prover.verify() != []
