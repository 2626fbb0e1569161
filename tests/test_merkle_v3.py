"""Experiment 8 test — mirrors reference src/circuits/merkle_v3.rs:90-127."""

from halo2_tpu.circuits.merkle_v3 import MerkleTreeV3Circuit, compute_merkle_root
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fp
from halo2_tpu.plonkish import Value


def test_merkle_tree_3():
    leaf = 99
    elements = [1, 5, 6, 9, 9]
    indices = [0, 0, 0, 0, 0]

    root = compute_merkle_root(Fp, leaf, elements, indices)

    circuit = MerkleTreeV3Circuit(
        Fp,
        Value.known(Fp.from_u64(leaf)),
        [Value.known(Fp.from_u64(x)) for x in elements],
        [Value.known(Fp.from_u64(x)) for x in indices],
    )

    valid_prover = MockProver.run(10, circuit, [[Fp.from_u64(leaf), root]], F=Fp)
    valid_prover.assert_satisfied()

    invalid_prover = MockProver.run(
        10, circuit, [[Fp.from_u64(leaf), Fp.from_u64(0)]], F=Fp
    )
    assert invalid_prover.verify() != []
