"""Experiment 3 tests — mirrors reference src/circuits/hash_v1.rs:43-55."""

from halo2_tpu.circuits.hash_v1 import Hash1Circuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fp
from halo2_tpu.plonkish import Value


def test_hash_1():
    k = 4
    a = Value.known(Fp.from_u64(2))
    circuit = Hash1Circuit(Fp, a)

    prover = MockProver.run(k, circuit, [[Fp.from_u64(4)]], F=Fp)
    assert prover.verify() == []
    prover.assert_satisfied()

    prover = MockProver.run(k, circuit, [[Fp.from_u64(8)]], F=Fp)
    assert prover.verify() != []
