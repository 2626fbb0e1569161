"""Experiment 4 tests — mirrors reference src/circuits/hash_v2.rs:48-63."""

from halo2_tpu.circuits.hash_v2 import Hash2Circuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fp
from halo2_tpu.plonkish import Value


def test_hash_2():
    k = 4
    a = Value.known(Fp.from_u64(2))
    b = Value.known(Fp.from_u64(7))
    circuit = Hash2Circuit(Fp, a, b)

    prover = MockProver.run(k, circuit, [[Fp.from_u64(9)]], F=Fp)
    assert prover.verify() == []

    prover = MockProver.run(k, circuit, [[Fp.from_u64(8)]], F=Fp)
    assert prover.verify() != []
