"""Experiment 14 test — mirrors reference src/circuits/add_carry_v2.rs:54-68."""

from halo2_tpu.circuits.add_carry_v2 import AddCarryV2Circuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fr as Fp
from halo2_tpu.plonkish import Value


def test_carry_2():
    k = 4
    a = Value.known(Fp.from_u64(1))
    public_inputs = [
        Fp.from_u64(0),
        Fp.from_u64((1 << 16) - 2),
        Fp.from_u64(0),
        Fp.from_u64((1 << 16) - 1),
    ]
    circuit = AddCarryV2Circuit(Fp, a)
    prover = MockProver.run(k, circuit, [public_inputs], F=Fp)
    prover.assert_satisfied()
    assert prover.verify() == []
