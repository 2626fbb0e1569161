"""Experiment 16 tests — mirror reference src/circuits/overflow_check_v2.rs:63-91."""

from halo2_tpu.circuits.overflow_check_v2 import OverflowCheckCircuitV2
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fr as Fp
from halo2_tpu.plonkish import Value


def test_none_overflow_case():
    k = 5
    a = Value.known(Fp.from_u64((1 << 16) - 2))
    b = Value.known(Fp.from_u64(1))
    circuit = OverflowCheckCircuitV2(Fp, a, b)
    prover = MockProver.run(k, circuit, [[]], F=Fp)
    prover.assert_satisfied()


def test_overflow_case():
    k = 5
    a = Value.known(Fp.from_u64((1 << 16) - 2))
    b = Value.known(Fp.from_u64(3))
    circuit = OverflowCheckCircuitV2(Fp, a, b)
    invalid_prover = MockProver.run(k, circuit, [[]], F=Fp)
    assert invalid_prover.verify() != []
