"""Experiment 15 tests — mirror reference src/circuits/overflow_check.rs:69-115."""

import pytest

from halo2_tpu.circuits.overflow_check import OverflowCheckCircuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fr as Fp
from halo2_tpu.plonkish import Value


def test_none_overflow_case():
    k = 4
    a = Value.known(Fp.from_u64((1 << 16) + 3))
    public_inputs = [
        Fp.from_u64(0),
        Fp.from_u64((1 << 16) - 2),
        Fp.from_u64(0),  # 2^32 <- 0 means not overflowed
        Fp.from_u64(2),  # 2^16
        Fp.from_u64(1),  # 2^0
    ]
    circuit = OverflowCheckCircuit(Fp, a)
    prover = MockProver.run(k, circuit, [public_inputs], F=Fp)
    prover.assert_satisfied()
    assert prover.verify() == []


def test_overflow_case():
    k = 4
    a = Value.known(Fp.from_u64((1 << 32) + 2))
    public_inputs = [
        Fp.from_u64(0),
        Fp.from_u64((1 << 16) - 1),
        Fp.from_u64(1),  # 2^32 <- non-zero means overflowed
        Fp.from_u64(1),  # 2^16
        Fp.from_u64(1),  # 2^0
    ]
    circuit = OverflowCheckCircuit(Fp, a)
    prover = MockProver.run(k, circuit, [public_inputs], F=Fp)
    # mirrors `panic::catch_unwind(|| prover.assert_satisfied())`
    with pytest.raises(AssertionError):
        prover.assert_satisfied()
