"""Experiment 17 tests — mirror reference src/circuits/safe_accumulator.rs:99-190."""

from halo2_tpu.circuits.safe_accumulator import SafeAccumulatorCircuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fr as Fp
from halo2_tpu.plonkish import Value


def K(v):
    return Value.known(Fp.from_u64(v))


def test_none_overflow_case():
    k = 8
    values = [K(4)]
    accumulated_value = [K(0), K(0), K((1 << 4) - 2), K((1 << 4) - 3)]  # 0x0 0x0 0xe 0xd
    result_accumulated = [
        Fp.from_u64(0),
        Fp.from_u64(0),
        Fp.from_u64((1 << 4) - 1),  # 0xf
        Fp.from_u64(1),             # 0x1
    ]
    circuit = SafeAccumulatorCircuit(Fp, values, accumulated_value)
    prover = MockProver.run(k, circuit, [result_accumulated], F=Fp)
    prover.assert_satisfied()


def test_none_overflow_case_with_multiple_values():
    k = 8
    values = [K(1), K(3)]
    accumulated_value = [K(0), K(0), K((1 << 4) - 2), K((1 << 4) - 3)]
    result_accumulated = [
        Fp.from_u64(0),
        Fp.from_u64(0),
        Fp.from_u64((1 << 4) - 1),
        Fp.from_u64(1),
    ]
    circuit = SafeAccumulatorCircuit(Fp, values, accumulated_value)
    prover = MockProver.run(k, circuit, [result_accumulated], F=Fp)
    prover.assert_satisfied()


def test_overflow_case():
    k = 8
    values = [K(4)]
    accumulated_value = [K(0), K((1 << 4) - 1), K((1 << 4) - 1), K((1 << 4) - 3)]
    circuit = SafeAccumulatorCircuit(Fp, values, accumulated_value)
    invalid_prover = MockProver.run(k, circuit, [[]], F=Fp)
    assert invalid_prover.verify() != []


def test_adding_over_range_value():
    k = 8
    invalid_values = [K(16)]
    accumulated_value = [K(0), K(0), K((1 << 4) - 2), K((1 << 4) - 1)]
    circuit = SafeAccumulatorCircuit(Fp, invalid_values, accumulated_value)
    invalid_prover = MockProver.run(k, circuit, [[]], F=Fp)
    assert invalid_prover.verify() != []
