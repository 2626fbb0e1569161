"""Experiments 1+2 tests — mirror reference src/circuits/inclusion_check*.rs."""

from halo2_tpu.circuits.inclusion_check import InclusionCheckCircuit
from halo2_tpu.circuits.inclusion_check_v2 import InclusionCheckV2Circuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fp
from halo2_tpu.plonkish import Value


def _table():
    usernames = [Value.known(Fp.from_u64(i)) for i in range(10)]
    balances = [Value.known(Fp.from_u64(i) * Fp.from_u64(2)) for i in range(10)]
    return usernames, balances


def test_inclusion_check_1():
    k = 4
    usernames, balances = _table()
    circuit = InclusionCheckCircuit(Fp, usernames, balances, inclusion_index=7)

    # Test 1 - valid entry at the inclusion index
    prover = MockProver.run(k, circuit, [[Fp.from_u64(7), Fp.from_u64(14)]], F=Fp)
    prover.assert_satisfied()

    # Test 2 - existing entry but not at the inclusion index
    prover = MockProver.run(k, circuit, [[Fp.from_u64(8), Fp.from_u64(16)]], F=Fp)
    assert prover.verify() != []

    # Test 3 - non-existing entry
    prover = MockProver.run(k, circuit, [[Fp.from_u64(10), Fp.from_u64(20)]], F=Fp)
    assert prover.verify() != []


def test_inclusion_check_2():
    k = 5
    usernames, balances = _table()
    circuit = InclusionCheckV2Circuit(
        Fp, usernames, balances, inclusion_index=7, constant=Fp.from_u64(0)
    )

    prover = MockProver.run(k, circuit, [[Fp.from_u64(7), Fp.from_u64(14)]], F=Fp)
    prover.assert_satisfied()

    prover = MockProver.run(k, circuit, [[Fp.from_u64(8), Fp.from_u64(16)]], F=Fp)
    assert prover.verify() != []

    prover = MockProver.run(k, circuit, [[Fp.from_u64(10), Fp.from_u64(20)]], F=Fp)
    assert prover.verify() != []
