"""Experiment 13 tests — mirrors reference src/circuits/add_carry_v1.rs:75-120,
including the EXACT structured permutation-failure assertion."""

from halo2_tpu.circuits.add_carry_v1 import AddCarryCircuit
from halo2_tpu.dev import InRegion, MockProver, OutsideRegion, Permutation
from halo2_tpu.field import Fr as Fp
from halo2_tpu.plonkish import Value


def test_carry_1():
    k = 4
    a = [Value.known(Fp.from_u64((1 << 16) - 1)), Value.known(Fp.from_u64(1))]
    public_inputs = [Fp.from_u64(1), Fp.from_u64(0)]
    circuit = AddCarryCircuit(Fp, a)
    prover = MockProver.run(k, circuit, [public_inputs], F=Fp)
    prover.assert_satisfied()
    assert prover.verify() == []


def test_carry_2():
    k = 4
    # a[1] == 2 causes a low-limb carry: result is (1, 1), publics say (1, 0)
    a = [Value.known(Fp.from_u64((1 << 16) - 1)), Value.known(Fp.from_u64(2))]
    circuit = AddCarryCircuit(Fp, a)

    invalid_prover = MockProver.run(k, circuit, [[Fp.from_u64(1), Fp.from_u64(0)]], F=Fp)
    assert invalid_prover.verify() == [
        Permutation(
            column=("advice", 2),
            location=InRegion(
                region_index=2, region_name="adivce row for accumulating", offset=1
            ),
        ),
        Permutation(column=("instance", 0), location=OutsideRegion(row=1)),
    ]

    valid_prover = MockProver.run(k, circuit, [[Fp.from_u64(1), Fp.from_u64(1)]], F=Fp)
    valid_prover.assert_satisfied()
