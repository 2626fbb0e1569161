"""Experiment 7 test — mirrors reference src/circuits/poseidon.rs:70-99.

WIDTH=5, RATE=4, L=4; digest computed out-of-circuit and passed as the only
public input.  Also cross-checks the grain constants against halo2_gadgets'
published P128Pow5T3 value.
"""

from halo2_tpu.circuits.poseidon import PoseidonCircuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fp
from halo2_tpu.plonkish import Value
from halo2_tpu.poseidon import MySpec, generate_constants, poseidon_hash


def test_grain_matches_halo2_gadgets_p128pow5t3():
    # halo2_gadgets/src/poseidon/primitives/fp.rs ROUND_CONSTANTS[0][0]
    rcs, _, _ = generate_constants(Fp.SPEC, 3, 8, 56)
    assert rcs[0][0] == 0x360D7470611E473D353F628F76D110F34E71162F31003B7057538C2596426303


def test_poseidon():
    WIDTH, RATE, L = 5, 4, 4
    hash_input = [Fp.from_u64(99)] * L
    spec = MySpec(WIDTH, RATE)

    digest = poseidon_hash(Fp, spec, hash_input)

    circuit = PoseidonCircuit(
        Fp, spec, L, [Value.known(x) for x in hash_input], Value.known(digest)
    )
    prover = MockProver.run(7, circuit, [[digest]], F=Fp)
    prover.assert_satisfied()

    # tampered digest must fail
    bad = digest + Fp.one()
    prover = MockProver.run(7, circuit, [[bad]], F=Fp)
    assert prover.verify() != []
