"""Experiments 9-11 tests — mirror reference src/circuits/less_than*.rs."""

from halo2_tpu.circuits.less_than import LessThanCircuit
from halo2_tpu.circuits.less_than_v2 import LessThanV2Circuit
from halo2_tpu.circuits.less_than_v3 import LessThanV3Circuit
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fp, Fr
from halo2_tpu.plonkish import Value


def test_less_than():
    """Reference src/circuits/less_than.rs:48-80 (dynamic lookup, pasta Fp)."""
    k = 10
    circuit = LessThanCircuit(Fp, Value.known(Fp.from_u64(755)))

    pub_inputs = [Fp.from_u64(i) for i in range(800)]
    prover = MockProver.run(k, circuit, [pub_inputs], F=Fp)
    prover.assert_satisfied()

    pub_inputs_2 = [Fp.from_u64(i) for i in range(754)]
    invalid_prover = MockProver.run(k, circuit, [pub_inputs_2], F=Fp)
    assert invalid_prover.verify() != []


def test_less_than_2():
    """Reference src/circuits/less_than_v2.rs:119-152 (bn254 Fr)."""
    k = 9
    circuit = LessThanV2Circuit(Fr, value_l=5, value_r=10, check=True)
    prover = MockProver.run(k, circuit, [], F=Fr)
    prover.assert_satisfied()

    circuit = LessThanV2Circuit(Fr, value_l=10, value_r=5, check=True)
    prover = MockProver.run(k, circuit, [], F=Fr)
    assert prover.verify() != []

    # check=false is VALID in v2 (check is a free witness)
    circuit = LessThanV2Circuit(Fr, value_l=10, value_r=5, check=False)
    prover = MockProver.run(k, circuit, [], F=Fr)
    prover.assert_satisfied()


def test_less_than_3():
    """Reference src/circuits/less_than_v3.rs:130-166 (bn254 Fr)."""
    k = 9
    public_input = [Fr.from_u64(10)]

    circuit = LessThanV3Circuit(Fr, value_l=5, value_r=10, check=True)
    prover = MockProver.run(k, circuit, [public_input], F=Fr)
    prover.assert_satisfied()

    circuit = LessThanV3Circuit(Fr, value_l=10, value_r=5, check=True)
    prover = MockProver.run(k, circuit, [public_input], F=Fr)
    assert prover.verify() != []

    # check=false now fails — check is pinned to 1 in synthesize
    circuit = LessThanV3Circuit(Fr, value_l=10, value_r=5, check=False)
    prover = MockProver.run(k, circuit, [public_input], F=Fr)
    assert prover.verify() != []
