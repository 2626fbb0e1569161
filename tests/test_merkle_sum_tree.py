"""Experiment 12 mock tests — mirror reference src/circuits/merkle_sum_tree.rs:214-343.

All 7 mock scenarios: valid, bad root hash, bad leaf hash, bad leaf balance,
non-binary index, swapped index, liabilities >= assets.
(test_full_prover lives in tests/test_kzg.py once the KZG backend lands.)
"""


from halo2_tpu.circuits.merkle_sum_tree import (
    MerkleSumTreeCircuit,
    Node,
    compute_merkle_sum_root,
)
from halo2_tpu.dev import MockProver
from halo2_tpu.field import Fr as Fp


def build_merkle_tree():
    leaf = Node(Fp.from_u64(10), Fp.from_u64(100))
    elements = [
        Node(Fp.from_u64(1), Fp.from_u64(10)),
        Node(Fp.from_u64(5), Fp.from_u64(50)),
        Node(Fp.from_u64(6), Fp.from_u64(60)),
        Node(Fp.from_u64(9), Fp.from_u64(90)),
        Node(Fp.from_u64(9), Fp.from_u64(90)),
    ]
    indices = [Fp.from_u64(0)] * 5
    root = compute_merkle_sum_root(Fp, leaf, elements, indices)
    return leaf, elements, indices, root


def instantiate_circuit(leaf, elements, indices, assets_sum):
    return MerkleSumTreeCircuit(
        Fp,
        leaf.hash,
        leaf.balance,
        [n.hash for n in elements],
        [n.balance for n in elements],
        indices,
        assets_sum,
    )


def test_valid_merkle_sum_tree():
    leaf, elements, indices, root = build_merkle_tree()
    assets_sum = Fp.from_u64(500)  # greater than liabilities sum (400)
    public_input = [leaf.hash, leaf.balance, root.hash, assets_sum]
    circuit = instantiate_circuit(leaf, elements, indices, assets_sum)
    MockProver.run(10, circuit, [public_input], F=Fp).assert_satisfied()


def test_invalid_root_hash():
    leaf, elements, indices, root = build_merkle_tree()
    assets_sum = Fp.from_u64(500)
    public_input = [leaf.hash, leaf.balance, Fp.from_u64(1000), assets_sum]
    circuit = instantiate_circuit(leaf, elements, indices, assets_sum)
    assert MockProver.run(10, circuit, [public_input], F=Fp).verify() != []


def test_invalid_leaf_hash():
    leaf, elements, indices, root = build_merkle_tree()
    assets_sum = Fp.from_u64(500)
    public_input = [Fp.from_u64(1000), leaf.balance, root.hash, assets_sum]
    circuit = instantiate_circuit(leaf, elements, indices, assets_sum)
    assert MockProver.run(10, circuit, [public_input], F=Fp).verify() != []


def test_invalid_leaf_balance():
    leaf, elements, indices, root = build_merkle_tree()
    assets_sum = Fp.from_u64(500)
    public_input = [leaf.hash, Fp.from_u64(1000), root.hash, assets_sum]
    circuit = instantiate_circuit(leaf, elements, indices, assets_sum)
    assert MockProver.run(10, circuit, [public_input], F=Fp).verify() != []


def test_non_binary_index():
    leaf, elements, indices, root = build_merkle_tree()
    assets_sum = Fp.from_u64(500)
    public_input = [leaf.hash, leaf.balance, root.hash, assets_sum]
    indices = [Fp.from_u64(2)] + indices[1:]
    circuit = instantiate_circuit(leaf, elements, indices, assets_sum)
    failures = MockProver.run(10, circuit, [public_input], F=Fp).verify()
    # bool + swap constraints must both appear
    names = {getattr(f, "gate_name", None) for f in failures}
    assert "bool constraint" in names and "swap constraint" in names


def test_swapping_index():
    leaf, elements, indices, root = build_merkle_tree()
    assets_sum = Fp.from_u64(500)
    public_input = [leaf.hash, leaf.balance, root.hash, assets_sum]
    indices = [Fp.from_u64(1)] + indices[1:]
    circuit = instantiate_circuit(leaf, elements, indices, assets_sum)
    assert MockProver.run(10, circuit, [public_input], F=Fp).verify() != []


def test_is_not_less_than():
    leaf, elements, indices, root = build_merkle_tree()
    assets_sum = Fp.from_u64(200)  # less than liabilities sum (400)
    public_input = [leaf.hash, leaf.balance, root.hash, assets_sum]
    circuit = instantiate_circuit(leaf, elements, indices, assets_sum)
    failures = MockProver.run(10, circuit, [public_input], F=Fp).verify()
    assert failures != []
