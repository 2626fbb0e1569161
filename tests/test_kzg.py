"""L8 KZG tests: full prove+verify round-trips (reference test_full_prover,
src/circuits/merkle_sum_tree.rs:346-358) plus tamper rejection."""

import random


from halo2_tpu.circuits.hash_v1 import Hash1Circuit
from halo2_tpu.circuits.merkle_sum_tree import (
    MerkleSumTreeCircuit,
    Node,
    compute_merkle_sum_root,
)
from halo2_tpu.circuits.utils import full_prover
from halo2_tpu.field import Fr
from halo2_tpu.kzg import ParamsKZG, keygen, verify_proof
from halo2_tpu.plonkish import Value


def test_kzg_roundtrip_hash_v1():
    circuit = Hash1Circuit(Fr, Value.known(Fr.from_u64(2)))
    proof, ok, _ = full_prover(circuit, 4, [Fr.from_u64(4)], rng=random.Random(42))
    assert ok
    assert len(proof) > 0

    params = ParamsKZG.setup_cached(4)
    pk = keygen(params, circuit, 4, Fr)
    # tampered public input must fail
    assert not verify_proof(params, pk.vk, proof, [[Fr.from_u64(5)]])
    # corrupted proof must fail
    mut = bytearray(proof)
    mut[7] ^= 1
    try:
        bad = verify_proof(params, pk.vk, bytes(mut), [[Fr.from_u64(4)]])
    except Exception:
        bad = False
    assert not bad


def test_full_prover():
    """The reference's only real prove+verify: merkle-sum-tree at k=9."""
    k = 9
    leaf = Node(Fr.from_u64(10), Fr.from_u64(100))
    elements = [
        Node(Fr.from_u64(h), Fr.from_u64(b))
        for h, b in [(1, 10), (5, 50), (6, 60), (9, 90), (9, 90)]
    ]
    indices = [Fr.from_u64(0)] * 5
    root = compute_merkle_sum_root(Fr, leaf, elements, indices)
    assets_sum = Fr.from_u64(500)
    public_input = [leaf.hash, leaf.balance, root.hash, assets_sum]
    circuit = MerkleSumTreeCircuit(
        Fr,
        leaf.hash,
        leaf.balance,
        [n.hash for n in elements],
        [n.balance for n in elements],
        indices,
        assets_sum,
    )
    proof, ok, times = full_prover(circuit, k, public_input, rng=random.Random(7))
    assert ok


def test_keygen_split_matches_fused():
    """keygen_vk + keygen_pk == fused keygen (same commitments/digest), and
    proofs made under either pk verify (halo2's two-entry-point API,
    reference src/circuits/utils.rs:31-36)."""
    import random

    from halo2_tpu.circuits.hash_v1 import Hash1Circuit
    from halo2_tpu.field import Fr
    from halo2_tpu.kzg import (
        ParamsKZG,
        create_proof,
        keygen,
        keygen_pk,
        keygen_vk,
        verify_proof,
    )
    from halo2_tpu.plonkish import Value

    k = 4
    params = ParamsKZG.setup_cached(k)
    circuit = Hash1Circuit(Fr, Value.known(Fr.from_u64(2)))
    vk = keygen_vk(params, circuit, k, Fr)
    pk = keygen_pk(params, vk, circuit, k, Fr)
    pk_fused = keygen(params, circuit, k, Fr)
    assert vk.digest == pk_fused.vk.digest
    assert [p for p in vk.fixed_commitments] == [
        p for p in pk_fused.vk.fixed_commitments
    ]
    public = [Fr.from_u64(4)]
    proof = create_proof(params, pk, circuit, [list(public)], rng=random.Random(3))
    proof2 = create_proof(
        params, pk_fused, circuit, [list(public)], rng=random.Random(3)
    )
    assert proof == proof2
    assert verify_proof(params.verifier_params(), vk, proof, [list(public)])
