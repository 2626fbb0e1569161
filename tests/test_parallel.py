"""L9 multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the sharded MSM / distributed NTT / sharded prove step are
bit-identical to their single-chip counterparts (which are themselves pinned
against the reference's semantics by the other test files).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.ec import host as ec
from halo2_tpu.ec.device import df as dfq, jac_to_affine
from halo2_tpu.field.device import get_device_field
from halo2_tpu.field.params import BN254_FR
from halo2_tpu.parallel import make_mesh, sharded_msm, sharded_ntt
from halo2_tpu.poly.domain import _ntt_fn


def _random_points(n, seed=1):
    rng = random.Random(seed)
    pts = [ec.ec_mul(ec.G1, rng.randrange(1, ec.R)) for _ in range(n)]
    xs = [ec.g1_to_ints(p)[0] for p in pts]
    ys = [ec.g1_to_ints(p)[1] for p in pts]
    d = dfq()
    return pts, d.encode(xs), d.encode(ys)


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 2, "sp": 4}


def test_sharded_prefix_product_matches_host():
    import random

    from halo2_tpu.parallel import grand_product_z

    n = 1 << 9
    rng = random.Random(21)
    dfr = get_device_field(BN254_FR)
    p = BN254_FR.p
    nums = [rng.randrange(1, p) for _ in range(n)]
    dens = [rng.randrange(1, p) for _ in range(n)]
    mesh = make_mesh(8)
    z = grand_product_z(mesh, BN254_FR, dfr.encode(nums), dfr.encode(dens))
    z_host = [1] * n
    for r in range(n - 1):
        z_host[r + 1] = z_host[r] * nums[r] % p * pow(dens[r], -1, p) % p
    assert [int(v) for v in dfr.decode(z)] == z_host


def test_sharded_msm_matches_single_chip():
    n = 32
    rng = random.Random(7)
    pts, px, py = _random_points(n)
    scalars = [rng.randrange(ec.R) for _ in range(n)]
    dfr = get_device_field(BN254_FR)
    sc = dfr.encode(scalars, to_mont=False)

    mesh = make_mesh(8)
    got = sharded_msm(mesh, px, py, sc)
    gx, gy = jac_to_affine(got)

    # host oracle (single-chip msm() equality is pinned in test_ec — not
    # recompiling a second full Pippenger module here keeps this file fast)
    acc = None
    for p, s in zip(pts, scalars):
        acc = ec.ec_add(acc, ec.ec_mul(p, s)) if acc else ec.ec_mul(p, s)
    hx, hy = ec.g1_to_ints(acc)
    assert int(dfq().decode(gx)) == hx
    assert int(dfq().decode(gy)) == hy


@pytest.mark.parametrize("inverse", [False, True])
def test_sharded_ntt_matches_single_chip(inverse):
    n = 256
    rng = random.Random(11)
    dfr = get_device_field(BN254_FR)
    vals = [rng.randrange(BN254_FR.p) for _ in range(n)]
    x = dfr.encode(vals)
    mesh = make_mesh(8)
    got = sharded_ntt(mesh, BN254_FR, x, inverse=inverse)
    want = _ntt_fn(BN254_FR, n, inverse)(x)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_sharded_prove_step_flagship():
    """Full sharded prove step on the flagship circuit (tiny: depth 2, k=9).

    Marked slow: ~3.5 min of XLA:CPU compile for coverage the driver's
    ``dryrun_multichip`` exercises on every round anyway.  Run with
    ``pytest -m slow`` (scripts/ci.sh stage 2).
    """
    from halo2_tpu.circuits.merkle_sum_tree import (
        MerkleSumTreeCircuit,
        Node,
        compute_merkle_sum_root,
    )
    from halo2_tpu.field import Fr
    from halo2_tpu.parallel import build_sharded_prove_step
    from halo2_tpu.plonkish.assignment import run_synthesis
    from halo2_tpu.plonkish.evaluator import encode_columns

    leaf = Node(Fr.from_u64(10), Fr.from_u64(100))
    elements = [
        Node(Fr.from_u64(1), Fr.from_u64(10)),
        Node(Fr.from_u64(5), Fr.from_u64(50)),
    ]
    indices = [Fr.from_u64(0), Fr.from_u64(0)]
    root = compute_merkle_sum_root(Fr, leaf, elements, indices)
    assets = Fr.from_u64(500)
    circuit = MerkleSumTreeCircuit(
        Fr,
        leaf.hash,
        leaf.balance,
        [e.hash for e in elements],
        [e.balance for e in elements],
        indices,
        assets,
    )
    public = [leaf.hash, leaf.balance, root.hash, assets]

    k = 9
    cs, _cfg, assignment = run_synthesis(circuit, k, [public], witness=True, field=Fr)
    fin = assignment.finalize()
    dfr = get_device_field(BN254_FR)
    columns = encode_columns(dfr, fin)
    n = 1 << k

    _pts, px, py = _random_points(16)
    mesh = make_mesh(8)
    step = build_sharded_prove_step(mesh, cs, BN254_FR, 16)
    violations, coeffs, commitments, z = step(columns, px, py)
    assert int(jnp.sum(violations)) == 0
    n_adv = columns["advice"].shape[0]
    assert coeffs.shape == (n_adv, 16, n)
    assert commitments["x"].shape == (n_adv, 16)
    assert z.shape == (16, n)


@pytest.mark.slow
def test_sharded_create_proof_proof_bytes():
    """create_proof(mesh=...) == single-chip proof bytes (pinned rng).

    The production multi-chip prover path (kzg/engine.ShardedEngine);
    also exercised by __graft_entry__.dryrun_multichip.  Slow tier: the
    sharded quotient + NTT + MSM programs cost minutes of XLA:CPU compile."""
    import random

    from halo2_tpu.circuits.hash_v1 import Hash1Circuit
    from halo2_tpu.field import Fr
    from halo2_tpu.kzg import ParamsKZG, create_proof, keygen, verify_proof
    from halo2_tpu.plonkish import Value

    k = 4
    params = ParamsKZG.setup_cached(k)
    circuit = Hash1Circuit(Fr, Value.known(Fr.from_u64(2)))
    pk = keygen(params, circuit, k, Fr)
    public = [Fr.from_u64(4)]
    mesh = make_mesh(8)
    p1 = create_proof(params, pk, circuit, [list(public)], rng=random.Random(11))
    p2 = create_proof(
        params, pk, circuit, [list(public)], rng=random.Random(11), mesh=mesh
    )
    assert p1 == p2
    assert verify_proof(params.verifier_params(), pk.vk, p2, [list(public)])


@pytest.mark.slow
def test_sharded_create_proof_lookup_circuit_proof_bytes():
    """Sharded proof bytes == single-chip on a LOOKUP-BEARING circuit.

    less_than_v2 at k=9 drives the zkevm LtChip (u8 range lookup): the
    ShardedEngine's lookup grand products, lookup-bearing quotient terms and
    permutation chunks must be byte-identical to single-chip under a pinned
    rng (round-4 VERDICT item 5 — hash_v1 alone never exercised lookups).
    Reference lookup surface: src/chips/less_than.rs:46-53,
    src/chips/merkle_sum_tree.rs:306-355."""
    import random

    from halo2_tpu.circuits.less_than_v2 import LessThanV2Circuit
    from halo2_tpu.field import Fr
    from halo2_tpu.kzg import ParamsKZG, create_proof, keygen, verify_proof

    k = 9
    params = ParamsKZG.setup_cached(k)
    circuit = LessThanV2Circuit(Fr, value_l=5, value_r=10, check=True)
    pk = keygen(params, circuit, k, Fr)
    mesh = make_mesh(8)
    p1 = create_proof(params, pk, circuit, [[]], rng=random.Random(13))
    p2 = create_proof(params, pk, circuit, [[]], rng=random.Random(13), mesh=mesh)
    assert p1 == p2
    assert verify_proof(params.verifier_params(), pk.vk, p2, [[]])
