"""Native C++ host engine (halo2_tpu/native) — bit-exactness vs the host
oracles and the device path, plus engine-equality of full proof bytes.

The native engine replaces the Rust crates' host compute (halo2curves MSM /
halo2_proofs poly ops behind reference src/circuits/utils.rs:40-48) for
domains where XLA program setup dominates (NOTES_ROUND4.md)."""

import random

import pytest

from halo2_tpu import native
from halo2_tpu.ec import host as ec
from halo2_tpu.field import BN254_FR
from halo2_tpu.field.device import get_device_field

P = BN254_FR.p

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native engine"
)


def test_native_mont_roundtrip_and_inv():
    rng = random.Random(1)
    vals = [0, 1, P - 1] + [rng.randrange(P) for _ in range(50)]
    R = 1 << 256
    mont = native.pack_ints([v * R % P for v in vals])
    assert native.unpack_ints(native.from_mont(mont, "fr")) == vals

    inv = native.batch_inv_fr(native.pack_ints(vals))
    want = [pow(v, -1, P) if v else 0 for v in vals]
    assert native.unpack_ints(inv) == want


def test_native_msm_vs_host_oracle():
    n = 100
    rng = random.Random(2)
    from halo2_tpu.field.params import BN254_FQ
    q = BN254_FQ.p
    R = 1 << 256
    exps = [rng.randrange(1, ec.R) for _ in range(n)]
    scalars = [0, 1] + [rng.randrange(ec.R) for _ in range(n - 2)]
    pts = [ec.ec_mul(ec.G1, a) for a in exps]
    want = ec.g1_to_ints(
        ec.ec_mul(ec.G1, sum(s * a for s, a in zip(scalars, exps)) % ec.R)
    )
    px = native.pack_ints([ec.g1_to_ints(pt)[0] * R % q for pt in pts])
    py = native.pack_ints([ec.g1_to_ints(pt)[1] * R % q for pt in pts])
    got = native.msm_g1_mont(px, py, native.pack_ints(scalars))
    assert got == want

    # batch form over shared points
    sb = native.pack_ints(scalars).reshape(1, n, 4).repeat(2, axis=0)
    assert native.msm_g1_mont_batch(px, py, sb) == [want, want]


def test_native_ntt_matches_device_domain():
    from halo2_tpu.poly.domain import _ntt_fn

    dfr = get_device_field(BN254_FR)
    rng = random.Random(3)
    m = 128
    vals = [rng.randrange(P) for _ in range(m)]
    for inverse in (False, True):
        dev = _ntt_fn(BN254_FR, m, inverse)(dfr.encode(vals))
        want = [int(v) for v in dfr.decode(dev)]
        got = native.unpack_ints(native.ntt_fr(native.pack_ints(vals), inverse))
        assert got == want


def test_native_grand_product_and_eval():
    rng = random.Random(4)
    u = 40
    num = [rng.randrange(1, P) for _ in range(u)]
    den = [rng.randrange(1, P) for _ in range(u)]
    z = native.unpack_ints(
        native.grand_product_fr(native.pack_ints(num), native.pack_ints(den), 5)
    )
    want = [5]
    for r in range(u):
        want.append(want[-1] * num[r] % P * pow(den[r], -1, P) % P)
    assert z == want

    poly = [rng.randrange(P) for _ in range(33)]
    xs = [rng.randrange(P) for _ in range(3)]
    got = native.poly_eval_fr(native.pack_ints(poly), xs)
    assert got == [sum(c * pow(x, i, P) for i, c in enumerate(poly)) % P for x in xs]


def test_native_expr_eval_matches_program():
    """The native expression VM == the device instruction VM on random data."""
    import numpy as np

    from halo2_tpu.plonkish.column import Column, ColumnKind, Rotation
    from halo2_tpu.plonkish.expression import Constant, Query
    from halo2_tpu.plonkish.evaluator import Program, _run_program

    rng = random.Random(5)
    n = 64
    a = Query(Column(ColumnKind.ADVICE, 0), Rotation(0))
    b = Query(Column(ColumnKind.ADVICE, 1), Rotation(1))
    f = Query(Column(ColumnKind.FIXED, 0), Rotation(-1))
    expr = (a * b + Constant(7)) * f - a * a * Constant(3) + b

    cols = {
        "advice": [[rng.randrange(P) for _ in range(n)] for _ in range(2)],
        "fixed": [[rng.randrange(P) for _ in range(n)]],
        "instance": [],
        "selector": [],
    }
    prog = Program([expr])
    # device VM
    import jax.numpy as jnp

    dfr = get_device_field(BN254_FR)
    dev_cols = {
        k: (jnp.stack([dfr.encode(c) for c in v]) if v else jnp.zeros((0, 16, n), jnp.uint32))
        for k, v in cols.items()
    }
    want = [int(x) for x in dfr.decode(_run_program(prog, dfr, dev_cols)[0])]
    # native VM
    rows = []
    for kind, ci, rot in prog.queries:
        arr = native.pack_ints(cols[kind][ci])
        rows.append(np.roll(arr, -rot, axis=0) if rot else arr)
    for v in prog.consts:
        rows.append(np.broadcast_to(native.pack_ints([v % P]), (n, 4)).copy())
    base = np.stack(rows)
    nq_c = base.shape[0]
    instrs = np.array(
        [(op, s1, s2, nq_c + i) for i, (op, s1, s2) in enumerate(prog.instrs)],
        np.int32,
    )
    got = native.unpack_ints(
        native.expr_eval_fr(base, instrs, prog.output_slots(), n)[0]
    )
    assert got == want


def test_engine_proof_bytes_identical():
    """NativeEngine and DeviceEngine produce byte-identical proofs."""
    import os

    from halo2_tpu.circuits.hash_v1 import Hash1Circuit
    from halo2_tpu.field import Fr
    from halo2_tpu.kzg import ParamsKZG, create_proof, keygen, verify_proof
    from halo2_tpu.plonkish import Value

    circuit = Hash1Circuit(Fr, Value.known(Fr.from_u64(2)))
    public = [Fr.from_u64(4)]
    params = ParamsKZG.setup_cached(4)
    pk = keygen(params, circuit, 4, Fr)

    old = os.environ.get("HALO2_TPU_PROVER_BACKEND")
    try:
        os.environ["HALO2_TPU_PROVER_BACKEND"] = "native"
        p_native = create_proof(params, pk, circuit, [list(public)], rng=random.Random(9))
        os.environ["HALO2_TPU_PROVER_BACKEND"] = "device"
        p_device = create_proof(params, pk, circuit, [list(public)], rng=random.Random(9))
    finally:
        if old is None:
            os.environ.pop("HALO2_TPU_PROVER_BACKEND", None)
        else:
            os.environ["HALO2_TPU_PROVER_BACKEND"] = old
    assert p_native == p_device
    assert verify_proof(params, pk.vk, p_native, [list(public)])


def _flat_pairs(pairs):
    return [
        ((ec.g1_to_ints(p)[0], ec.g1_to_ints(p)[1]),
         ((g2[0].c[0], g2[0].c[1]), (g2[1].c[0], g2[1].c[1])))
        for p, g2 in pairs
    ]


def test_native_miller_loop_matches_python():
    """Native tower Miller loop == ec/host.py's direct-basis construction,
    coefficient by coefficient (no final exponentiation)."""
    rng = random.Random(5)
    for _ in range(2):
        a, b = rng.randrange(1, ec.R), rng.randrange(1, ec.R)
        p1 = ec.ec_mul(ec.G1, a)
        q2 = ec.ec_mul(ec.G2, b)
        want = ec.miller_loop(ec.twist(q2), ec.cast_g1_to_fq12(p1))
        got = native.miller_loop_direct(
            ec.g1_to_ints(p1),
            ((q2[0].c[0], q2[0].c[1]), (q2[1].c[0], q2[1].c[1])),
        )
        assert got == [c % ec.P for c in want.c]


def test_native_pairing_product_bilinearity():
    """e(aP, bQ) * e(-abP, Q) == 1; tampered scalar fails; infinity skips.
    The exact check shape the KZG verifier runs (kzg/shplonk.py:187;
    reference verify_proof src/circuits/utils.rs:56-63)."""
    a, b = 1234567, 7654321
    p1 = ec.ec_mul(ec.G1, a)
    q2 = ec.ec_mul(ec.G2, b)
    nab = ec.ec_mul(ec.G1, (-(a * b)) % ec.R)
    assert native.pairing_product_is_one(_flat_pairs([(p1, q2), (nab, ec.G2)]))
    bad = ec.ec_mul(ec.G1, ((-(a * b)) + 1) % ec.R)
    assert not native.pairing_product_is_one(_flat_pairs([(p1, q2), (bad, ec.G2)]))
    assert native.pairing_product_is_one(_flat_pairs([(None, ec.G2)]))
    # host dispatcher routes through the same code
    assert ec.pairing_product_is_one([(p1, q2), (nab, ec.G2)])
    assert not ec.pairing_product_is_one([(p1, q2), (bad, ec.G2)])
