"""L6 polynomial-engine tests: NTT vs host naive evaluation."""

import random

from halo2_tpu.field import BN254_FR, get_device_field
from halo2_tpu.poly import get_domain


def test_ntt_roundtrip_and_values():
    k = 5
    n = 1 << k
    spec = BN254_FR
    p = spec.p
    dom = get_domain(spec, k, 4)
    df = get_device_field(spec)

    rng = random.Random(7)
    coeffs = [rng.randrange(p) for _ in range(n)]
    ca = df.encode(coeffs)

    evals = dom.coeff_to_lagrange(ca)
    got = [int(v) for v in df.decode(evals)]
    # naive evaluation at omega^i
    for i in [0, 1, 5, n - 1]:
        x = pow(dom.omega, i, p)
        expect = 0
        for c in reversed(coeffs):
            expect = (expect * x + c) % p
        assert got[i] == expect

    back = dom.lagrange_to_coeff(evals)
    assert [int(v) for v in df.decode(back)] == coeffs


def test_extended_coset_roundtrip():
    k = 4
    spec = BN254_FR
    p = spec.p
    dom = get_domain(spec, k, 5)
    df = get_device_field(spec)
    rng = random.Random(9)
    coeffs = [rng.randrange(p) for _ in range(1 << k)]
    ca = df.encode(coeffs)

    ext = dom.coeff_to_extended(ca)
    got = [int(v) for v in df.decode(ext)]
    # check a couple of points: x = g_coset * ext_omega^i
    for i in [0, 3]:
        x = dom.g_coset * pow(dom.extended_omega, i, p) % p
        expect = 0
        for c in reversed(coeffs):
            expect = (expect * x + c) % p
        assert got[i] == expect

    back = dom.extended_to_coeff(ext)
    dec = [int(v) for v in df.decode(back)]
    assert dec[: 1 << k] == coeffs
    assert all(v == 0 for v in dec[1 << k :])


def test_lagrange_helpers():
    spec = BN254_FR
    dom = get_domain(spec, 3, 4)
    p = spec.p
    x = 12345678901234567
    vals = [3, 1, 4, 1, 5]
    # interpolation evaluated naively
    expect = 0
    for i, v in enumerate(vals):
        expect = (expect + v * dom.l_i(i, x)) % p
    assert dom.eval_lagrange_interp(vals, x) == expect
    # l_i at domain points is an indicator
    assert dom.l_i(2, pow(dom.omega, 2, p)) == 1
    assert dom.l_i(2, pow(dom.omega, 3, p)) == 0
