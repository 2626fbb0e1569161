"""L0 field-arithmetic tests: device limb engine vs host big-int oracle."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.field import (
    BN254_FQ,
    BN254_FR,
    PASTA_FP,
    Fp,
    Fr,
    get_device_field,
)

SPECS = [PASTA_FP, BN254_FR, BN254_FQ]


def rand_elems(spec, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(spec.p) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_constants(spec):
    assert (spec.r * spec.r_inv) % spec.p == 1
    assert (spec.n0 * spec.p) % (1 << 16) == (1 << 16) - 1
    assert pow(spec.root_of_unity, 1 << spec.two_adicity, spec.p) == 1
    if spec.two_adicity > 0:
        assert pow(spec.root_of_unity, 1 << (spec.two_adicity - 1), spec.p) != 1


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_encode_decode_roundtrip(spec):
    df = get_device_field(spec)
    vals = rand_elems(spec, 33) + [0, 1, spec.p - 1]
    fa = df.encode(vals)
    back = df.decode(fa)
    assert [int(v) for v in back] == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_mul(spec):
    df = get_device_field(spec)
    n = 64
    a = rand_elems(spec, n, seed=1)
    b = rand_elems(spec, n, seed=2)
    fa, fb = df.encode(a), df.encode(b)

    got_add = df.decode(df.add(fa, fb))
    got_sub = df.decode(df.sub(fa, fb))
    got_mul = df.decode(df.mul(fa, fb))
    got_neg = df.decode(df.neg(fa))
    got_sq = df.decode(df.square(fa))
    for i in range(n):
        assert int(got_add[i]) == (a[i] + b[i]) % spec.p
        assert int(got_sub[i]) == (a[i] - b[i]) % spec.p
        assert int(got_mul[i]) == (a[i] * b[i]) % spec.p
        assert int(got_neg[i]) == (-a[i]) % spec.p
        assert int(got_sq[i]) == (a[i] * a[i]) % spec.p


def test_edge_values():
    spec = PASTA_FP
    df = get_device_field(spec)
    edge = [0, 1, 2, spec.p - 1, spec.p - 2, (1 << 255) % spec.p]
    fa = df.encode(edge)
    got = df.decode(df.mul(fa, fa))
    for i, v in enumerate(edge):
        assert int(got[i]) == v * v % spec.p
    # additive identities
    assert [int(v) for v in df.decode(df.add(fa, df.zeros((len(edge),))))] == edge
    one = df.one_mont((len(edge),))
    assert [int(v) for v in df.decode(df.mul(fa, one))] == edge


@pytest.mark.parametrize("spec", [PASTA_FP, BN254_FR], ids=lambda s: s.name)
def test_inv_and_pow(spec):
    df = get_device_field(spec)
    vals = rand_elems(spec, 8, seed=3) + [1, spec.p - 1]
    fa = df.encode(vals)
    inv = df.decode(df.inv(fa))
    for i, v in enumerate(vals):
        assert int(inv[i]) == pow(v, -1, spec.p)
    # inv(0) == 0
    z = df.inv(df.zeros((1,)))
    assert int(df.decode(z)[0]) == 0
    # pow_fixed
    e = 0xDEADBEEF12345
    got = df.decode(df.pow_fixed(fa, e))
    for i, v in enumerate(vals):
        assert int(got[i]) == pow(v, e, spec.p)


def test_from_u32_array():
    df = get_device_field(PASTA_FP)
    v = jnp.asarray(np.array([0, 1, 7, 65535, 123456789], np.uint32))
    got = df.decode(df.from_u32_array(v))
    assert [int(x) for x in got] == [0, 1, 7, 65535, 123456789]


def test_host_field_api():
    a = Fp.from_u64(5)
    b = Fp(7)
    assert int(a * b) == 35
    assert (a - b) + b == a
    assert a.invert() * a == Fp.one()
    assert Fp.zero().is_zero()
    assert Fp.from_repr((Fp.SPEC.p - 1).to_bytes(32, "little")) == Fp(-1)
    assert Fp.from_repr(Fp.SPEC.p.to_bytes(32, "little")) is None
    s = Fr(9).sqrt()
    assert s is not None and s * s == Fr(9)


def test_broadcasting_shapes():
    df = get_device_field(PASTA_FP)
    a = df.encode(rand_elems(PASTA_FP, 6, seed=5)).reshape(16, 2, 3)
    s = df.encode_scalar(12345)[:, None, None]
    out = df.mul(a, s)
    assert out.shape == (16, 2, 3)
    dec = df.decode(out)
    ref = df.decode(a)
    for idx in np.ndindex(2, 3):
        assert int(dec[idx]) == int(ref[idx]) * 12345 % PASTA_FP.p
