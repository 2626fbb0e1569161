"""Pallas kernel logic tests (interpret mode — CI has no TPU).

On hardware the kernels are selected automatically (field.pallas_mul); here
we force interpret mode to check bit-exactness against the jnp reference
path on CPU.
"""

import random

import numpy as np
import pytest

import halo2_tpu.field.pallas_mul as pm
from halo2_tpu.field.device import get_device_field
from halo2_tpu.field.params import BN254_FQ, BN254_FR, PASTA_FP


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pm.pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pm.pl, "pallas_call", patched)
    yield
    pm._mont_mul_call.cache_clear()
    pm._mont_sqr_call.cache_clear()


@pytest.mark.parametrize("spec", [BN254_FR, BN254_FQ, PASTA_FP])
def test_pallas_mont_mul_matches_jnp(spec):
    d = get_device_field(spec)
    rng = random.Random(3)
    p = spec.p
    vals_a = [0, 1, p - 1, p - 2] + [rng.randrange(p) for _ in range(60)]
    vals_b = [p - 1, 0, p - 1, 1] + [rng.randrange(p) for _ in range(60)]
    a, b = d.encode(vals_a), d.encode(vals_b)
    got = pm.mont_mul(spec, a, b)
    want = d.mul(a, b)  # jnp path (CPU backend -> pallas disabled)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("spec", [BN254_FQ, PASTA_FP])
def test_pallas_mont_sqr_matches_jnp(spec):
    d = get_device_field(spec)
    rng = random.Random(5)
    p = spec.p
    vals = [0, 1, p - 1, p - 2] + [rng.randrange(p) for _ in range(60)]
    a = d.encode(vals)
    got = pm.mont_sqr(spec, a)
    want = d.mul(a, a)  # jnp path (CPU backend -> pallas disabled)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_pallas_mont_mul_interpret_tile_boundary():
    """Batch sizes straddling the TILE boundary exercise the pad path."""
    spec = BN254_FQ
    d = get_device_field(spec)
    rng = random.Random(11)
    for n in (1, 3, pm.TILE - 1, pm.TILE, pm.TILE + 1):
        vals_a = [rng.randrange(spec.p) for _ in range(n)]
        vals_b = [rng.randrange(spec.p) for _ in range(n)]
        a, b = d.encode(vals_a), d.encode(vals_b)
        got = pm.mont_mul(spec, a, b)
        want = d.mul(a, b)
        assert np.array_equal(np.asarray(got), np.asarray(want))
