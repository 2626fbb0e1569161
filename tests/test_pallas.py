"""Pallas kernel logic tests (interpret mode — CI has no TPU).

On hardware the kernels are selected automatically (field.pallas_mul /
ec.pallas_jac); here we force interpret mode to check bit-exactness against
the jnp reference path on CPU.
"""

import random

import jax
import jax.numpy as jnp
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
    import halo2_tpu.ec.pallas_jac as pj

    monkeypatch.setattr(pj.pl, "pallas_call", patched)
    yield
    pm._mont_mul_call.cache_clear()
    pj._jac_add_call.cache_clear()


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


def test_pallas_jac_add_matches_jnp():
    from halo2_tpu.ec import host as ec
    from halo2_tpu.ec.device import df as dfq, jac_add, jac_from_affine, jac_infinity
    from halo2_tpu.ec.pallas_jac import jac_add_fused

    rng = random.Random(11)
    base = [ec.ec_mul(ec.G1, rng.randrange(1, ec.R)) for _ in range(6)]
    d = dfq()
    px = d.encode([ec.g1_to_ints(p)[0] for p in base])
    py = d.encode([ec.g1_to_ints(p)[1] for p in base])
    P = jac_from_affine(px, py)
    # exercise generic add, P==Q (double), P==-Q (infinity), P+inf, inf+Q
    inf = jac_infinity((6,))
    neg = {"x": P["x"], "y": d.neg(P["y"]), "z": P["z"]}
    cases = [
        (P, {k: jnp.roll(v, 1, axis=1) for k, v in P.items()}),
        (P, P),
        (P, neg),
        (P, inf),
        (inf, P),
    ]
    for p_, q_ in cases:
        got = jac_add_fused(p_, q_)
        want = jac_add(p_, q_)
        # infinity representations may differ in x/y; compare affine-normalized
        from halo2_tpu.ec.device import jac_to_affine

        gx, gy = jac_to_affine(got)
        wx, wy = jac_to_affine(want)
        assert np.array_equal(np.asarray(gx), np.asarray(wx))
        assert np.array_equal(np.asarray(gy), np.asarray(wy))
