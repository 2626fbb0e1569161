"""Fused Pallas Jacobian kernels vs the jnp reference path (interpret mode).

Covers the exception lanes explicitly: infinity on either side, P == Q
(double fix-up), P == -Q (infinity result), and masked-out madd lanes.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

import halo2_tpu.ec.pallas_jac as pj
import halo2_tpu.field.pallas_mul as pm
from halo2_tpu.ec import device as ecd
from halo2_tpu.ec import host as ech


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    orig = pm.pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pm.pl, "pallas_call", patched)
    monkeypatch.setattr(pj.pl, "pallas_call", patched)
    yield
    pj._madd_call.cache_clear()
    pj._add_call.cache_clear()


def _sample_points(n, seed):
    """n affine points (host ints) as Montgomery limb arrays + jac pytree."""
    d = ecd.df()
    rng = random.Random(seed)
    pts = [ech.ec_mul(ech.G1, rng.randrange(1, 1 << 60)) for _ in range(n)]
    x = d.encode([p[0].c[0] for p in pts])
    y = d.encode([p[1].c[0] for p in pts])
    return x, y


def _assert_jac_equal(got, want):
    """Compare as curve points (normalize to affine host ints)."""
    gx, gy = ecd.jac_to_affine(got)
    wx, wy = ecd.jac_to_affine(want)
    assert np.array_equal(np.asarray(gx), np.asarray(wx))
    assert np.array_equal(np.asarray(gy), np.asarray(wy))


def test_fused_madd_matches_jnp():
    n = 8
    x, y = _sample_points(n, 1)
    qx, qy = _sample_points(n, 2)
    p = ecd.jac_from_affine(x, y)
    # lane 0: p == q (double), lane 1: p == -q (infinity), lane 2: p == inf,
    # lane 3: invalid (masked), rest: generic
    d = ecd.df()
    qx = qx.at[:, 0].set(x[:, 0])
    qy = qy.at[:, 0].set(y[:, 0])
    qx = qx.at[:, 1].set(x[:, 1])
    qy = qy.at[:, 1].set(np.asarray(d.neg(y))[:, 1])
    p = {k: v.at[:, 2].set(ecd.jac_infinity(())[k]) for k, v in p.items()}
    valid = jnp.array([True, True, True, False, True, True, True, True])

    got = pj.jac_madd_pallas(p, qx, qy, valid)
    want = ecd._jac_madd_jnp(p, qx, qy, valid)
    _assert_jac_equal(got, want)


def test_fused_add_matches_jnp():
    n = 8
    x1, y1 = _sample_points(n, 3)
    x2, y2 = _sample_points(n, 4)
    d = ecd.df()
    # lane 0: p == q, lane 1: p == -q, lane 2: p inf, lane 3: q inf
    x2 = x2.at[:, 0].set(x1[:, 0])
    y2 = y2.at[:, 0].set(y1[:, 0])
    x2 = x2.at[:, 1].set(x1[:, 1])
    y2 = y2.at[:, 1].set(np.asarray(d.neg(y1))[:, 1])
    p = ecd.jac_from_affine(x1, y1)
    q = ecd.jac_from_affine(x2, y2)
    p = {k: v.at[:, 2].set(ecd.jac_infinity(())[k]) for k, v in p.items()}
    q = {k: v.at[:, 3].set(ecd.jac_infinity(())[k]) for k, v in q.items()}
    # mixed z: double q's lanes 4.. (非-1 z coordinates) via jnp double
    qd = ecd.jac_double(q)
    q = {k: jnp.where(jnp.arange(n)[None] >= 4, qd[k], q[k]) for k in q}

    got = pj.jac_add_pallas(p, q)
    want = ecd._jac_add_jnp(p, q)
    _assert_jac_equal(got, want)


def test_fused_add_multidim_batch():
    x1, y1 = _sample_points(6, 5)
    x2, y2 = _sample_points(6, 6)
    p = ecd.jac_from_affine(x1.reshape(16, 2, 3), y1.reshape(16, 2, 3))
    q = ecd.jac_from_affine(x2.reshape(16, 2, 3), y2.reshape(16, 2, 3))
    got = pj.jac_add_pallas(p, q)
    want = ecd._jac_add_jnp(p, q)
    _assert_jac_equal(got, want)
