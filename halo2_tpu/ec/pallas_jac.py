"""Fused Pallas TPU kernel for complete Jacobian point addition on BN254 G1.

The MSM inner loop (bucket accumulation, bucket reduction) is wall-to-wall
``jac_add``: ~23 field multiplies + ~15 adds/subs + exception selects per
point. With per-op kernels every intermediate (16, B) limb tensor round-trips
HBM and pays XLA op overhead; fusing the whole addition law into ONE Pallas
kernel keeps all ~40 intermediates in VMEM — HBM traffic collapses to the 6
input and 3 output coordinate tensors.

Algorithm identical to ec.device.jac_add (add-2007-bl + dbl-2009-l +
exception selects), field ops identical to field.pallas_mul — results are
bit-exact vs the jnp path (asserted in tests/test_ec.py on CPU where this
kernel is bypassed, and by the bench-side oracle checks on TPU).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.params import BN254_FQ, LIMB_MASK
from ..field.pallas_mul import TILE, _conv, _norm

L = 16
U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


def _consts():
    spec = BN254_FQ
    t_full = np.zeros((2 * L, 2 * L * L), np.float32)
    for i in range(L):
        for j in range(L):
            t_full[i + j, i * L + j] = 1.0
            t_full[i + j + 1, L * L + i * L + j] = 1.0
    nprime = (-pow(spec.p, -1, 1 << 256)) % (1 << 256)
    nprime_np = np.array(
        [[(nprime >> (16 * j)) & 0xFFFF] for j in range(L)], np.uint32
    )
    p_np = np.array([[(spec.p >> (16 * j)) & 0xFFFF] for j in range(L)], np.uint32)
    one_r = spec.r % spec.p
    one_np = np.array([[(one_r >> (16 * j)) & 0xFFFF] for j in range(L)], np.uint32)
    return t_full, nprime_np, p_np, one_np


class _F:
    """Field ops on (16, T) blocks inside the kernel (all VMEM)."""

    def __init__(self, t_mat, nprime, p_limbs):
        self.t_mat = t_mat
        self.nprime = nprime
        self.p = p_limbs

    def _row0(self, v):  # (T,) -> (16, T) with v in limb 0
        z = jnp.zeros((L - 1,) + v.shape, U32)
        return jnp.concatenate([v[None], z])

    def cond_sub_p(self, res):
        comp = jnp.broadcast_to(self.p, res.shape) ^ _MASK
        one0 = self._row0(jnp.ones(res.shape[1:], U32))
        sub, carry = _norm(res + comp + one0)
        return jnp.where((carry == 1)[None, :], sub, res)

    def add(self, a, b):
        t, _ = _norm(a + b)
        return self.cond_sub_p(t)

    def dbl(self, a):
        return self.add(a, a)

    def sub(self, a, b):
        comp = b ^ _MASK
        one0 = self._row0(jnp.ones(a.shape[1:], U32))
        d_, carry = _norm(a + comp + one0)
        dp, _ = _norm(d_ + jnp.broadcast_to(self.p, a.shape))
        return jnp.where((carry == 0)[None, :], dp, d_)  # borrow -> add p back

    def mul(self, a, b):
        t = _conv(a, b, self.t_mat)
        t_low, _ = _norm(t[:L])
        m_cols = _conv(t_low, jnp.broadcast_to(self.nprime, a.shape), self.t_mat[:L])
        m, _ = _norm(m_cols)
        mp = _conv(m, jnp.broadcast_to(self.p, a.shape), self.t_mat)
        s = t + mp
        _, c_low = _norm(s[:L])
        high = s[L:] + self._row0(c_low)
        res, _ = _norm(high)
        return self.cond_sub_p(res)

    def sq(self, a):
        return self.mul(a, a)

    def is_zero(self, a):  # (16, T) -> (T,) bool
        return jnp.all(a == 0, axis=0)

    def sel(self, mask, a, b):  # mask (T,)
        return jnp.where(mask[None, :], a, b)


def _jac_add_kernel(
    x1r, y1r, z1r, x2r, y2r, z2r, tmatr, nprimer, pr, oner, x3r, y3r, z3r
):
    f = _F(tmatr[:], nprimer[:], pr[:])
    one_mont = jnp.broadcast_to(oner[:], x1r.shape)
    x1, y1, z1 = x1r[:], y1r[:], z1r[:]
    x2, y2, z2 = x2r[:], y2r[:], z2r[:]

    z1z1 = f.sq(z1)
    z2z2 = f.sq(z2)
    u1 = f.mul(x1, z2z2)
    u2 = f.mul(x2, z1z1)
    s1 = f.mul(f.mul(y1, z2), z2z2)
    s2 = f.mul(f.mul(y2, z1), z1z1)
    h = f.sub(u2, u1)
    r = f.sub(s2, s1)

    hh = f.sq(h)
    i = f.dbl(f.dbl(hh))
    j = f.mul(h, i)
    rr = f.dbl(r)
    v = f.mul(u1, i)
    x3 = f.sub(f.sub(f.sq(rr), j), f.dbl(v))
    y3 = f.sub(f.mul(rr, f.sub(v, x3)), f.dbl(f.mul(s1, j)))
    z3 = f.mul(f.dbl(f.mul(z1, z2)), h)

    # doubling branch (dbl-2009-l, a=0)
    a_ = f.sq(x1)
    b_ = f.sq(y1)
    c_ = f.sq(b_)
    t_ = f.sq(f.add(x1, b_))
    dd = f.dbl(f.sub(f.sub(t_, a_), c_))
    e_ = f.add(f.dbl(a_), a_)
    f_ = f.sq(e_)
    xd = f.sub(f_, f.dbl(dd))
    yd = f.sub(f.mul(e_, f.sub(dd, xd)), f.dbl(f.dbl(f.dbl(c_))))
    zd = f.dbl(f.mul(y1, z1))

    h_zero = f.is_zero(h)
    r_zero = f.is_zero(r)
    p_inf = f.is_zero(z1)
    q_inf = f.is_zero(z2)
    same = h_zero & r_zero & ~p_inf & ~q_inf
    opposite = h_zero & ~r_zero & ~p_inf & ~q_inf

    zero = jnp.zeros_like(x3)
    x3 = f.sel(same, xd, x3)
    y3 = f.sel(same, yd, y3)
    z3 = f.sel(same, zd, z3)
    x3 = f.sel(opposite, zero, x3)
    y3 = f.sel(opposite, one_mont, y3)
    z3 = f.sel(opposite, zero, z3)
    x3 = f.sel(p_inf, x2, x3)
    y3 = f.sel(p_inf, y2, y3)
    z3 = f.sel(p_inf, z2, z3)
    x3 = f.sel(q_inf, x1, x3)
    y3 = f.sel(q_inf, y1, y3)
    z3 = f.sel(q_inf, z1, z3)

    x3r[:] = x3
    y3r[:] = y3
    z3r[:] = z3


@functools.lru_cache(maxsize=None)
def _jac_add_call(m: int):
    t_full, nprime_np, p_np, one_np = _consts()
    grid = (m // TILE,)
    tile = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        _jac_add_kernel,
        out_shape=[jax.ShapeDtypeStruct((L, m), jnp.uint32)] * 3,
        grid=grid,
        in_specs=[tile] * 6
        + [const((2 * L, 2 * L * L)), const((L, 1)), const((L, 1)), const((L, 1))],
        out_specs=[tile] * 3,
    )

    def fn(p, q):
        x, y, z = call(
            p["x"], p["y"], p["z"], q["x"], q["y"], q["z"],
            t_full, nprime_np, p_np, one_np,
        )
        return {"x": x, "y": y, "z": z}

    return fn


def jac_add_fused(p, q):
    """Complete Jacobian add via one fused kernel; arbitrary batch shapes."""
    batch = p["x"].shape[1:]
    m = int(np.prod(batch)) if batch else 1
    pad = (-m) % TILE

    def prep(pt):
        out = {}
        for k, v in pt.items():
            v2 = v.reshape(L, m)
            if pad:
                v2 = jnp.pad(v2, ((0, 0), (0, pad)))
            out[k] = v2
        return out

    r = _jac_add_call(m + pad)(prep(p), prep(q))
    return {k: v[:, :m].reshape((L,) + batch) for k, v in r.items()}
