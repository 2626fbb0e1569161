"""Fused Pallas kernels for the Jacobian group ops on the MSM hot path.

Round-2 profiling (NOTES_ROUND2.md + round-3 remeasure): a single
``jac_madd`` composed of pallas montmuls + XLA-fused elementwise mod-add/sub
costs ~2x its 11 multiplies — XLA materializes every Kogge-Stone carry chain
through HBM and schedules the VPU poorly (a bare jnp mod-add at 2^20 lanes
measures ~2x a whole pallas montmul).  These kernels run the complete
madd-2007-bl / add-2007-bl formulas in ONE ``pallas_call`` each: all 11/16
multiplies (v2 byte-Toeplitz Montgomery pipeline, field/pallas_mul.py) and
every add/sub/select stay in VMEM.

Exception lanes (P == Q needing a doubling) are returned as a per-lane flag;
the wrappers apply the (rare) doubling fix-up behind a scalar ``lax.cond``
using the jnp ``jac_double`` — identical semantics to the jnp reference
implementations in :mod:`ec.device`, against which the interpret-mode tests
check bit-exactness (tests/test_pallas_jac.py).

Replaces halo2curves' CPU Jacobian arithmetic inside the reference's MSM
(reference src/circuits/utils.rs:40-48; SURVEY.md §2c "MSM / curve ops").
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.params import FieldSpec, BN254_FQ
from ..field.pallas_mul import (
    L,
    U32,
    TILE,
    mont_consts,
    mont_in_specs,
    _mod_sub_vmem,
    _condsub2p,
    _dbl_lazy,
    _mont_mul_lazy,
    _mont_sqr_lazy,
    fat_kp_np,
    p2_np,
)


def _lazy_ops(tmat, tsqr, m2, m3, p, p2, fat3):
    """Round-5 carry-save schedule: multiplies skip the canonical
    conditional subtract (outputs < 1.8p for inputs < 2p — p = 0.189*2^256
    leaves slack up to 5.29p), subtractions run 2^256-complement style with
    a +2p wrap (output < 2p), and one additive tail folds into the squaring
    reducer's high half.  Stored coordinates stay < 2p in 16-bit limbs; the
    host tail reduces mod p when decoding (SURVEY §2c MSM; NOTES_ROUND4
    carry-save queue)."""
    mul = lambda x, y, off=None: _mont_mul_lazy(x, y, tmat, m2, m3, off)  # noqa: E731
    sqr = lambda x, off=None: _mont_sqr_lazy(x, tsqr, m2, m3, off)  # noqa: E731
    sub2 = lambda x, y: _mod_sub_vmem(x, y, p2)  # noqa: E731  a-b (+2p), <2p... see note
    return mul, sqr, sub2


def _is_zero_rep(v, p_limbs):
    """value ≡ 0 mod p for a < 2p representative: limbs all zero or == p."""
    zero = jnp.all(v == 0, axis=0, keepdims=True)
    eq_p = jnp.all(v == jnp.broadcast_to(p_limbs, v.shape), axis=0, keepdims=True)
    return zero | eq_p  # (1, T)


def _sel(mask, a, b):
    """mask: (1, T) bool -> where over (L, T)."""
    return jnp.where(mask, a, b)


def _madd_kernel(
    ax_ref, ay_ref, az_ref, qx_ref, qy_ref, valid_ref,
    tmat_ref, tsqr_ref, m2_ref, m3_ref, p_ref, p2_ref, fat3_ref, one_ref,
    ox_ref, oy_ref, oz_ref, same_ref,
):
    p = p_ref[:]
    p2 = p2_ref[:]
    fat3 = fat3_ref[:]
    mul, sqr, sub2 = _lazy_ops(
        tmat_ref[:], tsqr_ref[:], m2_ref[:], m3_ref[:], p, p2, fat3
    )
    ax, ay, az = ax_ref[:], ay_ref[:], az_ref[:]
    qx, qy = qx_ref[:], qy_ref[:]
    valid = valid_ref[:] != 0  # (1, T)

    # madd-2007-bl with lambda = 1/2 scaled output (X/4, Y/8, Z/2): the
    # window-sum consumer is projective, so the class representative is free
    # and the /4 /8 factors never need materializing.
    z1z1 = sqr(az)                      # < 1.8p
    u2 = mul(qx, z1z1)
    s2 = mul(qy, mul(az, z1z1))
    h = sub2(u2, ax)                    # < 2p
    hh = sqr(h)
    jj = mul(h, hh)                     # j/4
    v = mul(ax, hh)                     # v/4
    rr = sub2(s2, ay)                   # rr/2, < 2p
    # x3' = rr'^2 - j' - 2v' : fold (3p - j') into the squaring reduce
    a3 = sqr(rr, jnp.broadcast_to(fat3, rr.shape) - jj)  # < 4.8p
    a3 = _condsub2p(a3, p2)
    a3 = _condsub2p(a3, p2)             # < 2p
    t1 = _condsub2p(_dbl_lazy(v), p2)   # 2v', < 2p
    x3 = sub2(a3, t1)                   # < 2p
    tt = sub2(v, x3)
    u = mul(rr, tt)
    w = mul(ay, jj)
    y3 = sub2(u, w)                     # < 2p
    z3 = mul(az, h)                     # z3/2

    p_inf = _is_zero_rep(az, p)
    same = valid & _is_zero_rep(h, p) & _is_zero_rep(rr, p) & ~p_inf

    one = jnp.broadcast_to(one_ref[:], ax.shape)
    ox = _sel(p_inf, qx, x3)
    oy = _sel(p_inf, qy, y3)
    oz = _sel(p_inf, one, z3)
    ox_ref[:] = _sel(valid, ox, ax)
    oy_ref[:] = _sel(valid, oy, ay)
    oz_ref[:] = _sel(valid, oz, az)
    same_ref[:] = same.astype(U32)


def _add_kernel(
    ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref,
    tmat_ref, tsqr_ref, m2_ref, m3_ref, p_ref, p2_ref, fat3_ref, one_ref,
    ox_ref, oy_ref, oz_ref, same_ref,
):
    p = p_ref[:]
    p2 = p2_ref[:]
    fat3 = fat3_ref[:]
    mul, sqr, sub2 = _lazy_ops(
        tmat_ref[:], tsqr_ref[:], m2_ref[:], m3_ref[:], p, p2, fat3
    )
    x1, y1, z1 = ax_ref[:], ay_ref[:], az_ref[:]
    x2, y2, z2 = bx_ref[:], by_ref[:], bz_ref[:]

    z1z1 = sqr(z1)
    z2z2 = sqr(z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(mul(y1, z2), z2z2)
    s2 = mul(mul(y2, z1), z1z1)
    h = sub2(u2, u1)                    # < 2p
    rr = sub2(s2, s1)                   # r (the /2-scaled slope numerator)
    hh = sqr(h)
    jj = mul(h, hh)
    v = mul(u1, hh)
    a3 = sqr(rr, jnp.broadcast_to(fat3, rr.shape) - jj)
    a3 = _condsub2p(a3, p2)
    a3 = _condsub2p(a3, p2)
    t1 = _condsub2p(_dbl_lazy(v), p2)
    x3 = sub2(a3, t1)
    tt = sub2(v, x3)
    u = mul(rr, tt)
    w = mul(s1, jj)
    y3 = sub2(u, w)
    zz = mul(z1, z2)
    z3 = mul(zz, h)                     # z3/2 = z1*z2*h

    h_zero = _is_zero_rep(h, p)
    r_zero = _is_zero_rep(rr, p)
    p_inf = _is_zero_rep(z1, p)
    q_inf = _is_zero_rep(z2, p)
    same = h_zero & r_zero & ~p_inf & ~q_inf
    # opposite (h == 0, r != 0) needs no select: z3 = z1*z2*h ≡ 0 marks
    # infinity naturally (the Jacobian convention downstream checks mod p)

    ox = _sel(p_inf, x2, x3)
    oy = _sel(p_inf, y2, y3)
    oz = _sel(p_inf, z2, z3)
    ox_ref[:] = _sel(q_inf, x1, ox)
    oy_ref[:] = _sel(q_inf, y1, oy)
    oz_ref[:] = _sel(q_inf, z1, oz)
    same_ref[:] = same.astype(U32)


def _one_mont_np(spec: FieldSpec):
    r = (1 << 256) % spec.p
    return np.array([[(r >> (16 * j)) & 0xFFFF] for j in range(L)], np.uint32)


def _build_call(kernel, spec: FieldSpec, m: int, n_point_ins: int, n_flag_ins: int):
    grid = (m // TILE,)
    tile = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    flag = pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    consts = mont_consts(spec)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, m), jnp.uint32),
            jax.ShapeDtypeStruct((L, m), jnp.uint32),
            jax.ShapeDtypeStruct((L, m), jnp.uint32),
            jax.ShapeDtypeStruct((1, m), jnp.uint32),
        ),
        grid=grid,
        in_specs=[tile] * n_point_ins
        + [flag] * n_flag_ins
        + mont_in_specs(lambda i: (0, 0))
        + [one_spec] * 3,  # p2, fat3, one -- all (L, 1) broadcast constants
        out_specs=(tile, tile, tile, flag),
    )
    one_np = _one_mont_np(spec)
    p2c = p2_np(spec)
    fat3c = fat_kp_np(spec, 3)

    # inner jit: lower the kernel once per shape regardless of call-site
    # count (see field/pallas_mul._mont_mul_call)
    def fn(*arrays):
        return call(*arrays, *consts, p2c, fat3c, one_np)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _madd_call(spec: FieldSpec, m: int):
    return _build_call(_madd_kernel, spec, m, 5, 1)


@functools.lru_cache(maxsize=None)
def _add_call(spec: FieldSpec, m: int):
    return _build_call(_add_kernel, spec, m, 6, 0)


def _flatten_pad(arrays, flags, batch):
    m = 1
    for s in batch:
        m *= s
    pad = (-m) % TILE
    flat = [a.reshape(L, m) for a in arrays]
    fl = [f.reshape(1, m).astype(U32) for f in flags]
    if pad:
        flat = [jnp.pad(a, ((0, 0), (0, pad))) for a in flat]
        fl = [jnp.pad(f, ((0, 0), (0, pad))) for f in fl]
    return flat, fl, m, pad


def _unflatten(outs, batch, m, pad):
    ox, oy, oz, same = outs
    if pad:
        ox, oy, oz, same = ox[:, :m], oy[:, :m], oz[:, :m], same[:, :m]
    out = {
        "x": ox.reshape((L,) + batch),
        "y": oy.reshape((L,) + batch),
        "z": oz.reshape((L,) + batch),
    }
    return out, same.reshape(batch) != 0


def _double_fixup(out, same, p):
    """Apply the (rare) P == Q doubling on flagged lanes via the jnp path."""
    from . import device as ecd

    def fix(o):
        dbl = ecd.jac_double(p)
        return {k: jnp.where(same[None], dbl[k], o[k]) for k in o}

    return jax.lax.cond(jnp.any(same), fix, lambda o: o, out)


def jac_madd_pallas(p, qx, qy, valid):
    """Fused mixed add p + affine(qx, qy) where ``valid`` else p.

    Semantics identical to :func:`ec.device.jac_madd` (including the rare
    P == Q doubling, applied outside the kernel behind a scalar cond)."""
    batch = p["x"].shape[1:]
    flat, fl, m, pad = _flatten_pad(
        [p["x"], p["y"], p["z"], qx, qy], [valid], batch
    )
    outs = _madd_call(BN254_FQ, m + pad)(*flat, *fl)
    out, same = _unflatten(outs, batch, m, pad)
    return _double_fixup(out, same, p)


def jac_add_pallas(p, q):
    """Fused complete Jacobian add, semantics of :func:`ec.device.jac_add`."""
    batch = p["x"].shape[1:]
    flat, _, m, pad = _flatten_pad(
        [p["x"], p["y"], p["z"], q["x"], q["y"], q["z"]], [], batch
    )
    outs = _add_call(BN254_FQ, m + pad)(*flat)
    out, same = _unflatten(outs, batch, m, pad)
    return _double_fixup(out, same, p)
