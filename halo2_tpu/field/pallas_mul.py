"""Pallas TPU kernel for batched Montgomery multiplication.

The jnp formulation in :mod:`device` materializes every intermediate of the
limb convolution ((16,16,B) products, (512,B) f32 stacks, four Kogge-Stone
carry networks) through HBM — ~50x more traffic than the inputs themselves,
which is what bounds MSM/NTT throughput (the BASELINE.json north-star
metrics).  This kernel runs the identical algorithm with every intermediate
in VMEM: per (16, TILE) block it reads a, b and writes the product — 192
bytes of HBM traffic per lane instead of kilobytes.  The three limb
convolutions ride the MXU as (32,512)x(512,TILE) f32 one-hot matmuls (all
values < 2^24, so f32 accumulation is exact).

Used automatically by DeviceField.mul on the TPU backend; the jnp path
remains for CPU (tests run on a virtual CPU mesh) and as a fallback
(HALO2_TPU_NO_PALLAS=1).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import FieldSpec, LIMB_BITS, LIMB_MASK

L = 16
U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_SHIFT = LIMB_BITS
TILE = 512


def _norm(t):
    """Kogge-Stone carry normalization: (nl, T) limbs < 2^26 -> canonical."""
    nl = t.shape[0]

    def shift1(x, d=1):
        return jnp.concatenate([jnp.zeros((d,) + x.shape[1:], U32), x[:-d]])

    c0 = t >> _SHIFT
    v1 = (t & _MASK) + shift1(c0)
    co = c0[nl - 1]
    g1 = v1 >> _SHIFT
    v2 = (v1 & _MASK) + shift1(g1)
    co = co + g1[nl - 1]
    g = v2 >> _SHIFT
    p_flag = ((v2 & _MASK) == _MASK).astype(U32)
    d = 1
    while d < nl:
        g = g | (p_flag & shift1(g, d))
        p_flag = p_flag & shift1(p_flag, d)
        d *= 2
    out = ((v2 & _MASK) + shift1(g)) & _MASK
    co = co + g[nl - 1]
    return out, co


def _conv(x, y, t_mat):
    """(16,T)x(16,T) limbwise product -> column sums via one exact bf16 dot.

    The 32-bit partial products are split into BYTES and the one-hot
    assignment matrix carries weights {1, 256}: every bf16 operand (bytes
    0..255 and the power-of-two weight 256) is exact, every bf16 x bf16
    product (<= 255*256, a 16-bit-mantissa value) is exact in the MXU's f32
    accumulator, and the column sums stay < 2^21 < 2^24 — so a single-pass
    bf16 matmul is bit-exact while running at the MXU's native bf16 rate
    (the previous f32 HIGHEST-precision formulation was ~8x slower: XLA
    lowers it to a multi-pass bf16 emulation).
    """
    prod = x[:, None, :] * y[None, :, :]  # (16, 16, T) u32, exact
    b0 = (prod & np.uint32(0xFF)).reshape(L * L, -1)
    b1 = ((prod >> np.uint32(8)) & np.uint32(0xFF)).reshape(L * L, -1)
    b2 = ((prod >> np.uint32(16)) & np.uint32(0xFF)).reshape(L * L, -1)
    b3 = (prod >> np.uint32(24)).reshape(L * L, -1)
    # mosaic has no u32->bf16 cast; hop through i32 (all values < 256)
    stacked = (
        jnp.concatenate([b0, b1, b2, b3]).astype(jnp.int32).astype(jnp.bfloat16)
    )  # (1024, T)
    t = jax.lax.dot_general(
        t_mat.astype(jnp.bfloat16),
        stacked,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return t.astype(jnp.int32).astype(U32)


def _mont_mul_vmem(a, b, t_mat, nprime, p_limbs):
    """Montgomery product of (16, T) canonical-limb arrays, all in VMEM.

    Shared by the standalone montmul kernel and the fused NTT butterfly
    kernels (poly/pallas_ntt.py)."""
    t = _conv(a, b, t_mat)  # (32, T)
    t_low, _ = _norm(t[:L])
    m_cols = _conv(t_low, jnp.broadcast_to(nprime, a.shape), t_mat[:L])
    m, _ = _norm(m_cols)
    mp = _conv(m, jnp.broadcast_to(p_limbs, a.shape), t_mat)
    s = t + mp
    _, c_low = _norm(s[:L])
    zrows = jnp.zeros((L - 1,) + c_low.shape, U32)
    high = s[L:] + jnp.concatenate([c_low[None], zrows])  # carry into limb 0
    res, _ = _norm(high)  # < 2p

    # conditional subtract p: res - p with borrow detect
    comp = jnp.broadcast_to(p_limbs, res.shape) ^ _MASK
    one0 = jnp.concatenate([jnp.ones((1,) + c_low.shape, U32), zrows])
    sub, carry = _norm(res + comp + one0)
    return jnp.where((carry == 1)[None, :], sub, res)  # no borrow -> res >= p


def _mod_add_vmem(a, b, p_limbs):
    """(a + b) mod p for canonical (16, T) limb arrays, in VMEM."""
    s, _ = _norm(a + b)  # < 2p, fits 16 limbs (p is 254-bit)
    comp = jnp.broadcast_to(p_limbs, s.shape) ^ _MASK
    zrows = jnp.zeros((L - 1,) + s.shape[1:], U32)
    one0 = jnp.concatenate([jnp.ones((1,) + s.shape[1:], U32), zrows])
    sub, carry = _norm(s + comp + one0)
    return jnp.where((carry == 1)[None, :], sub, s)


def _mod_sub_vmem(a, b, p_limbs):
    """(a - b) mod p for canonical (16, T) limb arrays, in VMEM."""
    bcomp = b ^ _MASK
    zrows = jnp.zeros((L - 1,) + a.shape[1:], U32)
    one0 = jnp.concatenate([jnp.ones((1,) + a.shape[1:], U32), zrows])
    d, carry = _norm(a + bcomp + one0)  # a - b + 2^256
    wrapped, _ = _norm(d + jnp.broadcast_to(p_limbs, a.shape))
    return jnp.where((carry == 1)[None, :], d, wrapped)  # carry -> a >= b


def mont_consts(spec: FieldSpec):
    """(t_mat byte-weighted one-hot f32, nprime, p (16,1) u32) numpy constants.

    t_mat row layout matches _conv's byte stack: regions [b0|b1|b2|b3] of the
    32-bit partial product (i,j); b0/b1 are the low 16 bits (column i+j,
    weights 1/256), b2/b3 the high 16 bits (column i+j+1, weights 1/256).
    """
    t_full = np.zeros((2 * L, 4 * L * L), np.float32)
    for i in range(L):
        for j in range(L):
            t_full[i + j, i * L + j] = 1.0                    # b0
            t_full[i + j, L * L + i * L + j] = 256.0          # b1
            t_full[i + j + 1, 2 * L * L + i * L + j] = 1.0    # b2
            t_full[i + j + 1, 3 * L * L + i * L + j] = 256.0  # b3
    nprime = (-pow(spec.p, -1, 1 << 256)) % (1 << 256)
    nprime_np = np.array(
        [[(nprime >> (16 * j)) & 0xFFFF] for j in range(L)], np.uint32
    )
    p_np = np.array([[(spec.p >> (16 * j)) & 0xFFFF] for j in range(L)], np.uint32)
    return t_full, nprime_np, p_np


def _mont_mul_kernel(a_ref, b_ref, tmat_ref, nprime_ref, p_ref, o_ref):
    o_ref[:] = _mont_mul_vmem(
        a_ref[:], b_ref[:], tmat_ref[:], nprime_ref[:], p_ref[:]
    )


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec: FieldSpec, m: int):
    """Jittable pallas montmul over (16, m) operands (m multiple of TILE)."""
    t_full, nprime_np, p_np = mont_consts(spec)

    grid = (m // TILE,)
    tile_spec = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    call = pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, m), jnp.uint32),
        grid=grid,
        in_specs=[
            tile_spec,
            tile_spec,
            const_spec((2 * L, 4 * L * L)),
            const_spec((L, 1)),
            const_spec((L, 1)),
        ],
        out_specs=tile_spec,
    )

    # keep constants as NUMPY: a jnp.asarray here could run under an active
    # trace (first use is inside a while_loop body) and leak its tracer into
    # the lru_cache closure
    def fn(a, b):
        return call(a, b, t_full, nprime_np, p_np)

    return fn


def pallas_available() -> bool:
    if os.environ.get("HALO2_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product over arbitrary batch shapes (limb axis leading)."""
    batch = a.shape[1:]
    m = 1
    for s in batch:
        m *= s
    a2 = a.reshape(L, m)
    b2 = b.reshape(L, m)
    pad = (-m) % TILE
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
    out = _mont_mul_call(spec, m + pad)(a2, b2)
    if pad:
        out = out[:, :m]
    return out.reshape((L,) + batch)
