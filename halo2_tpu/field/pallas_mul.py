"""Pallas TPU kernels for batched Montgomery multiplication.

The jnp formulation in :mod:`device` materializes every intermediate of the
limb convolution ((16,16,B) products, (512,B) f32 stacks, four Kogge-Stone
carry networks) through HBM — ~50x more traffic than the inputs themselves,
which is what bounds MSM/NTT throughput (the BASELINE.json north-star
metrics).  These kernels run the identical algorithm with every intermediate
in VMEM: per (16, TILE) block they read the operands and write the product —
192 bytes of HBM traffic per lane instead of kilobytes.

Multiplication structure (v2):

* conv1 (a*b, both operands per-lane): 16x16 u32 limb products on the VPU,
  byte-split, then ONE exact bf16 one-hot matmul computes the column sums on
  the MXU (operands are bytes 0..255 and weights {1,256} — every bf16 value
  and every bf16 product is exact, and column sums stay < 2^21 < 2^24, the
  f32-accumulator exactness bound).
* The Montgomery reduction products t_low*N' and m*p have a SHARED constant
  operand, so the MXU can do the multiplication itself: the per-lane bytes of
  t_low/m are contracted against a dense byte-Toeplitz matrix of N'/p
  (entries 0..255, bf16-exact; column sums < 2^21).  This removes ~2/3 of the
  per-lane VPU multiply/byte-split work of the v1 kernel (which ran all three
  convolutions the conv1 way).
* Squaring uses the upper-triangle product list (136 instead of 256 VPU
  products) with doubled one-hot weights {2,512} for the off-diagonal terms.

Used automatically by DeviceField.mul/square on the TPU backend; the jnp
path remains for CPU (tests run on a virtual CPU mesh) and as a fallback
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
# upper-triangle (i, j>=i) pair list for the squaring kernel
_TRI = [(i, j) for i in range(L) for j in range(i, L)]
NTRI = len(_TRI)  # 136


def _norm(t):
    """Kogge-Stone carry normalization: (nl, T) limbs < 2^31 -> canonical."""
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


def _to_bf16(x):
    # mosaic has no u32->bf16 cast; hop through i32 (all values < 256)
    return x.astype(jnp.int32).astype(jnp.bfloat16)


def _conv(x, y, t_mat):
    """(16,T)x(16,T) limbwise product -> column sums via one exact bf16 dot.

    The 32-bit partial products are split into BYTES and the one-hot
    assignment matrix carries weights {1, 256}: every bf16 operand (bytes
    0..255 and the power-of-two weight 256) is exact, every bf16 x bf16
    product (<= 255*256, a 16-bit-significand value) is exact in the MXU's
    f32 accumulator, and the column sums stay < 2^21 < 2^24 — so a
    single-pass bf16 matmul is bit-exact while running at the MXU's native
    bf16 rate.
    """
    prod = x[:, None, :] * y[None, :, :]  # (16, 16, T) u32, exact
    return _conv_bytes(prod.reshape(L * L, -1), t_mat)


def _conv_bytes(prod, t_mat):
    b0 = prod & np.uint32(0xFF)
    b1 = (prod >> np.uint32(8)) & np.uint32(0xFF)
    b2 = (prod >> np.uint32(16)) & np.uint32(0xFF)
    b3 = prod >> np.uint32(24)
    stacked = _to_bf16(jnp.concatenate([b0, b1, b2, b3]))
    t = jax.lax.dot_general(
        t_mat.astype(jnp.bfloat16),
        stacked,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return t.astype(jnp.int32).astype(U32)


def _bytes16(v):
    """Canonical (16, T) u16-limb array -> (32, T) bf16 bytes.

    Row r < 16 holds byte 2r (limb low byte), row 16+r byte 2r+1 (limb high
    byte) — the layout the m2/m3 Toeplitz matrices are built against.
    """
    return _to_bf16(jnp.concatenate([v & np.uint32(0xFF), v >> np.uint32(8)]))


def _mul_shared(bytes_bf16, mat):
    """Bytes (32, T) x byte-Toeplitz (K, 32) -> u32 byte-column sums (K, T)."""
    t = jax.lax.dot_general(
        mat.astype(jnp.bfloat16),
        bytes_bf16,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return t.astype(jnp.int32).astype(U32)


def _from_bytecols(cols):
    """[even byte-cols (K) | odd byte-cols (K)] -> K u16-limb columns < 2^30."""
    k = cols.shape[0] // 2
    return cols[:k] + (cols[k:] << np.uint32(8))


def _mont_reduce_vmem(t, m2, m3, p_limbs):
    """Montgomery-reduce 32 u16-limb columns t (< 2^21) to canonical < p.

    m = (t mod R) * N' mod R and m * p ride the MXU via the shared-operand
    byte-Toeplitz matmuls m2/m3; only the carry normalizations remain on the
    VPU."""
    t_low, _ = _norm(t[:L])
    m = _from_bytecols(_mul_shared(_bytes16(t_low), m2))  # (16, T) < 2^30
    m, _ = _norm(m)
    mp = _from_bytecols(_mul_shared(_bytes16(m), m3))  # (32, T) < 2^30
    s = t + mp  # < 2^31; low 16 limb-columns ≡ 0 mod R
    _, c_low = _norm(s[:L])
    zrows = jnp.zeros((L - 1,) + c_low.shape, U32)
    high = s[L:] + jnp.concatenate([c_low[None], zrows])  # carry into limb 0
    res, _ = _norm(high)  # < 2p

    # conditional subtract p: res - p with borrow detect
    comp = jnp.broadcast_to(p_limbs, res.shape) ^ _MASK
    one0 = jnp.concatenate([jnp.ones((1,) + c_low.shape, U32), zrows])
    sub, carry = _norm(res + comp + one0)
    return jnp.where((carry == 1)[None, :], sub, res)  # no borrow -> res >= p


def _mont_mul_vmem(a, b, t_mat, m2, m3, p_limbs):
    """Montgomery product of (16, T) canonical-limb arrays, all in VMEM.

    Shared by the standalone montmul kernel, the fused NTT butterfly kernels
    (poly/pallas_ntt.py) and the fused Jacobian kernels (ec/pallas_jac.py)."""
    t = _conv(a, b, t_mat)  # (32, T)
    return _mont_reduce_vmem(t, m2, m3, p_limbs)


def _mont_sqr_vmem(a, t_sqr, m2, m3, p_limbs):
    """Montgomery square via the 136-product upper triangle."""
    rows = [a[i : i + 1] * a[i:] for i in range(L)]
    prod = jnp.concatenate(rows)  # (136, T)
    t = _conv_bytes(prod, t_sqr)  # (32, T) columns < 2^22
    return _mont_reduce_vmem(t, m2, m3, p_limbs)


# ------------------------------------------------------- lazy-reduction ops
# Round-5 carry-save redesign (NOTES_ROUND4 queue): inside the fused
# Jacobian kernels values are tracked as 16-bit-limb arrays bounded by k*p
# with k carried STATICALLY by the formula schedule (p = 0.189*2^256, so a
# Montgomery multiply stays exact while k_a*k_b <= 5.29 and any value fits
# the 16 limbs while k <= 5.29).  Multiplies skip the canonical conditional
# subtract (output < 1.8p for inputs < 2p), adds/subs skip it when the
# consumer tolerates the bound, and additive tails fold into the reducer's
# high half for free (`offset`).  One `_condsub2p` pass re-tightens a value
# below 2p where a following multiply needs it.


def _mont_reduce_lazy(t, m2, m3, offset=None):
    """Montgomery-reduce column sums WITHOUT the final conditional subtract:
    output < (0.189*k_t + 1 + k_off)p in 16-bit limbs (callers keep the
    total below 5.29p so it fits 2^256)."""
    t_low, _ = _norm(t[:L])
    m = _from_bytecols(_mul_shared(_bytes16(t_low), m2))
    m, _ = _norm(m)
    mp = _from_bytecols(_mul_shared(_bytes16(m), m3))
    s = t + mp
    _, c_low = _norm(s[:L])
    zrows = jnp.zeros((L - 1,) + c_low.shape, U32)
    high = s[L:] + jnp.concatenate([c_low[None], zrows])
    if offset is not None:
        high = high + offset
    res, _ = _norm(high)
    return res


def _mont_mul_lazy(a, b, t_mat, m2, m3, offset=None):
    return _mont_reduce_lazy(_conv(a, b, t_mat), m2, m3, offset)


def _mont_sqr_lazy(a, t_sqr, m2, m3, offset=None):
    rows = [a[i : i + 1] * a[i:] for i in range(L)]
    prod = jnp.concatenate(rows)
    return _mont_reduce_lazy(_conv_bytes(prod, t_sqr), m2, m3, offset)


def _add_lazy(a, b):
    """a + b with limb carries only (bound k_a + k_b)."""
    s, _ = _norm(a + b)
    return s


def _dbl_lazy(a):
    s, _ = _norm(a + a)
    return s


def _sub_fat(a, b, fat):
    """a - b + (fat == k*p with every limb >= 2^16 - 1): bound k_a + k."""
    s, _ = _norm(a + (jnp.broadcast_to(fat, a.shape) - b))
    return s


def _condsub2p(v, p2_limbs):
    """One conditional subtract of 2p: value < 4p -> < 2p."""
    comp = jnp.broadcast_to(p2_limbs, v.shape) ^ _MASK
    zrows = jnp.zeros((L - 1,) + v.shape[1:], U32)
    one0 = jnp.concatenate([jnp.ones((1,) + v.shape[1:], U32), zrows])
    sub, carry = _norm(v + comp + one0)
    return jnp.where((carry == 1)[None, :], sub, v)


def fat_kp_np(spec: FieldSpec, k: int):
    """k*p as (16, 1) u32 limbs with limbs 0..14 >= 2^16 - 1 (borrow-free
    elementwise subtraction of any canonical-limbed value).  k*p must fit
    2^256 (k <= 5 for BN254 Fq)."""
    v = k * spec.p
    assert v < 1 << 256
    f = [(v >> (16 * j)) & 0xFFFF for j in range(L)]
    for i in range(L - 1):
        f[i] += 1 << 16
        f[i + 1] -= 1
        assert f[i + 1] >= 0
    return np.array([[x] for x in f], np.uint32)


def p2_np(spec: FieldSpec):
    """2p as plain (16, 1) u32 limbs (the _condsub2p constant)."""
    v = 2 * spec.p
    return np.array([[(v >> (16 * j)) & 0xFFFF] for j in range(L)], np.uint32)


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


def _bytes_of_int(v: int):
    return [(v >> (8 * k)) & 0xFF for k in range(2 * L)]


def mont_consts(spec: FieldSpec):
    """Numpy constants for the VMEM Montgomery pipeline.

    Returns ``(t_full, t_sqr, m2, m3, p)``:

    * ``t_full`` (32, 1024) f32 — conv1 one-hot: regions [b0|b1|b2|b3] of the
      32-bit partial product (i,j); b0/b1 are its low 16 bits (column i+j,
      weights 1/256), b2/b3 the high 16 bits (column i+j+1, weights 1/256).
    * ``t_sqr`` (32, 544) f32 — same for the upper-triangle square products,
      with off-diagonal weights doubled.
    * ``m2`` (32, 32) f32 — byte-Toeplitz of N' = -p^{-1} mod 2^256: maps
      the 32 input bytes (layout of :func:`_bytes16`) to the 32 byte-column
      sums of x*N' mod 2^256, even columns first.
    * ``m3`` (64, 32) f32 — byte-Toeplitz of p: 64 byte-column sums of x*p,
      even columns first.
    * ``p`` (16, 1) u32 — modulus limbs.
    """
    t_full = np.zeros((2 * L, 4 * L * L), np.float32)
    for i in range(L):
        for j in range(L):
            t_full[i + j, i * L + j] = 1.0                    # b0
            t_full[i + j, L * L + i * L + j] = 256.0          # b1
            t_full[i + j + 1, 2 * L * L + i * L + j] = 1.0    # b2
            t_full[i + j + 1, 3 * L * L + i * L + j] = 256.0  # b3
    t_sqr = np.zeros((2 * L, 4 * NTRI), np.float32)
    for idx, (i, j) in enumerate(_TRI):
        w = 1.0 if i == j else 2.0
        t_sqr[i + j, idx] = w
        t_sqr[i + j, NTRI + idx] = 256.0 * w
        t_sqr[i + j + 1, 2 * NTRI + idx] = w
        t_sqr[i + j + 1, 3 * NTRI + idx] = 256.0 * w

    nprime = (-pow(spec.p, -1, 1 << 256)) % (1 << 256)
    nb, pb = _bytes_of_int(nprime), _bytes_of_int(spec.p)

    def toeplitz(out_bytes: int, coef):
        mat = np.zeros((out_bytes, 2 * L), np.float32)
        for k_out in range(out_bytes):
            tgt = 2 * k_out if k_out < out_bytes // 2 else 2 * (k_out - out_bytes // 2) + 1
            for row in range(2 * L):
                src = 2 * row if row < L else 2 * (row - L) + 1
                if 0 <= tgt - src < 2 * L:
                    mat[k_out, row] = coef[tgt - src]
        return mat

    m2 = toeplitz(2 * L, nb)
    m3 = toeplitz(4 * L, pb)
    p_np = np.array([[(spec.p >> (16 * j)) & 0xFFFF] for j in range(L)], np.uint32)
    return t_full, t_sqr, m2, m3, p_np


def mont_in_specs(index_map):
    """Pallas BlockSpecs for the (t_full, t_sqr, m2, m3, p) constant tuple."""
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, index_map, memory_space=pltpu.VMEM
    )
    return [
        const((2 * L, 4 * L * L)),
        const((2 * L, 4 * NTRI)),
        const((2 * L, 2 * L)),
        const((4 * L, 2 * L)),
        const((L, 1)),
    ]


def _mont_mul_kernel(a_ref, b_ref, tmat_ref, tsqr_ref, m2_ref, m3_ref, p_ref, o_ref):
    o_ref[:] = _mont_mul_vmem(
        a_ref[:], b_ref[:], tmat_ref[:], m2_ref[:], m3_ref[:], p_ref[:]
    )


def _mont_sqr_kernel(a_ref, tmat_ref, tsqr_ref, m2_ref, m3_ref, p_ref, o_ref):
    o_ref[:] = _mont_sqr_vmem(a_ref[:], tsqr_ref[:], m2_ref[:], m3_ref[:], p_ref[:])


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec: FieldSpec, m: int):
    """Jittable pallas montmul over (16, m) operands (m multiple of TILE)."""
    consts = mont_consts(spec)

    grid = (m // TILE,)
    tile_spec = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, m), jnp.uint32),
        grid=grid,
        in_specs=[tile_spec, tile_spec] + mont_in_specs(lambda i: (0, 0)),
        out_specs=tile_spec,
    )

    # keep constants as NUMPY: a jnp.asarray here could run under an active
    # trace (first use is inside a while_loop body) and leak its tracer into
    # the lru_cache closure.  jax.jit on the wrapper: an inner jit lowers
    # ONCE per shape no matter how many call sites the outer program has —
    # without it every jac_add/madd site re-runs the Mosaic kernel lowering
    # (~1.5 s each, 14 s of fixed per-process latency measured round 3).
    def fn(a, b):
        return call(a, b, *consts)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _mont_sqr_call(spec: FieldSpec, m: int):
    consts = mont_consts(spec)
    grid = (m // TILE,)
    tile_spec = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _mont_sqr_kernel,
        out_shape=jax.ShapeDtypeStruct((L, m), jnp.uint32),
        grid=grid,
        in_specs=[tile_spec] + mont_in_specs(lambda i: (0, 0)),
        out_specs=tile_spec,
    )

    def fn(a):
        return call(a, *consts)

    return jax.jit(fn)


def pallas_available() -> bool:
    if os.environ.get("HALO2_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def _tile_batched(call_builder, spec: FieldSpec, args):
    """Reshape/pad (L, *B) operands to (L, m) TILE multiples and call."""
    batch = args[0].shape[1:]
    m = 1
    for s in batch:
        m *= s
    flat = [a.reshape(L, m) for a in args]
    pad = (-m) % TILE
    if pad:
        flat = [jnp.pad(a, ((0, 0), (0, pad))) for a in flat]
    out = call_builder(spec, m + pad)(*flat)
    if pad:
        out = out[:, :m]
    return out.reshape((L,) + batch)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product over arbitrary batch shapes (limb axis leading)."""
    return _tile_batched(_mont_mul_call, spec, (a, b))


def mont_sqr(spec: FieldSpec, a):
    """Montgomery square over arbitrary batch shapes (limb axis leading)."""
    return _tile_batched(_mont_sqr_call, spec, (a,))
