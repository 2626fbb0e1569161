"""Device (TPU) prime-field arithmetic over limb-decomposed arrays.

Representation: a *field array* is a ``uint32`` tensor of shape ``(16, *batch)``
— 16 little-endian limbs of 16 bits, **limb axis leading** so the batch axes
land on TPU sublanes/lanes.  Values are kept in Montgomery form (R = 2^256) and
always normalized (< p, limbs < 2^16) between ops.

The multiplier is an operand-scanning Montgomery multiply expressed as ~150
fused vector ops: 16-bit limb products fit 32-bit lanes exactly
((2^16-1)^2 + 2*(2^16-1) < 2^32), column accumulations stay < 2^23, and the
per-step low-limb carry push keeps the CIOS invariant.  This replaces the
reference's Rust `halo2curves` Montgomery backend (reference: the field ops
behind every `Fp::from` / gate evaluation, e.g. src/circuits/utils.rs:2) with a
formulation XLA can fuse and tile across rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import FieldSpec, LIMB_BITS, LIMB_MASK, NUM_LIMBS, to_limbs

L = NUM_LIMBS
U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_SHIFT = LIMB_BITS


@functools.lru_cache(maxsize=None)
def _pallas_wanted() -> bool:
    from .pallas_mul import pallas_available

    return pallas_available()


def _col(limbs_list):
    """Host limb list -> (L, 1) numpy col for broadcasting against (L, *B)."""
    return np.array(limbs_list, dtype=np.uint32)


class DeviceField:
    """Vectorized field arithmetic bound to one :class:`FieldSpec`."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.p = spec.p
        self._p_np = _col(spec.p_limbs())          # (L,) numpy
        self.n0 = np.uint32(spec.n0)
        # full-width Montgomery constant N' = -p^{-1} mod 2^256 (loop-free REDC)
        nprime = (-pow(spec.p, -1, 1 << 256)) % (1 << 256)
        self._nprime_np = np.array(
            [(nprime >> (16 * j)) & 0xFFFF for j in range(L)], np.uint32
        )
        self._one_mont_np = _col(to_limbs(spec.r))  # Montgomery 1
        self._inv_exp_bits = np.array(
            [(spec.p - 2) >> i & 1 for i in range(spec.num_bits)], dtype=np.uint32
        )
        # limb-convolution matrices: column sums of stacked [lo | hi] partial
        # products as ONE f32 matmul (exact: all values < 2^24)
        t_full = np.zeros((2 * L, 2 * L * L), np.float32)
        for i in range(L):
            for j in range(L):
                t_full[i + j, i * L + j] = 1.0          # lo part at column i+j
                t_full[i + j + 1, L * L + i * L + j] = 1.0  # hi part at i+j+1
        self._t_full = t_full
        self._t_low = t_full[:L].copy()

    # ---------------------------------------------------------------- shapes
    def _bcast(self, a, b):
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        return (
            jnp.broadcast_to(a, (L,) + batch),
            jnp.broadcast_to(b, (L,) + batch),
            batch,
        )

    def _p_col(self, batch_ndim):
        return jnp.asarray(self._p_np.reshape((L,) + (1,) * batch_ndim))

    def zeros(self, batch_shape=()):
        return jnp.zeros((L,) + tuple(batch_shape), U32)

    def one_mont(self, batch_shape=()):
        one = jnp.asarray(self._one_mont_np.reshape((L,) + (1,) * len(batch_shape)))
        return jnp.broadcast_to(one, (L,) + tuple(batch_shape))

    # ------------------------------------------------------------- normalize
    # Carry chains via Kogge-Stone: two shift rounds squeeze limbs to
    # [0, 2^16], then log2(L) generate/propagate rounds compute exact carries.
    # Loop-free (~35 primitives) AND O(log L) depth — the scan version was
    # 16 sequential while-loop iterations per chain, which dominated runtime.
    def _norm(self, t):
        """t: (nl, *B) with limbs < 2^26 -> (canonical limbs, carry_out)."""
        nl = t.shape[0]
        zero_row = jnp.zeros((1,) + t.shape[1:], U32)

        def shift1(x, d=1):
            return jnp.concatenate([jnp.zeros((d,) + x.shape[1:], U32), x[:-d]])

        c0 = t >> _SHIFT
        v1 = (t & _MASK) + shift1(c0)
        co = c0[nl - 1]
        g1 = v1 >> _SHIFT
        v2 = (v1 & _MASK) + shift1(g1)
        co = co + g1[nl - 1]
        # digits in [0, 2^16]: exact single-bit Kogge-Stone
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

    def _carry_normalize(self, t):
        return self._norm(t)

    def _raw_sub(self, a, b):
        """a - b mod 2^256 with final borrow flag (1 if a < b)."""
        a, b, batch = self._bcast(a, b)
        comp = b ^ _MASK  # one's complement limbwise
        s = a + comp
        one0 = jnp.zeros((L,) + batch, U32).at[0].set(1)
        out, carry = self._norm(s + one0)  # a + (2^256 - b)
        return out, np.uint32(1) - carry

    def _raw_add(self, a, b):
        a, b, _ = self._bcast(a, b)
        return self._norm(a + b)

    def _cond_sub_p(self, a):
        """Reduce a in [0, 2p) to [0, p)."""
        pc = jnp.broadcast_to(self._p_col(a.ndim - 1), a.shape)
        sub, borrow = self._raw_sub(a, pc)
        return jnp.where(borrow == 0, sub, a)

    # ------------------------------------------------------------------- ops
    def add(self, a, b):
        a, b, _ = self._bcast(a, b)
        t, _ = self._carry_normalize(a + b)
        return self._cond_sub_p(t)

    def sub(self, a, b):
        a, b, _ = self._bcast(a, b)
        d, borrow = self._raw_sub(a, b)
        dp, _ = self._raw_add(d, self._p_col(d.ndim - 1))
        return jnp.where(borrow == 1, dp, d)

    def neg(self, a):
        return self.sub(self.zeros(a.shape[1:]), a)

    def double(self, a):
        return self.add(a, a)

    def _conv(self, x, y_bcast, t_mat):
        """Column sums of the limb product x*y via one exact f32 matmul.

        t_mat: (K, 2*L*L) one-hot column-assignment matrix.  All values stay
        < 2^24 so f32 accumulation at HIGHEST precision is exact; the matmul
        rides the MXU on TPU.  Returns (K, *B) uint32 columns (sums < 2^21).
        """
        k_out = t_mat.shape[0]
        batch = x.shape[1:]
        prod = x[:, None] * y_bcast[None, :]  # (L, L, *B) full 32-bit products
        lo = (prod & _MASK).reshape(L * L, -1)
        hi = (prod >> _SHIFT).reshape(L * L, -1)
        stacked = jnp.concatenate([lo, hi]).astype(jnp.float32)
        t = jnp.matmul(
            jnp.asarray(t_mat), stacked, precision=jax.lax.Precision.HIGHEST
        )
        return t.astype(U32).reshape((k_out,) + batch)

    def mul(self, a, b):
        """Montgomery product a * b * R^{-1} mod p — loop-free.

        Full-width reduction: T = a*b; m = (T mod R) * N' mod R with
        N' = -p^{-1} mod R computed as ONE low product (instead of CIOS's 16
        sequential limb steps); result = (T + m*p) / R < 2p.  All carry
        propagation is Kogge-Stone (log-depth), all limb convolutions are one
        f32 matmul each — zero XLA loops per multiply, MXU-friendly on TPU.

        On the TPU backend the same algorithm runs as a fused Pallas kernel
        (field.pallas_mul) keeping every intermediate in VMEM.
        """
        a, b, batch = self._bcast(a, b)
        if _pallas_wanted():
            from .pallas_mul import mont_mul

            return mont_mul(self.spec, a, b)
        t = self._conv(a, b, self._t_full)  # (2L, *B) columns < 2^21

        t_low_norm, _ = self._norm(t[:L])  # value mod R, canonical limbs
        nprime = jnp.asarray(self._nprime_np.reshape((L,) + (1,) * len(batch)))
        m_cols = self._conv(t_low_norm, jnp.broadcast_to(nprime, (L,) + batch), self._t_low)
        m, _ = self._norm(m_cols)  # m = (T mod R) * N' mod R

        pc = jnp.broadcast_to(self._p_col(len(batch)), (L,) + batch)
        mp = self._conv(m, pc, self._t_full)  # (2L, *B)

        s = t + mp  # columns < 2^22; low 16 columns ≡ 0 mod R
        _, c_low = self._norm(s[:L])
        high = s[L:].at[0].add(c_low)
        res, _ = self._norm(high)  # value < 2p < 2^256
        return self._cond_sub_p(res)

    def square(self, a):
        if _pallas_wanted():
            from .pallas_mul import mont_sqr

            return mont_sqr(self.spec, a)
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """Multiply by a small host constant k (adds, for k <= 4)."""
        if k == 0:
            return self.zeros(a.shape[1:])
        acc = a
        for _ in range(k - 1):
            acc = self.add(acc, a)
        return acc

    # ------------------------------------------------------------ pow / inv
    def pow_fixed(self, a, e: int):
        """a^e for a host-known exponent, via lax.scan over the exponent bits."""
        if e == 0:
            return self.one_mont(a.shape[1:])
        bits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(max(e.bit_length(), 1))], np.uint32)
        )
        return self._pow_bits(a, bits)

    def _pow_bits(self, a, bits):
        one = self.one_mont(a.shape[1:])

        def body(carry, bit):
            acc, base = carry
            acc = self.mul(acc, jnp.where(bit != 0, base, one))
            base = self.square(base)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(body, (one, a), bits)
        return acc

    def inv(self, a):
        """Batched inverse via Fermat: a^(p-2).  inv(0) = 0."""
        return self._pow_bits(a, jnp.asarray(self._inv_exp_bits))

    # ------------------------------------------------------------ predicates
    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        a, b, _ = self._bcast(a, b)
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        """mask: (*B,) bool -> where(mask, a, b) over (L, *B)."""
        a, b, _ = self._bcast(a, b)
        return jnp.where(mask[None], a, b)

    # ----------------------------------------------------------- conversions
    def encode_np(self, values, to_mont: bool = True):
        """Host ints / PrimeField elems -> (L, N) NUMPY limb array (Montgomery).

        Use this (not :meth:`encode`) inside ``lru_cache``d constant builders:
        ``jnp.asarray`` under an active jit trace yields a tracer, and caching
        a tracer leaks it out of its trace (UnexpectedTracerError later).
        Numpy constants are trace-safe and get baked in at jit time.
        """
        out = np.empty((L, len(values)), np.uint32)
        p, r = self.p, self.spec.r
        for i, v in enumerate(values):
            v = int(v) % p
            if to_mont:
                v = v * r % p
            for j in range(L):
                out[j, i] = (v >> (LIMB_BITS * j)) & LIMB_MASK
        return out

    def encode(self, values, to_mont: bool = True):
        """Host ints / PrimeField elems -> (L, N) device array (Montgomery)."""
        return jnp.asarray(self.encode_np(values, to_mont=to_mont))

    def encode_scalar(self, v, to_mont: bool = True):
        return self.encode([v], to_mont=to_mont)[:, 0]

    def decode(self, fa, from_mont: bool = True):
        """(L, *B) device array -> numpy object array of Python ints."""
        arr = np.asarray(jax.device_get(fa)).astype(object)
        flat = arr.reshape(L, -1)
        vals = np.zeros(flat.shape[1], dtype=object)
        for j in range(L):
            vals += flat[j] << (LIMB_BITS * j)
        if from_mont:
            rinv, p = self.spec.r_inv, self.p
            vals = np.array([int(v) * rinv % p for v in vals], dtype=object)
        return vals.reshape(fa.shape[1:]) if fa.ndim > 1 else int(vals[0])

    def from_u32_array(self, v):
        """Device uint32 values (*B,) -> Montgomery field arrays (L, *B)."""
        lo = (v & _MASK).astype(U32)
        hi = (v >> _SHIFT).astype(U32)
        zeros = jnp.zeros_like(lo)
        raw = jnp.stack([lo, hi] + [zeros] * (L - 2))
        r2 = jnp.asarray(_col(to_limbs(self.spec.r2)).reshape((L,) + (1,) * (v.ndim)))
        return self.mul(raw, r2)

    def to_mont_arr(self, raw):
        """Canonical-limb array -> Montgomery form (device)."""
        r2 = jnp.asarray(
            _col(to_limbs(self.spec.r2)).reshape((L,) + (1,) * (raw.ndim - 1))
        )
        return self.mul(raw, r2)

    def from_mont_arr(self, fa):
        """Montgomery form -> canonical limbs (device): multiply by 1."""
        one_raw = jnp.zeros((L,) + (1,) * (fa.ndim - 1), U32).at[0].set(1)
        return self.mul(fa, one_raw)


@functools.lru_cache(maxsize=None)
def get_device_field(spec: FieldSpec) -> DeviceField:
    return DeviceField(spec)
