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

from .params import FieldSpec, LIMB_BITS, LIMB_MASK, NUM_LIMBS, to_limbs, from_limbs

L = NUM_LIMBS
U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_SHIFT = LIMB_BITS


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
        self._one_mont_np = _col(to_limbs(spec.r))  # Montgomery 1
        self._inv_exp_bits = np.array(
            [(spec.p - 2) >> i & 1 for i in range(spec.num_bits)], dtype=np.uint32
        )

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
    # Carry/borrow chains run as lax.scan over the limb axis: the body is
    # traced once, keeping the XLA graph ~5 primitives per chain regardless
    # of limb count (this is what makes EC/MSM graphs tractable).
    def _carry_normalize(self, t):
        """t: (L, *B) with limbs < 2^31 -> canonical 16-bit limbs + final carry."""

        def body(c, tj):
            s = tj + c
            return s >> _SHIFT, s & _MASK

        c, out = jax.lax.scan(body, jnp.zeros(t.shape[1:], U32), t)
        return out, c

    def _raw_sub(self, a, b):
        """a - b mod 2^256 with final borrow flag (1 if a < b)."""

        def body(borrow, ab):
            aj, bj = ab
            tmp = aj + np.uint32(1 << _SHIFT) - bj - borrow
            return np.uint32(1) - (tmp >> _SHIFT), tmp & _MASK

        a, b, _ = self._bcast(a, b)
        borrow, out = jax.lax.scan(body, jnp.zeros(a.shape[1:], U32), (a, b))
        return out, borrow

    def _raw_add(self, a, b):
        def body(c, ab):
            aj, bj = ab
            s = aj + bj + c
            return s >> _SHIFT, s & _MASK

        a, b, _ = self._bcast(a, b)
        c, out = jax.lax.scan(body, jnp.zeros(a.shape[1:], U32), (a, b))
        return out, c

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

    def mul(self, a, b):
        """Montgomery product: a * b * R^{-1} mod p.

        Product phase: 16-bit partial products split lo/hi and summed by
        column with shifted pads (sums < 2^21, exact in uint32).  Reduction:
        CIOS expressed as a 16-step lax.scan over a sliding 16-limb window —
        each step settles one low limb (m = t_low * n0; window += m*p) so the
        whole reduce is ONE scan node (~10 primitives) in the graph.
        """
        a, b, batch = self._bcast(a, b)
        # ---- product: t[k] = sum_{i+j=k} a_i b_j (lo) + sum_{i+j=k-1} (hi)
        prod = a[:, None] * b[None, :]  # (L, L, *B) full 32-bit products
        lo = prod & _MASK
        hi = prod >> _SHIFT
        rows = [
            jnp.pad(lo[i], [(i, L - i)] + [(0, 0)] * len(batch)) for i in range(L)
        ] + [
            jnp.pad(hi[i], [(i + 1, L - i - 1)] + [(0, 0)] * len(batch))
            for i in range(L)
        ]
        t = sum(rows[1:], start=rows[0])  # (2L, *B), columns < 2^21

        # ---- REDC scan: window w = positions i..i+15; xs feeds t[i+16]
        pc = self._p_col(len(batch))
        n0 = self.n0

        def body(w, t_in):
            m = (w[0] * n0) & _MASK
            mp = m * pc  # (L, *B)
            mlo = mp & _MASK
            mhi = mp >> _SHIFT
            c = (w[0] + mlo[0]) >> _SHIFT
            shifted = jnp.concatenate([w[1:] + mlo[1:], t_in[None]], axis=0)
            w = shifted + mhi
            w = w.at[0].add(c)
            return w, None

        w, _ = jax.lax.scan(body, t[:L], t[L:])
        res, _ = self._carry_normalize(w)
        return self._cond_sub_p(res)

    def square(self, a):
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
    def encode(self, values, to_mont: bool = True):
        """Host ints / PrimeField elems -> (L, N) device array (Montgomery)."""
        out = np.empty((L, len(values)), np.uint32)
        p, r = self.p, self.spec.r
        for i, v in enumerate(values):
            v = int(v) % p
            if to_mont:
                v = v * r % p
            for j in range(L):
                out[j, i] = (v >> (LIMB_BITS * j)) & LIMB_MASK
        return jnp.asarray(out)

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
