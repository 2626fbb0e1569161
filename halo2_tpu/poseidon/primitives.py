"""Poseidon primitive: specs, host sponge, and a batched device permutation.

Host side mirrors halo2_gadgets `poseidon::primitives` (Spec, ConstantLength
domain, Hash) — these digests feed instance columns, so they must match the
reference bit-exactly (host oracles at src/circuits/merkle_v3.rs:72-87,
merkle_sum_tree.rs:121-150, poseidon.rs:88-90).

Device side exposes the same permutation as a `lax.scan` over rounds,
vectorized over a batch axis — used for bulk tree building and benchmarks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field.device import DeviceField, get_device_field
from ..field.host import PrimeField
from .grain import generate_constants


class Spec:
    """Poseidon spec bound to (width, rate); halo2_gadgets `Spec` trait."""

    def __init__(self, width: int, rate: int):
        assert rate == width - 1
        self.width = width
        self.rate = rate

    def full_rounds(self) -> int:
        raise NotImplementedError

    def partial_rounds(self) -> int:
        raise NotImplementedError

    def sbox(self, v):
        return v ** 5

    def secure_mds(self) -> int:
        return 0

    def constants(self, F: type[PrimeField]):
        """(round_constants, mds, mds_inv) as host field elements."""
        rcs, mds, mds_inv = generate_constants(
            F.SPEC, self.width, self.full_rounds(), self.partial_rounds(), self.secure_mds()
        )
        wrap = lambda rows: [[F(v) for v in row] for row in rows]
        return wrap(rcs), wrap(mds), wrap(mds_inv)


class MySpec(Spec):
    """The reference's MySpec (src/chips/poseidon/spec.rs): 8 full + 56
    partial rounds, x^5 sbox, secure_mds = 0, any width/rate."""

    def full_rounds(self) -> int:
        return 8

    def partial_rounds(self) -> int:
        return 56


class P128Pow5T3(MySpec):
    """halo2_gadgets' hardcoded width-3 spec; its constants are exactly the
    grain-generated ones for (t=3, 8, 56), so MySpec<3,2> coincides with it
    (observed by the reference: merkle_v3 hashes host-side with P128Pow5T3
    and in-circuit with MySpec, src/circuits/merkle_v3.rs:65-87)."""

    def __init__(self):
        super().__init__(3, 2)


class ConstantLength:
    """ConstantLength<L> domain: zero-pad to a multiple of RATE; capacity
    element encodes the length as L << 64."""

    def __init__(self, L: int):
        self.L = L

    def initial_capacity_element(self, F):
        return F.from_u128(self.L << 64)

    def padding(self, F, rate: int):
        k = (self.L + rate - 1) // rate
        return [F.zero()] * (k * rate - self.L)


def permute(state: list, spec: Spec, mds, round_constants):
    """Host permutation on field elements; halo2_gadgets primitives::permute."""
    width = spec.width
    r_f = spec.full_rounds() // 2
    r_p = spec.partial_rounds()

    def apply_mds(st):
        return [
            sum((mds[i][j] * st[j] for j in range(width)), start=type(st[0]).zero())
            for i in range(width)
        ]

    def full_round(st, rcs):
        return apply_mds([spec.sbox(w + rc) for w, rc in zip(st, rcs)])

    def part_round(st, rcs):
        st = [w + rc for w, rc in zip(st, rcs)]
        st[0] = spec.sbox(st[0])
        return apply_mds(st)

    rounds = [full_round] * r_f + [part_round] * r_p + [full_round] * r_f
    for f, rcs in zip(rounds, round_constants):
        state = f(state, rcs)
    return state


class Hash:
    """Out-of-circuit Poseidon hash (halo2_gadgets primitives::Hash) for
    ConstantLength domains."""

    def __init__(self, F: type[PrimeField], spec: Spec, domain: ConstantLength):
        self.F = F
        self.spec = spec
        self.domain = domain
        self.rcs, self.mds, self.mds_inv = spec.constants(F)

    @classmethod
    def init(cls, F, spec: Spec, domain: ConstantLength) -> "Hash":
        return cls(F, spec, domain)

    def hash(self, message):
        F, spec = self.F, self.spec
        assert len(message) == self.domain.L
        words = list(message) + self.domain.padding(F, spec.rate)
        state = [F.zero()] * spec.rate + [self.domain.initial_capacity_element(F)]
        for chunk_start in range(0, len(words), spec.rate):
            chunk = words[chunk_start : chunk_start + spec.rate]
            for i, w in enumerate(chunk):
                state[i] = state[i] + w
            state = permute(state, spec, self.mds, self.rcs)
        return state[0]


def poseidon_hash(F, spec: Spec, message) -> PrimeField:
    """Convenience one-shot hash with ConstantLength<len(message)>."""
    return Hash(F, spec, ConstantLength(len(message))).hash(message)


# --------------------------------------------------------------------------
# Device (batched) permutation
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _device_constants(field_spec, width, r_f_total, r_p, secure_mds):
    rcs, mds, _ = generate_constants(field_spec, width, r_f_total, r_p, secure_mds)
    df = get_device_field(field_spec)
    rc_dev = jnp.stack([df.encode(row) for row in rcs])       # (R, L, W) -> want (R, W, L)
    rc_dev = jnp.transpose(rc_dev, (0, 2, 1))                  # (R, W, L)
    mds_dev = jnp.stack([df.encode(row) for row in mds])       # (W, L, W)
    mds_dev = jnp.transpose(mds_dev, (0, 2, 1))                # (W_i, W_j, L)
    return rc_dev, mds_dev


def permute_device(df: DeviceField, spec: Spec, state):
    """Batched Poseidon permutation on device.

    state: (W, L, B) Montgomery limb arrays -> same shape out.  Rounds run as
    three lax.scans (full/partial/full); each round is ~W^2+3W field muls
    vectorized over the batch axis B.
    """
    W = spec.width
    r_f = spec.full_rounds() // 2
    r_p = spec.partial_rounds()
    rc_dev, mds_dev = _device_constants(
        df.spec, W, spec.full_rounds(), spec.partial_rounds(), spec.secure_mds()
    )

    def sbox(x):
        x2 = df.square(x)
        return df.mul(df.square(x2), x)

    def apply_mds(st):
        # st: (W, L, B); out[i] = sum_j mds[i][j] * st[j]
        out = []
        for i in range(W):
            acc = df.mul(mds_dev[i, 0][:, None], st[0])
            for j in range(1, W):
                acc = df.add(acc, df.mul(mds_dev[i, j][:, None], st[j]))
            out.append(acc)
        return jnp.stack(out)

    def full_body(st, rc):
        st = jnp.stack([sbox(df.add(st[i], rc[i][:, None])) for i in range(W)])
        return apply_mds(st), None

    def part_body(st, rc):
        st = jnp.stack([df.add(st[i], rc[i][:, None]) for i in range(W)])
        st = st.at[0].set(sbox(st[0]))
        return apply_mds(st), None

    state, _ = jax.lax.scan(full_body, state, rc_dev[:r_f])
    state, _ = jax.lax.scan(part_body, state, rc_dev[r_f : r_f + r_p])
    state, _ = jax.lax.scan(full_body, state, rc_dev[r_f + r_p :])
    return state


def hash_device(df: DeviceField, spec: Spec, L: int, messages):
    """Batched ConstantLength<L> hash: messages (L_msg, 16, B) -> (16, B)."""
    B = messages.shape[-1]
    rate = spec.rate
    k = (L + rate - 1) // rate
    cap = df.encode_scalar(L << 64)[:, None]  # Montgomery capacity element
    state = jnp.zeros((spec.width, 16, B), jnp.uint32).at[rate].set(
        jnp.broadcast_to(cap, (16, B))
    )
    padded = jnp.concatenate(
        [messages, jnp.zeros((k * rate - L, 16, B), jnp.uint32)], axis=0
    )
    for c in range(k):
        chunk = padded[c * rate : (c + 1) * rate]
        state = state.at[:rate].set(
            jnp.stack([df.add(state[i], chunk[i]) for i in range(rate)])
        )
        state = permute_device(df, spec, state)
    return state[0]
