"""Poseidon constant + digest goldens (VERDICT r2 item 6).

Offline environment: halo2_gadgets' published fp.rs tables cannot be fetched,
so beyond the one published scalar pinned in test_poseidon.py this file
cross-checks halo2_tpu.poseidon against a STRUCTURALLY INDEPENDENT second
implementation written directly from the Poseidon paper's grain-LFSR /
Cauchy-MDS parameter recipe (the algorithm halo2_gadgets implements —
reference consumer: /root/reference/src/chips/poseidon/spec.rs:17-31):

* integer-state LFSR (grain.py uses a list-of-bits state),
* MDS inverse via column-wise linear solve (grain.py uses Gauss-Jordan on an
  augmented matrix),
* a standalone sponge written from the spec (primitives.py Hash untouched).

A self-consistent bug in either implementation fails these tests; only an
identical misreading of the published algorithm in both would pass.  The
tables are also frozen by checksum so any future drift is loud.
"""

import hashlib

from halo2_tpu.field import Fp, Fr
from halo2_tpu.poseidon import MySpec, generate_constants, poseidon_hash


# --------------------------------------------------- independent grain LFSR
class _IntGrain:
    """80-bit LFSR kept as a single int, MSB = bit 79 (state index 0)."""

    def __init__(self, p: int, n_bits: int, t: int, r_f: int, r_p: int):
        self.p = p
        self.n_bits = n_bits
        seed = 0
        widths = ((1, 2), (0, 4), (n_bits, 12), (t, 12), (r_f, 10), (r_p, 10), ((1 << 30) - 1, 30))
        for value, width in widths:
            seed = (seed << width) | value
        assert seed.bit_length() <= 80
        self.s = seed
        for _ in range(160):
            self._clock()

    def _clock(self) -> int:
        s = self.s
        # taps at state positions 62, 51, 38, 23, 13, 0 (position 0 = MSB)
        bit = (
            (s >> (79 - 62)) ^ (s >> (79 - 51)) ^ (s >> (79 - 38))
            ^ (s >> (79 - 23)) ^ (s >> (79 - 13)) ^ (s >> 79)
        ) & 1
        self.s = ((s << 1) | bit) & ((1 << 80) - 1)
        return bit

    def _shrunk_bit(self) -> int:
        while True:
            b1, b2 = self._clock(), self._clock()
            if b1:
                return b2

    def _sample(self) -> int:
        v = 0
        for _ in range(self.n_bits):
            v = (v << 1) | self._shrunk_bit()
        return v

    def field_rejecting(self) -> int:
        while True:
            v = self._sample()
            if v < self.p:
                return v

    def field_reducing(self) -> int:
        return self._sample() % self.p


def _independent_constants(p: int, n_bits: int, t: int, r_f: int, r_p: int):
    g = _IntGrain(p, n_bits, t, r_f, r_p)
    rcs = [[g.field_rejecting() for _ in range(t)] for _ in range(r_f + r_p)]
    while True:
        vals = [g.field_reducing() for _ in range(2 * t)]
        if len(set(vals)) != len(vals):
            continue
        xs, ys = vals[:t], vals[t:]
        if any((x + y) % p == 0 for x in xs for y in ys):
            continue
        mds = [[pow((xs[i] + ys[j]) % p, p - 2, p) for j in range(t)] for i in range(t)]
        return rcs, mds


def _solve_inverse(mds, p):
    """Inverse via per-column linear solves (independent of grain.py's
    augmented-matrix Gauss-Jordan)."""
    t = len(mds)
    cols = []
    for c in range(t):
        a = [row[:] for row in mds]
        b = [1 if r == c else 0 for r in range(t)]
        for i in range(t):
            piv = next(r for r in range(i, t) if a[r][i] % p)
            a[i], a[piv] = a[piv], a[i]
            b[i], b[piv] = b[piv], b[i]
            inv = pow(a[i][i], p - 2, p)
            a[i] = [x * inv % p for x in a[i]]
            b[i] = b[i] * inv % p
            for r in range(t):
                if r != i and a[r][i] % p:
                    f = a[r][i]
                    a[r] = [(x - f * y) % p for x, y in zip(a[r], a[i])]
                    b[r] = (b[r] - f * b[i]) % p
        cols.append(b)
    return [[cols[c][r] for c in range(t)] for r in range(t)]


def _independent_hash(p, n_bits, t, message):
    """Standalone ConstantLength sponge from the spec (rate = t - 1)."""
    rate, L = t - 1, len(message)
    rcs, mds = _independent_constants(p, n_bits, t, 8, 56)

    def perm(state):
        for rnd in range(64):
            state = [(w + rc) % p for w, rc in zip(state, rcs[rnd])]
            sbox_upto = t if (rnd < 4 or rnd >= 60) else 1
            for i in range(sbox_upto):
                state[i] = pow(state[i], 5, p)
            state = [
                sum(mds[i][j] * state[j] for j in range(t)) % p for i in range(t)
            ]
        return state

    k = (L + rate - 1) // rate
    words = [int(m) for m in message] + [0] * (k * rate - L)
    state = [0] * rate + [(L << 64) % p]
    for c in range(k):
        for i, w in enumerate(words[c * rate : (c + 1) * rate]):
            state[i] = (state[i] + w) % p
        state = perm(state)
    return state[0]


def _table_checksum(rcs, mds) -> str:
    h = hashlib.sha256()
    for row in rcs:
        for v in row:
            h.update(int(v).to_bytes(32, "little"))
    for row in mds:
        for v in row:
            h.update(int(v).to_bytes(32, "little"))
    return h.hexdigest()


def _spec_of(F):
    return F.SPEC


def test_width3_constants_cross_check():
    spec = _spec_of(Fp)
    got_rcs, got_mds, got_inv = generate_constants(spec, 3, 8, 56)
    want_rcs, want_mds = _independent_constants(spec.p, spec.num_bits, 3, 8, 56)
    assert got_rcs == want_rcs
    assert got_mds == want_mds
    assert got_inv == _solve_inverse(want_mds, spec.p)
    # published anchor (halo2_gadgets fp.rs ROUND_CONSTANTS[0][0])
    assert got_rcs[0][0] == 0x360D7470611E473D353F628F76D110F34E71162F31003B7057538C2596426303


def test_width5_constants_cross_check():
    """The flagship's MySpec width (merkle_sum_tree WIDTH=5, RATE=4)."""
    spec = _spec_of(Fr)
    got_rcs, got_mds, got_inv = generate_constants(spec, 5, 8, 56)
    want_rcs, want_mds = _independent_constants(spec.p, spec.num_bits, 5, 8, 56)
    assert got_rcs == want_rcs
    assert got_mds == want_mds
    assert got_inv == _solve_inverse(want_mds, spec.p)


def test_constant_table_checksums_frozen():
    """Freeze the generated tables so any future grain/MDS drift is loud."""
    fp = _spec_of(Fp)
    fr = _spec_of(Fr)
    sums = {
        ("fp", 3): _table_checksum(*generate_constants(fp, 3, 8, 56)[:2]),
        ("fr", 3): _table_checksum(*generate_constants(fr, 3, 8, 56)[:2]),
        ("fr", 5): _table_checksum(*generate_constants(fr, 5, 8, 56)[:2]),
    }
    assert sums == {
        ("fp", 3): "a9a13cf048dcb1fdc90989307b50514fc8454fc53853f704d4a5b395b9b98812",
        ("fr", 3): "20a6364b21446c75eafb313c00cda37f1e772a3e76f158d6938b40fd52988709",
        ("fr", 5): "ac9832f6a2bfb6c4f75cab5cbaac0a523bef54b472ff45fea50b5a1f4d9fa5c3",
    }


def test_digest_cross_check_width3_fp():
    spec = _spec_of(Fp)
    msg = [Fp.from_u64(7), Fp.from_u64(11)]
    want = _independent_hash(spec.p, spec.num_bits, 3, msg)
    assert int(poseidon_hash(Fp, MySpec(3, 2), msg)) == want


def test_digest_cross_check_width5_fr():
    spec = _spec_of(Fr)
    msg = [Fr.from_u64(v) for v in (10, 100, 5, 50)]
    want = _independent_hash(spec.p, spec.num_bits, 5, msg)
    assert int(poseidon_hash(Fr, MySpec(5, 4), msg)) == want
