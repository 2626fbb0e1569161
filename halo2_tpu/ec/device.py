"""Device (TPU) BN254 G1 arithmetic: batched Jacobian ops + Pippenger MSM.

The MSM replaces halo2's CPU Pippenger inside `KZGCommitmentScheme` commits
(reference src/circuits/utils.rs:40-48, SURVEY.md §3.2 "HOT: MSM points/sec").
TPU-native shape: window digits from canonical limbs, per-window sort by
digit (data-dependent scatter is resolved by sort, keeping device code
static-shaped), quota-scheduled suffix-sum accumulation with an Abel-summation
window combine (see the MSM section below), and a host Horner tail.

Points are pytrees {x, y, z} of (16, *B) Montgomery limb arrays; z == 0 marks
infinity.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..jitutil import tuned_jit

from ..field.device import DeviceField, get_device_field
from ..field.params import BN254_FQ, NUM_LIMBS as L

U32 = jnp.uint32

_DF = None


def df() -> DeviceField:
    global _DF
    if _DF is None:
        _DF = get_device_field(BN254_FQ)
    return _DF


def jac(x, y, z):
    return {"x": x, "y": y, "z": z}


def jac_infinity(batch=()):
    d = df()
    return jac(d.zeros(batch), d.one_mont(batch), d.zeros(batch))


def _pvary(a, axes):
    """`pcast(..., to='varying')` with a fallback for JAX builds that still
    spell it `pvary` (the old name is deprecated as of jax 0.9)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(a, axes, to="varying")
    return jax.lax.pvary(a, axes)


def pvary_tree(x, axes):
    """Mark a jac pytree (or array pytree) device-varying over mesh axes.

    Loop carries initialized from constants (jac_infinity, zero suffix
    arrays) start replicated; under shard_map with the vma soundness check ON
    they must be declared varying before entering a fori_loop whose body
    mixes in sharded data (round-3 VERDICT item 7 — check_vma now stays
    enabled on every shard_map site)."""
    if not axes:
        return x

    def pv(a):
        try:
            cur = jax.typeof(a).vma
        except Exception:
            cur = frozenset()
        need = tuple(ax for ax in axes if ax not in cur)
        return _pvary(a, need) if need else a

    return jax.tree_util.tree_map(pv, x)


def jac_from_affine(x, y):
    """x, y: (16, *B) Montgomery; (0,0) treated as infinity."""
    d = df()
    inf = d.is_zero(x) & d.is_zero(y)
    z = d.select(inf, d.zeros(x.shape[1:]), d.one_mont(x.shape[1:]))
    return jac(x, y, z)


def is_infinity(p):
    return df().is_zero(p["z"])


def jac_neg(p):
    return jac(p["x"], df().neg(p["y"]), p["z"])


def jac_double(p):
    """dbl-2009-l for a=0: 3M + 4S + ..."""
    d = df()
    x, y, z = p["x"], p["y"], p["z"]
    a = d.square(x)
    b = d.square(y)
    c = d.square(b)
    t = d.square(d.add(x, b))
    dd = d.double(d.sub(d.sub(t, a), c))
    e = d.add(d.double(a), a)
    f = d.square(e)
    x3 = d.sub(f, d.double(dd))
    y3 = d.sub(d.mul(e, d.sub(dd, x3)), d.double(d.double(d.double(c))))
    z3 = d.double(d.mul(y, z))
    # doubling a point with y=0 or infinity gives infinity (z3 = 0) naturally
    return jac(x3, y3, z3)


def _use_pallas_jac() -> bool:
    from ..field.pallas_mul import pallas_available

    return pallas_available()


def jac_add(p, q):
    """Complete Jacobian addition (dispatches to the fused Pallas kernel on
    TPU — ec/pallas_jac.py — else the jnp formulation below)."""
    if _use_pallas_jac():
        from .pallas_jac import jac_add_pallas

        return jac_add_pallas(p, q)
    return _jac_add_jnp(p, q)


def _jac_add_jnp(p, q):
    """Complete Jacobian addition via add-2007-bl + exception selects.

    The P == Q exception needs a doubling, but two independently-computed
    points coincide with negligible probability on real workloads — so the
    doubling branch sits behind a scalar ``lax.cond`` and its 7 extra field
    muls are only paid on the (rare) rounds where some lane actually hits it.
    Under ``vmap`` the cond lowers to a select (both branches run), which is
    exactly the old behavior — never worse.
    """
    d = df()
    x1, y1, z1 = p["x"], p["y"], p["z"]
    x2, y2, z2 = q["x"], q["y"], q["z"]
    z1z1 = d.square(z1)
    z2z2 = d.square(z2)
    u1 = d.mul(x1, z2z2)
    u2 = d.mul(x2, z1z1)
    s1 = d.mul(d.mul(y1, z2), z2z2)
    s2 = d.mul(d.mul(y2, z1), z1z1)
    h = d.sub(u2, u1)
    r = d.sub(s2, s1)

    hh = d.square(h)
    i = d.double(d.double(hh))  # 4h^2 — (2h)^2 variant
    j = d.mul(h, i)
    rr = d.double(r)
    v = d.mul(u1, i)
    x3 = d.sub(d.sub(d.square(rr), j), d.double(v))
    y3 = d.sub(d.mul(rr, d.sub(v, x3)), d.double(d.mul(s1, j)))
    z3 = d.mul(d.double(d.mul(z1, z2)), h)

    h_zero = d.is_zero(h)
    r_zero = d.is_zero(r)
    p_inf = d.is_zero(z1)
    q_inf = d.is_zero(z2)

    same = h_zero & r_zero & ~p_inf & ~q_inf       # P == Q -> double
    opposite = h_zero & ~r_zero & ~p_inf & ~q_inf  # P == -Q -> infinity

    def sel(mask, a, b):
        return d.select(mask, a, b)

    out = jac(x3, y3, z3)
    out = jax.lax.cond(
        jnp.any(same),
        lambda o: {k: sel(same, v, o[k]) for k, v in jac_double(p).items()},
        lambda o: o,
        out,
    )
    inf = jac_infinity(x3.shape[1:])
    out = {k: sel(opposite, inf[k], out[k]) for k in out}
    out = {k: sel(p_inf, q[k], out[k]) for k in out}
    out = {k: sel(q_inf, p[k], out[k]) for k in out}
    return out


def jac_madd(p, qx, qy, valid):
    """Mixed add (dispatches to the fused Pallas kernel on TPU)."""
    if _use_pallas_jac():
        from .pallas_jac import jac_madd_pallas

        return jac_madd_pallas(p, qx, qy, valid)
    return _jac_madd_jnp(p, qx, qy, valid)


def _jac_madd_jnp(p, qx, qy, valid):
    """Mixed Jacobian + affine add: p + (qx, qy) where ``valid`` else p.

    madd-2007-bl (7M + 4S — vs 11M + 5S + an unconditional double for the
    complete add this replaces in the Pippenger bucket loop).  (qx, qy) must
    be a real curve point (z = 1, never infinity); ``valid`` masks lanes out.
    Exceptions handled completely: p == -q falls out naturally (z3 = 0),
    p == infinity selects (qx, qy, 1), and p == q takes a jac_double behind
    a scalar ``lax.cond`` that almost never fires.
    """
    d = df()
    x1, y1, z1 = p["x"], p["y"], p["z"]
    z1z1 = d.square(z1)
    u2 = d.mul(qx, z1z1)
    s2 = d.mul(qy, d.mul(z1, z1z1))
    h = d.sub(u2, x1)
    hh = d.square(h)
    i = d.double(d.double(hh))
    j = d.mul(h, i)
    rr = d.double(d.sub(s2, y1))
    v = d.mul(x1, i)
    x3 = d.sub(d.sub(d.square(rr), j), d.double(v))
    y3 = d.sub(d.mul(rr, d.sub(v, x3)), d.double(d.mul(y1, j)))
    z3 = d.sub(d.sub(d.square(d.add(z1, h)), z1z1), hh)
    out = jac(x3, y3, z3)

    p_inf = d.is_zero(z1)
    same = valid & d.is_zero(h) & d.is_zero(rr) & ~p_inf
    out = jax.lax.cond(
        jnp.any(same),
        lambda o: {k: d.select(same, v, o[k]) for k, v in jac_double(p).items()},
        lambda o: o,
        out,
    )
    one = d.one_mont(qx.shape[1:])
    aff = jac(qx, qy, one)
    out = {k: d.select(p_inf, aff[k], out[k]) for k in out}
    return {k: d.select(valid, out[k], p[k]) for k in out}


def jac_to_affine(p):
    """Batch-normalize to affine (Montgomery); infinity -> (0, 0)."""
    d = df()
    zinv = d.inv(p["z"])
    zinv2 = d.square(zinv)
    x = d.mul(p["x"], zinv2)
    y = d.mul(p["y"], d.mul(zinv2, zinv))
    inf = d.is_zero(p["z"])
    zero = d.zeros(x.shape[1:])
    return d.select(inf, zero, x), d.select(inf, zero, y)


def scalar_mul_batched(points, scalar_bits):
    """points: jac pytree (16, N); scalar_bits: (nbits, N) uint32 0/1 —
    per-point double-and-add, batched over N (LSB first)."""

    def body(carry, bits):
        acc, base = carry
        added = jac_add(acc, base)
        acc = {k: df().select(bits != 0, added[k], acc[k]) for k in acc}
        base = jac_double(base)
        return (acc, base), None

    n = points["x"].shape[-1]
    (acc, _), _ = jax.lax.scan(body, (jac_infinity((n,)), points), scalar_bits)
    return acc


# ---------------------------------------------------------------------- MSM
#
# Quota-scheduled Pippenger via Abel summation (round-3 redesign).
#
# Per window w the required sum is  sum_e d_e * P_e  (d_e = the c-bit digit).
# Sorting the window's entries by digit makes the digit sequence monotone, so
# by Abel summation   sum_e d_e P_e = sum_{k=1}^{2^c - 1} S(pos_k)   where
# S(p) = sum of sorted points at positions >= p (a positional suffix sum) and
# pos_k = searchsorted(sorted_digits, k).  Suffix sums come from a two-level
# decomposition: each lane owns an equal contiguous chunk of q sorted entries
# and emits its running intra-chunk suffixes (q rounds, EVERY lane busy EVERY
# round — unlike per-bucket run-splitting, the schedule is load-balanced for
# any digit distribution), and a Blelloch-style tree scan (2C adds at halving
# widths) yields the cross-chunk exclusive suffixes.  No bucket arrays, no
# O(B log B) bucket reduction, and window size c is decoupled from the digit
# distribution — c=12 cuts the madd count ~1.45x vs c=8.
#
# Replaces halo2curves' CPU Pippenger inside KZG commits (reference
# src/circuits/utils.rs:40-48; SURVEY.md §2c "MSM / curve ops").


def _msm_c(n: int) -> int:
    """Window bits: larger windows cut adds (W*n total) but cost B=2^c adds
    in the Abel combine — worth it once n*W >> 2^c."""
    if n < 256:
        return 4
    if n < (1 << 14):
        return 8
    return 12


def _digits_from_limbs(scalars_canonical, c: int):
    """(16, N) canonical 16-bit limbs -> (W, N) uint32 c-bit digits (c<=16)."""
    w_n = -(-254 // c)
    mask = np.uint32((1 << c) - 1)
    outs = []
    for k in range(w_n):
        l0, off = divmod(k * c, 16)
        d = scalars_canonical[l0] >> np.uint32(off)
        if off + c > 16 and l0 + 1 < 16:
            d = d | (scalars_canonical[l0 + 1] << np.uint32(16 - off))
        outs.append(d & mask)
    return jnp.stack(outs)


def _signed_digits(digits, c: int):
    """Unsigned c-bit digits -> (magnitudes, signs): d' = d + carry, and
    d' > 2^(c-1) is emitted as -(2^c - d') with carry 1, so magnitudes stay
    <= 2^(c-1) and the Abel combine's bucket count HALVES (sum_e d_e P_e =
    sum_e mag_e * (sign_e ? -P_e : P_e)).  The top window absorbs the final
    carry (its raw digit is < 2^(254 - c*(W-1)), far below 2^(c-1) for every
    window size _msm_c chooses, so it never needs recoding)."""
    w_n = digits.shape[0]
    half = np.uint32(1 << (c - 1))
    full = np.uint32(1 << c)
    mags, signs = [], []
    carry = jnp.zeros_like(digits[0])
    for k in range(w_n - 1):
        d = digits[k] + carry
        neg = d > half
        mags.append(jnp.where(neg, full - d, d))
        signs.append(neg.astype(U32))
        carry = neg.astype(U32)
    mags.append(digits[w_n - 1] + carry)
    signs.append(jnp.zeros_like(carry))
    return jnp.stack(mags), jnp.stack(signs)


def _fold_groups(terms, Q: int):
    """Sum groups of Q adjacent entries on the last axis: (..., M) -> (..., M//Q).

    A ``fori_loop`` with ONE jac_add body — folding with unrolled halving
    widths made Mosaic compile a distinct kernel per width (the bulk of a
    181 s MSM compile, measured round 3)."""
    M = terms["x"].shape[-1]
    G = M // Q
    v = {k: a.reshape(a.shape[:-1] + (G, Q)) for k, a in terms.items()}
    init = {k: a[..., 0] for k, a in v.items()}

    def body(r, acc):
        cur = {
            k: jax.lax.dynamic_index_in_dim(a, r, a.ndim - 1, False)
            for k, a in v.items()
        }
        return jac_add(acc, cur)

    return jax.lax.fori_loop(1, Q, body, init)


def _tree_sum(terms):
    """Sum all entries of the last axis via fixed-shape radix-16 folds."""
    while terms["x"].shape[-1] > 1:
        M = terms["x"].shape[-1]
        terms = _fold_groups(terms, min(16, M))
    return {k: v[..., 0] for k, v in terms.items()}


def _excl_suffix_scan(pts, Q: int = 64, vary_axes=()):
    """Exclusive suffix sums over the last axis (power-of-2 length C):
    out[..., i] = sum_{j > i} pts[..., j].  Hierarchical: a ``fori`` running
    suffix within groups of Q (fixed shape) + a recursive scan of the group
    totals, combined with one full-width add."""
    C = pts["x"].shape[-1]
    batch = pts["x"].shape[1:]
    if C == 1:
        return pvary_tree(jac_infinity(batch), vary_axes)
    if C <= Q:
        sfx0 = pvary_tree(
            {k: jnp.zeros((L,) + batch[:-1] + (C,), U32) for k in pts}, vary_axes
        )

        def body(r, carry):
            acc, sfx = carry
            pos = C - 1 - r
            sfx = {
                k: jax.lax.dynamic_update_slice_in_dim(
                    sfx[k], acc[k][..., None], pos, axis=sfx[k].ndim - 1
                )
                for k in sfx
            }
            cur = {
                k: jax.lax.dynamic_index_in_dim(a, pos, a.ndim - 1, False)
                for k, a in pts.items()
            }
            return jac_add(acc, cur), sfx

        _, sfx = jax.lax.fori_loop(
            0, C, body, (pvary_tree(jac_infinity(batch[:-1]), vary_axes), sfx0)
        )
        return sfx
    G = C // Q
    v = {k: a.reshape(a.shape[:-1] + (G, Q)) for k, a in pts.items()}
    sfx0 = pvary_tree({k: jnp.zeros_like(a) for k, a in v.items()}, vary_axes)

    def body(r, carry):
        acc, sfx = carry
        pos = Q - 1 - r
        sfx = {
            k: jax.lax.dynamic_update_slice_in_dim(
                sfx[k], acc[k][..., None], pos, axis=sfx[k].ndim - 1
            )
            for k in sfx
        }
        cur = {
            k: jax.lax.dynamic_index_in_dim(a, pos, a.ndim - 1, False)
            for k, a in v.items()
        }
        return jac_add(acc, cur), sfx

    gtot, sfx = jax.lax.fori_loop(
        0, Q, body, (pvary_tree(jac_infinity(batch[:-1] + (G,)), vary_axes), sfx0)
    )
    gsfx = _excl_suffix_scan(gtot, Q, vary_axes)  # (16, ..., G)
    gb = {k: jnp.broadcast_to(a[..., None], a.shape + (Q,)) for k, a in gsfx.items()}
    out = jac_add(sfx, gb)
    return {k: a.reshape(a.shape[:-2] + (C,)) for k, a in out.items()}


def _window_sums(px, py, digits, signs, c: int, vary_axes=(), q_rounds: int = 8):
    """Window sums sum_e d_e P_e for all windows at once.

    px, py: (16, n) affine Montgomery ((0,0) rows must have digit 0 — their
    garbage contributions only ever pollute suffix positions below pos_1,
    which the Abel combine never reads).  digits: (W, n) uint32.
    Returns a jac pytree (16, W).
    """
    w_n, n = digits.shape
    # signed digits: magnitudes <= 2^(c-1), so the Abel combine runs over
    # half the bucket positions of the unsigned form (round-4 redesign)
    B_eff = 1 << (c - 1)
    # chunks per window; q = n // C accumulation rounds, zero idle lanes.
    # q trades per-round fixed cost (fewer, wider rounds) against the
    # cross-chunk suffix-scan size (C = n/q chunks); 8 measured best at
    # 2^16 in the round-4 schedule sweep (183 ms vs 260 ms at q=16).
    C = max(1, n // q_rounds)
    q = n // C

    # ONE u32 key per entry — (mag | sign | index) packed so a single
    # UNSTABLE single-operand sort replaces the variadic argsort (stability
    # is irrelevant: the Abel combine only reads digit boundaries).  Fits
    # u32 for every reachable shape: c <= 12 and n <= _MSM_SLICE = 2^18
    # gives c + 1 + 18 = 31 bits.
    ib = max(1, (n - 1).bit_length())
    key = (
        (digits << np.uint32(ib + 1))
        | (signs << np.uint32(ib))
        | jnp.arange(n, dtype=U32)[None, :]
    )
    skey = jax.lax.sort(key, dimension=1, is_stable=False)
    order = (skey & np.uint32((1 << ib) - 1)).astype(jnp.int32)  # (W, n)
    sign_sorted = (skey >> np.uint32(ib)) & np.uint32(1)
    sd = skey >> np.uint32(ib + 1)
    order_cq = order.reshape(w_n, C, q)
    sign_cq = sign_sorted.reshape(w_n, C, q)
    # one stacked (n, 32) tensor: ONE row-gather per round instead of two.
    stacked_t = jnp.concatenate([px, py]).T

    # ---- intra-chunk suffix accumulation: q rounds, every lane busy
    valid = jnp.ones((w_n, C), bool)
    sfx0 = pvary_tree(
        {k: jnp.zeros((L, w_n, C, q), U32) for k in ("x", "y", "z")}, vary_axes
    )

    def body(r, carry):
        acc, sfx = carry
        pos = q - 1 - r
        idx = jax.lax.dynamic_slice_in_dim(order_cq, pos, 1, axis=2)[..., 0]
        sgn = jax.lax.dynamic_slice_in_dim(sign_cq, pos, 1, axis=2)[..., 0]
        g = jnp.moveaxis(stacked_t[idx], -1, 0)  # (32, W, C)
        qy = g[16:]
        qy = df().select(sgn != 0, df().neg(qy), qy)  # signed-digit negation
        acc = jac_madd(acc, g[:16], qy, valid)
        sfx = {
            k: jax.lax.dynamic_update_slice_in_dim(
                sfx[k], acc[k][..., None], pos, axis=3
            )
            for k in sfx
        }
        return acc, sfx

    chunk_tot, sfx = jax.lax.fori_loop(
        0, q, body, (pvary_tree(jac_infinity((w_n, C)), vary_axes), sfx0)
    )
    sfx = {k: v.reshape(L, w_n, n) for k, v in sfx.items()}

    # ---- cross-chunk exclusive suffixes CS[ch] = sum of chunks after ch
    CS = _excl_suffix_scan(chunk_tot, vary_axes=vary_axes)  # (16, W, C)

    # ---- Abel combine: sum_k S(pos_k), k = 1..B_eff (signed magnitudes)
    ks = jnp.arange(1, B_eff + 1, dtype=sd.dtype)
    pos = jax.vmap(lambda s: jnp.searchsorted(s, ks))(sd).astype(jnp.int32)
    ok = pos < n  # (W, B_eff)
    posc = jnp.clip(pos, 0, n - 1)
    s_intra = {
        k: jnp.take_along_axis(v, posc[None], axis=2) for k, v in sfx.items()
    }
    s_cross = {
        k: jnp.take_along_axis(v, (posc // q)[None], axis=2)
        for k, v in CS.items()
    }
    terms = jac_add(s_intra, s_cross)  # (16, W, B_eff)
    inf = pvary_tree(jac_infinity((w_n, B_eff)), vary_axes)
    terms = {k: df().select(~ok, inf[k], v) for k, v in terms.items()}

    # tree-reduce over k (B_eff = 2^(c-1) is already a power of two)
    return _tree_sum(terms)  # (16, W)


def _q_rounds(n: int) -> int:
    """Accumulation rounds per chunk.  Round-4 sweep at 2^16: q=8 beat q=16
    by 30% (183 vs 260 ms window sums); at the 2^18 slice size q=8 REGRESSED
    the 2^20 MSM (the cross-chunk suffix scan grows to C = n/8 = 32k tiny-
    lane rounds), so larger slices keep q=16."""
    return 8 if n <= (1 << 16) else 16


def _chunkable_n(n: int, q: int) -> int:
    """Smallest m >= n that _window_sums can chunk: m = q*C with C either
    <= 64 or recursively a multiple of 64 (the _excl_suffix_scan radix), so
    C*q == m holds at every level.  Padding entries are (0,0) points with
    digit 0 — sorted first and never read by the Abel combine (same invariant
    as real infinity inputs)."""
    if n < q:
        return n

    def round_chunks(C):
        if C <= 64:
            return C
        return 64 * round_chunks(-(-C // 64))

    return q * round_chunks(-(-n // q))


def _msm_wsums_raw(n: int):
    """Device Pippenger through window sums: (px, py, scalars) -> stacked
    Jacobian window sums, ONE (3, 16, W) array (x/y/z), normalized to affine
    later on the host (one device_get for all coordinates — each fetch pays a
    full tunnel round trip).  The Horner window combine (c*W sequential
    doublings at lane width 1 — idle-VPU time, measured round 2) is finished
    on the HOST with big-int Jacobian ops (~3 ms), where sequential-scalar
    work belongs."""
    c = _msm_c(n)
    q = _q_rounds(n)
    m = _chunkable_n(n, q)

    def fn(px, py, scalars_canonical):
        if m != n:
            pad = ((0, 0), (0, m - n))
            px = jnp.pad(px, pad)
            py = jnp.pad(py, pad)
            scalars_canonical = jnp.pad(scalars_canonical, pad)
        digits = _digits_from_limbs(scalars_canonical, c)
        # infinity inputs ((0,0) marker) can't ride the mixed add — force
        # digit 0, which the Abel combine never reads
        pt_inf = df().is_zero(px) & df().is_zero(py)
        digits = jnp.where(pt_inf[None], 0, digits)
        digits, signs = _signed_digits(digits, c)
        # Jacobian window sums; normalization happens on the HOST (the
        # device inverse is a 254-step scan at lane width W — pure dispatch
        # overhead for 22 lanes).  Stacked into ONE array: each device_get
        # pays a full tunnel round trip (~28 ms measured), so three separate
        # coordinate fetches would triple the host-tail latency.
        w = _window_sums(px, py, digits, signs, c, q_rounds=q)
        return jnp.stack([w["x"], w["y"], w["z"]])

    return fn


@functools.lru_cache(maxsize=None)
def _msm_wsums_jit(n: int):
    return tuned_jit(_msm_wsums_raw(n))


def _msm_raw(n: int, vary_axes=()):
    """Fully-device MSM (window sums + device Horner) — used where the result
    must stay a device value (the shard_map'd multi-chip path).
    ``vary_axes``: mesh axes to declare loop carries varying over (shard_map
    callers with check_vma on)."""
    c = _msm_c(n)
    q = _q_rounds(n)
    num_windows = -(-254 // c)
    m = _chunkable_n(n, q)

    def fn(px, py, scalars_canonical):
        if m != n:
            pad = ((0, 0), (0, m - n))
            px = jnp.pad(px, pad)
            py = jnp.pad(py, pad)
            scalars_canonical = jnp.pad(scalars_canonical, pad)
        digits = _digits_from_limbs(scalars_canonical, c)
        pt_inf = df().is_zero(px) & df().is_zero(py)
        digits = jnp.where(pt_inf[None], 0, digits)
        digits, signs = _signed_digits(digits, c)
        wsums = _window_sums(px, py, digits, signs, c, vary_axes, q_rounds=q)

        def horner(i, acc):
            acc = jax.lax.fori_loop(0, c, lambda _, a: jac_double(a), acc)
            w = {
                k: jax.lax.dynamic_index_in_dim(v, num_windows - 1 - i, 1, False)
                for k, v in wsums.items()
            }
            return jac_add(acc, w)

        return jax.lax.fori_loop(
            0, num_windows, horner, pvary_tree(jac_infinity(()), vary_axes)
        )

    return fn


# ---------------------------------------------- host Jacobian (Python ints)
def _hj_dbl(p, q):
    """dbl-2009-l on host ints; p = (X, Y, Z) or None for infinity."""
    if p is None:
        return None
    X, Y, Z = p
    A = X * X % q
    B = Y * Y % q
    C = B * B % q
    D = 2 * ((X + B) * (X + B) - A - C) % q
    E = 3 * A % q
    F = E * E % q
    X3 = (F - 2 * D) % q
    Y3 = (E * (D - X3) - 8 * C) % q
    Z3 = 2 * Y * Z % q
    return None if Z3 == 0 else (X3, Y3, Z3)


def _hj_madd(p, x2, y2, q):
    """Mixed add p + affine(x2, y2) on host ints."""
    if p is None:
        return (x2, y2, 1)
    X, Y, Z = p
    Z2 = Z * Z % q
    U2 = x2 * Z2 % q
    S2 = y2 * Z * Z2 % q
    if U2 == X:
        if S2 == Y:
            return _hj_dbl(p, q)
        return None
    H = (U2 - X) % q
    HH = H * H % q
    I = 4 * HH % q
    J = H * I % q
    rr = 2 * (S2 - Y) % q
    V = X * I % q
    X3 = (rr * rr - J - 2 * V) % q
    Y3 = (rr * (V - X3) - 2 * Y * J) % q
    Z3 = ((Z + H) * (Z + H) - Z2 - HH) % q
    return None if Z3 == 0 else (X3, Y3, Z3)


def _host_horner(wx_ints, wy_ints, c: int):
    """Window sums (host ints, (0,0)=infinity) -> final jac (X,Y,Z) or None."""
    from ..field.params import BN254_FQ

    q = BN254_FQ.p
    acc = None
    for x, y in zip(reversed(wx_ints), reversed(wy_ints)):
        for _ in range(c):
            acc = _hj_dbl(acc, q)
        if x or y:
            acc = _hj_madd(acc, int(x), int(y), q)
    return acc


def _hj_add(p, q2, q):
    """Full Jacobian + Jacobian add on host ints (None = infinity)."""
    if p is None:
        return q2
    if q2 is None:
        return p
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q2
    Z1Z1 = Z1 * Z1 % q
    Z2Z2 = Z2 * Z2 % q
    U1 = X1 * Z2Z2 % q
    U2 = X2 * Z1Z1 % q
    S1 = Y1 * Z2 * Z2Z2 % q
    S2 = Y2 * Z1 * Z1Z1 % q
    if U1 == U2:
        if S1 == S2:
            return _hj_dbl(p, q)
        return None
    H = (U2 - U1) % q
    I = 4 * H * H % q
    J = H * I % q
    rr = 2 * (S2 - S1) % q
    V = U1 * I % q
    X3 = (rr * rr - J - 2 * V) % q
    Y3 = (rr * (V - X3) - 2 * S1 * J) % q
    Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) * H % q
    return None if Z3 == 0 else (X3, Y3, Z3)


def _encode_host_jac(pt):
    d = df()
    if pt is None:
        return jac_infinity(())
    X, Y, Z = pt
    # Host-side encode: the point was computed on the host, and shipping it
    # through the device (encode -> upload, caller readback -> download)
    # costs two tunnel round-trips per MSM.  Numpy limbs are valid jax
    # inputs for any downstream device op and free to read back.
    enc = d.encode_np([X, Y, Z])
    return jac(enc[:, 0], enc[:, 1], enc[:, 2])


# largest single-dispatch MSM: the suffix arrays are 3 * 16 * W * n u32, so
# n = 2^18 at c=12 stays ~1.1 GB of HBM; larger inputs run in slices whose
# window sums combine with host Jacobian adds (linearity of the MSM).
_MSM_SLICE = 1 << 18


def _wsums_host_affine(w):
    """Device stacked (3, 16, W) window sums -> host affine ints ((0,0)=inf)."""
    d = df()
    w_host = np.asarray(jax.device_get(w))  # ONE tunnel fetch for all coords
    X, Y, Z = d.decode(w_host[0]), d.decode(w_host[1]), d.decode(w_host[2])
    q = BN254_FQ.p
    wx, wy = [], []
    for i in range(len(X)):
        if int(Z[i]) % q == 0:
            wx.append(0)
            wy.append(0)
        else:
            zi = pow(int(Z[i]), q - 2, q)
            zi2 = zi * zi % q
            wx.append(int(X[i]) * zi2 % q)
            wy.append(int(Y[i]) * zi2 % q * zi % q)
    return wx, wy


def _msm_host_point(px, py, scalars_canonical):
    """MSM -> host Jacobian tuple (X, Y, Z) or None (infinity)."""
    n = px.shape[-1]
    if n <= _MSM_SLICE:
        wsums = _msm_wsums_jit(n)(px, py, scalars_canonical)
        wx, wy = _wsums_host_affine(wsums)
        return _host_horner(wx, wy, _msm_c(n))
    from ..field.params import BN254_FQ

    acc = None
    for s in range(0, n, _MSM_SLICE):
        e = min(n, s + _MSM_SLICE)
        pt = _msm_host_point(
            px[:, s:e], py[:, s:e], scalars_canonical[:, s:e]
        )
        acc = _hj_add(acc, pt, BN254_FQ.p)
    return acc


def msm(px, py, scalars_canonical):
    """Multi-scalar multiplication.

    px, py: (16, N) affine coordinates in Montgomery form ((0,0) = infinity);
    scalars_canonical: (16, N) canonical (non-Montgomery) Fr limbs.
    Returns a jac point (16,) pytree (device; host Horner tail inside).
    """
    return _encode_host_jac(_msm_host_point(px, py, scalars_canonical))


def _hybrid_device_frac(n: int) -> float:
    import os

    v = os.environ.get("HALO2_TPU_MSM_DEVICE_FRAC")
    if v:
        return min(1.0, max(0.0, float(v)))
    # Round-5 sweep on v5e + 2-core IFMA host: the device dispatch has a
    # ~120-150 ms floor at any slice size (q accumulation rounds + tunnel
    # RTT + the size-independent Abel combine), so below ~2^17 points the
    # host IFMA Pippenger alone is fastest.  Above that, balance the slice
    # so both finish together: with the lazy-reduction host Pippenger at
    # ~1.0 s/2^20 and the device at ~2.13 s/2^20 + 0.13 s floor,
    # f = (1.00 - 0.13) / (2.13 + 1.00) ~ 0.28 (was 0.42 before the
    # round-5 host MSM rework made the host 1.6x faster).
    if n < (1 << 17):
        return 0.0
    return 0.28


# 52-bit lane forms of host point mirrors, keyed by (id, slice) — the SRS
# arrays are long-lived and reused across every MSM of a prove/bench, so the
# Montgomery-52 conversion pass (a full O(n) sweep) is paid once.  Entries
# keep a reference to the source arrays so ids cannot be recycled under us.
_PTS52_CACHE: dict = {}


def _host_pts52(host_px, host_py, nd):
    from .. import native

    key = (id(host_px), id(host_py), int(nd))
    ent = _PTS52_CACHE.get(key)
    if ent is not None and ent[0] is host_px and ent[1] is host_py:
        return ent[2], ent[3]
    px = native.pack_device(np.asarray(host_px[:, nd:]))
    py = native.pack_device(np.asarray(host_py[:, nd:]))
    r = native.points_to52(px, py)
    if r is None:
        return None
    if len(_PTS52_CACHE) > 8:
        _PTS52_CACHE.clear()
    _PTS52_CACHE[key] = (host_px, host_py, r[0], r[1])
    return r


def msm_hybrid(px, py, scalars_canonical, host_px=None, host_py=None,
               host_scalars=None):
    """Heterogeneous MSM: the TPU Pippenger runs a leading point slice while
    the host IFMA Pippenger (halo2_tpu/native) runs the tail on the CPU
    cores, overlapped; the two Jacobian partials combine on the host (MSM
    linearity).  This uses ALL the silicon on a TPU VM the way the
    reference uses all its CPU cores via rayon (src/circuits/utils.rs:40-48).

    host_* are (16, N) numpy mirrors of the SAME data (points Montgomery,
    scalars canonical).  Falls back to the pure device path when the native
    engine or the mirrors are unavailable.
    """
    from .. import native
    from ..field.params import BN254_FQ

    n = px.shape[-1]
    if (
        host_px is None
        or host_scalars is None
        or not native.available()
        or n < (1 << 12)
    ):
        return msm(px, py, scalars_canonical)
    nd = int(n * _hybrid_device_frac(n))
    nd = max(0, min(n, nd))
    if nd == 0:
        pts52 = _host_pts52(host_px, host_py, 0)
        if pts52 is not None:
            x, y = native.msm_g1_mont52(
                pts52[0], pts52[1], native.pack_device(np.asarray(host_scalars))
            )
        else:
            x, y = native.msm_g1_mont(
                native.pack_device(np.asarray(host_px)),
                native.pack_device(np.asarray(host_py)),
                native.pack_device(np.asarray(host_scalars)),
            )
        return _encode_host_jac((x, y, 1) if (x or y) else None)

    # 1) dispatch the device slice (async; jax returns before execution)
    dev_parts = []
    s = 0
    while s < nd:
        e = min(nd, s + _MSM_SLICE)
        m = e - s
        dev_parts.append(
            (m, _msm_wsums_jit(m)(px[:, s:e], py[:, s:e], scalars_canonical[:, s:e]))
        )
        s = e
    # 2) host IFMA Pippenger on the tail while the device runs
    pts52 = _host_pts52(host_px, host_py, nd)
    if pts52 is not None:
        hx, hy = native.msm_g1_mont52(
            pts52[0], pts52[1],
            native.pack_device(np.asarray(host_scalars[:, nd:])),
        )
    else:
        hx, hy = native.msm_g1_mont(
            native.pack_device(np.asarray(host_px[:, nd:])),
            native.pack_device(np.asarray(host_py[:, nd:])),
            native.pack_device(np.asarray(host_scalars[:, nd:])),
        )
    host_pt = None if (hx == 0 and hy == 0) else (hx, hy, 1)
    # 3) fetch device window sums, Horner, combine
    acc = host_pt
    for m, w in dev_parts:
        wx, wy = _wsums_host_affine(w)
        pt = _host_horner(wx, wy, _msm_c(m))
        acc = _hj_add(acc, pt, BN254_FQ.p)
    return _encode_host_jac(acc)


def msm_points(px, py, scalars_canonical):
    """MSM returning the result as host ints (x, y), (0, 0) = infinity."""
    pt = _msm_host_point(px, py, scalars_canonical)
    if pt is None:
        return 0, 0
    from ..field.params import BN254_FQ

    q = BN254_FQ.p
    X, Y, Z = pt
    zinv = pow(Z, q - 2, q)
    zinv2 = zinv * zinv % q
    return X * zinv2 % q, Y * zinv2 % q * zinv % q


