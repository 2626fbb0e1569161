"""Device (TPU) BN254 G1 arithmetic: batched Jacobian ops + Pippenger MSM.

The MSM replaces halo2's CPU Pippenger inside `KZGCommitmentScheme` commits
(reference src/circuits/utils.rs:40-48, SURVEY.md §3.2 "HOT: MSM points/sec").
TPU-native shape: window digits from canonical limbs, per-window sort by
digit, segmented associative-scan bucket accumulation (data-dependent scatter
is resolved by sort, keeping device code static-shaped), log-depth suffix-sum
bucket reduction, and a Horner window combine of c doublings per window.

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
from ..field.params import BN254_FQ, LIMB_BITS

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


def jac_add(p, q):
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
def _window_bits(n: int) -> int:
    """Pippenger window size: bucket work (256/c * 2^c) vs point work (n)."""
    return 4 if n < 256 else 8


def _digits_from_limbs(scalars_canonical, c: int):
    """(16, N) canonical 16-bit limbs -> (256/c, N) uint32 c-bit digits."""
    per_limb = 16 // c
    mask = np.uint32((1 << c) - 1)
    parts = [
        (scalars_canonical >> np.uint32(c * i)) & mask for i in range(per_limb)
    ]
    return jnp.stack(parts, axis=1).reshape(16 * per_limb, -1)


def _bucket_sums_all_windows(
    points, digits, buckets_n, head_split: int = 8, top_split: int = 32
):
    """Per-(window, bucket) point sums via balanced round-robin accumulation.

    points: jac pytree (16, N); digits: (W, N) int32 in [0, buckets_n).
    Returns bucket sums as jac pytree (16, W, buckets_n).

    The classic bucket-serial schedule, vectorized over all buckets at once:
    sort each window's digits, then in round r every lane absorbs its r-th
    point (one full-width ``jac_madd`` per round, all windows in parallel).
    The XLA graph holds exactly ONE jac_madd — compile time stays flat in N.
    Load-balance refinements (NOTES_ROUND2.md profile):

      * bucket 0 never contributes (the reducer masks it), so its runs are
        skipped — also makes zero/small scalars nearly free;
      * EVERY bucket's run is sliced across ``head_split`` lanes (slice s
        covers the half-open range [cnt*s//S, cnt*(s+1)//S) of the run) and
        the slices are log-folded afterwards — the while_loop trip count
        drops from max-run to ~max-run/S while total field work is constant
        (the same adds at S-fold lane width, far better VPU occupancy);
      * the TOP window is structurally skewed (scalars < p < 2^254, so its
        digits use a fraction of the bucket range and runs are ~4x longer);
        it gets ``top_split`` slices to match.

    Correctness never depends on the digit distribution: the ``while_loop``
    trip count is the true max slice length.
    """
    w_n, n = digits.shape
    order = jnp.argsort(digits, axis=1)  # (W, N)
    sd = jnp.take_along_axis(digits, order, axis=1)

    bvals = jnp.arange(buckets_n, dtype=sd.dtype)
    starts = jax.vmap(lambda s: jnp.searchsorted(s, bvals, side="left"))(sd)
    ends = jax.vmap(lambda s: jnp.searchsorted(s, bvals, side="right"))(sd)
    counts = ends - starts  # (W, B)
    counts = counts.at[:, 0].set(0)  # bucket 0 is discarded by the reducer

    def slices(st, cnt, S):
        """st, cnt: (..., B) -> slice starts/counts (..., S, B)."""
        s_idx = jnp.arange(S)[:, None]
        lo = st[..., None, :] + (cnt[..., None, :] * s_idx) // S
        hi = st[..., None, :] + (cnt[..., None, :] * (s_idx + 1)) // S
        return lo, hi - lo

    hs, ts = head_split, top_split
    head_lo, head_cnt = slices(starts[: w_n - 1], counts[: w_n - 1], hs)
    top_lo, top_cnt = slices(starts[w_n - 1], counts[w_n - 1], ts)
    flat_starts = jnp.concatenate([head_lo.reshape(-1), top_lo.reshape(-1)])
    flat_counts = jnp.concatenate([head_cnt.reshape(-1), top_cnt.reshape(-1)])
    n_lanes = flat_starts.shape[0]
    lane_w = jnp.concatenate(
        [
            jnp.arange((w_n - 1) * hs * buckets_n) // (hs * buckets_n),
            jnp.full(ts * buckets_n, w_n - 1),
        ]
    )
    max_run = jnp.max(flat_counts)

    inf_lane = jac_infinity((n_lanes,))
    # one stacked (N, 32) tensor: ONE row-gather per round instead of two.
    # NOTE: assumes no input point is infinity ((0,0) rows would corrupt the
    # mixed add) — msm() guards this by zeroing those scalars' digits.
    stacked_t = jnp.concatenate([points["x"], points["y"]]).T

    def body(carry):
        r, acc = carry
        pos = jnp.clip(flat_starts + r, 0, n - 1)
        pt_idx = order[lane_w, pos]  # (n_lanes,)
        g = stacked_t[pt_idx].T  # (32, n_lanes)
        valid = r < flat_counts
        return r + 1, jac_madd(acc, g[:16], g[16:], valid)

    _, acc = jax.lax.while_loop(
        lambda carry: carry[0] < max_run, body, (jnp.int32(0), inf_lane)
    )

    def fold(pts, S, lead):
        """(16, lead, S, B) -> (16, lead, B) sequential slice fold.

        A ``fori_loop`` with ONE jac_add body instead of an unrolled log-depth
        tree: same total field work (S-1 adds over lead*B lanes), but the
        compiled module holds a single addition graph — the unrolled tree made
        XLA compile time explode (468 s for the 2-fold CPU module, and the
        bulk of the 190 s TPU MSM compile in round 1)."""
        pts = {k: v.reshape(16, lead, S, buckets_n) for k, v in pts.items()}
        init = {k: v[:, :, 0] for k, v in pts.items()}

        def body(s, acc):
            cur = {
                k: jax.lax.dynamic_index_in_dim(v, s, 2, False)
                for k, v in pts.items()
            }
            return jac_add(acc, cur)

        return jax.lax.fori_loop(1, S, body, init)

    head = fold(
        {k: v[:, : (w_n - 1) * hs * buckets_n].reshape(16, w_n - 1, hs, buckets_n)
         for k, v in acc.items()},
        hs, w_n - 1,
    )
    top = fold(
        {k: v[:, (w_n - 1) * hs * buckets_n :].reshape(16, 1, ts, buckets_n)
         for k, v in acc.items()},
        ts, 1,
    )
    return {k: jnp.concatenate([head[k], top[k]], axis=1) for k in acc}


def _bucket_reduce(buckets, buckets_n):
    """sum_{j>=1} j * B_j per window = sum of suffix sums.

    buckets: jac pytree (16, W, buckets_n) -> window sums (16, W).
    Log-depth Hillis-Steele scans over the bucket axis, all windows batched.
    """
    assert buckets_n & (buckets_n - 1) == 0
    d = df()
    batch = buckets["x"].shape[1:]
    inf = jac_infinity(batch)
    mask = jnp.arange(buckets_n) == 0  # digit 0 contributes nothing
    buckets = {k: d.select(jnp.broadcast_to(mask, batch), inf[k], buckets[k]) for k in buckets}

    idx = jnp.arange(buckets_n)

    def prefix_scan(pts):
        """Inclusive prefix sum over the bucket axis (one add per step)."""

        def step(s, acc):
            dshift = jnp.left_shift(1, s)
            prev = {k: jnp.roll(v, dshift, axis=-1) for k, v in acc.items()}
            oob = jnp.broadcast_to(idx < dshift, batch)
            prev = {k: d.select(oob, inf[k], prev[k]) for k in prev}
            return jac_add(acc, prev)

        return jax.lax.fori_loop(0, buckets_n.bit_length() - 1, step, pts)

    # suffix sums = reversed prefix sums
    rev = {k: v[..., ::-1] for k, v in buckets.items()}
    suffix_rev = prefix_scan(rev)
    # sum_{j>=1} j*B_j = sum_{j>=1} suffix[j] — drop suffix[0] (last element)
    last = jnp.broadcast_to(jnp.arange(buckets_n) == buckets_n - 1, batch)
    suffix_rev = {k: d.select(last, inf[k], v) for k, v in suffix_rev.items()}
    total = prefix_scan(suffix_rev)
    return {k: v[..., -1] for k, v in total.items()}


def _msm_wsums_raw(n: int):
    """Device Pippenger through window sums: (px, py, scalars) -> affine
    window points (x, y) each (16, W).  The Horner window combine (256
    sequential doublings at lane width 1 — 59 ms of idle-VPU time on v5e,
    measured round 2) is finished on the HOST with big-int Jacobian ops
    (~3 ms), where sequential-scalar work belongs."""
    c = _window_bits(n)
    buckets_n = 1 << c

    def fn(px, py, scalars_canonical):
        digits = _digits_from_limbs(scalars_canonical, c).astype(jnp.int32)
        # infinity inputs ((0,0) marker) can't ride the mixed add — route all
        # their digits to bucket 0, which the reducer discards
        pt_inf = df().is_zero(px) & df().is_zero(py)
        digits = jnp.where(pt_inf[None], 0, digits)
        bsums = _bucket_sums_all_windows({"x": px, "y": py}, digits, buckets_n)
        wsums = _bucket_reduce(bsums, buckets_n)  # (16, W) jac pytree
        return jac_to_affine(wsums)

    return fn


@functools.lru_cache(maxsize=None)
def _msm_wsums_jit(n: int):
    return tuned_jit(_msm_wsums_raw(n))


def _msm_raw(n: int):
    """Fully-device MSM (window sums + device Horner) — used where the result
    must stay a device value (the shard_map'd multi-chip path)."""
    c = _window_bits(n)
    num_windows = 256 // c
    buckets_n = 1 << c

    def fn(px, py, scalars_canonical):
        digits = _digits_from_limbs(scalars_canonical, c).astype(jnp.int32)
        pt_inf = df().is_zero(px) & df().is_zero(py)
        digits = jnp.where(pt_inf[None], 0, digits)
        bsums = _bucket_sums_all_windows({"x": px, "y": py}, digits, buckets_n)
        wsums = _bucket_reduce(bsums, buckets_n)  # (16, W) jac pytree

        def horner(i, acc):
            acc = jax.lax.fori_loop(0, c, lambda _, a: jac_double(a), acc)
            w = {
                k: jax.lax.dynamic_index_in_dim(v, num_windows - 1 - i, 1, False)
                for k, v in wsums.items()
            }
            return jac_add(acc, w)

        return jax.lax.fori_loop(0, num_windows, horner, jac_infinity(()))

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


def _encode_host_jac(pt):
    d = df()
    if pt is None:
        return jac_infinity(())
    X, Y, Z = pt
    enc = d.encode([X, Y, Z])
    return jac(enc[:, 0], enc[:, 1], enc[:, 2])


def msm(px, py, scalars_canonical):
    """Multi-scalar multiplication.

    px, py: (16, N) affine coordinates in Montgomery form ((0,0) = infinity);
    scalars_canonical: (16, N) canonical (non-Montgomery) Fr limbs.
    Returns a jac point (16,) pytree (device; host Horner tail inside).
    """
    n = px.shape[-1]
    wx, wy = _msm_wsums_jit(n)(px, py, scalars_canonical)
    d = df()
    wx_i, wy_i = d.decode(wx), d.decode(wy)
    return _encode_host_jac(_host_horner(wx_i, wy_i, _window_bits(n)))


def msm_points(px, py, scalars_canonical):
    """MSM returning the result as host ints (x, y), (0, 0) = infinity."""
    n = px.shape[-1]
    wx, wy = _msm_wsums_jit(n)(px, py, scalars_canonical)
    d = df()
    pt = _host_horner(d.decode(wx), d.decode(wy), _window_bits(n))
    if pt is None:
        return 0, 0
    from ..field.params import BN254_FQ

    q = BN254_FQ.p
    X, Y, Z = pt
    zinv = pow(Z, q - 2, q)
    zinv2 = zinv * zinv % q
    return X * zinv2 % q, Y * zinv2 % q * zinv % q


@functools.lru_cache(maxsize=None)
def _msm_batch_jit(n: int):
    """One set of base points, many scalar vectors: vmapped window-sum
    Pippenger in a single executable (the per-phase commit path)."""
    single = _msm_wsums_raw(n)

    def fn(px, py, scalars_batch):  # scalars_batch: (B, 16, n)
        return jax.vmap(lambda s: single(px, py, s))(scalars_batch)

    return tuned_jit(fn)


def msm_batch_points(px, py, scalars_batch):
    """Batched MSM over shared points -> list of host-int (x, y) pairs."""
    n = px.shape[-1]
    wx, wy = _msm_batch_jit(n)(px, py, scalars_batch)  # (B, 16, W)
    d = df()
    c = _window_bits(n)
    wx_i = d.decode(jnp.moveaxis(wx, 0, -1))  # (W, B) host ints
    wy_i = d.decode(jnp.moveaxis(wy, 0, -1))
    from ..field.params import BN254_FQ

    q = BN254_FQ.p
    out = []
    for b in range(wx.shape[0]):
        pt = _host_horner(wx_i[:, b], wy_i[:, b], c)
        if pt is None:
            out.append((0, 0))
            continue
        X, Y, Z = pt
        zinv = pow(Z, q - 2, q)
        zinv2 = zinv * zinv % q
        out.append((X * zinv2 % q, Y * zinv2 % q * zinv % q))
    return out
