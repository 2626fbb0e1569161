"""Evaluation domains + radix-2 NTT on device (halo2 `poly::EvaluationDomain`).

The reference's prover converts columns between coefficient and Lagrange
bases and evaluates the quotient on an extended coset (SURVEY.md §3.2 "NTT
butterflies/sec" hot path).  Here the NTT is an iterative Cooley-Tukey over
limb-vectorized Montgomery arrays: one host-precomputed bit-reversal gather +
log2(n) vectorized butterfly stages, each a single (L, n/2)-wide field
multiply — XLA fuses the add/sub wings.  Stage twiddles are cached per
(field, n, inverse) on device.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..jitutil import tuned_jit

from ..field.device import get_device_field
from ..field.params import FieldSpec


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(spec: FieldSpec, n: int, inverse: bool):
    """Per-stage twiddle tensors, Montgomery-encoded — NUMPY (trace-safe:
    this cache is populated lazily, possibly under an active jit trace)."""
    df = get_device_field(spec)
    s = spec.two_adicity
    omega = pow(spec.root_of_unity, 1 << (s - n.bit_length() + 1), spec.p)
    if inverse:
        omega = pow(omega, -1, spec.p)
    stages = []
    m = 1
    while m < n:
        w = pow(omega, n // (2 * m), spec.p)
        tw = [pow(w, j, spec.p) for j in range(m)]
        stages.append(df.encode_np(tw))  # (L, m)
        m *= 2
    return stages


@functools.lru_cache(maxsize=None)
def _ntt_raw(spec: FieldSpec, n: int, inverse: bool):
    """Un-jitted NTT builder (composable inside an outer jit)."""
    from ..field.pallas_mul import pallas_available

    df = get_device_field(spec)
    rev = _bit_reverse_perm(n)  # numpy: trace-safe constant
    n_inv = df.encode_np([pow(n, -1, spec.p)])

    if pallas_available() and n >= 512:
        # fused-butterfly Pallas ladder (poly/pallas_ntt.py): one kernel for
        # all small stages + one kernel per large stage, VMEM-resident wings
        from .pallas_ntt import ntt_stages

        ladder = ntt_stages(spec, n, inverse)

        def fn(coeffs):  # (L, n) Montgomery
            x = ladder(coeffs[:, rev])
            if inverse:
                x = df.mul(x, n_inv)
            return x

        return fn

    stages = _stage_twiddles(spec, n, inverse)

    def fn(coeffs):  # (L, n) Montgomery
        x = coeffs[:, rev]
        m = 1
        for tw in stages:
            # view as (L, n/(2m), 2, m)
            x = x.reshape(16, n // (2 * m), 2, m)
            a = x[:, :, 0, :]
            b = df.mul(x[:, :, 1, :], tw[:, None, :])
            x = jnp.stack([df.add(a, b), df.sub(a, b)], axis=2).reshape(16, n)
            m *= 2
        if inverse:
            x = df.mul(x, n_inv)
        return x

    return fn


@functools.lru_cache(maxsize=None)
def _ntt_fn(spec: FieldSpec, n: int, inverse: bool):
    return tuned_jit(_ntt_raw(spec, n, inverse))


class EvaluationDomain:
    """Domain of size n=2^k with an extended coset of size 2^extended_k.

    Matches halo2's layout: omega generates H; the extended domain evaluates
    on the coset g_coset * H_ext where g_coset is the field's multiplicative
    generator (halo2 uses ZETA; the coset choice is a free protocol parameter
    as long as prover and verifier agree — ours is self-consistent and
    documented as a divergence).
    """

    def __init__(self, spec: FieldSpec, k: int, degree: int):
        self.spec = spec
        self.k = k
        self.n = 1 << k
        self.df = get_device_field(spec)
        # quotient degree: gates of degree d give h of degree ~ (d-1)*n
        quotient_poly_degree = max(degree - 1, 1)
        self.extended_k = k + (quotient_poly_degree - 1).bit_length()
        self.extended_n = 1 << self.extended_k
        p = spec.p
        s = spec.two_adicity
        assert self.extended_k <= s
        self.omega = pow(spec.root_of_unity, 1 << (s - k), p)
        self.omega_inv = pow(self.omega, -1, p)
        self.extended_omega = pow(spec.root_of_unity, 1 << (s - self.extended_k), p)
        self.g_coset = spec.generator

    # ------------------------------------------------------------- transforms
    def lagrange_to_coeff(self, evals):
        """(L, n) evals on H -> coefficients."""
        return _ntt_fn(self.spec, self.n, True)(evals)

    def coeff_to_lagrange(self, coeffs):
        return _ntt_fn(self.spec, self.n, False)(coeffs)

    def coeff_to_extended(self, coeffs):
        """(L, n) coeffs -> (L, extended_n) evals on the extended coset."""
        return self._c2e_fn(coeffs.shape[1])(coeffs)

    @functools.lru_cache(maxsize=None)
    def _c2e_fn(self, m):
        # one jitted program per input width: the pad + coset-scale mul ran
        # EAGERLY before (one pallas dispatch per prover column — the bulk of
        # the k=11 quotient phase's per-column overhead)
        df = self.df
        powers = self._coset_powers(self.extended_n)
        ntt = _ntt_raw(self.spec, self.extended_n, False)

        def fn(coeffs):
            padded = (
                jnp.zeros((16, self.extended_n), jnp.uint32)
                .at[:, :m]
                .set(coeffs)
            )
            return ntt(df.mul(padded, powers))

        return tuned_jit(fn)

    def extended_to_coeff(self, evals):
        """(L, extended_n) coset evals -> (L, extended_n) coefficients."""
        return self._e2c_fn()(evals)

    @functools.lru_cache(maxsize=None)
    def _e2c_fn(self):
        df = self.df
        powers_inv = self._coset_powers_inv(self.extended_n)
        ntt = _ntt_raw(self.spec, self.extended_n, True)

        def fn(evals):
            return df.mul(ntt(evals), powers_inv)

        return tuned_jit(fn)

    @functools.lru_cache(maxsize=None)
    def _coset_powers(self, n):
        p = self.spec.p
        pows = [1] * n
        for i in range(1, n):
            pows[i] = pows[i - 1] * self.g_coset % p
        return self.df.encode(pows)

    @functools.lru_cache(maxsize=None)
    def _coset_powers_inv(self, n):
        p = self.spec.p
        ginv = pow(self.g_coset, -1, p)
        pows = [1] * n
        for i in range(1, n):
            pows[i] = pows[i - 1] * ginv % p
        return self.df.encode(pows)

    # ------------------------------------------------------- vanishing helpers
    @functools.lru_cache(maxsize=None)
    def vanishing_inv_extended_ints(self) -> tuple:
        """1 / (X^n - 1) on the extended coset, host ints (shared by the
        device and native prover engines).

        (g*w^i)^n = g^n * w^(i*n) cycles with period ext_n/n, so only
        rot_scale distinct inverses exist — computed once and tiled (the
        per-point modexp loop cost ~1 s of every first prove at k=11)."""
        p = self.spec.p
        rot = self.extended_n // self.n
        gn = pow(self.g_coset, self.n, p)
        wn = pow(self.extended_omega, self.n, p)
        vals = []
        acc = gn
        for _ in range(rot):
            vals.append(pow(acc - 1, -1, p))
            acc = acc * wn % p
        return tuple(vals[i % rot] for i in range(self.extended_n))

    @functools.lru_cache(maxsize=None)
    def vanishing_inv_extended(self):
        """1 / (X^n - 1) evaluated on the extended coset (device encode)."""
        return self.df.encode(list(self.vanishing_inv_extended_ints()))

    # host-side scalar helpers (verifier)
    def l_i(self, i: int, x: int) -> int:
        """Lagrange basis L_i evaluated at x (host int)."""
        p = self.spec.p
        w_i = pow(self.omega, i, p)
        if (x - w_i) % p == 0:
            return 1
        xn = pow(x, self.n, p)
        num = w_i * (xn - 1) % p
        den = self.n * ((x - w_i) % p) % p
        return num * pow(den, -1, p) % p

    def eval_lagrange_interp(self, values: list[int], x: int) -> int:
        """Evaluate the poly with given Lagrange values (rest zero) at x."""
        p = self.spec.p
        acc = 0
        for i, v in enumerate(values):
            if v:
                acc = (acc + v * self.l_i(i, x)) % p
        return acc


@functools.lru_cache(maxsize=None)
def get_domain(spec: FieldSpec, k: int, degree: int) -> EvaluationDomain:
    return EvaluationDomain(spec, k, degree)
