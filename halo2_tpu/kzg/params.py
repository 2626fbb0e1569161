"""KZG structured reference string (halo2 `ParamsKZG::<Bn256>::setup`).

The reference regenerates the SRS from OsRng on every run
(src/circuits/utils.rs:28); here setup is SEEDABLE (a precondition for
reproducible proofs, SURVEY.md §5 checkpoint/resume) and the tau powers are
computed ON DEVICE: powers of tau by scalar scan, then one batched double-and-
add over the bit rows.  Params serialize to disk so keygen/bench runs can
reuse them.
"""

from __future__ import annotations

import os
import pickle
import random

import jax
import jax.numpy as jnp

from ..jitutil import tuned_jit
import numpy as np

from ..ec import host as ec
from ..ec.device import df as dfq, jac_from_affine, jac_to_affine, scalar_mul_batched


class ParamsKZG:
    """g1 powers [G, tauG, ..., tau^{n-1}G] (HOST numpy, Montgomery affine
    limbs — jnp ops upload on dispatch; keeping them off-device avoids the
    tunnel's first-device_get penalty, measured 285 s round 4), g2,
    s_g2 = tau*G2 (host)."""

    def __init__(self, k: int, g1_x, g1_y, g2, s_g2):
        self.k = k
        self.n = 1 << k
        self.g1_x = np.asarray(g1_x)  # (16, n) host numpy, Montgomery
        self.g1_y = np.asarray(g1_y)
        self.g2 = g2
        self.s_g2 = s_g2

    @classmethod
    def setup(cls, k: int, seed: int = 0xD15C0):
        n = 1 << k
        rng = random.Random(seed)
        tau = rng.randrange(1, ec.R)

        # powers of tau (host ints — n scalar muls in Fr)
        powers = [1] * n
        for i in range(1, n):
            powers[i] = powers[i - 1] * tau % ec.R

        d = dfq()
        if jax.default_backend() == "cpu" or n <= 4096:
            # host fixed-base muls (fast Python ints), then encode
            pts = [ec.ec_mul(ec.G1, v) for v in powers]
            xs = [ec.g1_to_ints(p)[0] for p in pts]
            ys = [ec.g1_to_ints(p)[1] for p in pts]
            g1_x, g1_y = d.encode(xs), d.encode(ys)
        else:
            # batched fixed-base scalar mul on device: G * tau^i for all i
            limbs = np.zeros((16, n), np.uint32)
            for i, v in enumerate(powers):
                for j in range(16):
                    limbs[j, i] = (v >> (16 * j)) & 0xFFFF
            # (16, n) 16-bit limbs -> (256, n) LSB-first bits, vectorized
            sc = (
                (limbs[:, None, :] >> np.arange(16, dtype=np.uint32)[None, :, None]) & 1
            ).reshape(256, n)
            gx, gy = ec.g1_to_ints(ec.G1)
            base = jac_from_affine(
                jnp.broadcast_to(d.encode([gx]), (16, n)),
                jnp.broadcast_to(d.encode([gy]), (16, n)),
            )
            acc = tuned_jit(scalar_mul_batched)(base, jnp.asarray(sc))
            g1_x, g1_y = tuned_jit(jac_to_affine)(acc)

        g2 = ec.G2
        s_g2 = ec.ec_mul(ec.G2, tau)
        return cls(k, g1_x, g1_y, g2, s_g2)

    def g1_host(self) -> list:
        """SRS points as host ints (lazily decoded from the device arrays)."""
        if getattr(self, "_g1_host", None) is None:
            d = dfq()
            xs = d.decode(self.g1_x)
            ys = d.decode(self.g1_y)
            self._g1_host = [
                ec.g1_from_ints(int(x), int(y)) for x, y in zip(xs, ys)
            ]
        return self._g1_host

    # ------------------------------------------------------------ persistence
    def save(self, path: str):
        data = {
            "k": self.k,
            "g1_x": np.asarray(self.g1_x),
            "g1_y": np.asarray(self.g1_y),
            "g2": [c.c for c in self.g2],
            "s_g2": [c.c for c in self.s_g2],
        }
        with open(path, "wb") as f:
            pickle.dump(data, f)

    @classmethod
    def load(cls, path: str):
        with open(path, "rb") as f:
            data = pickle.load(f)
        g2 = (ec.FQ2(data["g2"][0]), ec.FQ2(data["g2"][1]))
        s_g2 = (ec.FQ2(data["s_g2"][0]), ec.FQ2(data["s_g2"][1]))
        return cls(data["k"], data["g1_x"], data["g1_y"], g2, s_g2)

    @classmethod
    def setup_cached(cls, k: int, seed: int = 0xD15C0, cache_dir: str = None):
        cache_dir = cache_dir or os.path.join(os.path.dirname(__file__), "..", "..", ".srs")
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"kzg_bn254_k{k}_s{seed}.pkl")
        if os.path.exists(path):
            return cls.load(path)
        params = cls.setup(k, seed)
        params.save(path)
        return params

    def verifier_params(self) -> "ParamsKZG":
        return self
