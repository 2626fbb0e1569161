"""TPU smoke-check: pallas NTT vs jnp NTT, MSM vs host reference, timings.

Run on the real chip (no args). Used during development; not part of tests/
(which run on the CPU mesh where the pallas path is gated off).
"""

import os
import random
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo2_tpu.field.device import get_device_field
from halo2_tpu.field.params import BN254_FR
from halo2_tpu.poly import domain as dom


def sync(x):
    return np.asarray(x)


def check_ntt(n, iters=3):
    dfr = get_device_field(BN254_FR)
    rng = random.Random(1)
    vals = [rng.randrange(BN254_FR.p) for _ in range(min(n, 4096))]
    x = dfr.encode(vals)
    if n > 4096:
        x = jnp.tile(x, (1, n // 4096))

    fwd = dom._ntt_fn(BN254_FR, n, False)
    inv = dom._ntt_fn(BN254_FR, n, True)
    y = fwd(x)
    rt = inv(y)
    ok_rt = bool(jnp.all(rt == x))

    # cross-check vs the jnp path
    os.environ["HALO2_TPU_NO_PALLAS"] = "1"
    dom._ntt_fn.cache_clear()
    ref = dom._ntt_fn(BN254_FR, n, False)(x)
    del os.environ["HALO2_TPU_NO_PALLAS"]
    dom._ntt_fn.cache_clear()
    ok_ref = bool(jnp.all(sync(ref) == sync(y)))
    print(f"NTT n=2^{n.bit_length()-1}: roundtrip={ok_rt} vs_jnp={ok_ref}")

    sync(fwd(x)[0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fwd(x)[0, :1])
    dt = (time.perf_counter() - t0) / iters
    bfl = (n // 2) * (n.bit_length() - 1)
    print(f"  {dt*1e3:.1f} ms -> {bfl/dt/1e6:.0f}M butterflies/s")
    return ok_rt and ok_ref


def check_msm(k, iters=3):
    from halo2_tpu.ec.device import msm, jac_to_affine
    from halo2_tpu.ec import host as ech
    from halo2_tpu.kzg.params import ParamsKZG

    n = 1 << k
    params = ParamsKZG.setup_cached(k)
    dfr = get_device_field(BN254_FR)
    rng = random.Random(42)
    sc = [rng.randrange(BN254_FR.p) for _ in range(n)]
    scalars = dfr.encode(sc, to_mont=False)

    t0 = time.perf_counter()
    out = msm(params.g1_x, params.g1_y, scalars)
    sync(out["x"])
    print(f"MSM 2^{k} compile+run: {time.perf_counter()-t0:.1f}s")

    if k <= 10:
        from halo2_tpu.field.params import BN254_FQ

        dfq = get_device_field(BN254_FQ)
        ax, ay = jac_to_affine(out)
        got = (
            int(dfq.decode(sync(ax).reshape(16, 1))[0]),
            int(dfq.decode(sync(ay).reshape(16, 1))[0]),
        )
        want = ech.g1_to_ints(ech.msm_host(params.g1_host(), sc))
        ok = got == tuple(want)
        print(f"  vs host reference: {ok}")
        if not ok:
            print(f"  got={got}\n  want={want}")
            return False

    t0 = time.perf_counter()
    for _ in range(iters):
        out = msm(params.g1_x, params.g1_y, scalars)
        sync(out["x"])
    dt = (time.perf_counter() - t0) / iters
    print(f"  {dt*1e3:.1f} ms -> {n/dt:,.0f} points/s")
    return True


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    ok = True
    for n in (1 << 10, 1 << 16):
        ok &= check_ntt(n)
    ok &= check_msm(8)
    ok &= check_msm(16)
    ntt20 = check_ntt(1 << 20)
    ok &= ntt20
    print("ALL OK" if ok else "FAILURES")
