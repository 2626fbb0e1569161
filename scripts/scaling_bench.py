"""Scaling-efficiency measurement on the virtual 8-device CPU mesh.

BASELINE.md mandates MSM/NTT throughput "at 1 chip, 1 host, and N>=2 hosts
with >=80% scaling efficiency"; multi-chip hardware is unavailable (one v5e
via tunnel), so — like the driver's dryrun — the collective path is measured
on an ``xla_force_host_platform_device_count`` CPU mesh: same shard_map
program, same collectives, virtual devices.  Efficiency is work-normalized:
eff = t(1 device) / (D * t(D devices)) for the same total problem size.

Prints ONE JSON line consumed by bench.py.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_disable_hlo_passes" not in flags:
    flags = (flags + " --xla_disable_hlo_passes=fusion").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main():
    import random

    from halo2_tpu.ec import host as ec
    from halo2_tpu.ec.device import df as dfq
    from halo2_tpu.field.device import get_device_field
    from halo2_tpu.field.params import BN254_FR
    from halo2_tpu.parallel.msm import sharded_msm
    from halo2_tpu.parallel.ntt import sharded_ntt

    n = 1 << 12  # big enough to amortize collective overhead on 8 vCPUs
    rng = random.Random(11)
    base = ec.ec_mul(ec.G1, 7)
    pts = [ec.ec_mul(base, i + 1) for i in range(64)]
    d = dfq()
    px = d.encode([ec.g1_to_ints(p)[0] for p in pts] * (n // 64))
    py = d.encode([ec.g1_to_ints(p)[1] for p in pts] * (n // 64))
    dfr = get_device_field(BN254_FR)
    sc = dfr.encode([rng.randrange(BN254_FR.p) for _ in range(n)], to_mont=False)

    def timed(mesh, axes, iters=3):
        out = sharded_msm(mesh, px, py, sc, axes=axes)
        np.asarray(out["x"])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = sharded_msm(mesh, px, py, sc, axes=axes)
            np.asarray(out["x"])
        return (time.perf_counter() - t0) / iters

    devs = jax.devices()
    mesh1 = Mesh(np.array(devs[:1]).reshape(1, 1), ("dp", "sp"))
    mesh8 = Mesh(np.array(devs[:8]).reshape(2, 4), ("dp", "sp"))
    t1 = timed(mesh1, ("dp", "sp"))
    t8 = timed(mesh8, ("dp", "sp"))
    msm_eff = t1 / (8 * t8)

    # NTT: four-step all_to_all over sp
    m = 1 << 14
    x = dfr.encode([rng.randrange(BN254_FR.p) for _ in range(1024)])
    import jax.numpy as jnp

    x = jnp.tile(x, (1, m // 1024))
    o1 = sharded_ntt(mesh1, BN254_FR, x)
    np.asarray(o1[0, :1])
    t0 = time.perf_counter()
    o1 = sharded_ntt(mesh1, BN254_FR, x)
    np.asarray(o1[0, :1])
    nt1 = time.perf_counter() - t0
    o8 = sharded_ntt(mesh8, BN254_FR, x)
    np.asarray(o8[0, :1])
    t0 = time.perf_counter()
    o8 = sharded_ntt(mesh8, BN254_FR, x)
    np.asarray(o8[0, :1])
    nt8 = time.perf_counter() - t0
    ntt_eff = nt1 / (8 * nt8)

    print(
        json.dumps(
            {
                "msm_t1_s": round(t1, 4),
                "msm_t8_s": round(t8, 4),
                "msm_scaling_efficiency_8dev": round(msm_eff, 4),
                "ntt_t1_s": round(nt1, 4),
                "ntt_t8_s": round(nt8, 4),
                "ntt_scaling_efficiency_8dev": round(ntt_eff, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
