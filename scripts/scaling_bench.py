"""Scaling-efficiency measurement on the virtual 8-device CPU mesh.

BASELINE.md mandates MSM/NTT throughput "at 1 chip, 1 host, and N>=2 hosts
with >=80% scaling efficiency"; multi-chip hardware is unavailable (one v5e
via tunnel), so — like the driver's dryrun — the collective path is measured
on an ``xla_force_host_platform_device_count`` CPU mesh: same shard_map
program, same collectives, virtual devices.

Two figures are reported per workload (round-4 redesign):

* work-normalized efficiency  eff_D = t(1 dev, n) / (D * t(D devs, n)) —
  the mandated number.  CAVEAT, measured round 4: the virtual CPU devices
  are XLA:CPU-dispatch-bound on the Pippenger's fixed round structure
  (t1(n) barely moves when n halves: 13.97 s at n=2^12-local vs 13.43 s at
  2^11-local), so on THIS 2-core host the number mostly measures host op
  dispatch, not the collective pattern.
* collective overhead  ovh_2 = t(2 devs, n) / t(1 dev, n/2) — the 2-device
  time against its perfect-scaling lower bound (the same program at half
  the points).  This isolates what the all_gather/all_to_all pattern itself
  costs; ~1.0 means the collectives are free at this size.

Sections run under a global deadline and emit partial JSON as they finish
(bench.py keeps the LAST line).
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

DEADLINE = time.monotonic() + float(os.environ.get("HALO2_TPU_SCALING_BUDGET", "620"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def left():
    return DEADLINE - time.monotonic()


def main():
    import random

    from halo2_tpu.ec import host as ec
    from halo2_tpu.ec.device import df as dfq
    from halo2_tpu.field.device import get_device_field
    from halo2_tpu.field.params import BN254_FR
    from halo2_tpu.parallel.msm import sharded_msm
    from halo2_tpu.parallel.ntt import sharded_ntt

    # n = 2^12: at the round-3 size (2^10) a 512-point local MSM was
    # dispatch-bound on the virtual CPU devices (t2 > t1), so the 2-dev
    # efficiency measured collective+dispatch overhead, not scaling.
    n = 1 << 12
    rng = random.Random(11)
    base = ec.ec_mul(ec.G1, 7)
    pts = [ec.ec_mul(base, i + 1) for i in range(64)]
    d = dfq()
    px = d.encode([ec.g1_to_ints(p)[0] for p in pts] * (n // 64))
    py = d.encode([ec.g1_to_ints(p)[1] for p in pts] * (n // 64))
    dfr = get_device_field(BN254_FR)
    sc = dfr.encode([rng.randrange(BN254_FR.p) for _ in range(n)], to_mont=False)

    def timed_msm(mesh, axes, pxa, pya, sca, tag):
        t0 = time.perf_counter()
        out = sharded_msm(mesh, pxa, pya, sca, axes=axes)
        np.asarray(out["x"])
        log(f"msm {tag} compile+first {time.perf_counter()-t0:.1f}s")
        best = None
        for _ in range(2):  # min-of-2: host GC/page stalls spike single runs
            t0 = time.perf_counter()
            out = sharded_msm(mesh, pxa, pya, sca, axes=axes)
            np.asarray(out["x"])
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return best

    devs = jax.devices()
    mesh1 = Mesh(np.array(devs[:1]).reshape(1, 1), ("dp", "sp"))
    mesh2 = Mesh(np.array(devs[:2]).reshape(1, 2), ("dp", "sp"))
    mesh8 = Mesh(np.array(devs[:8]).reshape(2, 4), ("dp", "sp"))

    result = {
        "scaling_host_cores": os.cpu_count() or 1,
        "scaling_8dev_ceiling": round(min(1.0, (os.cpu_count() or 1) / 8), 4),
        # the honest read of the virtual-mesh numbers (see module docstring)
        "scaling_note": (
            "virtual CPU devices share this host's cores; work-normalized "
            "efficiencies are bounded by cores/D and by XLA:CPU dispatch; "
            "msm_collective_overhead_2dev isolates the collective pattern "
            "cost (1.0 = free)"
        ),
    }

    t1 = timed_msm(mesh1, ("dp", "sp"), px, py, sc, "1dev")
    result["msm_t1_s"] = round(t1, 4)
    log(f"t1={t1:.3f}")
    t2 = timed_msm(mesh2, ("dp", "sp"), px, py, sc, "2dev")
    result["msm_t2_s"] = round(t2, 4)
    result["msm_scaling_efficiency_2dev"] = round(t1 / (2 * t2), 4)
    log(f"t2={t2:.3f}")
    print(json.dumps(result), flush=True)

    # NTT: four-step all_to_all over sp
    if left() > 120:
        m = 1 << 14
        x = dfr.encode([rng.randrange(BN254_FR.p) for _ in range(1024)])
        import jax.numpy as jnp

        x = jnp.tile(x, (1, m // 1024))

        def timed_ntt(mesh, xa, tag):
            t0 = time.perf_counter()
            o = sharded_ntt(mesh, BN254_FR, xa)
            np.asarray(o[0, :1])
            log(f"ntt {tag} compile+first {time.perf_counter()-t0:.1f}s")
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                o = sharded_ntt(mesh, BN254_FR, xa)
                np.asarray(o[0, :1])
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            return best

        nt1 = timed_ntt(mesh1, x, "1dev")
        result["ntt_t1_s"] = round(nt1, 4)
        if left() > 60:
            nt2 = timed_ntt(mesh2, x, "2dev")
            result["ntt_t2_s"] = round(nt2, 4)
            result["ntt_scaling_efficiency_2dev"] = round(nt1 / (2 * nt2), 4)
        if left() > 60:
            nt8 = timed_ntt(mesh8, x, "8dev")
            result["ntt_t8_s"] = round(nt8, 4)
            result["ntt_scaling_efficiency_8dev"] = round(nt1 / (8 * nt8), 4)
        print(json.dumps(result), flush=True)

    # perfect-scaling lower bound for t2: the SAME 1-dev program at n/2
    if left() > 150:
        h = n // 2
        t1h = timed_msm(mesh1, ("dp", "sp"), px[:, :h], py[:, :h], sc[:, :h], "1dev-half")
        result["msm_t1_halfn_s"] = round(t1h, 4)
        result["msm_collective_overhead_2dev"] = round(t2 / t1h, 4)
        log(f"t1_half={t1h:.3f} -> collective overhead x{t2/t1h:.2f}")
        print(json.dumps(result), flush=True)

    # 8-dev MSM last: on a 2-core host the figure is capped at 0.25 by
    # oversubscription (scaling_8dev_ceiling), so it ranks below the NTT data
    if left() > 150:
        t8 = timed_msm(mesh8, ("dp", "sp"), px, py, sc, "8dev")
        result["msm_t8_s"] = round(t8, 4)
        result["msm_scaling_efficiency_8dev"] = round(t1 / (8 * t8), 4)
        print(json.dumps(result), flush=True)



if __name__ == "__main__":
    main()
