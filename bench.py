"""Headline benchmark: Pippenger MSM throughput on the real chip.

The reference publishes no numbers (BASELINE.md); its MSM is halo2curves'
multicore CPU Pippenger inside `create_proof` (src/circuits/utils.rs:40-48).
BASELINE.json names "MSM points/sec" the north-star metric, so that is what
this prints.  ``vs_baseline`` is measured against 1.0e6 points/sec — the
order-of-magnitude throughput of the reference's rayon'd CPU Pippenger on the
ubuntu-latest CI runners it was developed on (no published number exists to
pin it tighter; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra context (NTT butterflies/sec, device, sizes) goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 16  # 2^16 points
BASELINE_POINTS_PER_SEC = 1.0e6
# reference CPU radix-2 FFT (halo2_proofs::poly, rayon) order-of-magnitude on
# the same class of CPU: ~150 ms at 2^20 -> (2^19 * 20) butterflies / 0.15 s
BASELINE_BUTTERFLIES_PER_SEC = 7.0e7


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_msm():
    import random

    from halo2_tpu.ec.device import msm_hybrid
    from halo2_tpu.field.device import get_device_field
    from halo2_tpu.field.params import BN254_FR
    from halo2_tpu.kzg.params import ParamsKZG

    n = 1 << K
    t0 = time.perf_counter()
    params = ParamsKZG.setup_cached(K)
    log(f"SRS k={K} ready in {time.perf_counter() - t0:.1f}s")

    dfr = get_device_field(BN254_FR)
    rng = random.Random(42)
    sc_np = dfr.encode_np(
        [rng.randrange(BN254_FR.p) for _ in range(n)], to_mont=False
    )
    scalars = jnp.asarray(sc_np)
    # SRS lives host-side since round 4 — upload to the device ONCE (passing
    # numpy would re-upload 8 MB through the tunnel on every call).  The
    # heterogeneous MSM (round 5) runs the TPU Pippenger on a leading slice
    # and the host IFMA Pippenger on the tail concurrently, so the host
    # mirrors ride along.
    g1_x, g1_y = jnp.asarray(params.g1_x), jnp.asarray(params.g1_y)

    def run():
        return msm_hybrid(g1_x, g1_y, scalars, params.g1_x, params.g1_y, sc_np)

    # compile + warmup.  NOTE: sync via host readback (np.asarray), NOT
    # block_until_ready — the axon TPU tunnel returns from block_until_ready
    # before device execution completes, which silently fakes the timing.
    t0 = time.perf_counter()
    out = run()
    np.asarray(out["x"])
    log(f"MSM compile+first run: {time.perf_counter() - t0:.1f}s")

    # median of 9: the tunnel occasionally injects multi-hundred-ms latency
    # spikes and the VM sees intermittent external core-stealing (round-5:
    # ±10% run-to-run on a quiet box) that wreck a mean; at 2^16 the MSM is
    # host-only so the extra reps cost ~0.3 s total
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out["x"])
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    return n / dt, dt


def bench_ntt():
    import random

    from halo2_tpu.field.device import get_device_field
    from halo2_tpu.field.params import BN254_FR
    from halo2_tpu.poly.domain import _ntt_fn

    n = 1 << 20
    dfr = get_device_field(BN254_FR)
    rng = random.Random(7)
    x = dfr.encode([rng.randrange(BN254_FR.p) for _ in range(4096)])
    x = jnp.tile(x, (1, n // 4096))
    fn = _ntt_fn(BN254_FR, n, False)
    np.asarray(fn(x)[0, :1])  # sync via readback (see bench_msm note)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        x2 = fn(x)
        np.asarray(x2[0, :1])
    dt = (time.perf_counter() - t0) / iters
    butterflies = (n // 2) * (n.bit_length() - 1)
    return butterflies / dt, dt


def bench_scaling():
    """Scaling efficiency on the virtual 8-device CPU mesh (subprocess: the
    TPU backend is already initialized here; the mesh needs JAX_PLATFORMS=cpu
    before init).  Returns the parsed JSON dict; on ANY failure returns a
    loud {"scaling": "FAILED", ...} marker instead of silently omitting the
    mandated fields."""
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts", "scaling_bench.py")
    def last_json(text):
        for line in reversed((text or "").strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return None

    try:
        out = subprocess.run(
            [sys.executable, script],
            capture_output=True, text=True, timeout=700,
        )
        found = last_json(out.stdout)
        if found is not None:
            return found
        log(f"scaling bench produced no JSON; stderr tail: {out.stderr[-300:]}")
        return {"scaling": "FAILED", "scaling_error": "no JSON emitted"}
    except subprocess.TimeoutExpired as e:
        # the bench prints a partial JSON line after the MSM section — salvage
        stdout = e.stdout.decode() if isinstance(e.stdout, bytes) else e.stdout
        found = last_json(stdout)
        if found is not None:
            found["scaling"] = "PARTIAL (timeout before NTT section)"
            return found
        log("scaling bench timed out before any JSON")
        return {"scaling": "FAILED", "scaling_error": "timeout, no JSON emitted"}
    except Exception as e:
        log(f"scaling bench failed: {e}")
        return {"scaling": "FAILED", "scaling_error": str(e)[:200]}


def bench_msm_2_20():
    """Secondary MSM size (regressions at scale go unseen otherwise)."""
    import random

    from halo2_tpu.ec.device import msm_hybrid
    from halo2_tpu.field.device import get_device_field
    from halo2_tpu.field.params import BN254_FR
    from halo2_tpu.kzg.params import ParamsKZG

    n = 1 << 20
    params = ParamsKZG.setup_cached(16)  # 2^16 SRS tiled to 2^20 points
    reps = n // (1 << 16)
    px_np = np.tile(np.asarray(params.g1_x), (1, reps))
    py_np = np.tile(np.asarray(params.g1_y), (1, reps))
    px = jnp.asarray(px_np)
    py = jnp.asarray(py_np)
    dfr = get_device_field(BN254_FR)
    rng = random.Random(9)
    sc_np = np.tile(
        dfr.encode_np([rng.randrange(BN254_FR.p) for _ in range(1 << 16)], to_mont=False),
        (1, reps),
    )
    sc = jnp.asarray(sc_np)

    def run():
        return msm_hybrid(px, py, sc, px_np, py_np, sc_np)

    out = run()
    np.asarray(out["x"])  # compile+warm (sync via readback, see bench_msm)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out["x"])
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]  # median (tunnel latency spikes)
    return n / dt, dt


def bench_northstar():
    """End-to-end k=11/depth-15 merkle-sum-tree prove+verify (BASELINE.md
    north star) in a subprocess; returns {northstar_prove_s, ...} fields so
    the driver artifact captures it (round-3 VERDICT item 5)."""
    import subprocess

    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts", "north_star.py"
    )
    try:
        out = subprocess.run(
            [sys.executable, script],
            capture_output=True, text=True, timeout=480,
        )
        for line in reversed((out.stdout or "").strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                return {
                    "northstar_prove_s": d.get("prove_s"),
                    "northstar_verify_s": d.get("verify_s"),
                    "northstar_keygen_s": d.get("keygen_s"),
                    "northstar_workload": d.get("workload"),
                }
        return {"northstar": "FAILED", "northstar_error": out.stderr[-200:]}
    except Exception as e:
        return {"northstar": "FAILED", "northstar_error": str(e)[:200]}


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    pps, msm_dt = bench_msm()
    log(f"MSM 2^{K}: {msm_dt * 1e3:.1f} ms -> {pps:,.0f} points/s")
    result = {
        "metric": f"msm_points_per_sec_2^{K}_bn254",
        "value": round(pps),
        "unit": "points/s",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 4),
    }
    try:
        pps20, dt20 = bench_msm_2_20()
        log(f"MSM 2^20: {dt20 * 1e3:.1f} ms -> {pps20:,.0f} points/s")
        result["msm_points_per_sec_2^20"] = round(pps20)
    except Exception as e:
        log(f"MSM 2^20 bench skipped: {e}")
    try:
        bps, ntt_dt = bench_ntt()
        log(f"NTT 2^20: {ntt_dt * 1e3:.1f} ms -> {bps:,.0f} butterflies/s")
        result["ntt_butterflies_per_sec_2^20"] = round(bps)
        result["ntt_vs_baseline"] = round(bps / BASELINE_BUTTERFLIES_PER_SEC, 4)
    except Exception as e:  # NTT context only; never break the headline line
        log(f"NTT bench skipped: {e}")
    if not os.environ.get("HALO2_TPU_BENCH_NO_NORTHSTAR"):
        ns = bench_northstar()
        log(f"north star: {ns}")
        result.update(ns)
    if not os.environ.get("HALO2_TPU_BENCH_NO_SCALING"):
        result.update(bench_scaling())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
