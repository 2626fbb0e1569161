"""Host-MSM microbenchmark: phase timings for the IFMA Pippenger.

Times pack_device, the Montgomery-52 conversion (implicit in msm_g1_mont),
and the MSM core at 2^16 and 2^20, host-only (no TPU).  Used to steer the
round-5 perf push toward the 1.0 M points/s baseline.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from halo2_tpu import native  # noqa: E402
from halo2_tpu.field.device import get_device_field  # noqa: E402
from halo2_tpu.field.params import BN254_FR  # noqa: E402
from halo2_tpu.kzg.params import ParamsKZG  # noqa: E402


def med(f, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import random

    assert native.available(), "native engine missing"
    params = ParamsKZG.setup_cached(16)
    dfr = get_device_field(BN254_FR)
    rng = random.Random(42)
    n16 = 1 << 16
    sc_np16 = dfr.encode_np(
        [rng.randrange(BN254_FR.p) for _ in range(n16)], to_mont=False
    )
    gx = np.asarray(params.g1_x)
    gy = np.asarray(params.g1_y)

    t_pack = med(lambda: native.pack_device(gx), 3)
    print(f"pack_device 2^16 (one coord): {t_pack*1e3:.1f} ms")

    px = native.pack_device(gx)
    py = native.pack_device(gy)
    sc = native.pack_device(sc_np16)

    out = {}
    def run16():
        out["r"] = native.msm_g1_mont(px, py, sc)
    t16 = med(run16, 5)
    print(f"msm core 2^16: {t16*1e3:.1f} ms -> {n16/t16:,.0f} pts/s   {out['r'][0]%1000}")

    pts52 = native.points_to52(px, py)
    if pts52 is not None:
        def run16p():
            out["r"] = native.msm_g1_mont52(pts52[0], pts52[1], sc)
        t16p = med(run16p, 5)
        print(f"msm pre52 2^16: {t16p*1e3:.1f} ms -> {n16/t16p:,.0f} pts/s   {out['r'][0]%1000}")

    # 2^20 (tiled points, fresh scalars pattern like bench.py)
    reps = 16
    px20 = np.tile(px, (reps, 1))
    py20 = np.tile(py, (reps, 1))
    sc20 = np.tile(sc, (reps, 1))
    n20 = 1 << 20
    def run20():
        out["r"] = native.msm_g1_mont(px20, py20, sc20)
    t20 = med(run20, 3)
    print(f"msm core 2^20: {t20*1e3:.1f} ms -> {n20/t20:,.0f} pts/s   {out['r'][0]%1000}")
    pts52_20 = native.points_to52(px20, py20)
    if pts52_20 is not None:
        def run20p():
            out["r"] = native.msm_g1_mont52(pts52_20[0], pts52_20[1], sc20)
        t20p = med(run20p, 3)
        print(f"msm pre52 2^20: {t20p*1e3:.1f} ms -> {n20/t20p:,.0f} pts/s   {out['r'][0]%1000}")


if __name__ == "__main__":
    main()
