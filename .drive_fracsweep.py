import os, time, random
import numpy as np, jax.numpy as jnp
from halo2_tpu.ec.device import msm_hybrid, msm
from halo2_tpu.field.device import get_device_field
from halo2_tpu.field.params import BN254_FR
from halo2_tpu.kzg.params import ParamsKZG
from halo2_tpu import native

params = ParamsKZG.setup_cached(16)
dfr = get_device_field(BN254_FR)
rng = random.Random(42)
n = 1 << 16
sc_np = dfr.encode_np([rng.randrange(BN254_FR.p) for _ in range(n)], to_mont=False)
scalars = jnp.asarray(sc_np)
g1_x, g1_y = jnp.asarray(params.g1_x), jnp.asarray(params.g1_y)

pxp = native.pack_device(params.g1_x); pyp = native.pack_device(params.g1_y)
scp = native.pack_device(sc_np)
t0 = time.perf_counter(); native.msm_g1_mont(pxp, pyp, scp)
print(f"host-only 2^16 (pre-packed): {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
t0 = time.perf_counter()
native.msm_g1_mont(native.pack_device(params.g1_x), native.pack_device(params.g1_y), native.pack_device(sc_np))
print(f"host-only 2^16 (incl pack): {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

for frac in ["0.3", "0.42", "0.55"]:
    os.environ["HALO2_TPU_MSM_DEVICE_FRAC"] = frac
    t0 = time.perf_counter()
    out = msm_hybrid(g1_x, g1_y, scalars, params.g1_x, params.g1_y, sc_np)
    np.asarray(out["x"])
    print(f"warm frac={frac}: {time.perf_counter()-t0:.1f} s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = msm_hybrid(g1_x, g1_y, scalars, params.g1_x, params.g1_y, sc_np)
        np.asarray(out["x"]); ts.append(time.perf_counter()-t0)
    print(f"hybrid frac={frac}: {sorted(ts)[1]*1e3:.0f} ms", flush=True)

os.environ.pop("HALO2_TPU_MSM_DEVICE_FRAC", None)
out = msm(g1_x, g1_y, scalars); np.asarray(out["x"])
ts = []
for _ in range(3):
    t0 = time.perf_counter(); out = msm(g1_x, g1_y, scalars); np.asarray(out["x"]); ts.append(time.perf_counter()-t0)
print(f"device-only 2^16: {sorted(ts)[1]*1e3:.0f} ms", flush=True)
