"""Honest DeviceEngine-vs-NativeEngine prove crossover (round-5 VERDICT item 4).

Measures the FULL north-star prove through the pure device engine
(HALO2_TPU_PROVER_BACKEND=device) twice in one process — the first run pays
the one-time XLA program build + tunnel load, the second is the steady
state — and the native engine prove on the same pk, at the requested k's.
Prints one JSON line per k.

Usage: python scripts/device_crossover.py [--ks 11,13] [--depth 15]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="11,13")
    ap.add_argument("--depth", type=int, default=15)
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)

    from halo2_tpu.circuits.merkle_sum_tree import (
        MerkleSumTreeCircuit,
        Node,
        compute_merkle_sum_root,
    )
    from halo2_tpu.field import Fr
    from halo2_tpu.kzg import ParamsKZG, create_proof, verify_proof
    from halo2_tpu.kzg.keygen import keygen_cached

    rng = random.Random(0xA11CE)
    depth = args.depth
    leaf = Node(Fr.from_u64(10), Fr.from_u64(100))
    elements = [
        Node(Fr.from_u64(rng.randrange(1 << 32)), Fr.from_u64(rng.randrange(1 << 20)))
        for _ in range(depth)
    ]
    indices = [Fr.from_u64(rng.randrange(2)) for _ in range(depth)]
    root = compute_merkle_sum_root(Fr, leaf, elements, indices)
    assets_sum = root.balance + Fr.from_u64(1)
    public = [leaf.hash, leaf.balance, root.hash, assets_sum]
    circuit = MerkleSumTreeCircuit(
        Fr,
        leaf.hash,
        leaf.balance,
        [n.hash for n in elements],
        [n.balance for n in elements],
        indices,
        assets_sum,
    )

    for k in [int(x) for x in args.ks.split(",")]:
        params = ParamsKZG.setup_cached(k)
        cache = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", ".srs",
            f"pk_mst_d{depth}_k{k}.pkl",
        )
        pk = keygen_cached(params, circuit, k, Fr, cache)

        os.environ["HALO2_TPU_PROVER_BACKEND"] = "native"
        t0 = time.perf_counter()
        p_nat = create_proof(params, pk, circuit, [list(public)], rng=random.Random(7))
        t_native = time.perf_counter() - t0
        print(f"k={k} native prove: {t_native:.2f}s", flush=True)

        os.environ["HALO2_TPU_PROVER_BACKEND"] = "device"
        t0 = time.perf_counter()
        p_dev = create_proof(params, pk, circuit, [list(public)], rng=random.Random(7))
        t_cold = time.perf_counter() - t0
        print(f"k={k} device prove COLD (program build+load): {t_cold:.1f}s", flush=True)
        t0 = time.perf_counter()
        p_dev2 = create_proof(params, pk, circuit, [list(public)], rng=random.Random(7))
        t_warm = time.perf_counter() - t0
        print(f"k={k} device prove STEADY-STATE: {t_warm:.2f}s", flush=True)
        os.environ.pop("HALO2_TPU_PROVER_BACKEND", None)

        assert p_dev == p_nat == p_dev2, "engines must produce identical bytes"
        ok = verify_proof(params.verifier_params(), pk.vk, p_dev, [list(public)])
        assert ok
        print(json.dumps({
            "k": k,
            "depth": depth,
            "native_prove_s": round(t_native, 3),
            "device_prove_cold_s": round(t_cold, 2),
            "device_prove_steady_s": round(t_warm, 3),
            "verified": ok,
        }), flush=True)


if __name__ == "__main__":
    main()
