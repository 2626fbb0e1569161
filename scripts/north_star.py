"""North-star workload (BASELINE.md): merkle-sum-tree, depth 15, k>=11,
end-to-end KZG prove+verify on the real TPU.

Prints the reference's vk/pk/prove/verify timing lines
(reference src/circuits/utils.rs:66-69) plus per-phase prover timings and a
final one-line JSON summary consumed by bench.py.

Usage: python scripts/north_star.py [--k 11] [--depth 15] [--no-pk-cache]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=11)
    ap.add_argument("--depth", type=int, default=15)
    ap.add_argument("--no-pk-cache", action="store_true")
    ap.add_argument(
        "--repeat",
        type=int,
        default=1,
        help="prove N times in-process and report each prove time; the first "
        "device-backend prove pays XLA program load through the tunnel "
        "(~minutes), later proves are steady-state dispatch",
    )
    ap.add_argument(
        "--profile-dir",
        default=os.environ.get("HALO2_TPU_PROFILE"),
        help="capture a jax.profiler trace of the prove phase into this dir "
        "(view with tensorboard / xprof; SURVEY.md §5 tracing)",
    )
    args = ap.parse_args()
    os.environ.setdefault("HALO2_TPU_TIMING", "1")

    import contextlib

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
    from halo2_tpu.kzg.prover import PHASE_TIMINGS

    k, depth = args.k, args.depth
    rng = random.Random(0xA11CE)
    leaf = Node(Fr.from_u64(10), Fr.from_u64(100))
    elements = [
        Node(Fr.from_u64(rng.randrange(1 << 32)), Fr.from_u64(rng.randrange(1 << 20)))
        for _ in range(depth)
    ]
    indices = [Fr.from_u64(rng.randrange(2)) for _ in range(depth)]
    t0 = time.perf_counter()
    root = compute_merkle_sum_root(Fr, leaf, elements, indices)
    print(f"host oracle root ({depth} levels): {time.perf_counter() - t0:.2f}s", flush=True)
    assets_sum = root.balance + Fr.from_u64(1)  # liabilities < assets
    public_input = [leaf.hash, leaf.balance, root.hash, assets_sum]
    circuit = MerkleSumTreeCircuit(
        Fr,
        leaf.hash,
        leaf.balance,
        [n.hash for n in elements],
        [n.balance for n in elements],
        indices,
        assets_sum,
    )

    t0 = time.perf_counter()
    params = ParamsKZG.setup_cached(k)
    print(f"SRS k={k} ready in {time.perf_counter() - t0:.1f}s", flush=True)

    vk_time = pk_time = None
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        ".srs",
        f"pk_mst_d{depth}_k{k}.pkl",
    )
    t0 = time.perf_counter()
    if args.no_pk_cache or not os.path.exists(cache):
        # cold path: the two halo2 entry points, individually measured
        # (reference src/circuits/utils.rs:31-36 times them separately)
        from halo2_tpu.kzg import keygen_pk, keygen_vk

        vk = keygen_vk(params, circuit, k, Fr)
        vk_time = time.perf_counter() - t0
        t1 = time.perf_counter()
        pk = keygen_pk(params, vk, circuit, k, Fr)
        pk_time = time.perf_counter() - t1
        if not args.no_pk_cache:
            os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
            pk.save(cache)
    else:
        pk = keygen_cached(params, circuit, k, Fr, cache)
    keygen_time = time.perf_counter() - t0

    PHASE_TIMINGS.clear()
    prof = (
        jax.profiler.trace(args.profile_dir)
        if args.profile_dir
        else contextlib.nullcontext()
    )
    prove_times = []
    for rep in range(max(1, args.repeat)):
        t0 = time.perf_counter()
        with (prof if rep == 0 else contextlib.nullcontext()):
            proof = create_proof(
                params, pk, circuit, [list(public_input)], rng=random.Random(7)
            )
        prove_times.append(time.perf_counter() - t0)
        if args.repeat > 1:
            print(f"prove rep {rep}: {prove_times[-1]:.3f}s", flush=True)
    proof_time = prove_times[-1]  # steady state (first rep pays program load)
    if args.profile_dir:
        print(f"profiler trace written to {args.profile_dir}", flush=True)

    t0 = time.perf_counter()
    ok = verify_proof(params.verifier_params(), pk.vk, proof, [list(public_input)])
    verify_time = time.perf_counter() - t0
    assert ok, "north-star proof failed verification"

    # tamper check: verification must reject a wrong root
    bad_public = list(public_input)
    bad_public[2] = bad_public[2] + Fr.from_u64(1)
    assert not verify_proof(params.verifier_params(), pk.vk, proof, [bad_public])

    if vk_time is not None:
        print(f"Time to generate vk {vk_time:.3f}s")
        print(f"Time to generate pk {pk_time:.3f}s")
    else:
        print(f"Time to load vk+pk from cache {keygen_time:.3f}s")
    print(f"Prover Time {proof_time:.3f}s")
    print(f"Verifier Time {verify_time:.3f}s")
    summary = {
        "workload": f"merkle_sum_tree depth={depth} k={k} KZG",
        "keygen_s": round(keygen_time, 3),
        "keygen_vk_s": round(vk_time, 3) if vk_time is not None else None,
        "keygen_pk_s": round(pk_time, 3) if pk_time is not None else None,
        "prove_s": round(proof_time, 3),
        "prove_reps_s": [round(t, 3) for t in prove_times] if args.repeat > 1 else None,
        "verify_s": round(verify_time, 3),
        "proof_bytes": len(proof),
        "phases": {p: round(v, 3) for p, v in PHASE_TIMINGS.items()},
    }
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
