"""Cross-chip Pippenger MSM (L9).

Replaces the reference's single-host rayon Pippenger inside
`KZGCommitmentScheme` commits (src/circuits/utils.rs:40-48) with the
BASELINE.json mandate: "MSM points/buckets are partitioned with bucket sums
reduced via collectives".  Each device runs the full single-chip Pippenger
(ec.device._msm_raw — sort + segmented-scan bucket accumulation) over its
shard of the points, producing one partial Jacobian sum; the D partials are
exchanged with ``all_gather`` over the mesh axes and folded with the complete
Jacobian addition law on every device (replicated result).

The partial-sum exchange is O(D) field elements — negligible next to the
O(N/D) local bucket work — so scaling efficiency is limited only by the
digit-sort load balance.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ec.device import _msm_raw, jac_add


@functools.lru_cache(maxsize=None)
def _sharded_msm_fn(mesh: Mesh, n: int, axes: tuple):
    ndev = 1
    for a in axes:
        ndev *= mesh.shape[a]
    assert n % ndev == 0, f"point count {n} must divide over {ndev} devices"
    local = _msm_raw(n // ndev)

    def local_fn(px, py, scalars):
        part = local(px, py, scalars)  # jac pytree, leaves (16,)
        gathered = {
            k: jax.lax.all_gather(v, axes, axis=0) for k, v in part.items()
        }  # leaves (D, 16)
        acc = {k: v[0] for k, v in gathered.items()}
        for i in range(1, ndev):
            acc = jac_add(acc, {k: v[i] for k, v in gathered.items()})
        return acc

    spec = P(None, axes)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs={"x": P(), "y": P(), "z": P()},
        # the Pippenger loops carry replicated-initialized accumulators that
        # become device-varying after the first iteration; skip the vma check
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_msm(mesh: Mesh, px, py, scalars_canonical, axes=("dp", "sp")):
    """MSM sharded over the given mesh axes.

    px, py: (16, N) affine Montgomery; scalars_canonical: (16, N) canonical
    Fr limbs.  Returns a replicated Jacobian point pytree (leaves (16,)).
    """
    axes = tuple(a for a in axes if a in mesh.shape)
    return _sharded_msm_fn(mesh, px.shape[-1], axes)(px, py, scalars_canonical)
