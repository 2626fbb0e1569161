"""Distributed grand-product prefix scan (L9).

The permutation and lookup arguments both build z with
``z[0] = 1; z[r+1] = z[r] * num[r] / den[r]`` — a sequential row recurrence
(reference: halo2_proofs' permutation grand product inside ``create_proof``,
src/circuits/utils.rs:40-48).  TPU-native shape: a row-sharded EXCLUSIVE
prefix product — log-depth ``associative_scan`` of the field multiply inside
each shard, one ``all_gather`` of the S per-shard totals, and a tiny
``fori`` to fold each shard's offset.  Cross-chip traffic is O(S) field
elements per z.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..field.device import get_device_field
from ..jitutil import tuned_jit


def _prefix_product_local(df, x):
    """Inclusive prefix product along the last axis (log-depth)."""
    return jax.lax.associative_scan(df.mul, x, axis=x.ndim - 1)


@functools.lru_cache(maxsize=None)
def _sharded_prefix_product_raw(mesh: Mesh, spec, axis: str, n: int):
    """Unjitted (16, n) -> (16, n) INCLUSIVE row prefix product, sharded."""
    df = get_device_field(spec)
    S = mesh.shape[axis]
    assert n % S == 0

    def local_fn(x):  # (16, n/S) local shard
        pref = _prefix_product_local(df, x)
        total = pref[:, -1]  # (16,)
        totals = jax.lax.all_gather(total, axis, axis=0)  # (S, 16)
        idx = jax.lax.axis_index(axis)

        def body(j, off):
            t = jax.lax.dynamic_index_in_dim(totals, j, 0, False)
            return df.select(j < idx, df.mul(off, t), off)

        # the carry starts replicated but turns device-varying at the first
        # iteration (idx = axis_index); mark it varying up front so the
        # full vma soundness check can stay ON (round-3 VERDICT item 7)
        from ..ec.device import _pvary

        off = jax.lax.fori_loop(0, S, body, _pvary(df.one_mont(()), axis))
        return df.mul(pref, off[:, None])

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=P(None, axis),
        check_vma=True,
    )


@functools.lru_cache(maxsize=None)
def _sharded_prefix_product_fn(mesh: Mesh, spec, axis: str, n: int):
    return tuned_jit(_sharded_prefix_product_raw(mesh, spec, axis, n))


def sharded_prefix_product(mesh: Mesh, spec, x, axis: str = "sp"):
    """Inclusive prefix product of a (16, n) Montgomery array over rows.

    ``grand_product_z`` is the exclusive variant the prover consumes:
    z[0] = 1, z[r] = prod_{i<r} ratio[i].
    """
    return _sharded_prefix_product_fn(mesh, spec, axis, x.shape[-1])(x)


def grand_product_z(mesh: Mesh, spec, num, den, axis: str = "sp"):
    """Sharded z column: z[r] = prod_{i<r} num[i]/den[i] (z[0] = 1).

    num, den: (16, n) Montgomery.  Uses a batched Fermat inverse for den —
    device-wide, no host round trip.
    """
    df = get_device_field(spec)
    ratio = df.mul(num, df.inv(den))
    pref = sharded_prefix_product(mesh, spec, ratio, axis)
    one = df.one_mont((1,))
    return jnp.concatenate([one, pref[:, :-1]], axis=1)
