"""Distributed four-step NTT with all_to_all stage exchange (L9).

BASELINE.json mandate: "NTT butterfly stages are exchanged all-to-all".
Classic four-step decomposition of the size-n DFT over omega (the SAME omega
as poly.domain's single-chip kernel, so results are bit-identical):

  n = n1*n2, input viewed as M[i, jj] = x[i*n2 + jj], columns jj sharded
  over the ``sp`` mesh axis.
    1. local n1-point NTTs down each column  (root omega^{n2})
    2. local twiddle multiply by omega^{jj*k1}
    3. ``all_to_all`` transpose: column-sharded -> row-sharded
    4. local n2-point NTTs along each row    (root omega^{n1})
  giving X[k1 + k2*n1] = E[k1, k2].

Only step 3 touches the interconnect, moving each element exactly once —
the communication-optimal schedule for a single NTT on a mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..jitutil import tuned_jit

from ..field.device import get_device_field
from ..field.params import FieldSpec
from ..poly.domain import _bit_reverse_perm, _stage_twiddles


def _ntt_along_axis1(df, stages, rev, x):
    """NTT over axis 1 of (16, m, B), batched over B. Natural order in/out."""
    m, b = x.shape[1], x.shape[2]
    x = x[:, rev, :]
    w = 1
    for tw in stages:  # tw: (16, w)
        x = x.reshape(16, m // (2 * w), 2, w, b)
        lo = x[:, :, 0]
        hi = df.mul(x[:, :, 1], tw[:, None, :, None])
        x = jnp.stack([df.add(lo, hi), df.sub(lo, hi)], axis=2).reshape(16, m, b)
        w *= 2
    return x


def _split(n: int) -> tuple[int, int]:
    lg = n.bit_length() - 1
    n1 = 1 << ((lg + 1) // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(spec: FieldSpec, n: int, inverse: bool):
    """omega^{jj*k1} as a Montgomery (16, n1, n2) NUMPY tensor (trace-safe)."""
    n1, n2 = _split(n)
    df = get_device_field(spec)
    p, s = spec.p, spec.two_adicity
    omega = pow(spec.root_of_unity, 1 << (s - n.bit_length() + 1), p)
    if inverse:
        omega = pow(omega, -1, p)
    vals = []
    for k1 in range(n1):
        row_base = pow(omega, k1, p)
        v, row = 1, []
        for _ in range(n2):
            row.append(v)
            v = v * row_base % p
        vals.extend(row)
    return df.encode_np(vals).reshape(16, n1, n2)


@functools.lru_cache(maxsize=None)
def _sharded_ntt_raw(mesh: Mesh, spec: FieldSpec, n: int, inverse: bool, axis: str):
    """Unjitted sharded-NTT fn — composable inside an outer jit (pipeline)."""
    n1, n2 = _split(n)
    S = mesh.shape[axis]
    assert n1 % S == 0 and n2 % S == 0, f"n={n} too small for {S}-way sharding"
    df = get_device_field(spec)
    stages1 = _stage_twiddles(spec, n1, inverse)
    stages2 = _stage_twiddles(spec, n2, inverse)
    # all closure constants are NUMPY: this cache may be populated under an
    # active jit trace (e.g. from pipeline.build_sharded_prove_step's step)
    rev1 = _bit_reverse_perm(n1)
    rev2 = _bit_reverse_perm(n2)
    wmat = _twiddle_matrix(spec, n, inverse)
    n_inv = df.encode_np([pow(n, -1, spec.p)])[:, :, None]

    def local_fn(x, w):  # x: (16, n1, n2/S) local, w: matching twiddle shard
        x = _ntt_along_axis1(df, stages1, rev1, x)       # NTT over i -> k1
        x = df.mul(x, w)                                  # omega^{jj*k1}
        x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)
        # now (16, n1/S, n2): NTT along jj -> k2 for each k1 row
        x = jnp.swapaxes(x, 1, 2)                         # (16, n2, n1/S)
        x = _ntt_along_axis1(df, stages2, rev2, x)
        x = jnp.swapaxes(x, 1, 2)                         # E[k1_local, k2]
        if inverse:
            x = df.mul(x, n_inv)
        return x

    sm = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis)),
        out_specs=P(None, axis, None),
        check_vma=True,
    )

    def fn(coeffs):  # (16, n) -> (16, n), natural order, same DFT as poly.domain
        e = sm(coeffs.reshape(16, n1, n2), wmat)
        return jnp.transpose(e, (0, 2, 1)).reshape(16, n)

    return fn


@functools.lru_cache(maxsize=None)
def _sharded_ntt_fn(mesh: Mesh, spec: FieldSpec, n: int, inverse: bool, axis: str):
    return tuned_jit(_sharded_ntt_raw(mesh, spec, n, inverse, axis))


def sharded_ntt(mesh: Mesh, spec: FieldSpec, x, inverse: bool = False, axis: str = "sp"):
    """Distributed NTT of a (16, n) Montgomery array; bit-identical to
    ``poly.domain._ntt_fn(spec, n, inverse)``."""
    return _sharded_ntt_fn(mesh, spec, x.shape[-1], inverse, axis)(x)
