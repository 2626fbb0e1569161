"""Fused Pallas NTT butterfly stages (TPU hot path).

The jnp NTT in :mod:`domain` pays ~20 HBM round trips per transform: every
stage materializes the twiddle product, the add/sub wings, and a stack/
reshape through HBM (NOTES_ROUND2.md measured 336 ms for n=2^20).  Here each
stage is ONE ``pallas_call`` that keeps the butterfly (Montgomery twiddle
mul + mod-add + mod-sub) entirely in VMEM:

* ``_small_stages_call`` — all stages with half-size m <= TILE/2 fused into a
  single kernel.  Within a (16, TILE) lane tile the butterfly partner is
  ``lane ± m``; partners are brought in register with two static lane
  rotations (concat of static slices) and the wings are picked with a lane-
  index select.  The twiddle vector per stage is the periodic pattern
  [1…1 | w^0..w^(m-1)] pre-tiled to TILE lanes (a-lanes multiply by one —
  2x mul overhead for these stages, bought back many times by the fusion).
* ``_large_stage_call`` — one stage with m >= TILE: the array is viewed as
  (16, 2G, m) where row 2g / 2g+1 are the a / b wings of group g; each block
  (16, 2, mt) holds both wings so the whole butterfly is local.

Replaces the reference's CPU best_fft inside halo2_proofs::poly
(SURVEY.md §2c "NTT / polynomial engine"; hot per §3.2 create_proof).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.params import FieldSpec
from ..field.pallas_mul import (
    L,
    TILE,
    mont_consts,
    mont_in_specs,
    _mod_add_vmem,
    _mod_sub_vmem,
    _mont_mul_vmem,
)


def _small_stages_kernel(x_ref, tw_ref, tmat_ref, tsqr_ref, m2_ref, m3_ref, p_ref, o_ref, *, ms):
    x = x_ref[:]  # (16, TILE)
    t_mat, m2, m3, p_limbs = tmat_ref[:], m2_ref[:], m3_ref[:], p_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
    for si, m in enumerate(ms):
        t = x if m == 1 else _mont_mul_vmem(x, tw_ref[si], t_mat, m2, m3, p_limbs)
        # partners: up[i] = t[i-m] (for b-lanes), down[i] = t[i+m] (a-lanes).
        # The tile wrap-around only lands in lanes the select discards
        # (2m divides TILE, so 2m-groups never straddle the tile edge).
        up = jnp.concatenate([t[:, -m:], t[:, :-m]], axis=1)
        down = jnp.concatenate([t[:, m:], t[:, :m]], axis=1)
        is_b = (lane & m) != 0
        x = jnp.where(is_b, _mod_sub_vmem(up, t, p_limbs), _mod_add_vmem(t, down, p_limbs))
    o_ref[:] = x


@functools.lru_cache(maxsize=None)
def _small_stages_call(spec: FieldSpec, n: int, inverse: bool, ms: tuple):
    from .domain import _stage_twiddles

    consts = mont_consts(spec)
    stages = _stage_twiddles(spec, n, inverse)
    one = np.zeros((L, 1), np.uint32)
    r = (1 << 256) % spec.p  # Montgomery one
    for j in range(L):
        one[j, 0] = (r >> (16 * j)) & 0xFFFF
    # periodic per-stage twiddle pattern tiled to TILE lanes:
    # position i -> 1 if (i mod 2m) < m else w^(i mod 2m - m)
    tw = np.zeros((len(ms), L, TILE), np.uint32)
    for si, m in enumerate(ms):
        pat = np.concatenate([np.broadcast_to(one, (L, m)), stages[m.bit_length() - 1]], axis=1)
        tw[si] = np.tile(pat, (1, TILE // (2 * m)))

    tile_spec = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        functools.partial(_small_stages_kernel, ms=ms),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // TILE,),
        in_specs=[tile_spec, const((len(ms), L, TILE))]
        + mont_in_specs(lambda i: (0, 0)),
        out_specs=tile_spec,
    )
    # inner jit: cache the Mosaic lowering per shape across call sites and
    # processes (see field/pallas_mul._mont_mul_call)
    return jax.jit(lambda x: call(x, tw, *consts))


def _large_stage_kernel(x_ref, tw_ref, tmat_ref, tsqr_ref, m2_ref, m3_ref, p_ref, o_ref):
    a = x_ref[:, 0, 0, :]
    b = x_ref[:, 0, 1, :]
    bp = _mont_mul_vmem(b, tw_ref[:], tmat_ref[:], m2_ref[:], m3_ref[:], p_ref[:])
    o_ref[:, 0, 0, :] = _mod_add_vmem(a, bp, p_ref[:])
    o_ref[:, 0, 1, :] = _mod_sub_vmem(a, bp, p_ref[:])


@functools.lru_cache(maxsize=None)
def _large_stage_call(spec: FieldSpec, n: int, inverse: bool, m: int):
    from .domain import _stage_twiddles

    consts = mont_consts(spec)
    tw = _stage_twiddles(spec, n, inverse)[m.bit_length() - 1]  # (L, m)
    mt = min(m, TILE)
    g = n // (2 * m)  # butterfly groups; view (L, G, 2, m) wing dim in-block

    blk = pl.BlockSpec(
        (L, 1, 2, mt), lambda i, j: (0, i, 0, j), memory_space=pltpu.VMEM
    )
    tw_spec = pl.BlockSpec((L, mt), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _large_stage_kernel,
        out_shape=jax.ShapeDtypeStruct((L, g, 2, m), jnp.uint32),
        grid=(g, m // mt),
        in_specs=[blk, tw_spec] + mont_in_specs(lambda i, j: (0, 0)),
        out_specs=blk,
    )

    def fn(x):  # (L, n) -> (L, n)
        return call(x.reshape(L, g, 2, m), tw, *consts).reshape(L, n)

    return jax.jit(fn)


def ntt_stages(spec: FieldSpec, n: int, inverse: bool):
    """Jittable (L, n)->(L, n) full butterfly ladder (input bit-reversed)."""
    small_ms = tuple(1 << s for s in range(n.bit_length() - 1) if (1 << s) <= TILE // 2)
    large_ms = tuple(1 << s for s in range(n.bit_length() - 1) if (1 << s) > TILE // 2)
    small = _small_stages_call(spec, n, inverse, small_ms) if small_ms else None
    larges = [_large_stage_call(spec, n, inverse, m) for m in large_ms]

    def fn(x):
        if small is not None:
            x = small(x)
        for lg in larges:
            x = lg(x)
        return x

    return fn
