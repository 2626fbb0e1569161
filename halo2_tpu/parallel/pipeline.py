"""Sharded prove step (L9): the full per-phase device pipeline under one jit.

This is the multi-chip version of the prover's hot phase sequence
(kzg/prover.py, mirroring reference src/circuits/utils.rs:40-48):
witness columns -> gate evaluation over all rows -> iNTT to coefficients ->
MSM commitment.  Shardings:

  * gate evaluation — rows sharded over ``sp`` (GSPMD sharding constraints;
    XLA turns the rotation ``jnp.roll``s into collective permutes);
  * iNTT — distributed four-step NTT, butterfly halves exchanged
    ``all_to_all`` over ``sp`` (parallel.ntt);
  * MSM — points partitioned over the whole mesh, partial bucket sums
    reduced via ``all_gather`` + Jacobian fold (parallel.msm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..jitutil import tuned_jit

from ..field.device import get_device_field
from ..plonkish.evaluator import Program, _run_program
from .msm import _sharded_msm_raw
from .ntt import _sharded_ntt_raw


def build_sharded_prove_step(mesh: Mesh, cs, spec, n_points: int):
    """Returns ``step(columns, px, py) -> (violations, commitment)`` , jitted
    over ``mesh``.

    ``columns`` is the evaluator pytree of (C, 16, n) Montgomery tensors;
    ``px, py`` the (16, n_points) SRS points.  The step evaluates every gate
    constraint on every row (sharded), converts the first advice column to
    coefficient form with the distributed iNTT, and commits to it with the
    sharded MSM.  Output: per-constraint violation counts (replicated) and
    the commitment as a Jacobian pytree.
    """
    df = get_device_field(spec)
    exprs = [c for gate in cs.gates for c in gate.constraints]
    prog = Program(exprs)
    row_sharding = NamedSharding(mesh, P(None, None, "sp"))

    msm_axes = tuple(a for a in ("dp", "sp") if a in mesh.shape)
    msm_fn = _sharded_msm_raw(mesh, n_points, msm_axes)

    def step(columns, px, py):
        columns = {
            k: jax.lax.with_sharding_constraint(v, row_sharding)
            for k, v in columns.items()
        }
        outs = _run_program(prog, df, columns)  # (C, 16, n)
        violations = jnp.sum(~jnp.all(outs == 0, axis=1), axis=-1)  # (C,)

        adv = columns["advice"][0]  # (16, n)
        n = adv.shape[-1]
        intt = _sharded_ntt_raw(mesh, spec, n, True, "sp")
        coeffs = intt(adv)
        scalars = df.from_mont_arr(coeffs)[:, :n_points]
        commitment = msm_fn(px, py, scalars)
        return violations, commitment

    return tuned_jit(step)
