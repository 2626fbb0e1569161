"""Sharded prove-step DEMO (L9): per-phase device pipeline under ONE jit.

NOTE (round 4): the production multi-chip prover is `create_proof(mesh=...)`
(kzg/engine.ShardedEngine), which routes every real phase — iNTT, commits,
permutation/lookup grand products with the actual beta/gamma/sigma labels,
and the row-sharded quotient VM — through halo2_tpu/parallel and produces
byte-identical proofs to single-chip (asserted in dryrun_multichip).  This
module remains as the fused single-jit form of the row-axis phases (gate
check + iNTT + commits + a grand-product scan with synthetic labels), used
by the dryrun to exercise all collectives inside one program.

This is the multi-chip version of the prover's phase sequence that touches
the row axis (kzg/prover.py, mirroring reference src/circuits/utils.rs:40-48):
witness columns -> gate evaluation over all rows -> iNTT of EVERY advice
column -> MSM commitment of every column -> grand-product z (permutation /
lookup argument prefix recurrence).  Shardings:

  * gate evaluation — rows sharded over ``sp`` (GSPMD sharding constraints;
    XLA turns the rotation ``jnp.roll``s into collective permutes);
  * iNTT — distributed four-step NTT, butterfly halves exchanged
    ``all_to_all`` over ``sp`` (parallel.ntt);
  * MSM — points partitioned over the whole mesh, partial window sums
    reduced via ``all_gather`` + Jacobian fold (parallel.msm);
  * grand products — row-sharded prefix product: local associative scan +
    all_gather of per-shard totals (parallel.scan).

``dryrun_multichip`` (__graft_entry__) asserts each output bit-identical to
host-integer references.
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
from .scan import _sharded_prefix_product_raw


def build_sharded_prove_step(mesh: Mesh, cs, spec, n_points: int):
    """Returns ``step(columns, px, py) -> (violations, coeffs, commitments,
    z)``, jitted over ``mesh``.

    ``columns`` is the evaluator pytree of (C, 16, n) Montgomery tensors;
    ``px, py`` the (16, n_points) SRS points.  The step evaluates every gate
    constraint on every row (sharded), converts EVERY advice column to
    coefficient form with the distributed iNTT, commits each with the sharded
    MSM, and computes a permutation-style grand-product z over the first two
    advice columns (num = adv0 + 1, den = adv1 + 1 — the recurrence shape of
    kzg/prover.py's permutation/lookup z columns).  Outputs: per-constraint
    violation counts (replicated), (A, 16, n) iNTT coefficients, stacked
    Jacobian commitments (leaves (A, 16)), and the (16, n) z column.
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

        adv = columns["advice"]  # (A, 16, n)
        n = adv.shape[-1]
        intt = _sharded_ntt_raw(mesh, spec, n, True, "sp")
        coeffs = jax.lax.map(intt, adv)  # (A, 16, n) — ONE traced body

        def commit_one(coeffs_col):
            scalars = df.from_mont_arr(coeffs_col)[:, :n_points]
            return msm_fn(px, py, scalars)

        commitments = jax.lax.map(commit_one, coeffs)  # leaves (A, 16)

        # grand-product z: z[0]=1, z[r+1] = z[r] * num[r]/den[r]
        prefix = _sharded_prefix_product_raw(mesh, spec, "sp", n)
        one_col = df.one_mont((n,))
        num = df.add(adv[0], one_col)
        den = df.add(adv[1 % adv.shape[0]], one_col)
        ratio = df.mul(num, df.inv(den))
        pref = prefix(ratio)
        z = jnp.concatenate([df.one_mont((1,)), pref[:, :-1]], axis=1)
        return violations, coeffs, commitments, z

    return tuned_jit(step)
