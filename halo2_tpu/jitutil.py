"""jit wrapper tuned per backend.

XLA:CPU's ``fusion`` pass is super-linearly slow on this library's field
arithmetic: deep chains of small integer ops with reconvergent dataflow
(Kogge-Stone carries + conditional-subtract selects) make its fusion cost
analysis explode.  Measured on the round-2 dev box: a chain of 16 field adds
compiles in 104 s with the pass on, 1.5 s with it off — and the driver's
8-virtual-device ``dryrun_multichip`` timed out entirely (MULTICHIP_r01
rc=124) compiling the sharded prove step.  Disabling the pass costs only
unfused elementwise runtime on the CPU *test* backend; the TPU backend is
untouched.

Per-jit ``compiler_options`` (not XLA_FLAGS) so it works even when the
driver/test harness created the CPU client before we run.
"""

from __future__ import annotations

import jax

_CPU_OPTS = {"xla_disable_hlo_passes": "fusion"}


def tuned_jit(fn, **jit_kw):
    """``jax.jit`` with the CPU compile-time mitigation applied when the
    default backend is CPU (virtual-mesh tests / driver dryrun)."""
    if jax.default_backend() == "cpu":
        opts = dict(_CPU_OPTS)
        opts.update(jit_kw.pop("compiler_options", None) or {})
        jit_kw["compiler_options"] = opts
    return jax.jit(fn, **jit_kw)
