"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count=8``.  NOTE: jax is already imported at
interpreter startup by the axon sitecustomize (TPU tunnel), so env vars alone
are too late — we must update jax.config directly to force the CPU backend.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's fusion pass is superlinearly slow on the field-arithmetic op
# graphs (see halo2_tpu/jitutil.py); disabling it cuts suite compile time
# by well over an order of magnitude with no effect on correctness.
if "xla_disable_hlo_passes" not in flags:
    flags = (flags + " --xla_disable_hlo_passes=fusion").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the persistent compilation cache segfaults in jaxlib's executable
# serialization (zstd) on the very large unfused sharded-prover programs
# (observed round 5 on the k=9 mesh MSM); tests don't need cross-process
# caching, so turn it off
jax.config.update("jax_enable_compilation_cache", False)
# XLA_FLAGS is consumed lazily when the CPU client is created, which has not
# happened yet at conftest time, so the env mutation above still takes effect.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
