"""Device-mesh construction for the proving pipeline.

Axes (the ZK-prover analogues of dp/sp):
  * ``dp`` — data parallel over MSM points / independent commitments;
  * ``sp`` — "sequence" (row) parallel over circuit rows, NTT columns, and
    gate-evaluation lanes.

On real hardware dp x sp should be laid out so the heavy all_to_all of the
distributed NTT rides ICI within a slice (SURVEY.md §5 "distributed
communication backend").
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    """A (dp, sp) mesh over the first ``n_devices`` devices.

    ``dp`` defaults to 2 when the device count is even, else 1; ``sp`` takes
    the rest.  A 1-device mesh is valid (all collectives degenerate).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    if dp is None:
        dp = 2 if n % 2 == 0 and n > 1 else 1
    assert n % dp == 0
    sp = n // dp
    arr = np.array(devs[:n]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))
