"""Multi-chip scaling (L9) — mesh helpers, sharded MSM/NTT, sharded prove step.

The reference has NO distributed anything (SURVEY.md §5: its only parallelism
is rayon threads inside halo2_proofs). This package is the TPU-native scaling
mandate from BASELINE.json: MSM points partitioned across chips with partial
sums combined via collectives, NTT butterfly stages exchanged all-to-all, and
gate/quotient evaluation sharded by row.
"""

from .mesh import make_mesh
from .msm import sharded_msm
from .ntt import sharded_ntt
from .pipeline import build_sharded_prove_step
from .scan import grand_product_z, sharded_prefix_product

__all__ = [
    "make_mesh",
    "sharded_msm",
    "sharded_ntt",
    "build_sharded_prove_step",
    "grand_product_z",
    "sharded_prefix_product",
]
