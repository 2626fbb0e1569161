"""halo2_tpu — a TPU-native PLONKish (halo2-style) proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
summa-dev/halo2-experiments and the slice of the PSE halo2 stack it exercises:
limb-vectorized prime-field arithmetic, a PLONKish constraint-system frontend,
a vectorized MockProver, the 17 reference experiments (chips + circuits), a
Poseidon (Pow5) gadget with grain-LFSR constants, and a KZG/SHPLONK prover
built on TPU NTT and Pippenger MSM kernels.
"""

__version__ = "0.1.0"
