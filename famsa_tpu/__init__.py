"""famsa_tpu - TPU-native progressive multiple sequence alignment framework.

A ground-up JAX/Pallas re-design with the capabilities of FAMSA 2.5.0:
bit-parallel LCS distances, SLINK/MST-Prim/UPGMA/NJ guide trees (with
PartTree/MedoidTree heuristics), progressive affine-gap profile alignment,
iterative refinement, and FAMSA-compatible CLI/outputs.
"""

__version__ = "0.1.0"
