"""famsa_tpu - TPU-native progressive multiple sequence alignment framework.

A ground-up JAX/Pallas re-design with the capabilities of FAMSA 2.5.0:
bit-parallel LCS distances, SLINK/MST-Prim/UPGMA/NJ guide trees (with
PartTree/MedoidTree heuristics), progressive affine-gap profile alignment,
iterative refinement, and FAMSA-compatible CLI/outputs.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: kernel compiles through the remote TPU
# tunnel cost minutes; cache them across processes.  Opt out with
# FAMSA_TPU_JAX_CACHE=0 or point FAMSA_TPU_JAX_CACHE at a directory.
# Default lives under ~/.cache (NOT /tmp: /tmp is wiped between sessions
# on this box, which costs a ~6 min cold compile per kernel shape).
_cache = _os.environ.get(
    "FAMSA_TPU_JAX_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "famsa_tpu_jaxcache"))
if _cache and _cache != "0":
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
