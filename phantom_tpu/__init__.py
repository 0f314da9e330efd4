"""phantom_tpu — a TPU-native word-wise FHE framework (BFV / BGV / CKKS).

Built from scratch in JAX/XLA/Pallas with the capability set of the CUDA
reference library surveyed in SURVEY.md.  64-bit modular arithmetic is
decomposed into 32-bit ops for the TPU VPU/MXU; RNS limbs and coefficient
blocks shard over device meshes via jax.sharding.

Requires jax_enable_x64 (set on import).
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
