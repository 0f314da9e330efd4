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

# umbrella API (reference: include/phantom.h)
from .schemes import (BatchEncoder, CKKSEncoder, Ciphertext,  # noqa: F401,E402
                      Context, EncryptionParameters, LinearTransform,
                      MulTech, Plaintext, Scheme, evaluate, keys,
                      make_context)
from .host.modulus import CoeffModulus, Modulus, PlainModulus  # noqa: F401,E402
from .fast32 import Fast32, Ct32  # noqa: F401,E402  (u32 fast evaluator)
