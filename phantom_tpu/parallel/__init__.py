"""Multi-chip sharding layer (new component; the reference is single-GPU —
SURVEY.md §5.8: no NCCL/MPI anywhere in /root/reference).

Design (SURVEY.md §2 parallelism table):
  - mesh axes ("dp", "limb"): ciphertext batch parallelism x RNS-limb
    parallelism.  Elementwise RNS ops and the NTT are *limb-local* (zero
    communication); the base-conversion matmuls and keyswitch inner
    products are cross-limb and lower to XLA collectives (all-gather /
    psum) inserted by GSPMD from the sharding annotations.
  - everything rides jax.jit + NamedSharding: annotate, let XLA place the
    collectives on ICI.
"""

from .mesh import (make_mesh, make_coeff_mesh, ct_sharding,  # noqa: F401
                   replicate, shard_ciphertext_data,
                   sharded_mul_relin_rescale_step)
from .pipeline_sharded import (build_sharded_consts,  # noqa: F401
                               build_sharded_step,
                               sharded_mult_relin_rescale)
