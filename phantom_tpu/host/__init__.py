"""Host-side exact-integer precompute (reference L0 equivalent)."""

from .modulus import Modulus, CoeffModulus, PlainModulus, compute_shoup  # noqa: F401
from . import numth, hestd, ntt_tables  # noqa: F401
from .globals_ import (  # noqa: F401
    default_coeff_modulus_128,
    default_coeff_modulus_192,
    default_coeff_modulus_256,
)
