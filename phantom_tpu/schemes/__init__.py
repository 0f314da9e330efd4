"""Scheme layer: parameters, context chain, keys, encoders, evaluator."""

from .params import EncryptionParameters, Scheme, MulTech  # noqa: F401
from .context import Context, make_context  # noqa: F401
from .ciphertext import Ciphertext, Plaintext  # noqa: F401
from . import keys  # noqa: F401
from .batch_encoder import BatchEncoder  # noqa: F401
from . import evaluate  # noqa: F401
from .ckks_encoder import CKKSDeviceEncoder, CKKSEncoder  # noqa: F401
from . import keyswitch  # noqa: F401
from .linear import LinearTransform  # noqa: F401
from .poly import (poly_eval, poly_eval_cheb,  # noqa: F401
                   poly_eval_cheb_fast32, poly_eval_fast32)
