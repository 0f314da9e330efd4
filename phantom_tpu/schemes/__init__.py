"""Scheme layer: parameters, context chain, keys, encoders, evaluator."""

from .params import EncryptionParameters, Scheme, MulTech  # noqa: F401
from .context import Context, make_context  # noqa: F401
from .ciphertext import Ciphertext, Plaintext  # noqa: F401
from . import keys  # noqa: F401
from .batch_encoder import BatchEncoder  # noqa: F401
from . import evaluate  # noqa: F401
from .ckks_encoder import CKKSDeviceEncoder, CKKSEncoder  # noqa: F401
from . import keyswitch  # noqa: F401
