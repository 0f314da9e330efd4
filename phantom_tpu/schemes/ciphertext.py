"""Plaintext / Ciphertext containers (JAX pytrees).

Equivalent of the reference's PhantomPlaintext / PhantomCiphertext
(include/plaintext.h, include/ciphertext.h), as flax.struct dataclasses:
array payloads are pytree leaves (jit/vmap/shard-able); bookkeeping fields
(chain index, NTT form, BGV correction factor) are static aux data so jitted
evaluator verbs specialize on them exactly like the reference's host
dispatch does.

Data layout: (size, L, N) uint64 — ciphertext polys x RNS limbs x degree.
CKKS `scale` is carried as a static float (deterministic per pipeline stage).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Plaintext:
    data: jnp.ndarray  # BFV: (1, N) mod t; CKKS/BGV-NTT: (L, N)
    chain_index: int = flax.struct.field(pytree_node=False, default=0)
    is_ntt_form: bool = flax.struct.field(pytree_node=False, default=False)
    scale: float = flax.struct.field(pytree_node=False, default=1.0)

    @property
    def poly_modulus_degree(self) -> int:
        return self.data.shape[-1]


@flax.struct.dataclass
class Ciphertext:
    data: jnp.ndarray  # (size, L, N)
    chain_index: int = flax.struct.field(pytree_node=False, default=1)
    is_ntt_form: bool = flax.struct.field(pytree_node=False, default=False)
    scale: float = flax.struct.field(pytree_node=False, default=1.0)
    correction_factor: int = flax.struct.field(pytree_node=False, default=1)
    noise_scale_deg: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def size(self) -> int:
        return self.data.shape[0]

    @property
    def coeff_modulus_size(self) -> int:
        return self.data.shape[1]

    @property
    def poly_modulus_degree(self) -> int:
        return self.data.shape[2]
