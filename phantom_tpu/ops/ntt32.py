"""Negacyclic NTT over 32-bit RNS primes — the TPU-native fast path.

Same stage structure and table layout as ops/ntt.py (see that module and
SURVEY.md §2 #12), but every residue is a single uint32 word and the Shoup
companions use 2^32 fixed point: a butterfly is ~15 native int32 VPU ops.
Tables convert losslessly from the u64 host tables for q < 2^31
(floor(w*2^32/q) == floor(w*2^64/q) >> 32).

Ranges: forward input [0, q), intermediates [0, 4q) (q < 2^30 required for
the lazy accumulation to fit uint32), output [0, q); inverse input [0, 2q),
output [0, q).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .modmath32 import (U32, csub32, mul_mod_shoup_lazy32, u32)


class NTTTables32(NamedTuple):
    q: jnp.ndarray                      # (L,) uint32
    root_powers: jnp.ndarray            # (L, N) uint32
    root_powers_shoup: jnp.ndarray      # (L, N) uint32, 2^32 fixed point
    inv_root_powers: jnp.ndarray
    inv_root_powers_shoup: jnp.ndarray
    inv_degree: jnp.ndarray             # (L,)
    inv_degree_shoup: jnp.ndarray

    @property
    def n(self) -> int:
        return self.root_powers.shape[-1]

    def limb_slice(self, idx) -> "NTTTables32":
        ia = np.asarray(idx)
        return NTTTables32(*(a[ia] for a in self))


def tables32_from_tables64(t) -> NTTTables32:
    """Convert NTTTablesDevice (u64) for q < 2^30 into the u32 layout."""
    q = np.asarray(t.q)
    assert (q < (1 << 30)).all(), "32-bit NTT path requires q < 2^30"
    return NTTTables32(
        q=jnp.asarray(q.astype(np.uint32)),
        root_powers=jnp.asarray(np.asarray(t.root_powers).astype(np.uint32)),
        root_powers_shoup=jnp.asarray(
            (np.asarray(t.root_powers_shoup) >> 32).astype(np.uint32)),
        inv_root_powers=jnp.asarray(
            np.asarray(t.inv_root_powers).astype(np.uint32)),
        inv_root_powers_shoup=jnp.asarray(
            (np.asarray(t.inv_root_powers_shoup) >> 32).astype(np.uint32)),
        inv_degree=jnp.asarray(np.asarray(t.inv_degree).astype(np.uint32)),
        inv_degree_shoup=jnp.asarray(
            (np.asarray(t.inv_degree_shoup) >> 32).astype(np.uint32)),
    )


def ntt_forward32(x: jnp.ndarray, t: NTTTables32,
                  lazy_output: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT on uint32 residues (..., L, N)."""
    n = x.shape[-1]
    num_l = x.shape[-2]
    assert t.q.shape[0] == num_l
    q = t.q.reshape(num_l, 1)
    two_q = q * U32(2)
    batch = x.shape[:-2]

    m = 1
    half = n >> 1
    while m < n:
        xr = x.reshape(*batch, num_l, m, 2, half)
        w = t.root_powers[:, m:2 * m].reshape(num_l, m, 1)
        ws = t.root_powers_shoup[:, m:2 * m].reshape(num_l, m, 1)
        qb = q.reshape(num_l, 1, 1)
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        u = u - jnp.where(u >= qb * U32(2), qb * U32(2), U32(0))
        wv = mul_mod_shoup_lazy32(v, w, ws, qb)
        x = jnp.stack([u + wv, u - wv + qb * U32(2)], axis=-2)
        x = x.reshape(*batch, num_l, n)
        m <<= 1
        half >>= 1

    if lazy_output:
        return x
    return csub32(csub32(x, two_q), q)


def ntt_inverse32(x: jnp.ndarray, t: NTTTables32,
                  scale: Optional[jnp.ndarray] = None,
                  scale_shoup: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Inverse negacyclic NTT with fused scaling, uint32 residues."""
    n = x.shape[-1]
    num_l = x.shape[-2]
    q = t.q.reshape(num_l, 1)
    batch = x.shape[:-2]

    m = n >> 1
    half = 1
    while m >= 1:
        xr = x.reshape(*batch, num_l, m, 2, half)
        w = t.inv_root_powers[:, m:2 * m].reshape(num_l, m, 1)
        ws = t.inv_root_powers_shoup[:, m:2 * m].reshape(num_l, m, 1)
        qb = q.reshape(num_l, 1, 1)
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        s = u + v
        s = s - jnp.where(s >= qb * U32(2), qb * U32(2), U32(0))
        d = mul_mod_shoup_lazy32(u - v + qb * U32(2), w, ws, qb)
        x = jnp.stack([s, d], axis=-2).reshape(*batch, num_l, n)
        m >>= 1
        half <<= 1

    if scale is None:
        scale = t.inv_degree
        scale_shoup = t.inv_degree_shoup
    sc = u32(scale).reshape(num_l, 1)
    scs = u32(scale_shoup).reshape(num_l, 1)
    return csub32(mul_mod_shoup_lazy32(x, sc, scs, q), q)
