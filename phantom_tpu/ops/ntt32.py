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


def _fwd_stage2(x, t, m, n, batch, num_l):
    """One radix-2 CT stage at parameter m (Harvey lazy [0,4q))."""
    half = n // (2 * m)
    xr = x.reshape(*batch, num_l, m, 2, half)
    w = t.root_powers[:, m:2 * m].reshape(num_l, m, 1)
    ws = t.root_powers_shoup[:, m:2 * m].reshape(num_l, m, 1)
    qb = t.q.reshape(num_l, 1, 1)
    u = xr[..., 0, :]
    v = xr[..., 1, :]
    u = u - jnp.where(u >= qb * U32(2), qb * U32(2), U32(0))
    wv = mul_mod_shoup_lazy32(v, w, ws, qb)
    out = jnp.stack([u + wv, u - wv + qb * U32(2)], axis=-2)
    return out.reshape(*batch, num_l, n)


def _fwd_stage4(x, t, m, n, batch, num_l):
    """Stages (m, 2m) in one pass — same butterflies and lazy ranges as
    two _fwd_stage2 calls (bit-identical), but one HBM round trip instead
    of two.  The stage-exchange view is (m, 2, 2, n/4m): the first axis
    pair is stage-m's split, the second stage-2m's."""
    qtr = n // (4 * m)
    xr = x.reshape(*batch, num_l, m, 2, 2, qtr)
    qb = t.q.reshape(num_l, 1, 1, 1)
    two_q = qb * U32(2)
    wa = t.root_powers[:, m:2 * m].reshape(num_l, m, 1, 1)
    was = t.root_powers_shoup[:, m:2 * m].reshape(num_l, m, 1, 1)
    u = xr[..., 0, :, :]
    v = xr[..., 1, :, :]
    u = u - jnp.where(u >= two_q, two_q, U32(0))
    wv = mul_mod_shoup_lazy32(v, wa, was, qb)
    a = jnp.stack([u + wv, u - wv + two_q], axis=-3)  # (…, m, 2a, 2b, qtr)
    wb = t.root_powers[:, 2 * m:4 * m].reshape(num_l, m, 2, 1)
    wbs = t.root_powers_shoup[:, 2 * m:4 * m].reshape(num_l, m, 2, 1)
    u2 = a[..., 0, :]
    v2 = a[..., 1, :]
    u2 = u2 - jnp.where(u2 >= two_q, two_q, U32(0))
    wv2 = mul_mod_shoup_lazy32(v2, wb, wbs, qb)
    out = jnp.stack([u2 + wv2, u2 - wv2 + two_q], axis=-2)
    return out.reshape(*batch, num_l, n)


def ntt_forward32(x: jnp.ndarray, t: NTTTables32,
                  lazy_output: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT on uint32 residues (..., L, N).

    Stages run as radix-4 passes (two butterfly stages per HBM round
    trip; one leading radix-2 pass when log2(N) is odd) — the XLA-path
    analogue of the reference's radix-8 register blocking
    (fntt_2d.cu:9-99): same arithmetic, fewer materializations."""
    n = x.shape[-1]
    num_l = x.shape[-2]
    assert t.q.shape[0] == num_l
    q = t.q.reshape(num_l, 1)
    two_q = q * U32(2)
    batch = x.shape[:-2]

    logn = n.bit_length() - 1
    m = 1
    if logn % 2 == 1:
        x = _fwd_stage2(x, t, m, n, batch, num_l)
        m = 2
    while m < n:
        x = _fwd_stage4(x, t, m, n, batch, num_l)
        m <<= 2

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
    while m >= 2:
        # stages (m, m/2) in one pass (bit-identical to two radix-2 GS
        # stages; see _fwd_stage4 for the rationale)
        h1 = n // (2 * m)
        xr = x.reshape(*batch, num_l, m // 2, 2, 2, h1)
        qb = q.reshape(num_l, 1, 1, 1)
        two_q_b = qb * U32(2)
        w1 = t.inv_root_powers[:, m:2 * m].reshape(num_l, m // 2, 2, 1)
        w1s = t.inv_root_powers_shoup[:, m:2 * m].reshape(
            num_l, m // 2, 2, 1)
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        s1 = u + v
        s1 = s1 - jnp.where(s1 >= two_q_b, two_q_b, U32(0))
        d1 = mul_mod_shoup_lazy32(u - v + two_q_b, w1, w1s, qb)
        y = jnp.stack([s1, d1], axis=-2)  # (…, m/2, 2a, 2b, h1)
        w2 = t.inv_root_powers[:, m // 2:m].reshape(num_l, m // 2, 1, 1)
        w2s = t.inv_root_powers_shoup[:, m // 2:m].reshape(
            num_l, m // 2, 1, 1)
        u2 = y[..., 0, :, :]
        v2 = y[..., 1, :, :]
        s2 = u2 + v2
        s2 = s2 - jnp.where(s2 >= two_q_b, two_q_b, U32(0))
        d2 = mul_mod_shoup_lazy32(u2 - v2 + two_q_b, w2, w2s, qb)
        x = jnp.stack([s2, d2], axis=-3).reshape(*batch, num_l, n)
        m >>= 2
    if m == 1:
        xr = x.reshape(*batch, num_l, 1, 2, n >> 1)
        w = t.inv_root_powers[:, 1:2].reshape(num_l, 1, 1)
        ws = t.inv_root_powers_shoup[:, 1:2].reshape(num_l, 1, 1)
        qb = q.reshape(num_l, 1, 1)
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        s = u + v
        s = s - jnp.where(s >= qb * U32(2), qb * U32(2), U32(0))
        d = mul_mod_shoup_lazy32(u - v + qb * U32(2), w, ws, qb)
        x = jnp.stack([s, d], axis=-2).reshape(*batch, num_l, n)

    if scale is None:
        scale = t.inv_degree
        scale_shoup = t.inv_degree_shoup
    sc = u32(scale).reshape(num_l, 1)
    scs = u32(scale_shoup).reshape(num_l, 1)
    return csub32(mul_mod_shoup_lazy32(x, sc, scs, q), q)
