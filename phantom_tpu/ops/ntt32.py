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


# stages fused per materialization: 3 = radix-8, the reference's register
# blocking (fntt_2d.cu:9-99 / butterfly.cuh fntt8) re-expressed as one
# XLA fusion — log2(N) HBM round trips become ceil(log2(N)/3)
PASS_STAGES = 3


def _fwd_pass(x, t, m, k, n, batch, num_l):
    """k consecutive CT stages (m, 2m, …, 2^(k-1)·m) in one pass —
    bit-identical butterflies and lazy ranges to k radix-2 stages, one
    HBM round trip instead of k.  Mini-stage j pairs the j-th axis of
    the (m, 2, …, 2, rest) view; its 2^j·m twiddles are indexed by
    (block, already-split axes) row-major."""
    rest = n // (m << k)
    xr = x.reshape(*batch, num_l, m, *([2] * k), rest)
    for j in range(k):
        pre = 1 << j
        post = 1 << (k - j - 1)
        xr = xr.reshape(*batch, num_l, m, pre, 2, post, rest)
        mj = m << j
        w = t.root_powers[:, mj:2 * mj].reshape(num_l, m, pre, 1, 1)
        ws = t.root_powers_shoup[:, mj:2 * mj].reshape(num_l, m, pre, 1, 1)
        qb = t.q.reshape(num_l, 1, 1, 1, 1)
        two_q = qb * U32(2)
        u = xr[..., 0, :, :]
        v = xr[..., 1, :, :]
        u = csub32(u, two_q)
        wv = mul_mod_shoup_lazy32(v, w, ws, qb)
        xr = jnp.stack([u + wv, u - wv + two_q], axis=-3)
    return xr.reshape(*batch, num_l, n)


def ntt_forward32(x: jnp.ndarray, t: NTTTables32,
                  lazy_output: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT on uint32 residues (..., L, N).

    Stages run as radix-2^PASS_STAGES passes (_fwd_pass) — the XLA-path
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
    done = 0
    while done < logn:
        k = min(PASS_STAGES, logn - done)
        x = _fwd_pass(x, t, m, k, n, batch, num_l)
        m <<= k
        done += k

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

    # GS stages fused PASS_STAGES at a time, mirroring _fwd_pass: a pass
    # covers stages (m_top, m_top/2, …); mini-stage j pairs the
    # (k-1-j)-th axis (innermost first), bit-identical to k radix-2
    # stages in one materialization
    logn = n.bit_length() - 1
    m_top = n >> 1
    done = 0
    while done < logn:
        k = min(PASS_STAGES, logn - done)
        m_low = m_top >> (k - 1)
        h = n // (2 * m_top)
        xr = x.reshape(*batch, num_l, m_low, *([2] * k), h)
        for j in range(k):
            p = k - 1 - j
            pre = 1 << p
            post = 1 << (k - p - 1)
            xr = xr.reshape(*batch, num_l, m_low, pre, 2, post, h)
            mj = m_top >> j
            w = t.inv_root_powers[:, mj:2 * mj].reshape(
                num_l, m_low, pre, 1, 1)
            ws = t.inv_root_powers_shoup[:, mj:2 * mj].reshape(
                num_l, m_low, pre, 1, 1)
            qb = q.reshape(num_l, 1, 1, 1, 1)
            two_q_b = qb * U32(2)
            u = xr[..., 0, :, :]
            v = xr[..., 1, :, :]
            s = u + v
            s = csub32(s, two_q_b)
            d = mul_mod_shoup_lazy32(u - v + two_q_b, w, ws, qb)
            xr = jnp.stack([s, d], axis=-3)
        x = xr.reshape(*batch, num_l, n)
        m_top >>= k
        done += k

    if scale is None:
        scale = t.inv_degree
        scale_shoup = t.inv_degree_shoup
    sc = u32(scale).reshape(num_l, 1)
    scs = u32(scale_shoup).reshape(num_l, 1)
    return csub32(mul_mod_shoup_lazy32(x, sc, scs, q), q)
