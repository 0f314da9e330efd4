"""Negacyclic NTT / inverse NTT over RNS bases (XLA path).

TPU-native re-design of the reference's NTT engine (src/ntt/fntt_2d.cu,
intt_2d.cu, ntt_1d.cu).  Instead of the CUDA 2D radix-8 shared-memory
factorization, the transform is expressed as log2(N) fully-vectorized
Harvey butterfly stages over a (..., L, m, 2, t) view; each stage is a
handful of 32-bit VPU ops after XLA's uint64 emulation, the stage loop is
unrolled at trace time (static shapes), and XLA fuses each stage into a
single elementwise kernel.  Batching over RNS limbs L — the reference's
kernel "batch" axis — is just an array dimension here, so the same code
shards over a device mesh by limb with zero communication.

Value ranges (Harvey lazy reduction):
  forward: input [0, q), intermediate [0, 4q), output reduced to [0, q)
  inverse: input [0, 2q), intermediate [0, 2q), output [0, q)

Twiddle-table layout is produced by host/ntt_tables.py: the stage with m
groups consumes table entries [m, 2m).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .modmath import U64, csub, mul_mod_shoup_lazy, u64


class NTTTablesDevice(NamedTuple):
    """Device-resident twiddle tables for an RNS base (L limbs, degree N).

    Equivalent of the reference's DNTTTable (include/ntt.cuh:34-129).
    """

    q: jnp.ndarray                      # (L,) uint64
    root_powers: jnp.ndarray            # (L, N) uint64, bit-reversed psi^i
    root_powers_shoup: jnp.ndarray      # (L, N)
    inv_root_powers: jnp.ndarray        # (L, N) bit-reversed psi^{-i}
    inv_root_powers_shoup: jnp.ndarray  # (L, N)
    inv_degree: jnp.ndarray             # (L,) N^{-1} mod q
    inv_degree_shoup: jnp.ndarray       # (L,)

    @property
    def n(self) -> int:
        return self.root_powers.shape[-1]

    @property
    def num_limbs(self) -> int:
        return self.root_powers.shape[0]


def tables_from_host(rns_tables) -> NTTTablesDevice:
    """Build device tables from host RNSNTTTables (host/ntt_tables.py)."""
    return NTTTablesDevice(
        q=jnp.asarray(np.array(rns_tables.moduli, dtype=np.uint64)),
        root_powers=jnp.asarray(rns_tables.root_powers),
        root_powers_shoup=jnp.asarray(rns_tables.root_powers_shoup),
        inv_root_powers=jnp.asarray(rns_tables.inv_root_powers),
        inv_root_powers_shoup=jnp.asarray(rns_tables.inv_root_powers_shoup),
        inv_degree=jnp.asarray(rns_tables.inv_degree),
        inv_degree_shoup=jnp.asarray(rns_tables.inv_degree_shoup),
    )


def _limb_slice(tables: NTTTablesDevice, limbs: Optional[Tuple[int, int]]):
    if limbs is None:
        return tables
    lo, hi = limbs
    return NTTTablesDevice(
        q=tables.q[lo:hi],
        root_powers=tables.root_powers[lo:hi],
        root_powers_shoup=tables.root_powers_shoup[lo:hi],
        inv_root_powers=tables.inv_root_powers[lo:hi],
        inv_root_powers_shoup=tables.inv_root_powers_shoup[lo:hi],
        inv_degree=tables.inv_degree[lo:hi],
        inv_degree_shoup=tables.inv_degree_shoup[lo:hi],
    )


def _limb_gather(tables: NTTTablesDevice, rows) -> NTTTablesDevice:
    """Select an arbitrary (static) set of limb rows, e.g. Ql + special P."""
    idx = np.asarray(rows, dtype=np.int64)
    return NTTTablesDevice(
        q=tables.q[idx],
        root_powers=tables.root_powers[idx],
        root_powers_shoup=tables.root_powers_shoup[idx],
        inv_root_powers=tables.inv_root_powers[idx],
        inv_root_powers_shoup=tables.inv_root_powers_shoup[idx],
        inv_degree=tables.inv_degree[idx],
        inv_degree_shoup=tables.inv_degree_shoup[idx],
    )


def concat_tables(a: NTTTablesDevice, b: NTTTablesDevice) -> NTTTablesDevice:
    return NTTTablesDevice(*[jnp.concatenate([x, y], axis=0)
                             for x, y in zip(a, b)])


def ntt_forward(x: jnp.ndarray, tables: NTTTablesDevice,
                limbs: Optional[Tuple[int, int]] = None,
                lazy_output: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT, batched over leading dims and RNS limbs.

    x: (..., L, N) uint64 with coefficients in [0, q).  Output in NTT
    ("evaluation") order; [0, q) unless lazy_output (then [0, 4q)).
    """
    t = _limb_slice(tables, limbs)
    n = x.shape[-1]
    num_l = x.shape[-2]
    assert t.q.shape[0] == num_l, (t.q.shape, x.shape)
    q = t.q.reshape(num_l, 1)
    two_q = q * U64(2)
    batch = x.shape[:-2]

    # k-stage passes (k <= ntt32.PASS_STAGES): one materialization per
    # radix-2^k block — see ops/ntt32.py:_fwd_pass for the axis scheme
    from .ntt32 import PASS_STAGES
    logn = n.bit_length() - 1
    m = 1
    done = 0
    while done < logn:
        k = min(PASS_STAGES, logn - done)
        rest = n // (m << k)
        xr = x.reshape(*batch, num_l, m, *([2] * k), rest)
        for j in range(k):
            pre = 1 << j
            post = 1 << (k - j - 1)
            xr = xr.reshape(*batch, num_l, m, pre, 2, post, rest)
            mj = m << j
            w = t.root_powers[:, mj:2 * mj].reshape(num_l, m, pre, 1, 1)
            ws = t.root_powers_shoup[:, mj:2 * mj].reshape(
                num_l, m, pre, 1, 1)
            qb = q.reshape(num_l, 1, 1, 1, 1)
            tq = qb * U64(2)
            u = xr[..., 0, :, :]
            v = xr[..., 1, :, :]
            u = u - jnp.where(u >= tq, tq, U64(0))
            wv = mul_mod_shoup_lazy(v, w, ws, qb)
            xr = jnp.stack([u + wv, u - wv + tq], axis=-3)
        x = xr.reshape(*batch, num_l, n)
        m <<= k
        done += k

    if lazy_output:
        return x
    return csub(csub(x, two_q), q)


def ntt_inverse(x: jnp.ndarray, tables: NTTTablesDevice,
                limbs: Optional[Tuple[int, int]] = None,
                scale: Optional[jnp.ndarray] = None,
                scale_shoup: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Inverse negacyclic NTT with fused final scaling.

    x: (..., L, N) uint64 in [0, 2q).  The final multiply applies
    `scale` (default N^{-1} mod q); pass a per-limb (L,) scale that already
    folds extra factors (e.g. N^{-1} * t or N^{-1} * P^{-1}) to get the
    reference's fused intt-scale kernels (intt_2d.cu:759) for free.
    Output in [0, q).
    """
    t = _limb_slice(tables, limbs)
    n = x.shape[-1]
    num_l = x.shape[-2]
    assert t.q.shape[0] == num_l
    q = t.q.reshape(num_l, 1)
    batch = x.shape[:-2]

    # k-stage GS passes, innermost pair axis first — mirror of
    # ntt32.ntt_inverse32's fused loop
    from .ntt32 import PASS_STAGES
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
            tq = qb * U64(2)
            u = xr[..., 0, :, :]
            v = xr[..., 1, :, :]
            s = u + v
            s = s - jnp.where(s >= tq, tq, U64(0))
            d = mul_mod_shoup_lazy(u - v + tq, w, ws, qb)
            xr = jnp.stack([s, d], axis=-3)
        x = xr.reshape(*batch, num_l, n)
        m_top >>= k
        done += k

    if scale is None:
        scale = t.inv_degree
        scale_shoup = t.inv_degree_shoup
    sc = u64(scale).reshape(num_l, 1)
    scs = u64(scale_shoup).reshape(num_l, 1)
    return csub(mul_mod_shoup_lazy(x, sc, scs, q), q)


def negacyclic_mul(a: jnp.ndarray, b: jnp.ndarray,
                   tables: NTTTablesDevice) -> jnp.ndarray:
    """Reference helper: coefficient-form negacyclic product via NTT."""
    from .modmath import mul_mod_shoup  # local import to avoid cycle noise
    fa = ntt_forward(a, tables)
    fb = ntt_forward(b, tables)
    q = tables.q.reshape(-1, 1)
    # generic product needs Barrett (no precomputed shoup for fb); reuse wide mul
    from .modmath import mul_mod
    from .rns_host import ratios_for  # lazy import; see rns_host
    rlo, rhi = ratios_for(tables.q)
    prod = mul_mod(fa, fb, q, rlo.reshape(-1, 1), rhi.reshape(-1, 1))
    return ntt_inverse(prod, tables)
