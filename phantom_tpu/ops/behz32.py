"""BEHZ RNS multiplication machinery on the 32-bit fast path.

u32 mirror of ops/behz.py (reference: bfv_multiply_behz, evaluate.cu:451;
SmMRq / fast_floor / fastbconv_sk kernels): requires every Q and Bsk prime
< 2^30 (make_context picks a sub-2^30 Bsk pool for u32-compatible
parameters, so the base — and therefore every intermediate VALUE — is
identical to the u64 path's and results bit-match).

The redundant modulus m_tilde = 2^32 is *native* here: mod-m_tilde
arithmetic is plain uint32 wraparound, so the Ql -> {m_tilde} conversion is
a bare u32 multiply-accumulate with no reduction at all.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import bconv32 as bc32
from . import modmath32 as m32
from .bconv32 import BaseConvConsts32, ModulusVec32, modulus_vec32

M_TILDE = 1 << 32


class BEHZConsts32(NamedTuple):
    """u32 BEHZ tables (mirror of behz.BEHZConsts)."""

    q_to_bsk: BaseConvConsts32
    b_to_q: BaseConvConsts32
    b_to_msk: BaseConvConsts32
    bsk: ModulusVec32
    # Ql -> {m_tilde}: y scaling already in q_to_bsk; the matmul row is
    # qhat mod 2^32 (native wrap)
    qhat_mod_mtilde: jnp.ndarray     # (k,) uint32
    neg_q_inv_mod_mtilde: jnp.ndarray  # () uint32 view of the low word?
    q_mod_bsk: jnp.ndarray
    mtilde_inv_mod_bsk: jnp.ndarray
    mtilde_inv_shoup: jnp.ndarray
    mtilde_mod_bsk: jnp.ndarray      # (k+2,) 2^32 mod bsk_j
    q_inv_mod_bsk: jnp.ndarray
    q_inv_shoup: jnp.ndarray
    b_inv_mod_msk: jnp.ndarray
    b_mod_q: jnp.ndarray
    msk_half: jnp.ndarray
    t_mod_q: jnp.ndarray
    t_mod_q_shoup: jnp.ndarray
    t_mod_bsk: jnp.ndarray
    t_mod_bsk_shoup: jnp.ndarray


def _u32a(v):
    return jnp.asarray(np.array([int(x) & 0xFFFFFFFF for x in v],
                                dtype=np.uint32))


def make_behz_consts32(data_moduli, bsk_moduli, t: int) -> BEHZConsts32:
    from ..host.numth import invert_mod
    from ..host.rns import BaseConverter, RNSBase
    assert all(int(m) < (1 << 30) for m in bsk_moduli), \
        "u32 BEHZ needs Bsk primes < 2^30"
    q_base = RNSBase(list(data_moduli))
    b_moduli = list(bsk_moduli[:-1])
    m_sk = int(bsk_moduli[-1])
    b_base = RNSBase(b_moduli)
    bsk_base = RNSBase(list(bsk_moduli))
    big_q = q_base.prod
    big_b = b_base.prod
    qinv_bsk = [invert_mod(big_q % m, m) for m in bsk_moduli]
    mtinv_bsk = [invert_mod(M_TILDE % m, m) for m in bsk_moduli]
    return BEHZConsts32(
        q_to_bsk=bc32.consts32_from_host(BaseConverter(q_base, bsk_base)),
        b_to_q=bc32.consts32_from_host(BaseConverter(b_base, q_base)),
        b_to_msk=bc32.consts32_from_host(
            BaseConverter(b_base, RNSBase([m_sk]))),
        bsk=modulus_vec32(list(bsk_moduli)),
        qhat_mod_mtilde=_u32a([(q_base.prod // q) % M_TILDE
                               for q in data_moduli]),
        neg_q_inv_mod_mtilde=jnp.uint32(
            (M_TILDE - invert_mod(big_q % M_TILDE, M_TILDE)) % M_TILDE),
        q_mod_bsk=_u32a([big_q % m for m in bsk_moduli]),
        mtilde_inv_mod_bsk=_u32a(mtinv_bsk),
        mtilde_inv_shoup=_u32a([(v << 32) // m for v, m in
                                zip(mtinv_bsk, bsk_moduli)]),
        mtilde_mod_bsk=_u32a([M_TILDE % m for m in bsk_moduli]),
        q_inv_mod_bsk=_u32a(qinv_bsk),
        q_inv_shoup=_u32a([(v << 32) // m for v, m in
                           zip(qinv_bsk, bsk_moduli)]),
        b_inv_mod_msk=jnp.uint32(invert_mod(big_b % m_sk, m_sk)),
        b_mod_q=_u32a([big_b % q for q in data_moduli]),
        msk_half=jnp.uint32(m_sk >> 1),
        t_mod_q=_u32a([t % q for q in data_moduli]),
        t_mod_q_shoup=_u32a([((t % q) << 32) // q for q in data_moduli]),
        t_mod_bsk=_u32a([t % m for m in bsk_moduli]),
        t_mod_bsk_shoup=_u32a([((t % m) << 32) // m for m in bsk_moduli]),
    )


def sm_mrq32(x_q: jnp.ndarray, c: BEHZConsts32) -> jnp.ndarray:
    """Lift x (base Ql) to Bsk with small Montgomery reduction by
    m_tilde = 2^32 (mirror of behz.sm_mrq; same values, so bit-identical
    to the u64 path on the shared base)."""
    q = c.q_to_bsk.ibase.q[:, None]
    rh = c.q_to_bsk.ibase.ratio_hi[:, None]
    rl = c.q_to_bsk.ibase.ratio_lo[:, None]
    # x' = m_tilde * x mod q = (2^32 mod q) * x
    pow32 = c.q_to_bsk.ibase.pow32[:, None]
    xp = m32.mul_mod32(x_q, pow32, q, rh, rl)
    conv_bsk = bc32.bconv_approx32(xp, c.q_to_bsk)
    # Ql -> {m_tilde}: y * qhat summed mod 2^32 — native u32 wraparound
    y = bc32.scale_by_qhat_inv32(xp, c.q_to_bsk)
    conv_mt = jnp.zeros(y.shape[1:], dtype=jnp.uint32)
    for i in range(y.shape[0]):
        conv_mt = conv_mt + y[i] * c.qhat_mod_mtilde[i]
    r = conv_mt * c.neg_q_inv_mod_mtilde  # mod 2^32, native
    bskq = c.bsk.q[:, None]
    bsk_rh = c.bsk.ratio_hi[:, None]
    bsk_rl = c.bsk.ratio_lo[:, None]
    is_neg = (r > jnp.uint32(1 << 31))[None, :]
    r_red = m32.barrett_reduce_u32(
        jnp.broadcast_to(r[None, :], conv_bsk.shape), bskq, bsk_rh)
    r_eff = jnp.where(is_neg,
                      m32.sub_mod32(r_red, c.mtilde_mod_bsk[:, None], bskq),
                      r_red)
    qr = m32.mul_mod32(r_eff, c.q_mod_bsk[:, None], bskq, bsk_rh, bsk_rl)
    summed = m32.add_mod32(conv_bsk, qr, bskq)
    return m32.mul_mod_shoup32(summed, c.mtilde_inv_mod_bsk[:, None],
                               c.mtilde_inv_shoup[:, None], bskq)


def fast_floor32(x_q: jnp.ndarray, x_bsk: jnp.ndarray,
                 c: BEHZConsts32) -> jnp.ndarray:
    """floor(x / Q) in base Bsk (mirror of behz.fast_floor)."""
    bskq = c.bsk.q[:, None]
    conv = bc32.bconv_approx32(x_q, c.q_to_bsk)
    diff = m32.sub_mod32(x_bsk, conv, bskq)
    return m32.mul_mod_shoup32(diff, c.q_inv_mod_bsk[:, None],
                               c.q_inv_shoup[:, None], bskq)


def fastbconv_sk32(x_bsk: jnp.ndarray, c: BEHZConsts32) -> jnp.ndarray:
    """Shenoy-Kumaresan exact Bsk -> Ql (mirror of behz.fastbconv_sk)."""
    k_b = c.b_to_q.ibase.q.shape[0]
    x_b = x_bsk[:k_b]
    x_msk = x_bsk[k_b]
    out_q = c.b_to_q.obase.q[:, None]
    out_rh = c.b_to_q.obase.ratio_hi[:, None]
    out_rl = c.b_to_q.obase.ratio_lo[:, None]
    conv_q = bc32.bconv_approx32(x_b, c.b_to_q)
    conv_msk = bc32.bconv_approx32(x_b, c.b_to_msk)[0]
    msk = c.b_to_msk.obase.q[0]
    diff = m32.sub_mod32(conv_msk, x_msk, msk)
    alpha = m32.mul_mod32(diff, c.b_inv_mod_msk, msk,
                          c.b_to_msk.obase.ratio_hi[0],
                          c.b_to_msk.obase.ratio_lo[0])
    is_neg = (alpha > c.msk_half)[None, :]
    b_mod = c.b_mod_q[:, None]
    pos_term = m32.mul_mod32(alpha[None, :], b_mod, out_q, out_rh, out_rl)
    neg_term = m32.mul_mod32((msk - alpha)[None, :], b_mod, out_q, out_rh,
                             out_rl)
    return jnp.where(is_neg, m32.add_mod32(conv_q, neg_term, out_q),
                     m32.sub_mod32(conv_q, pos_term, out_q))
