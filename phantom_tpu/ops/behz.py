"""BEHZ RNS multiplication machinery for BFV.

TPU-native equivalent of the reference's BEHZ path (bfv_multiply_behz,
src/evaluate.cu:451; DRNSTool BEHZ members, src/rns.cu:330-470; kernels in
src/rns_bconv.cu / src/rns.cu): the auxiliary base Bsk = B u {m_sk}, the
redundant modulus m_tilde, small Montgomery reduction (SmMRq), the
divide-and-floor by Q in Bsk, and the Shenoy-Kumaresan exact conversion
back to Q.

All steps are elementwise / small-matmul jnp ops over (L, N) residue
tensors; overshoot bounds follow Bajard-Eynard-Hasan-Zucca (CT-RSA 2017),
with the same per-step ranges the reference relies on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import bconv as bc
from . import modmath as mm
from .rns_host import ModulusVec, modulus_vec, to_u64_array

M_TILDE = 1 << 32  # reference/SEAL choice: redundant modulus 2^32


class BEHZConsts(NamedTuple):
    """Per-level BEHZ tables (reference: DRNSTool BEHZ members,
    include/rns.cuh:69-117)."""

    # base conversions
    q_to_bsk: bc.BaseConvConsts      # Ql -> Bsk (approximate)
    q_to_mtilde: bc.BaseConvConsts   # Ql -> {m_tilde}
    b_to_q: bc.BaseConvConsts        # B -> Ql
    b_to_msk: bc.BaseConvConsts      # B -> {m_sk}
    bsk: ModulusVec                  # (k+2,) B then m_sk
    # SmMRq (Montgomery reduction by m_tilde)
    mtilde_vec: ModulusVec           # ({1},) m_tilde
    neg_q_inv_mod_mtilde: jnp.ndarray  # () [-Q^{-1}]_{m_tilde}
    q_mod_bsk: jnp.ndarray           # (k+2,) Q mod bsk_j
    mtilde_inv_mod_bsk: jnp.ndarray  # (k+2,) m_tilde^{-1} mod bsk_j
    mtilde_inv_shoup: jnp.ndarray
    mtilde_half: jnp.ndarray         # () m_tilde/2
    mtilde_half_mod_bsk: jnp.ndarray  # (k+2,)
    # fast floor
    q_inv_mod_bsk: jnp.ndarray       # (k+2,) Q^{-1} mod bsk_j
    q_inv_shoup: jnp.ndarray
    # Shenoy-Kumaresan
    b_inv_mod_msk: jnp.ndarray       # () B^{-1} mod m_sk
    b_mod_q: jnp.ndarray             # (k,) B mod q_i
    msk_half: jnp.ndarray            # () floor(m_sk/2)
    # t multiplier for step 6 (fused into inverse NTT scale by caller)
    t_mod_bsk: jnp.ndarray           # (k+2,)
    t_mod_bsk_shoup: jnp.ndarray
    mtilde_mod_bsk: jnp.ndarray = None  # (k+2,) 2^32 mod bsk_j


def make_behz_consts(data_moduli, bsk_moduli, t: int) -> BEHZConsts:
    """bsk_moduli: B primes then m_sk (all NTT-friendly, coprime to Ql)."""
    from ..host.modulus import compute_shoup
    from ..host.numth import invert_mod
    from ..host.rns import BaseConverter, RNSBase

    q_base = RNSBase(data_moduli)
    b_moduli = list(bsk_moduli[:-1])
    m_sk = int(bsk_moduli[-1])
    b_base = RNSBase(b_moduli)
    bsk_base = RNSBase(list(bsk_moduli))
    mtilde = M_TILDE
    big_q = q_base.prod
    big_b = b_base.prod

    qinv_bsk = [invert_mod(big_q % m, m) for m in bsk_moduli]
    mtinv_bsk = [invert_mod(mtilde % m, m) for m in bsk_moduli]
    return BEHZConsts(
        q_to_bsk=bc.consts_from_host(BaseConverter(q_base, bsk_base)),
        q_to_mtilde=bc.consts_from_host(
            BaseConverter(q_base, RNSBase([mtilde]))),
        b_to_q=bc.consts_from_host(BaseConverter(b_base, q_base)),
        b_to_msk=bc.consts_from_host(BaseConverter(b_base, RNSBase([m_sk]))),
        bsk=modulus_vec(list(bsk_moduli)),
        mtilde_vec=modulus_vec([mtilde]),
        neg_q_inv_mod_mtilde=jnp.uint64(
            (mtilde - invert_mod(big_q % mtilde, mtilde)) % mtilde),
        q_mod_bsk=jnp.asarray(to_u64_array([big_q % m for m in bsk_moduli])),
        mtilde_inv_mod_bsk=jnp.asarray(to_u64_array(mtinv_bsk)),
        mtilde_inv_shoup=jnp.asarray(to_u64_array(
            [compute_shoup(v, m) for v, m in zip(mtinv_bsk, bsk_moduli)])),
        mtilde_half=jnp.uint64(mtilde >> 1),
        mtilde_half_mod_bsk=jnp.asarray(
            to_u64_array([(mtilde >> 1) % m for m in bsk_moduli])),
        q_inv_mod_bsk=jnp.asarray(to_u64_array(qinv_bsk)),
        q_inv_shoup=jnp.asarray(to_u64_array(
            [compute_shoup(v, m) for v, m in zip(qinv_bsk, bsk_moduli)])),
        b_inv_mod_msk=jnp.uint64(invert_mod(big_b % m_sk, m_sk)),
        b_mod_q=jnp.asarray(to_u64_array([big_b % q for q in data_moduli])),
        msk_half=jnp.uint64(m_sk >> 1),
        t_mod_bsk=jnp.asarray(to_u64_array([t % m for m in bsk_moduli])),
        t_mod_bsk_shoup=jnp.asarray(to_u64_array(
            [compute_shoup(t % m, m) for m in bsk_moduli])),
        mtilde_mod_bsk=jnp.asarray(
            to_u64_array([mtilde % m for m in bsk_moduli])),
    )


def sm_mrq(x_q: jnp.ndarray, c: BEHZConsts) -> jnp.ndarray:
    """Lift x (base Ql) to Bsk with small Montgomery reduction by m_tilde.

    Steps (reference: BEHZ_mul_1 / sm_mrq kernels):
      1. x' = m_tilde * x mod Ql
      2. approximate-convert x' to Bsk and to {m_tilde}: value m_tilde*x + a*Q
      3. r = [x'_mtilde * (-Q^{-1})]_{m_tilde}, centered
      4. out = (conv_Bsk + Q*r) * m_tilde^{-1} mod Bsk  =  x + u*Q, |u| small
    """
    q = c.q_to_bsk.ibase.q[:, None]
    rlo = c.q_to_bsk.ibase.ratio_lo[:, None]
    rhi = c.q_to_bsk.ibase.ratio_hi[:, None]
    # m_tilde = 2^32 < q_i, multiply via barrett
    xp = mm.mul_mod(x_q, jnp.uint64(M_TILDE), q, rlo, rhi)
    conv_bsk = bc.bconv_approx(xp, c.q_to_bsk)    # (k+2, N), in [0, bsk_j)
    conv_mt = bc.bconv_approx(xp, c.q_to_mtilde)  # (1, N) mod m_tilde
    mt = c.mtilde_vec.q[0]
    r = mm.mul_mod(conv_mt, c.neg_q_inv_mod_mtilde, mt,
                   c.mtilde_vec.ratio_lo[0], c.mtilde_vec.ratio_hi[0])[0]
    # center r in [-m_tilde/2, m_tilde/2): r_eff = r - 2^32*is_neg mod
    # bsk_j, valid for bsk primes on either side of 2^32
    bskq = c.bsk.q[:, None]
    bsk_rlo = c.bsk.ratio_lo[:, None]
    bsk_rhi = c.bsk.ratio_hi[:, None]
    is_neg = (r > c.mtilde_half)[None, :]
    r_red = mm.barrett_reduce_u64(
        jnp.broadcast_to(r[None, :], conv_bsk.shape), bskq, bsk_rhi)
    r_eff = jnp.where(is_neg,
                      mm.sub_mod(r_red, c.mtilde_mod_bsk[:, None], bskq),
                      r_red)
    qr = mm.mul_mod(r_eff, c.q_mod_bsk[:, None], bskq, bsk_rlo, bsk_rhi)
    summed = mm.add_mod(conv_bsk, qr, bskq)
    return mm.mul_mod_shoup(summed, c.mtilde_inv_mod_bsk[:, None],
                            c.mtilde_inv_shoup[:, None], bskq)


def fast_floor(x_q: jnp.ndarray, x_bsk: jnp.ndarray,
               c: BEHZConsts) -> jnp.ndarray:
    """floor((x) / Q) in base Bsk, inputs are t*x in Ql and Bsk
    (reference: DRNSTool::fast_floor).

    floor(y/Q) = (y - [y]_Q) / Q; [y]_Q is approximated by the fast
    conversion of the Ql residues (overshoot a*Q folds into the floor's
    +-(k+1) error bound, absorbed by BEHZ noise analysis)."""
    bskq = c.bsk.q[:, None]
    conv = bc.bconv_approx(x_q, c.q_to_bsk)
    diff = mm.sub_mod(x_bsk, conv, bskq)
    return mm.mul_mod_shoup(diff, c.q_inv_mod_bsk[:, None],
                            c.q_inv_shoup[:, None], bskq)


def fastbconv_sk(x_bsk: jnp.ndarray, c: BEHZConsts) -> jnp.ndarray:
    """Shenoy-Kumaresan exact conversion Bsk = B u {m_sk} -> Ql
    (reference: DRNSTool::fastbconv_sk).

    alpha_sk = [(conv_B->msk(x) - x_msk) * B^{-1}]_{m_sk} centered recovers
    the exact overshoot of the approximate B -> Ql conversion."""
    k_b = c.b_to_q.ibase.q.shape[0]
    x_b = x_bsk[:k_b]
    x_msk = x_bsk[k_b]  # (N,)
    out_q = c.b_to_q.obase.q[:, None]
    out_rlo = c.b_to_q.obase.ratio_lo[:, None]
    out_rhi = c.b_to_q.obase.ratio_hi[:, None]
    conv_q = bc.bconv_approx(x_b, c.b_to_q)           # x + a*B mod q
    conv_msk = bc.bconv_approx(x_b, c.b_to_msk)[0]    # x + a*B mod m_sk
    msk = c.b_to_msk.obase.q[0]
    diff = mm.sub_mod(conv_msk, x_msk, msk)
    alpha = mm.mul_mod(diff, c.b_inv_mod_msk, msk,
                       c.b_to_msk.obase.ratio_lo[0],
                       c.b_to_msk.obase.ratio_hi[0])  # (N,) in [0, m_sk)
    # alpha centered: alpha > m_sk/2 encodes the negative value alpha - m_sk
    is_neg = (alpha > c.msk_half)[None, :]
    b_mod = c.b_mod_q[:, None]
    pos_term = mm.mul_mod(alpha[None, :], b_mod, out_q, out_rlo, out_rhi)
    neg_term = mm.mul_mod((msk - alpha)[None, :], b_mod, out_q, out_rlo,
                          out_rhi)
    # out = conv_q - alpha_centered * B mod q
    return jnp.where(is_neg, mm.add_mod(conv_q, neg_term, out_q),
                     mm.sub_mod(conv_q, pos_term, out_q))
