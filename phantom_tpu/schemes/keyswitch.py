"""Hybrid (modup / inner-product / moddown) key switching.

TPU-native equivalent of the reference's keyswitch engine
(src/eval_key_switch.cu:95-183, DRNSTool::modup/moddown_from_NTT in
src/rns_bconv.cu:530-828): the ciphertext digit c2 is split into beta
digits of alpha primes each, every digit is base-extended to the full QlP
base (own rows copied, complement rows fast-base-converted — the
reference's modup_copy_partQl_kernel + padded bconv matmul), the extended
digits are NTT'd and inner-producted against the evaluation key with a
128-bit lazy accumulator (key_switch_inner_prod_c2_and_evk,
eval_key_switch.cu:14-69), and both halves are brought back to Ql with a
P^{-1}-corrected moddown.

Everything here is jittable; digit geometry (alpha, beta, level sizes) is
static Python, so each level specializes its own trace like the reference's
per-level host dispatch.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops import bconv as bc
from ..ops import modmath as mm
from ..ops import ntt as nttmod
from .context import Context, ContextData


def qlp_rows(ctx: Context, size_ql: int):
    """Static row indices of the QlP base inside the full QP key base."""
    p = ctx.params
    return list(range(size_ql)) + list(range(p.size_q, p.size_qp))


def tables_qlp(ctx: Context, size_ql: int) -> nttmod.NTTTablesDevice:
    return nttmod._limb_gather(ctx.ntt, qlp_rows(ctx, size_ql))


def digit_bounds(ctx: Context, size_ql: int, d: int) -> Tuple[int, int]:
    alpha = ctx.params.size_p
    lo = d * alpha
    return lo, min(lo + alpha, size_ql)


def modup(ctx: Context, cd: ContextData, c2: jnp.ndarray) -> jnp.ndarray:
    """Base-extend each digit of c2 to QlP and NTT the result.

    c2: (size_ql, N) coefficient form in [0, q).
    Returns (beta, size_qlp, N) NTT form.
    Reference: DRNSTool::modup (rns_bconv.cu:530-628).
    """
    ks = cd.ks
    size_ql = cd.size_ql
    beta = len(ks.digit_convs)
    tq = tables_qlp(ctx, size_ql)
    assembled = []
    for d in range(beta):
        lo, hi = digit_bounds(ctx, size_ql, d)
        x = c2[lo:hi]
        compl = bc.bconv_approx(x, ks.digit_convs[d])
        # assemble [data[:lo], own digit, data[hi:], P rows]
        assembled.append(jnp.concatenate([compl[:lo], x, compl[lo:]], axis=0))
    # one batched NTT over all digits (keeps the trace O(1) in beta)
    return nttmod.ntt_forward(jnp.stack(assembled), tq)


def inner_product_evk(t_modup: jnp.ndarray, evk: jnp.ndarray,
                      cd: ContextData) -> jnp.ndarray:
    """sum_d t_d * evk[d, j] over digits, NTT domain, 128-bit accumulation.

    t_modup: (beta, K', N) in [0, q); evk: (beta, 2, K', N) in [0, q).
    Returns (2, K', N) in [0, q).
    Reference: key_switch_inner_prod_c2_and_evk (eval_key_switch.cu:14-69).
    """
    ks = cd.ks
    beta = t_modup.shape[0]
    kk, n = t_modup.shape[1], t_modup.shape[2]
    q = ks.qlp.q[:, None]
    rlo = ks.qlp.ratio_lo[:, None]
    rhi = ks.qlp.ratio_hi[:, None]
    pow64 = ks.pow64_mod_qlp[:, None]
    halves = []
    for j in range(2):
        hi = jnp.zeros((kk, n), dtype=jnp.uint64)
        lo = jnp.zeros((kk, n), dtype=jnp.uint64)
        for d in range(beta):
            h, l = mm.mul_wide(t_modup[d], evk[d, j])
            hi, lo = mm.add_wide(hi, lo, h, l)
        halves.append(bc.reduce_u128_any(hi, lo, q, rlo, rhi, pow64))
    return jnp.stack(halves)


def _moddown_delta(ks, x_p: jnp.ndarray) -> jnp.ndarray:
    """delta == x (mod P) over Ql rows; BGV additionally forces
    delta == 0 (mod t) so the divided noise stays a multiple of t
    (reference: moddown_bconv vs bgv_moddown_kernel, rns_bconv.cu:636,691).
    """
    if ks.p_to_t is None:
        return bc.bconv_exact(x_p, ks.p_to_q)
    q = ks.p_to_q.obase.q[:, None]
    p_q = ks.p_to_q.ibase.q[:, None]
    # centered conversion via the (P-1)/2 shift
    shifted = mm.add_mod(x_p, ks.phalf_mod_p[:, None], p_q)
    dq = mm.sub_mod(bc.bconv_exact(shifted, ks.p_to_q),
                    ks.phalf_mod_q[:, None], q)
    t = ks.t_mv.q[0]
    dt = mm.sub_mod(bc.bconv_exact(shifted, ks.p_to_t), ks.phalf_mod_t, t)
    # u = [-delta * P^{-1}]_t ; delta' = delta + P*u == 0 (mod t)
    u = mm.mul_mod(dt, ks.neg_pinv_mod_t, t, ks.t_mv.ratio_lo[0],
                   ks.t_mv.ratio_hi[0])
    corr = mm.mul_mod(u, ks.bigp_mod_q[:, None], q,
                      ks.p_to_q.obase.ratio_lo[:, None],
                      ks.p_to_q.obase.ratio_hi[:, None])
    return mm.add_mod(dq, corr, q)


def moddown_ntt(ctx: Context, cd: ContextData, x: jnp.ndarray) -> jnp.ndarray:
    """(x_Q - delta(x_P)) * P^{-1} over Ql, NTT-form input and output.

    x: (size_qlp, N) NTT form.  Reference: DRNSTool::moddown_from_NTT
    (rns_bconv.cu:776): iNTT the P part, convert P -> Ql, NTT back,
    fused (x - delta) * P^{-1}.
    """
    ks = cd.ks
    size_ql = cd.size_ql
    x_q = x[:size_ql]
    x_p = nttmod.ntt_inverse(x[size_ql:], ctx.tables_p())
    delta = _moddown_delta(ks, x_p)
    delta_ntt = nttmod.ntt_forward(delta, ctx.tables_q(size_ql))
    diff = mm.sub_mod(x_q, delta_ntt, cd.mv.q[:, None])
    return mm.mul_mod_shoup(diff, ks.pinv_mod_q[:, None],
                            ks.pinv_shoup[:, None], cd.mv.q[:, None])


def moddown_coeff(ctx: Context, cd: ContextData,
                  x: jnp.ndarray) -> jnp.ndarray:
    """Moddown for coefficient-form input (reference: DRNSTool::moddown)."""
    ks = cd.ks
    size_ql = cd.size_ql
    x_q = x[:size_ql]
    delta = _moddown_delta(ks, x[size_ql:])
    diff = mm.sub_mod(x_q, delta, cd.mv.q[:, None])
    return mm.mul_mod_shoup(diff, ks.pinv_mod_q[:, None],
                            ks.pinv_shoup[:, None], cd.mv.q[:, None])


def evk_rows(ctx: Context, evk_data: jnp.ndarray, cd: ContextData):
    """Restrict a (dnum, 2, K, N) key to this level's digits and QlP rows."""
    size_ql = cd.size_ql
    beta = len(cd.ks.digit_convs)
    rows = jnp.asarray(qlp_rows(ctx, size_ql))
    return evk_data[:beta, :, rows]


def keyswitch(ctx: Context, cd: ContextData, c2: jnp.ndarray,
              evk_data: jnp.ndarray) -> jnp.ndarray:
    """Full hybrid keyswitch of one polynomial c2 (coefficient form).

    c2: (size_ql, N) coeff form -> (2, size_ql, N) NTT form over Ql.
    Reference: keyswitch_inplace (eval_key_switch.cu:95-183).
    """
    t_modup = modup(ctx, cd, c2)
    prod = inner_product_evk(t_modup, evk_rows(ctx, evk_data, cd), cd)
    return jnp.stack([moddown_ntt(ctx, cd, prod[0]),
                      moddown_ntt(ctx, cd, prod[1])])


def modup_from_ntt(ctx: Context, cd: ContextData,
                   c2_ntt: jnp.ndarray) -> jnp.ndarray:
    """Fused modup for NTT-form input (reference: ntt_modup.cu — iNTT fused
    with the x QHatInv scaling; own digit rows reused in NTT form, so only
    complement rows are forward-transformed).

    c2_ntt: (size_ql, N) NTT form -> (beta, size_qlp, N) NTT form.
    Bit-identical to ntt_inverse + modup."""
    ks = cd.ks
    size_ql = cd.size_ql
    alpha = ctx.params.size_p
    beta = len(ks.digit_convs)
    if ks.modup_scale is None or size_ql % alpha != 0:
        return modup(ctx, cd, nttmod.ntt_inverse(
            c2_ntt, ctx.tables_q(size_ql)))
    # one fused iNTT over all Ql rows: output y = x * QhatInv (coeff form)
    y = nttmod.ntt_inverse(c2_ntt, ctx.tables_q(size_ql),
                           scale=ks.modup_scale,
                           scale_shoup=ks.modup_scale_shoup)
    rows_full = qlp_rows(ctx, size_ql)
    out = []
    for d in range(beta):
        lo, hi = digit_bounds(ctx, size_ql, d)
        compl = bc._matmul_reduce(y[lo:hi], ks.digit_convs[d])
        compl_rows = rows_full[:lo] + rows_full[hi:]
        compl_ntt = nttmod.ntt_forward(
            compl, nttmod._limb_gather(ctx.ntt, compl_rows))
        out.append(jnp.concatenate(
            [compl_ntt[:lo], c2_ntt[lo:hi], compl_ntt[lo:]], axis=0))
    return jnp.stack(out)


def keyswitch_from_ntt(ctx: Context, cd: ContextData, c2_ntt: jnp.ndarray,
                       evk_data: jnp.ndarray) -> jnp.ndarray:
    """Hybrid keyswitch for NTT-form c2 with the fused modup."""
    t_modup = modup_from_ntt(ctx, cd, c2_ntt)
    prod = inner_product_evk(t_modup, evk_rows(ctx, evk_data, cd), cd)
    return jnp.stack([moddown_ntt(ctx, cd, prod[0]),
                      moddown_ntt(ctx, cd, prod[1])])
