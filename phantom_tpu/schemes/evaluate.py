"""Evaluator verbs: add/sub/negate, multiply, relinearize, plain ops,
rescale and modulus switching.

TPU-native equivalent of the reference's evaluator (src/evaluate.cu,
include/evaluate.cuh:34-245).  Each verb is a pure function
Ciphertext -> Ciphertext built from the jittable op layer; the static
bookkeeping (chain index, NTT form, sizes) specializes traces per level the
way the reference's host dispatch picks per-level kernels and tables.

BFV multiplication implements the HPS technique (bfv_multiply_hps,
src/evaluate.cu:648) with the double-precision scale-and-round replaced by
exact integer arithmetic (ops/scaleround.py).  BEHZ and the leveled HPS
variants land with their own precompute tables.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as nttmod
from ..ops import polyops as po
from ..ops import scaleround as sr
from .ciphertext import Ciphertext, Plaintext
from .context import Context, ContextData
from .keyswitch import keyswitch
from .params import Scheme


def _cd(ctx: Context, ct: Ciphertext) -> ContextData:
    return ctx.get_context_data(ct.chain_index)


def _check_compatible(ct1: Ciphertext, ct2: Ciphertext,
                      check_scale: bool = True):
    if ct1.chain_index != ct2.chain_index:
        raise ValueError("ciphertexts are at different levels")
    if ct1.is_ntt_form != ct2.is_ntt_form:
        raise ValueError("NTT form mismatch")
    # scale equality matters for add/sub only; CKKS multiplication takes
    # operands at any scales (the product scale is their product)
    if check_scale and abs(ct1.scale - ct2.scale) > 1e-6 * ct1.scale:
        raise ValueError("scale mismatch")


# --------------------------------------------------------------------------
# linear ops
# --------------------------------------------------------------------------

def negate(ctx: Context, ct: Ciphertext) -> Ciphertext:
    cd = _cd(ctx, ct)
    return ct.replace(data=po.neg_rns(ct.data, cd.mv))


def _pad_to(data: jnp.ndarray, size: int) -> jnp.ndarray:
    if data.shape[0] == size:
        return data
    pad = jnp.zeros((size - data.shape[0],) + data.shape[1:], data.dtype)
    return jnp.concatenate([data, pad], axis=0)


def add(ctx: Context, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    """ct1 + ct2 (reference: add_inplace, evaluate.cu).

    BGV operands with unequal correction factors are balanced first
    (reference: balance_correction_factors)."""
    _check_compatible(ct1, ct2)
    if (ctx.params.scheme == Scheme.BGV
            and ct1.correction_factor != ct2.correction_factor):
        ct1, ct2 = _balance_correction(ctx, ct1, ct2)
    cd = _cd(ctx, ct1)
    size = max(ct1.size, ct2.size)
    a = _pad_to(ct1.data, size)
    b = _pad_to(ct2.data, size)
    return ct1.replace(data=po.add_rns(a, b, cd.mv))


def sub(ctx: Context, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    _check_compatible(ct1, ct2)
    if (ctx.params.scheme == Scheme.BGV
            and ct1.correction_factor != ct2.correction_factor):
        ct1, ct2 = _balance_correction(ctx, ct1, ct2)
    cd = _cd(ctx, ct1)
    size = max(ct1.size, ct2.size)
    a = _pad_to(ct1.data, size)
    b = _pad_to(ct2.data, size)
    return ct1.replace(data=po.sub_rns(a, b, cd.mv))


def _balance_factors(f1: int, f2: int, t: int):
    """Noise-minimizing common correction factor for BGV.

    Returns (f, e1, e2) with e1*f1 == e2*f2 == f (mod t), gcd(e_i, t) == 1,
    and |e1_bal| + |e2_bal| minimal over the extended-Euclid convergents of
    ratio = f2/f1 mod t — so each balancing multiply adds as little noise as
    possible (reference: balance_correction_factors, evaluate.cu:20-79)."""
    import math

    from ..host import numth
    half = t // 2

    def bal_abs(x):
        return t - x if x > half else x

    ratio = (numth.invert_mod(f1 % t, t) * f2) % t
    e1, e2 = ratio, 1
    best = bal_abs(e1) + bal_abs(e2)
    prev_a, a = t, ratio
    prev_b, b = 0, 1
    while a != 0:
        q = prev_a // a
        prev_a, a = a, prev_a - q * a
        prev_b, b = b, prev_b - q * b
        a_mod, b_mod = a % t, b % t
        if a_mod != 0 and math.gcd(a_mod, t) == 1:
            s = bal_abs(a_mod) + bal_abs(b_mod)
            if s < best:
                best, e1, e2 = s, a_mod, b_mod
    return (e1 * f1) % t, e1, e2


def _balance_correction(ctx: Context, ct1: Ciphertext, ct2: Ciphertext):
    """Scale both BGV operands to a common correction factor
    (reference: balance_correction_factors + the scalar multiplies in
    add_inplace, evaluate.cu:148-167)."""
    t = ctx.params.plain_modulus
    f1, f2 = ct1.correction_factor, ct2.correction_factor
    f, m1, m2 = _balance_factors(f1, f2, t)
    cd = _cd(ctx, ct1)

    def scale_ct(ct, m):
        if m == 1:
            return ct
        # multiply by the CENTERED representative: for m > t/2 scale by
        # t - m and negate, so the integer noise grows by |m_bal| (the
        # quantity the factor search minimized), not by m itself — scaling
        # by the positive representative would blow e*noise past Q/2
        neg = m > t // 2
        mag = t - m if neg else m
        mv = cd.mv
        marr = jnp.full((1, 1, 1), jnp.uint64(mag))
        scaled = mm.mul_mod(ct.data, marr, mv.q[:, None],
                            mv.ratio_lo[:, None], mv.ratio_hi[:, None])
        if neg:
            scaled = jnp.where(scaled == 0, jnp.uint64(0),
                               mv.q[:, None] - scaled)
        return ct.replace(data=scaled, correction_factor=f)

    return scale_ct(ct1, m1).replace(correction_factor=f), \
        scale_ct(ct2, m2).replace(correction_factor=f)


# --------------------------------------------------------------------------
# multiplication
# --------------------------------------------------------------------------

def _tables_d(ctx: Context, size_ql: int) -> nttmod.NTTTablesDevice:
    """NTT tables for the combined base D = Ql u Rl (BFV HPS)."""
    return nttmod.concat_tables(ctx.tables_q(size_ql),
                                ctx.tables_r(size_ql + 1))


def bfv_multiply_hps(ctx: Context, ct1: Ciphertext,
                     ct2: Ciphertext) -> Ciphertext:
    """BFV multiply, HPS technique (reference: bfv_multiply_hps,
    src/evaluate.cu:648): lift both operands Ql -> D = Ql u Rl with exact
    base conversion, dyadic product in NTT(D), exact scale-and-round
    round(t/Ql * .) back down to Ql."""
    from ..ops import bconv as bc
    cd = _cd(ctx, ct1)
    hps = cd.hps
    k = cd.size_ql
    td = _tables_d(ctx, k)

    def lift(ct):
        polys = []
        for i in range(ct.size):
            x_q = ct.data[i]
            x_r = bc.bconv_exact(x_q, hps.q_to_r)
            polys.append(jnp.concatenate([x_q, x_r], axis=0))
        return jnp.stack(polys)

    a = nttmod.ntt_forward(lift(ct1), td)
    b = nttmod.ntt_forward(lift(ct2), td)
    if ct1.size == 2 and ct2.size == 2:
        prod = po.tensor_prod_2x2(a, b, hps.dbase)
    else:
        prod = po.tensor_prod_mxn(a, b, hps.dbase)
    prod = nttmod.ntt_inverse(prod, td)
    out = jnp.stack([sr.scale_and_round_hps(prod[i], hps)
                     for i in range(prod.shape[0])])
    return ct1.replace(data=out)


def bfv_square_hps(ctx: Context, ct: Ciphertext) -> Ciphertext:
    from ..ops import bconv as bc
    cd = _cd(ctx, ct)
    hps = cd.hps
    td = _tables_d(ctx, cd.size_ql)
    polys = []
    for i in range(ct.size):
        x_q = ct.data[i]
        polys.append(jnp.concatenate(
            [x_q, bc.bconv_exact(x_q, hps.q_to_r)], axis=0))
    a = nttmod.ntt_forward(jnp.stack(polys), td)
    prod = nttmod.ntt_inverse(po.tensor_square_2x2(a, hps.dbase), td)
    out = jnp.stack([sr.scale_and_round_hps(prod[i], hps)
                     for i in range(prod.shape[0])])
    return ct.replace(data=out)


def multiply(ctx: Context, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    """Scheme dispatch (reference: multiply_inplace, evaluate.cu:1029)."""
    _check_compatible(ct1, ct2, check_scale=False)
    scheme = ctx.params.scheme
    if scheme == Scheme.BFV:
        from .params import MulTech
        mt = ctx.params.mul_tech
        if mt == MulTech.BEHZ:
            return bfv_multiply_behz(ctx, ct1, ct2)
        if mt in (MulTech.HPS_OVERQ, MulTech.HPS_OVERQ_LEVELED):
            return bfv_multiply_hps_overq(ctx, ct1, ct2)
        return bfv_multiply_hps(ctx, ct1, ct2)
    cd = _cd(ctx, ct1)
    if ct1.size == 2 and ct2.size == 2:
        prod = po.tensor_prod_2x2(ct1.data, ct2.data, cd.mv)
    else:
        prod = po.tensor_prod_mxn(ct1.data, ct2.data, cd.mv)
    if scheme == Scheme.CKKS:
        return ct1.replace(data=prod, scale=ct1.scale * ct2.scale)
    # BGV: correction factors multiply mod t
    t = ctx.params.plain_modulus
    return ct1.replace(
        data=prod,
        correction_factor=(ct1.correction_factor * ct2.correction_factor) % t)


def square(ctx: Context, ct: Ciphertext) -> Ciphertext:
    scheme = ctx.params.scheme
    if scheme == Scheme.BFV:
        from .params import MulTech
        mt = ctx.params.mul_tech
        if mt == MulTech.BEHZ:
            return bfv_multiply_behz(ctx, ct, ct)
        if mt in (MulTech.HPS_OVERQ, MulTech.HPS_OVERQ_LEVELED):
            return bfv_multiply_hps_overq(ctx, ct, ct)
        return bfv_square_hps(ctx, ct)
    cd = _cd(ctx, ct)
    prod = po.tensor_square_2x2(ct.data, cd.mv)
    if scheme == Scheme.CKKS:
        return ct.replace(data=prod, scale=ct.scale * ct.scale)
    t = ctx.params.plain_modulus
    return ct.replace(data=prod,
                      correction_factor=(ct.correction_factor ** 2) % t)


# --------------------------------------------------------------------------
# relinearization
# --------------------------------------------------------------------------

def relinearize(ctx: Context, ct: Ciphertext, rlk) -> Ciphertext:
    """3-poly -> 2-poly using the relinearization key
    (reference: relinearize_inplace, evaluate.cu:1342)."""
    if ct.size != 3:
        raise ValueError("relinearize expects a size-3 ciphertext")
    from .keyswitch import keyswitch_from_ntt
    cd = _cd(ctx, ct)
    size_ql = cd.size_ql
    if ct.is_ntt_form:
        switched = keyswitch_from_ntt(ctx, cd, ct.data[2], rlk.data)
    else:
        switched = keyswitch(ctx, cd, ct.data[2], rlk.data)
    if not ct.is_ntt_form:
        switched = nttmod.ntt_inverse(switched, ctx.tables_q(size_ql))
    out = jnp.stack([po.add_rns(ct.data[0], switched[0], cd.mv),
                     po.add_rns(ct.data[1], switched[1], cd.mv)])
    return ct.replace(data=out)


def multiply_and_relin(ctx: Context, ct1: Ciphertext, ct2: Ciphertext,
                       rlk) -> Ciphertext:
    """Fused multiply + relinearize (reference: multiply_and_relin_inplace,
    evaluate.cu:1061)."""
    return relinearize(ctx, multiply(ctx, ct1, ct2), rlk)


# --------------------------------------------------------------------------
# plaintext ops
# --------------------------------------------------------------------------

def _bfv_plain_centered_rns(ctx: Context, cd: ContextData, m: jnp.ndarray):
    """Lift mod-t plaintext coefficients to centered RNS residues over Ql."""
    t = ctx.params.plain_modulus
    q = cd.mv.q[:, None]
    lifted = jnp.broadcast_to(m[None, :], (cd.size_ql, m.shape[-1]))
    thr = jnp.uint64((t + 1) >> 1)
    return jnp.where(lifted >= thr, q - (jnp.uint64(t) - lifted), lifted)


def add_plain(ctx: Context, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
    cd = _cd(ctx, ct)
    scheme = ctx.params.scheme
    if scheme == Scheme.BFV:
        lifted = sr.scale_plain_up(pt.data[0], cd.plain_lift)
        c0 = po.add_rns(ct.data[0], lifted, cd.mv)
    elif scheme == Scheme.CKKS:
        c0 = po.add_rns(ct.data[0], pt.data, cd.mv)
    else:  # BGV: plaintext enters scaled by the correction factor
        from ..host import numth
        t = ctx.params.plain_modulus
        m = pt.data[0]
        f = ct.correction_factor % t
        if f != 1:
            mf = (m.astype(jnp.uint64) * jnp.uint64(f)) % jnp.uint64(t)
        else:
            mf = m
        from .keys import _bgv_lift_plain_ntt
        c0 = po.add_rns(ct.data[0], _bgv_lift_plain_ntt(ctx, cd, mf), cd.mv)
    return ct.replace(data=ct.data.at[0].set(c0))


def sub_plain(ctx: Context, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
    cd = _cd(ctx, ct)
    scheme = ctx.params.scheme
    if scheme == Scheme.BFV:
        lifted = sr.scale_plain_up(pt.data[0], cd.plain_lift)
        c0 = po.sub_rns(ct.data[0], lifted, cd.mv)
    elif scheme == Scheme.CKKS:
        c0 = po.sub_rns(ct.data[0], pt.data, cd.mv)
    else:
        from .keys import _bgv_lift_plain_ntt
        t = ctx.params.plain_modulus
        m = pt.data[0]
        f = ct.correction_factor % t
        if f != 1:
            m = (m.astype(jnp.uint64) * jnp.uint64(f)) % jnp.uint64(t)
        c0 = po.sub_rns(ct.data[0], _bgv_lift_plain_ntt(ctx, cd, m), cd.mv)
    return ct.replace(data=ct.data.at[0].set(c0))


def multiply_plain(ctx: Context, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
    """ct * pt (reference: multiply_plain_inplace, evaluate.cu:1106)."""
    cd = _cd(ctx, ct)
    scheme = ctx.params.scheme
    size_ql = cd.size_ql
    if scheme == Scheme.BFV:
        tq = ctx.tables_q(size_ql)
        m_rns = _bfv_plain_centered_rns(ctx, cd, pt.data[0])
        m_ntt = nttmod.ntt_forward(m_rns, tq)
        ct_ntt = nttmod.ntt_forward(ct.data, tq)
        prod = po.mul_rns(ct_ntt, m_ntt[None], cd.mv)
        return ct.replace(data=nttmod.ntt_inverse(prod, tq))
    if scheme == Scheme.CKKS:
        prod = po.mul_rns(ct.data, pt.data[None], cd.mv)
        return ct.replace(data=prod, scale=ct.scale * pt.scale)
    # BGV: NTT-form ct times NTT(plain)
    from .keys import _bgv_lift_plain_ntt
    m_ntt = _bgv_lift_plain_ntt(ctx, cd, pt.data[0])
    prod = po.mul_rns(ct.data, m_ntt[None], cd.mv)
    return ct.replace(data=prod)


# --------------------------------------------------------------------------
# rescale / modulus switching
# --------------------------------------------------------------------------

def _divide_round_qlast_ntt(ctx: Context, cd: ContextData,
                            x: jnp.ndarray) -> jnp.ndarray:
    """round(x / q_last) over the remaining limbs, NTT form in/out.

    Reference: DRNSTool::divide_and_round_q_last_ntt (rns.cu:1160)."""
    rc = cd.rescale
    k = cd.size_ql
    last_tables = nttmod._limb_slice(ctx.ntt, (k - 1, k))
    xl = nttmod.ntt_inverse(x[..., k - 1:k, :], last_tables)  # (...,1,N)
    qlast = cd.mv.q[k - 1]
    xl = mm.add_mod(xl, rc.half, qlast)
    rest_mv_q = cd.mv.q[:k - 1][:, None]
    rest_rhi = cd.mv.ratio_hi[:k - 1][:, None]
    red = mm.barrett_reduce_u64(xl, rest_mv_q, rest_rhi)  # broadcast (k-1,N)
    delta = mm.sub_mod(red, rc.half_mod_q[:, None], rest_mv_q)
    delta_ntt = nttmod.ntt_forward(delta, ctx.tables_q(k - 1))
    diff = mm.sub_mod(x[..., :k - 1, :], delta_ntt, rest_mv_q)
    return mm.mul_mod_shoup(diff, rc.qlast_inv[:, None],
                            rc.qlast_inv_shoup[:, None], rest_mv_q)


def _divide_round_qlast_coeff(ctx: Context, cd: ContextData,
                              x: jnp.ndarray) -> jnp.ndarray:
    """Coefficient-form variant (reference: divide_and_round_q_last,
    rns.cu:1114)."""
    rc = cd.rescale
    k = cd.size_ql
    qlast = cd.mv.q[k - 1]
    xl = mm.add_mod(x[..., k - 1:k, :], rc.half, qlast)
    rest_q = cd.mv.q[:k - 1][:, None]
    rest_rhi = cd.mv.ratio_hi[:k - 1][:, None]
    red = mm.barrett_reduce_u64(xl, rest_q, rest_rhi)
    delta = mm.sub_mod(red, rc.half_mod_q[:, None], rest_q)
    diff = mm.sub_mod(x[..., :k - 1, :], delta, rest_q)
    return mm.mul_mod_shoup(diff, rc.qlast_inv[:, None],
                            rc.qlast_inv_shoup[:, None], rest_q)


def rescale_to_next(ctx: Context, ct: Ciphertext) -> Ciphertext:
    """CKKS rescale (reference: rescale_to_next, evaluate.cu:1545)."""
    if ctx.params.scheme != Scheme.CKKS:
        raise ValueError("rescale is CKKS-only; use mod_switch for BFV/BGV")
    cd = _cd(ctx, ct)
    if cd.size_ql < 2:
        raise ValueError("cannot rescale: last level")
    qlast = int(ctx.params.data_moduli[cd.size_ql - 1])
    out = _divide_round_qlast_ntt(ctx, cd, ct.data)
    return ct.replace(data=out, chain_index=ct.chain_index + 1,
                      scale=ct.scale / qlast)


def mod_switch_to_next(ctx: Context, ct: Ciphertext) -> Ciphertext:
    """Drop the last prime (reference: mod_switch_to_next,
    evaluate.cu:1376-1543): BFV scales by q_last with rounding, CKKS drops
    the limb (scale unchanged), BGV applies the mod-t correction."""
    cd = _cd(ctx, ct)
    if cd.size_ql < 2:
        raise ValueError("cannot mod-switch: last level")
    scheme = ctx.params.scheme
    if scheme == Scheme.BFV:
        out = _divide_round_qlast_coeff(ctx, cd, ct.data)
        return ct.replace(data=out, chain_index=ct.chain_index + 1)
    if scheme == Scheme.CKKS:
        return ct.replace(data=ct.data[..., :cd.size_ql - 1, :],
                          chain_index=ct.chain_index + 1)
    # BGV: divide by q_last while keeping the value mod t intact
    out, new_factor = _bgv_mod_switch(ctx, cd, ct)
    return ct.replace(data=out, chain_index=ct.chain_index + 1,
                      correction_factor=new_factor)


def _bgv_mod_switch(ctx: Context, cd: ContextData, ct: Ciphertext):
    """BGV mod-switch: subtract delta == c (mod q_last), == 0 (mod t), then
    divide exactly by q_last; the plaintext picks up a factor
    q_last^{-1} mod t, tracked in the correction factor (reference:
    mod_t_and_divide_q_last_ntt, rns.cu:1209)."""
    from ..host import numth
    bgv = cd.bgv
    rc = cd.rescale
    k = cd.size_ql
    x = ct.data  # (size, k, N) NTT form
    last_tables = nttmod._limb_slice(ctx.ntt, (k - 1, k))
    c_last = nttmod.ntt_inverse(x[..., k - 1:k, :], last_tables)
    t = bgv.t_mv.q[0]
    t_rhi = bgv.t_mv.ratio_hi[0]
    # u = [c_last * (-q_last^{-1})]_t
    r_t = mm.barrett_reduce_u64(c_last, t, t_rhi)
    u = mm.mul_mod(r_t, bgv.neg_qlast_inv_mod_t, t,
                   bgv.t_mv.ratio_lo[0], t_rhi)
    rest_q = cd.mv.q[:k - 1][:, None]
    rest_rlo = cd.mv.ratio_lo[:k - 1][:, None]
    rest_rhi = cd.mv.ratio_hi[:k - 1][:, None]
    c_last_mod_qi = mm.barrett_reduce_u64(c_last, rest_q, rest_rhi)
    delta = mm.add_mod(
        c_last_mod_qi,
        mm.mul_mod(u, bgv.qlast_mod_qi[:, None], rest_q, rest_rlo, rest_rhi),
        rest_q)
    delta_ntt = nttmod.ntt_forward(delta, ctx.tables_q(k - 1))
    diff = mm.sub_mod(x[..., :k - 1, :], delta_ntt, rest_q)
    out = mm.mul_mod_shoup(diff, rc.qlast_inv[:, None],
                           rc.qlast_inv_shoup[:, None], rest_q)
    t_int = ctx.params.plain_modulus
    qlast = int(ctx.params.data_moduli[k - 1])
    new_factor = (ct.correction_factor
                  * numth.invert_mod(qlast % t_int, t_int)) % t_int
    return out, new_factor


def mod_switch_to(ctx: Context, ct: Ciphertext, chain_index: int) -> Ciphertext:
    while ct.chain_index < chain_index:
        ct = mod_switch_to_next(ctx, ct)
    return ct


# --------------------------------------------------------------------------
# Galois / rotations
# --------------------------------------------------------------------------

def _galois_tool(ctx: Context):
    """The context's GaloisTool (a proper static Context field; see
    make_context)."""
    return ctx.galois


def apply_galois(ctx: Context, ct: Ciphertext, elt: int, glk) -> Ciphertext:
    """Apply sigma_elt and key-switch back to s (reference:
    apply_galois_inplace, evaluate.cu:1567)."""
    if ct.size != 2:
        raise ValueError("apply_galois requires a size-2 ciphertext "
                         "(relinearize first)")
    if elt not in glk.elts:
        raise ValueError(f"no galois key for element {elt}")
    kidx = glk.elts.index(elt)
    cd = _cd(ctx, ct)
    size_ql = cd.size_ql
    tool = _galois_tool(ctx)
    tq = ctx.tables_q(size_ql)
    if ct.is_ntt_form:
        from .keyswitch import keyswitch_from_ntt
        c0p = tool.apply_ntt(ct.data[0], elt)
        c1p = tool.apply_ntt(ct.data[1], elt)
        switched = keyswitch_from_ntt(ctx, cd, c1p, glk.data[kidx])
        out = jnp.stack([po.add_rns(c0p, switched[0], cd.mv), switched[1]])
    else:
        c0p = tool.apply_coeff(ct.data[0], elt, cd.mv.q)
        c1p = tool.apply_coeff(ct.data[1], elt, cd.mv.q)
        switched = nttmod.ntt_inverse(
            keyswitch(ctx, cd, c1p, glk.data[kidx]), tq)
        out = jnp.stack([po.add_rns(c0p, switched[0], cd.mv), switched[1]])
    return ct.replace(data=out)


def _naf(value: int):
    """Non-adjacent form decomposition (reference: naf, host/numth.h:17)."""
    out = []
    while value:
        zs = value & 3
        if zs == 1:
            out.append(1)
            value -= 1
        elif zs == 3:
            out.append(-1)
            value += 1
        else:
            out.append(0)
        value >>= 1
    return [d << i for i, d in enumerate(out) if d]


def rotate(ctx: Context, ct: Ciphertext, step: int, glk) -> Ciphertext:
    """Rotate slots by `step`, decomposing into available galois elements
    via NAF when the direct element is missing (reference: rotate_inplace,
    evaluate.cu:1633)."""
    from . import galois as gal
    n = ctx.params.n
    if step % (n // 2) == 0:
        return ct
    elt = gal.get_elt_from_step(step, n)
    if elt in glk.elts:
        return apply_galois(ctx, ct, elt, glk)
    for part in _naf(step):
        e = gal.get_elt_from_step(part, n)
        if e not in glk.elts:
            raise ValueError(f"no galois key for step {part}")
        ct = apply_galois(ctx, ct, e, glk)
    return ct


def rotate_rows(ctx: Context, ct: Ciphertext, step: int, glk) -> Ciphertext:
    """BFV/BGV row rotation (reference: rotate_rows_inplace)."""
    return rotate(ctx, ct, step, glk)


def rotate_columns(ctx: Context, ct: Ciphertext, glk) -> Ciphertext:
    """BFV/BGV column swap = conjugation element 2N-1."""
    return apply_galois(ctx, ct, 2 * ctx.params.n - 1, glk)


def rotate_vector(ctx: Context, ct: Ciphertext, step: int, glk) -> Ciphertext:
    """CKKS slot rotation."""
    return rotate(ctx, ct, step, glk)


def complex_conjugate(ctx: Context, ct: Ciphertext, glk) -> Ciphertext:
    """CKKS complex conjugation."""
    return apply_galois(ctx, ct, 2 * ctx.params.n - 1, glk)


# --------------------------------------------------------------------------
# BFV BEHZ multiplication
# --------------------------------------------------------------------------

def bfv_multiply_behz(ctx: Context, ct1: Ciphertext,
                      ct2: Ciphertext) -> Ciphertext:
    """BFV multiply, BEHZ technique (reference: bfv_multiply_behz,
    src/evaluate.cu:451): lift to Ql u Bsk u {m_tilde} with small Montgomery
    reduction, dyadic products in NTT(Ql) and NTT(Bsk), multiply by t,
    divide-and-floor by Ql in Bsk, Shenoy-Kumaresan back to Ql."""
    from ..ops import behz as bz
    cd = _cd(ctx, ct1)
    c = cd.behz
    k = cd.size_ql
    tq = ctx.tables_q(k)
    tbsk = ctx.tables_bsk(k)
    mv_bsk = c.bsk

    def lift(ct):
        qs, bs = [], []
        for i in range(ct.size):
            x_q = ct.data[i]
            qs.append(x_q)
            bs.append(bz.sm_mrq(x_q, c))
        return jnp.stack(qs), jnp.stack(bs)

    a_q, a_bsk = lift(ct1)
    b_q, b_bsk = lift(ct2)
    a_q = nttmod.ntt_forward(a_q, tq)
    b_q = nttmod.ntt_forward(b_q, tq)
    a_bsk = nttmod.ntt_forward(a_bsk, tbsk)
    b_bsk = nttmod.ntt_forward(b_bsk, tbsk)
    if ct1.size == 2 and ct2.size == 2:
        prod_q = po.tensor_prod_2x2(a_q, b_q, cd.mv)
        prod_bsk = po.tensor_prod_2x2(a_bsk, b_bsk, mv_bsk)
    else:
        prod_q = po.tensor_prod_mxn(a_q, b_q, cd.mv)
        prod_bsk = po.tensor_prod_mxn(a_bsk, b_bsk, mv_bsk)
    prod_q = nttmod.ntt_inverse(prod_q, tq)
    prod_bsk = nttmod.ntt_inverse(prod_bsk, tbsk)
    # multiply by t (reference fuses this into the inverse-NTT scale)
    t = jnp.uint64(ctx.params.plain_modulus)
    tq_prod = mm.mul_mod(prod_q, t, cd.mv.q[:, None], cd.mv.ratio_lo[:, None],
                         cd.mv.ratio_hi[:, None])
    tbsk_prod = mm.mul_mod_shoup(prod_bsk, c.t_mod_bsk[:, None],
                                 c.t_mod_bsk_shoup[:, None], mv_bsk.q[:, None])
    out = []
    for i in range(prod_q.shape[0]):
        floored = bz.fast_floor(tq_prod[i], tbsk_prod[i], c)
        out.append(bz.fastbconv_sk(floored, c))
    return ct1.replace(data=jnp.stack(out))


# --------------------------------------------------------------------------
# BFV HPSoverQ / HPSoverQ-leveled multiplication
# --------------------------------------------------------------------------

def bfv_multiply_hps_overq(ctx: Context, ct1: Ciphertext,
                           ct2: Ciphertext) -> Ciphertext:
    """BFV multiply, HPSoverQ (+ leveled) technique (reference:
    bfv_multiply_hps with mul_tech hps_overq/_leveled, evaluate.cu:648-805).

    The 1/Q scaling moves onto ct2 before the tensor product:
      ct2 -> w2 = round(Rl*x2/Q) represented in QlRl (exact, v-free),
      ct1 -> (leveled: round(Ql/Q*x1)) lifted Ql -> Rl exactly,
      product in NTT(QlRl), final exact round(t/Rl * .) : D -> Ql.
    Leveled additionally drops levels chosen by the noise model
    (FindLevelsToDrop) and expands the result back to the full base Q."""
    from ..host.noise import find_levels_to_drop
    from ..ops import bconv as bc
    from .params import MulTech

    p = ctx.params
    lvl = 0
    if p.mul_tech == MulTech.HPS_OVERQ_LEVELED:
        nsd = max(ct1.noise_scale_deg, ct2.noise_scale_deg)
        dcrt_bits = max(int(q).bit_length() for q in p.data_moduli)
        cd_full = ctx.get_context_data(ct1.chain_index)
        beta = len(cd_full.ks.digit_convs)
        lvl = find_levels_to_drop(p.n, p.size_q, p.size_p, beta,
                                  p.plain_modulus, dcrt_bits, nsd - 1,
                                  False, True)
    cd = ctx.get_context_data(ct1.chain_index + lvl)
    hps = cd.hps
    k_l = cd.size_ql
    td = _tables_d(ctx, k_l)

    a_polys = []
    for i in range(ct1.size):
        x = ct1.data[i]
        if lvl:
            x = sr.scale_and_round_exact(x, cd.leveled.q_to_ql)
        a_polys.append(jnp.concatenate(
            [x, bc.bconv_exact(x, hps.q_to_r)], axis=0))
    b_polys = []
    sr_to_rl = cd.leveled.q_to_rl if lvl else hps.sr_ql_to_rl
    for i in range(ct2.size):
        w_rl = sr.scale_and_round_exact(ct2.data[i], sr_to_rl)
        w_ql = bc.bconv_exact(w_rl, hps.r_to_q)
        b_polys.append(jnp.concatenate([w_ql, w_rl], axis=0))

    a = nttmod.ntt_forward(jnp.stack(a_polys), td)
    b = nttmod.ntt_forward(jnp.stack(b_polys), td)
    if ct1.size == 2 and ct2.size == 2:
        prod = po.tensor_prod_2x2(a, b, hps.dbase)
    else:
        prod = po.tensor_prod_mxn(a, b, hps.dbase)
    prod = nttmod.ntt_inverse(prod, td)
    out = [sr.scale_and_round_exact(prod[i], hps.sr_final_overq)
           for i in range(prod.shape[0])]
    if lvl:
        out = [_expand_ql_to_q(ctx, cd, w) for w in out]
    new_nsd = max(ct1.noise_scale_deg, ct2.noise_scale_deg) + 1
    return ct1.replace(data=jnp.stack(out), noise_scale_deg=new_nsd)


def _expand_ql_to_q(ctx: Context, cd: ContextData, w: jnp.ndarray):
    """Centered exact lift Ql -> full Q (reference: ExpandCRTBasis_Ql_Q,
    rns.cu:1825): Ql rows are copied, dropped rows get the centered value
    via the (Ql-1)/2 shift."""
    from ..ops import bconv as bc
    lc = cd.leveled
    shifted = mm.add_mod(w, lc.qlhalf_mod_ql[:, None], cd.mv.q[:, None])
    drop = bc.bconv_exact(shifted, lc.ql_to_drop)
    drop = mm.sub_mod(drop, lc.qlhalf_mod_drop[:, None],
                      lc.ql_to_drop.obase.q[:, None])
    return jnp.concatenate([w, drop], axis=0)


def hoisting(ctx: Context, ct: Ciphertext, glk, steps) -> Ciphertext:
    """Sum of rotations with a single modup/moddown (reference:
    hoisting_inplace, evaluate.cu:1670-1865): c1 is base-extended once; each
    step permutes the extended digits in the NTT domain and runs only the
    evk inner product; one moddown finishes the batch.

    Returns sum_s rotate(ct, s)."""
    from . import galois as gal
    from .keyswitch import evk_rows, inner_product_evk, modup, moddown_ntt
    if ct.size != 2:
        raise ValueError("hoisting requires a size-2 ciphertext")
    p = ctx.params
    cd = _cd(ctx, ct)
    size_ql = cd.size_ql
    tool = _galois_tool(ctx)
    tq = ctx.tables_q(size_ql)
    elts = [gal.get_elt_from_step(s, p.n) for s in steps]
    for e in elts:
        if e not in glk.elts:
            raise ValueError(f"no galois key for element {e}")

    from .keyswitch import modup_from_ntt
    c0, c1 = ct.data[0], ct.data[1]
    if ct.is_ntt_form:
        t_modup = modup_from_ntt(ctx, cd, c1)
    else:
        t_modup = modup(ctx, cd, c1)  # (beta, K', N) NTT form

    acc_c0 = None
    acc_cx = None
    qlp_q = cd.ks.qlp.q[:, None]
    for elt in elts:
        kidx = glk.elts.index(elt)
        if ct.is_ntt_form:
            c0p = tool.apply_ntt(c0, elt)
        else:
            c0p = tool.apply_coeff(c0, elt, cd.mv.q)
        tperm = tool.apply_ntt(t_modup, elt)
        prod = inner_product_evk(tperm, evk_rows(ctx, glk.data[kidx], cd), cd)
        acc_c0 = c0p if acc_c0 is None else po.add_rns(acc_c0, c0p, cd.mv)
        acc_cx = prod if acc_cx is None else mm.add_mod(acc_cx, prod, qlp_q)

    cx0 = moddown_ntt(ctx, cd, acc_cx[0])
    cx1 = moddown_ntt(ctx, cd, acc_cx[1])
    if not ct.is_ntt_form:
        cx0 = nttmod.ntt_inverse(cx0, tq)
        cx1 = nttmod.ntt_inverse(cx1, tq)
    out = jnp.stack([po.add_rns(acc_c0, cx0, cd.mv), cx1])
    return ct.replace(data=out)


def mod_switch_plain_to_next(ctx: Context, pt: Plaintext) -> Plaintext:
    """Drop the last prime of an NTT-form (CKKS) plaintext
    (reference: mod_switch_to_next for plaintexts)."""
    cd = ctx.get_context_data(pt.chain_index)
    if cd.size_ql < 2:
        raise ValueError("cannot mod-switch plaintext: last level")
    return pt.replace(data=pt.data[..., :cd.size_ql - 1, :],
                      chain_index=pt.chain_index + 1)


def mod_switch_plain_to(ctx: Context, pt: Plaintext,
                        chain_index: int) -> Plaintext:
    while pt.chain_index < chain_index:
        pt = mod_switch_plain_to_next(ctx, pt)
    return pt


def add_many(ctx: Context, cts) -> Ciphertext:
    """Sum a list of ciphertexts (reference: add_many, evaluate.cuh)."""
    cts = list(cts)
    if not cts:
        raise ValueError("add_many needs at least one ciphertext")
    acc = cts[0]
    for ct in cts[1:]:
        acc = add(ctx, acc, ct)
    return acc


def hoisted_linear_combo(ctx: Context, ct: Ciphertext, glk, steps,
                         pts_qlp, pts_scale: float,
                         t_modup=None) -> Ciphertext:
    """sum_s pt_s * rotate(ct, s) with ONE modup and ONE moddown.

    The hoisted-rotation PPML primitive (Halevi-Shoup matvec inner loop):
    the plaintext weights multiply the per-step keyswitch products while
    they still live over the extended base QlP, so the expensive moddown
    is shared across all steps (reference building blocks: hoisting,
    evaluate.cu:1670 + multiply_plain).

    pts_qlp: list of (size_qlp, N) NTT-form weights from
    ckks_encoder.encode_extended, aligned with `steps`.

    t_modup: optional precomputed base extension of c1 (from
    keyswitch.modup_from_ntt) so BSGS callers (schemes.linear) can share
    ONE modup across all baby-step groups."""
    from . import galois as gal
    from .keyswitch import (evk_rows, inner_product_evk, modup_from_ntt,
                            moddown_ntt)
    if ctx.params.scheme != Scheme.CKKS or not ct.is_ntt_form:
        raise ValueError("hoisted_linear_combo expects NTT-form CKKS input")
    if ct.size != 2:
        raise ValueError("requires a size-2 ciphertext")
    p = ctx.params
    cd = _cd(ctx, ct)
    size_ql = cd.size_ql
    tool = _galois_tool(ctx)
    qlp_q = cd.ks.qlp.q[:, None]
    qlp_rlo = cd.ks.qlp.ratio_lo[:, None]
    qlp_rhi = cd.ks.qlp.ratio_hi[:, None]

    c0, c1 = ct.data[0], ct.data[1]
    if t_modup is None:
        t_modup = modup_from_ntt(ctx, cd, c1)

    acc_c0 = None      # weighted permuted c0 terms (mod Ql)
    acc_c1 = None      # identity steps contribute pt*c1 directly (mod Ql)
    acc_cx = None      # weighted keyswitch products (mod QlP)
    for s, pt in zip(steps, pts_qlp):
        if s % (p.n // 2) == 0:
            # identity rotation: no keyswitch needed at all
            term0 = po.mul_rns(c0, pt[:size_ql], cd.mv)
            term1 = po.mul_rns(c1, pt[:size_ql], cd.mv)
            acc_c1 = term1 if acc_c1 is None else po.add_rns(acc_c1, term1,
                                                             cd.mv)
        else:
            elt = gal.get_elt_from_step(s, p.n)
            if elt not in glk.elts:
                raise ValueError(f"no galois key for step {s}")
            kidx = glk.elts.index(elt)
            c0p = tool.apply_ntt(c0, elt)
            tperm = tool.apply_ntt(t_modup, elt)
            prod = inner_product_evk(tperm, evk_rows(ctx, glk.data[kidx], cd),
                                     cd)
            weighted = mm.mul_mod(prod, pt[None], qlp_q, qlp_rlo, qlp_rhi)
            term0 = po.mul_rns(c0p, pt[:size_ql], cd.mv)
            acc_cx = weighted if acc_cx is None else mm.add_mod(
                acc_cx, weighted, qlp_q)
        acc_c0 = term0 if acc_c0 is None else po.add_rns(acc_c0, term0, cd.mv)
    if acc_cx is not None:
        cx0 = moddown_ntt(ctx, cd, acc_cx[0])
        cx1 = moddown_ntt(ctx, cd, acc_cx[1])
        out0 = po.add_rns(acc_c0, cx0, cd.mv)
        out1 = cx1 if acc_c1 is None else po.add_rns(cx1, acc_c1, cd.mv)
    else:
        out0 = acc_c0
        out1 = acc_c1
    return ct.replace(data=jnp.stack([out0, out1]),
                      scale=ct.scale * pts_scale)
