"""Key generation, encryption, decryption.

Equivalent of the reference's PhantomSecretKey / PhantomPublicKey /
PhantomRelinKey / PhantomGaloisKey (src/secretkey.cu, include/secretkey.h).

Key material lives in NTT form over the full key base QP, exactly like the
reference; hybrid key-switching keys hold dnum = size_Q/alpha "digit" keys,
each an encryption of zero with P*s' added onto its own digit's modulus
block (generate_one_kswitch_key, src/secretkey.cu:297).

All heavy paths are jittable; randomness is threefry key-split (PRNG swap
from the reference's Salsa20 is documented in ops/sampling.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as nttmod
from ..ops import polyops as po
from ..ops import sampling as smp
from ..ops import scaleround as sr
from ..ops import bconv as bc
from .ciphertext import Ciphertext, Plaintext
from .context import Context, ContextData
from .keyswitch import moddown_coeff as _moddown_coeff_ks, moddown_ntt as _moddown_ntt_ks
from .params import Scheme


@flax.struct.dataclass
class SecretKey:
    data: jnp.ndarray  # (K, N) uint64, NTT form over QP


@flax.struct.dataclass
class PublicKey:
    data: jnp.ndarray  # (2, K, N) NTT form, key level


@flax.struct.dataclass
class RelinKey:
    data: jnp.ndarray  # (dnum, 2, K, N) NTT form


@flax.struct.dataclass
class GaloisKeys:
    data: jnp.ndarray  # (G, dnum, 2, K, N)
    elts: Tuple[int, ...] = flax.struct.field(pytree_node=False, default=())


# --------------------------------------------------------------------------
# key generation
# --------------------------------------------------------------------------

def gen_secret_key(ctx: Context, rng: jax.Array) -> SecretKey:
    """Ternary secret in NTT form over QP (reference: gen_secretkey)."""
    s = smp.sample_ternary_rns(rng, ctx.params.n, ctx.key_mv)
    return SecretKey(data=nttmod.ntt_forward(s, ctx.ntt))


def _encrypt_zero_symmetric_ntt(ctx: Context, sk: SecretKey, rng: jax.Array,
                                mult_t: bool = False):
    """(c0, c1) = (-(a s + e), a) in NTT form at the key level.

    mult_t: BGV's t*e noise.  Reference: encrypt_zero_symmetric
    (src/secretkey.cu:232).
    """
    k_a, k_e = jax.random.split(rng)
    n = ctx.params.n
    a = smp.sample_uniform_rns(k_a, n, ctx.key_mv)  # NTT-form uniform
    mult = None
    if mult_t:
        # lift t across QP rows
        t = ctx.params.plain_modulus
        tm = jnp.asarray([t % q for q in ctx.params.coeff_modulus],
                         dtype=jnp.uint64)
        mult = tm
    e = smp.sample_error_rns(k_e, n, ctx.key_mv, multiplier=mult)
    e_ntt = nttmod.ntt_forward(e, ctx.ntt)
    a_s = po.mul_rns(a, sk.data, ctx.key_mv)
    c0 = po.neg_rns(po.add_rns(a_s, e_ntt, ctx.key_mv), ctx.key_mv)
    return c0, a


def gen_public_key(ctx: Context, sk: SecretKey, rng: jax.Array) -> PublicKey:
    mult_t = ctx.params.scheme == Scheme.BGV
    c0, c1 = _encrypt_zero_symmetric_ntt(ctx, sk, rng, mult_t=mult_t)
    return PublicKey(data=jnp.stack([c0, c1]))


def _gen_kswitch_key(ctx: Context, sk: SecretKey, new_key: jnp.ndarray,
                     rng: jax.Array) -> jnp.ndarray:
    """Key-switching key for `new_key` (K, N NTT form): (dnum, 2, K, N).

    Digit d's key = encrypt-zero + P*new_key restricted to digit-d's modulus
    block (reference: generate_one_kswitch_key, multiply_temp_mod_and_add).
    The dnum digit keys are generated with one vmapped trace (digit
    restriction is a static mask, so every digit shares the same graph).
    """
    p = ctx.params
    alpha = p.size_p
    dnum = -(-p.size_q // alpha)
    mult_t = p.scheme == Scheme.BGV
    big_p = 1
    for q in p.special_moduli:
        big_p *= q

    subkeys = jax.random.split(rng, dnum)
    c0s, c1s = jax.vmap(
        lambda k: _encrypt_zero_symmetric_ntt(ctx, sk, k, mult_t=mult_t)
    )(subkeys)  # (dnum, K, N) each

    # P*new_key over every QP row once; digit membership masks select rows
    mv = ctx.key_mv
    pm = jnp.asarray([big_p % q for q in p.coeff_modulus], dtype=jnp.uint64)
    term = mm.mul_mod(new_key, pm[:, None], mv.q[:, None],
                      mv.ratio_lo[:, None], mv.ratio_hi[:, None])  # (K, N)
    import numpy as _np
    mask = _np.zeros((dnum, p.size_qp, 1), dtype=bool)
    for d in range(dnum):
        mask[d, d * alpha: min((d + 1) * alpha, p.size_q)] = True
    c0s = jnp.where(jnp.asarray(mask),
                    mm.add_mod(c0s, term[None], mv.q[:, None]), c0s)
    return jnp.stack([c0s, c1s], axis=1)  # (dnum, 2, K, N)


def _mv_slice(mv, lo, hi):
    from ..ops.rns_host import ModulusVec
    return ModulusVec(q=mv.q[lo:hi], ratio_lo=mv.ratio_lo[lo:hi],
                      ratio_hi=mv.ratio_hi[lo:hi])


def gen_relin_key(ctx: Context, sk: SecretKey, rng: jax.Array) -> RelinKey:
    s_sq = po.mul_rns(sk.data, sk.data, ctx.key_mv)  # s^2 in NTT form
    return RelinKey(data=_gen_kswitch_key(ctx, sk, s_sq, rng))


# --------------------------------------------------------------------------
# encryption
# --------------------------------------------------------------------------

def encrypt_zero_asymmetric(ctx: Context, pk: PublicKey, chain_index: int,
                            rng: jax.Array, is_ntt_form: bool) -> jnp.ndarray:
    """Encryption of zero at `chain_index`: (2, size_Ql, N).

    Runs at the key level then moddowns QP -> Ql, like the reference
    (encrypt_zero_asymmetric_internal, src/secretkey.cu:88).
    """
    p = ctx.params
    n = p.n
    cd = ctx.get_context_data(chain_index)
    k_u, k_e0, k_e1 = jax.random.split(rng, 3)
    u = nttmod.ntt_forward(smp.sample_ternary_rns(k_u, n, ctx.key_mv), ctx.ntt)
    mult = None
    if p.scheme == Scheme.BGV:
        t = p.plain_modulus
        mult = jnp.asarray([t % q for q in p.coeff_modulus], dtype=jnp.uint64)
    out = []
    for i, k_e in enumerate((k_e0, k_e1)):
        e = smp.sample_error_rns(k_e, n, ctx.key_mv, multiplier=mult)
        ci = po.mul_rns(u, pk.data[i], ctx.key_mv)  # NTT domain
        if is_ntt_form:
            ci = po.add_rns(ci, nttmod.ntt_forward(e, ctx.ntt), ctx.key_mv)
        else:
            ci = nttmod.ntt_inverse(ci, ctx.ntt)
            ci = po.add_rns(ci, e, ctx.key_mv)
        out.append(ci)
    x = jnp.stack(out)  # (2, K, N) at key level
    # keep Ql rows + P rows, drop unused data rows beyond the level
    size_ql = cd.size_ql
    rows = list(range(size_ql)) + list(range(p.size_q, p.size_qp))
    x = x[:, jnp.asarray(rows)]
    md = _moddown_ntt_ks if is_ntt_form else _moddown_coeff_ks
    return jnp.stack([md(ctx, cd, x[0]), md(ctx, cd, x[1])])


def encrypt_asymmetric(ctx: Context, pk: PublicKey, plain: Plaintext,
                       rng: jax.Array) -> Ciphertext:
    p = ctx.params
    if p.scheme == Scheme.BFV:
        ci = ctx.first_data_index
        cd = ctx.get_context_data(ci)
        zero = encrypt_zero_asymmetric(ctx, pk, ci, rng, is_ntt_form=False)
        lifted = sr.scale_plain_up(plain.data[0], cd.plain_lift)
        c0 = po.add_rns(zero[0], lifted, cd.mv)
        return Ciphertext(data=jnp.stack([c0, zero[1]]), chain_index=ci,
                          is_ntt_form=False)
    if p.scheme == Scheme.CKKS:
        ci = plain.chain_index
        cd = ctx.get_context_data(ci)
        zero = encrypt_zero_asymmetric(ctx, pk, ci, rng, is_ntt_form=True)
        c0 = po.add_rns(zero[0], plain.data, cd.mv)
        return Ciphertext(data=jnp.stack([c0, zero[1]]), chain_index=ci,
                          is_ntt_form=True, scale=plain.scale)
    if p.scheme == Scheme.BGV:
        ci = ctx.first_data_index
        cd = ctx.get_context_data(ci)
        zero = encrypt_zero_asymmetric(ctx, pk, ci, rng, is_ntt_form=True)
        pt = _bgv_lift_plain_ntt(ctx, cd, plain.data[0])
        c0 = po.add_rns(zero[0], pt, cd.mv)
        return Ciphertext(data=jnp.stack([c0, zero[1]]), chain_index=ci,
                          is_ntt_form=True, correction_factor=1)
    raise ValueError("unsupported scheme")


def encrypt_symmetric(ctx: Context, sk: SecretKey, plain: Plaintext,
                      rng: jax.Array) -> Ciphertext:
    """Symmetric encryption directly at the first data level."""
    p = ctx.params
    ci = ctx.first_data_index if p.scheme != Scheme.CKKS else plain.chain_index
    cd = ctx.get_context_data(ci)
    size_ql = cd.size_ql
    n = p.n
    k_a, k_e = jax.random.split(rng)
    a = smp.sample_uniform_rns(k_a, n, cd.mv)  # NTT form
    mult = None
    if p.scheme == Scheme.BGV:
        t = p.plain_modulus
        mult = jnp.asarray([t % q for q in cd.moduli], dtype=jnp.uint64)
    e = smp.sample_error_rns(k_e, n, cd.mv, multiplier=mult)
    tq = ctx.tables_q(size_ql)
    s = sk.data[:size_ql]
    a_s = po.mul_rns(a, s, cd.mv)
    if p.scheme == Scheme.BFV:
        c0 = po.neg_rns(po.add_rns(nttmod.ntt_inverse(a_s, tq), e, cd.mv),
                        cd.mv)
        lifted = sr.scale_plain_up(plain.data[0], cd.plain_lift)
        c0 = po.add_rns(c0, lifted, cd.mv)
        c1 = nttmod.ntt_inverse(a, tq)
        return Ciphertext(data=jnp.stack([c0, c1]), chain_index=ci,
                          is_ntt_form=False)
    # NTT-form schemes
    e_ntt = nttmod.ntt_forward(e, tq)
    c0 = po.neg_rns(po.add_rns(a_s, e_ntt, cd.mv), cd.mv)
    if p.scheme == Scheme.CKKS:
        c0 = po.add_rns(c0, plain.data, cd.mv)
        return Ciphertext(data=jnp.stack([c0, a]), chain_index=ci,
                          is_ntt_form=True, scale=plain.scale)
    pt = _bgv_lift_plain_ntt(ctx, cd, plain.data[0])
    c0 = po.add_rns(c0, pt, cd.mv)
    return Ciphertext(data=jnp.stack([c0, a]), chain_index=ci,
                      is_ntt_form=True)


def _bgv_lift_plain_ntt(ctx: Context, cd: ContextData, m: jnp.ndarray):
    """Lift mod-t plaintext (N,) into NTT form over Ql (BGV)."""
    q = cd.mv.q[:, None]
    lifted = jnp.broadcast_to(m[None, :], (cd.size_ql, m.shape[0]))
    # coefficients in [0, t): re-center negatives ([t/2, t) -> q - (t - m))
    t = ctx.params.plain_modulus
    thr = jnp.uint64((t + 1) >> 1)
    lifted = jnp.where(lifted >= thr,
                       q - (jnp.uint64(t) - lifted), lifted)
    return nttmod.ntt_forward(lifted, ctx.tables_q(cd.size_ql))


# --------------------------------------------------------------------------
# decryption
# --------------------------------------------------------------------------

def _dot_with_sk_powers(ctx: Context, sk: SecretKey, ct: Ciphertext):
    """[c0 + c1 s + c2 s^2 + ...]_Ql in NTT form (size_Ql, N)."""
    cd = ctx.get_context_data(ct.chain_index)
    size_ql = cd.size_ql
    tq = ctx.tables_q(size_ql)
    s = sk.data[:size_ql]
    polys = ct.data
    if not ct.is_ntt_form:
        polys = nttmod.ntt_forward(polys, nttmod._limb_slice(
            ctx.ntt, (0, size_ql)))
    acc = polys[0]
    s_pow = s
    for i in range(1, ct.size):
        acc = po.fma_rns(polys[i], s_pow, acc, cd.mv)
        if i + 1 < ct.size:
            s_pow = po.mul_rns(s_pow, s, cd.mv)
    return acc


def decrypt(ctx: Context, sk: SecretKey, ct: Ciphertext) -> Plaintext:
    p = ctx.params
    cd = ctx.get_context_data(ct.chain_index)
    size_ql = cd.size_ql
    acc_ntt = _dot_with_sk_powers(ctx, sk, ct)
    if p.scheme == Scheme.BFV:
        x = nttmod.ntt_inverse(acc_ntt, ctx.tables_q(size_ql))
        m = sr.decrypt_scale_and_round(x, cd.decrypt_sr)
        return Plaintext(data=m[None, :], chain_index=ct.chain_index)
    if p.scheme == Scheme.CKKS:
        return Plaintext(data=acc_ntt, chain_index=ct.chain_index,
                         is_ntt_form=True, scale=ct.scale)
    # BGV: iNTT then exact centered CRT conversion to t + correction fix
    x = nttmod.ntt_inverse(acc_ntt, ctx.tables_q(size_ql))
    m = _bgv_decrypt_to_t(ctx, cd, x, ct.correction_factor)
    return Plaintext(data=m, chain_index=ct.chain_index)


def _bgv_decrypt_to_t(ctx: Context, cd: ContextData, x: jnp.ndarray,
                      correction_factor: int) -> jnp.ndarray:
    """Exact centered conversion [x]_Ql -> mod t, then divide out the
    correction factor (reference: decrypt_mod_t, rns.cu:1237 + the
    correction-factor fix in bgv_decrypt, secretkey.cu:638).

    The centered value is obtained with the (Ql-1)/2 shift trick: convert
    the non-negative x + H exactly, then subtract H mod t."""
    from ..host import numth
    bgv = cd.bgv
    t_mv = bgv.t_mv
    shifted = mm.add_mod(x, bgv.qhalf_mod_q[:, None], cd.mv.q[:, None])
    conv = bc.bconv_exact(shifted, bgv.q_to_t)  # (1, N) mod t
    m = mm.sub_mod(conv, bgv.qhalf_mod_t, t_mv.q[:, None])
    f = correction_factor % ctx.params.plain_modulus
    if f != 1:
        finv = numth.invert_mod(f, ctx.params.plain_modulus)
        m = mm.mul_mod(m, jnp.uint64(finv), t_mv.q[:, None],
                       t_mv.ratio_lo[:, None], t_mv.ratio_hi[:, None])
    return m


# --------------------------------------------------------------------------
# Galois keys
# --------------------------------------------------------------------------

def create_galois_keys(ctx: Context, sk: SecretKey, rng: jax.Array,
                       steps=None, elts=None) -> GaloisKeys:
    """One key-switching key per Galois element, switching sigma_elt(s) -> s
    (reference: create_galois_keys, src/secretkey.cu:421)."""
    from . import galois as gal
    n = ctx.params.n
    if elts is None:
        if steps is not None:
            elts = gal.get_elts_from_steps(steps, n)
        elif ctx.params.galois_elts:
            elts = list(ctx.params.galois_elts)
        else:
            elts = gal.default_elts(n)
    tool = gal.GaloisTool(n)
    all_keys = []
    for elt in elts:
        rng, sub = jax.random.split(rng)
        s_perm = tool.apply_ntt(sk.data, elt)
        all_keys.append(_gen_kswitch_key(ctx, sk, s_perm, sub))
    return GaloisKeys(data=jnp.stack(all_keys), elts=tuple(elts))


# --------------------------------------------------------------------------
# noise budget
# --------------------------------------------------------------------------

def invariant_noise_budget(ctx: Context, sk: SecretKey,
                           ct: Ciphertext) -> int:
    """Remaining BFV noise budget in bits (reference:
    invariant_noise_budget, src/secretkey.cu:752-839): compose
    t*[ct(s)]_Ql on host, center, and return log2(Ql / (2*||v||_inf)).
    """
    import numpy as np
    from ..host.numth import invert_mod
    p = ctx.params
    if p.scheme != Scheme.BFV:
        raise ValueError("noise budget is defined for BFV")
    cd = ctx.get_context_data(ct.chain_index)
    acc_ntt = _dot_with_sk_powers(ctx, sk, ct)
    x = np.asarray(nttmod.ntt_inverse(acc_ntt, ctx.tables_q(cd.size_ql)))
    moduli = list(cd.moduli)
    total = 1
    for q in moduli:
        total *= q
    punct = [total // q for q in moduli]
    inv = [invert_mod(h % q, q) for h, q in zip(punct, moduli)]
    t = p.plain_modulus
    half = total // 2
    norm = 0
    for j in range(p.n):
        acc = 0
        for l, q in enumerate(moduli):
            acc += (int(x[l, j]) * inv[l] % q) * punct[l]
        v = (t * (acc % total)) % total
        if v > half:
            v = total - v
        if v > norm:
            norm = v
    if norm == 0:
        return total.bit_length() - 1
    budget = (total.bit_length() - 1) - (2 * norm).bit_length()
    return max(budget, 0)
