"""Exact scale-and-round kernels (BFV decrypt / multiply arithmetic).

TPU-native replacement for the reference's double-precision HPS
scale-and-round kernels (src/rns.cu:1519-1823).  The TPU has no fast f64, so
every round(t * x / Q) is evaluated in exact fixed-point integer arithmetic:

    round(t*x/Q) mod t  =  round( sum_i y_i * (t/q_i) ) mod t,
    y_i = [x_i * (Q/q_i)^{-1}]_{q_i}

with per-limb exact splits  t*2^64 = Lam_i*q_i + rho_i  so that

    y_i * t * 2^64 / q_i = y_i*Lam_i + g_i + r_i/q_i          (exact)
    g_i, r_i = divmod(y_i * rho_i, q_i)                        (exact Barrett)

The integer words accumulate in 128 bits; the remainders r_i/q_i are refined
one more fixed-point level (error < k * 2^-128, vs 2^-52 for the reference's
doubles).  Correct decryption margins therefore strictly dominate the
reference's.

Constraint: k * t < 2^63 (plain modulus times limb count), comfortably above
any standard parameter set; asserted at precompute time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import modmath as mm
from .rns_host import ModulusVec, modulus_vec, to_u64_array


class DecryptScaleRoundConsts(NamedTuple):
    """Constants for round(t*x/Q) mod t over base Q (BFV decrypt).

    Reference counterpart: hps_decrypt_scale_and_round tables
    (src/rns.cu:1634, qMSB float-split variants).
    """

    base: ModulusVec             # Q primes (k,)
    qhat_inv: jnp.ndarray        # (k,)
    qhat_inv_shoup: jnp.ndarray  # (k,)
    lam: jnp.ndarray             # (k,) floor(t*2^64 / q_i)
    rho: jnp.ndarray             # (k,) t*2^64 mod q_i
    t: jnp.ndarray               # () plain modulus
    t_ratio_hi: jnp.ndarray      # () floor(2^128/t) >> 64


def make_decrypt_consts(base, t: int) -> DecryptScaleRoundConsts:
    """base: host RNSBase for Q; t: plain modulus (int)."""
    k = base.size
    assert k * t < (1 << 63), "k*t must fit in 63 bits for exact rounding"
    lam = [(t << 64) // q for q in base.moduli]
    rho = [(t << 64) - l * q for l, q in zip(lam, base.moduli)]
    assert all(l < (1 << 64) for l in lam), "require t < q_i for all i"
    return DecryptScaleRoundConsts(
        base=modulus_vec(base.moduli),
        qhat_inv=jnp.asarray(to_u64_array(base.qhat_inv_mod_qi)),
        qhat_inv_shoup=jnp.asarray(to_u64_array(base.qhat_inv_shoup)),
        lam=jnp.asarray(to_u64_array(lam)),
        rho=jnp.asarray(to_u64_array(rho)),
        t=jnp.uint64(t),
        t_ratio_hi=jnp.uint64(((1 << 128) // t) >> 64),
    )


def decrypt_scale_and_round(x: jnp.ndarray,
                            c: DecryptScaleRoundConsts) -> jnp.ndarray:
    """x: (k, N) RNS residues of [c0 + c1 s]_Q -> (N,) plaintext in [0, t)."""
    k, n = x.shape
    q = c.base.q[:, None]
    rlo = c.base.ratio_lo[:, None]
    rhi = c.base.ratio_hi[:, None]

    y = mm.mul_mod_shoup(x, c.qhat_inv[:, None], c.qhat_inv_shoup[:, None], q)

    # integer words: A_i = y_i * Lam_i (128-bit), g_i = floor(y_i*rho_i/q_i)
    a_hi, a_lo = mm.mul_wide(y, c.lam[:, None])
    ph, plvals = mm.mul_wide(y, c.rho[:, None])
    g, r = mm.barrett_div_mod_u128(ph, plvals, q, rlo, rhi)
    # second fixed-point level: F2_i = floor(r_i * 2^64 / q_i)
    f2, _ = mm.barrett_div_mod_u128(r, jnp.zeros_like(r), q, rlo, rhi)

    # S = sum(A_i + g_i) in 128 bits; E2 = sum F2_i in 128 bits
    s_hi = jnp.zeros((n,), dtype=jnp.uint64)
    s_lo = jnp.zeros((n,), dtype=jnp.uint64)
    e_hi = jnp.zeros((n,), dtype=jnp.uint64)
    e_lo = jnp.zeros((n,), dtype=jnp.uint64)
    for i in range(k):
        s_hi, s_lo = mm.add_wide(s_hi, s_lo, a_hi[i], a_lo[i])
        s_lo, cr = mm.add_u64_carry(s_lo, g[i])
        s_hi = s_hi + cr
        e_lo, cr = mm.add_u64_carry(e_lo, f2[i])
        e_hi = e_hi + cr

    # m = floor( (S*2^64 + E2 + 2^127) / 2^128 ) = S_hi + carry(S_lo + W_hi)
    w_hi = e_hi + jnp.uint64(1 << 63)  # E2 < k*2^64, no overflow
    _, c3 = mm.add_u64_carry(s_lo, w_hi)
    m_int = s_hi + c3
    return mm.barrett_reduce_u64(m_int, c.t, c.t_ratio_hi)


class PlainLiftConsts(NamedTuple):
    """Constants for BFV's scaled plaintext embedding round(Q*m/t) mod q_i.

    Writing Q = Delta*t + r_t:  round(Q*m/t) = Delta*m + round(r_t*m/t).
    Reference counterpart: multiply_add_plain_with_scaling_variant
    (src/scalingvariant.cu:10).
    """

    base: ModulusVec
    delta_mod_q: jnp.ndarray        # (k,) Delta mod q_i
    delta_shoup: jnp.ndarray        # (k,)
    r_t: jnp.ndarray                # () Q mod t
    t: jnp.ndarray                  # ()
    t_half: jnp.ndarray             # () floor(t/2)
    t_ratio_lo: jnp.ndarray
    t_ratio_hi: jnp.ndarray


def make_plain_lift_consts(base, t: int) -> PlainLiftConsts:
    from ..host.modulus import compute_shoup
    assert t < min(base.moduli), "require t < q_i (fix term must be reduced)"
    delta = base.prod // t
    r_t = base.prod - delta * t
    dmod = [delta % q for q in base.moduli]
    ratio = (1 << 128) // t
    return PlainLiftConsts(
        base=modulus_vec(base.moduli),
        delta_mod_q=jnp.asarray(to_u64_array(dmod)),
        delta_shoup=jnp.asarray(to_u64_array(
            [compute_shoup(d, q) for d, q in zip(dmod, base.moduli)])),
        r_t=jnp.uint64(r_t),
        t=jnp.uint64(t),
        t_half=jnp.uint64(t // 2),
        t_ratio_lo=jnp.uint64(ratio & ((1 << 64) - 1)),
        t_ratio_hi=jnp.uint64(ratio >> 64),
    )


def scale_plain_up(m: jnp.ndarray, c: PlainLiftConsts) -> jnp.ndarray:
    """m: (N,) plaintext coefficients in [0, t) -> (k, N) round(Q*m/t) mod q_i."""
    q = c.base.q[:, None]
    # fix = round(r_t * m / t) = floor((r_t*m + floor(t/2)) / t), exact
    h, l = mm.mul_wide(m, c.r_t)
    l2, cr = mm.add_u64_carry(l, c.t_half * jnp.ones_like(l))
    h2 = h + cr
    fix, _ = mm.barrett_div_mod_u128(h2, l2, c.t, c.t_ratio_lo, c.t_ratio_hi)
    main = mm.mul_mod_shoup(m[None, :], c.delta_mod_q[:, None],
                            c.delta_shoup[:, None], q)
    # fix < t <= q_i is already reduced mod q_i
    return mm.add_mod(main, fix[None, :] * jnp.ones_like(main), q)


def scale_and_round_hps_to_r(x_d: jnp.ndarray, hps) -> jnp.ndarray:
    """round((t/Ql) * x) : base D = Ql u Rl -> base Rl, unconditionally exact.

    The v-free construction (t*Rl == 0 mod r_j) — see ExactScaleRoundConsts.
    Reference counterpart: scaleAndRound_HPS_QlRl_Ql (src/rns.cu:1789),
    which relies on double-precision rationals; this path is exact."""
    return scale_and_round_exact(x_d, hps.sr_to_r)


def scale_and_round_hps(x_d: jnp.ndarray, hps) -> jnp.ndarray:
    """round((t/Ql) * x) : base D -> base Ql (via exact Rl intermediate).

    Tensor-product coefficients are *signed* (negacyclic wrap), so the Rl
    residues of W = round(t*x/Ql) are interpreted centered: with
    |W| < n*t*Ql << Rl/2, shift by H = (Rl-1)/2, exact-convert the
    non-negative value W + H in [0, Rl), and unshift mod q_j.
    (Reference: the QlRl->Ql path of scaleAndRound_HPS, rns.cu:1789.)"""
    from . import bconv as bc
    w_r = scale_and_round_hps_to_r(x_d, hps)
    shifted = mm.add_mod(w_r, hps.rl_half_mod_r[:, None],
                         hps.sr_to_r.obase.q[:, None])
    conv = bc.bconv_exact(shifted, hps.r_to_q)
    return mm.sub_mod(conv, hps.rl_half_mod_q[:, None],
                      hps.r_to_q.obase.q[:, None])


class ExactScaleRoundConsts(NamedTuple):
    """Generic exact round((num/den) * x) : ibase -> obase, v-free.

    Requires obase_j | G where G = num * prod(ibase) / den, which makes the
    CRT-overshoot term v*G vanish mod every output prime — the construction
    behind both the HPS tensor scale-down (t/Ql : QlRl -> Rl) and the
    leveled HPS input scale-down (Ql/Q : Q -> Ql).
    """

    ibase: ModulusVec
    ihat_inv: jnp.ndarray        # (k_in,) (I/d_i)^{-1} mod d_i
    ihat_inv_shoup: jnp.ndarray
    omega_mod_out: jnp.ndarray   # (k_out, k_in) floor(G/d_i) mod out_j
    rho: jnp.ndarray             # (k_in,) G mod d_i
    obase: ModulusVec
    pow64_mod_out: jnp.ndarray   # (k_out,)


def make_exact_scale_round(in_moduli, num: int, den: int,
                           out_moduli) -> ExactScaleRoundConsts:
    from ..host.rns import RNSBase
    ibase = RNSBase(list(in_moduli))
    assert ibase.prod % den == 0, "den must divide prod(ibase)"
    G = num * (ibase.prod // den)
    for p in out_moduli:
        assert G % p == 0, "output primes must divide num*prod(I)/den"
    omega = [G // d for d in in_moduli]
    rho = [G - w * d for w, d in zip(omega, in_moduli)]
    return ExactScaleRoundConsts(
        ibase=modulus_vec(list(in_moduli)),
        ihat_inv=jnp.asarray(to_u64_array(ibase.qhat_inv_mod_qi)),
        ihat_inv_shoup=jnp.asarray(to_u64_array(ibase.qhat_inv_shoup)),
        omega_mod_out=jnp.asarray(np.array(
            [[w % p for w in omega] for p in out_moduli], dtype=np.uint64)),
        rho=jnp.asarray(to_u64_array(rho)),
        obase=modulus_vec(list(out_moduli)),
        pow64_mod_out=jnp.asarray(
            to_u64_array([(1 << 64) % p for p in out_moduli])),
    )


def scale_and_round_exact(x: jnp.ndarray,
                          c: ExactScaleRoundConsts) -> jnp.ndarray:
    """x: (k_in, N) residues -> (k_out, N) residues of round((num/den)*x).

    Same 128-bit-matmul + two-level-Barrett structure as
    scale_and_round_hps_to_r, for any (num, den) satisfying the v-free
    condition (see ExactScaleRoundConsts)."""
    from . import bconv as bc

    k_in, n = x.shape
    d_q = c.ibase.q[:, None]
    d_rlo = c.ibase.ratio_lo[:, None]
    d_rhi = c.ibase.ratio_hi[:, None]
    y = mm.mul_mod_shoup(x, c.ihat_inv[:, None], c.ihat_inv_shoup[:, None],
                         d_q)
    hi, lo = bc._accumulate(y, c.omega_mod_out)
    out_q = c.obase.q[:, None]
    out_rlo = c.obase.ratio_lo[:, None]
    out_rhi = c.obase.ratio_hi[:, None]
    pow64 = c.pow64_mod_out[:, None]
    int_part = bc.reduce_u128_any(hi, lo, out_q, out_rlo, out_rhi, pow64)

    ph, plv = mm.mul_wide(y, c.rho[:, None])
    g, r = mm.barrett_div_mod_u128(ph, plv, d_q, d_rlo, d_rhi)
    f2, _ = mm.barrett_div_mod_u128(r, jnp.zeros_like(r), d_q, d_rlo, d_rhi)
    g_hi = jnp.zeros((n,), dtype=jnp.uint64)
    g_lo = jnp.zeros((n,), dtype=jnp.uint64)
    e_hi = jnp.zeros((n,), dtype=jnp.uint64)
    e_lo = jnp.zeros((n,), dtype=jnp.uint64)
    for i in range(k_in):
        g_lo, cr = mm.add_u64_carry(g_lo, g[i])
        g_hi = g_hi + cr
        e_lo, cr = mm.add_u64_carry(e_lo, f2[i])
        e_hi = e_hi + cr
    _, c3 = mm.add_u64_carry(e_lo, jnp.uint64(1 << 63) * jnp.ones_like(e_lo))
    g_lo, cr = mm.add_u64_carry(g_lo, e_hi + c3)
    g_hi = g_hi + cr
    frac_part = bc.reduce_u128_any(g_hi[None, :], g_lo[None, :], out_q,
                                   out_rlo, out_rhi, pow64)
    return mm.add_mod(int_part, frac_part, out_q)
