"""Exact scale-and-round on the 32-bit fast path (q, t < 2^30).

u32 mirror of ops/scaleround.py: round((num/den) * x) : ibase -> obase with
the v-free construction (obase_j | G = num*prod(I)/den), evaluated entirely
in uint32 words.  The integer part is the (k_out, k_in) omega matmul (MXU
int8 path available via bconv32._accumulate32); the fractional part uses a
three-level 2^32 fixed-point cascade (error < k * 2^-96 vs the reference's
2^-52 doubles — scaleAndRound_HPS_QlRl_Ql, src/rns.cu:1789).

Bit-identical to scaleround.scale_and_round_exact on the same inputs (both
are exact); tested so in tests/test_bfv32.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import bconv32 as bc32
from . import modmath32 as m32
from .bconv32 import ModulusVec32, modulus_vec32


class ExactScaleRound32(NamedTuple):
    """u32 tables for exact round((num/den)*x) : ibase -> obase.

    Mirrors scaleround.ExactScaleRoundConsts; see there for the algebra.
    """

    ibase: ModulusVec32
    ihat_inv: jnp.ndarray        # (k_in,)
    ihat_inv_shoup: jnp.ndarray  # (k_in,) 2^32 fixed point
    omega_mod_out: jnp.ndarray   # (k_out, k_in) floor(G/d_i) mod out_j
    rho: jnp.ndarray             # (k_in,) G mod d_i (< d_i < 2^30)
    obase: ModulusVec32
    # (k_out, 57) fold constants for the MXU digit-plane matmul
    pow2: jnp.ndarray = None
    pow2_shoup: jnp.ndarray = None


def make_exact_scale_round32(in_moduli, num: int, den: int,
                             out_moduli) -> ExactScaleRound32:
    from ..host.rns import RNSBase
    ibase = RNSBase(list(in_moduli))
    assert ibase.prod % den == 0, "den must divide prod(ibase)"
    G = num * (ibase.prod // den)
    for p in out_moduli:
        assert G % p == 0, "output primes must divide num*prod(I)/den"
    omega = [G // d for d in in_moduli]
    rho = [G - w * d for w, d in zip(omega, in_moduli)]
    u32a = lambda v: jnp.asarray(np.array([int(x) for x in v],
                                          dtype=np.uint32))
    pw, pw_sh = bc32.pow2_tables(out_moduli)
    return ExactScaleRound32(
        ibase=modulus_vec32(list(in_moduli)),
        ihat_inv=u32a(ibase.qhat_inv_mod_qi),
        ihat_inv_shoup=u32a([(v << 32) // q for v, q in
                             zip(ibase.qhat_inv_mod_qi, ibase.moduli)]),
        omega_mod_out=jnp.asarray(np.array(
            [[w % p for w in omega] for p in out_moduli], dtype=np.uint32)),
        rho=u32a(rho),
        obase=modulus_vec32(list(out_moduli)),
        pow2=pw,
        pow2_shoup=pw_sh,
    )


def scale_and_round_exact32(x: jnp.ndarray,
                            c: ExactScaleRound32) -> jnp.ndarray:
    """x: (k_in, N) u32 residues -> (k_out, N) round((num/den)*x) residues.

    Integer words via the exact u96-triple matmul; fractional correction
    F = round(sum_i y_i*rho_i/d_i) via three 2^32 fixed-point levels.
    """
    k_in = x.shape[0]
    rest = x.shape[1:]   # flat (N,) or blocked (n1, n2)
    bb = (slice(None),) + (None,) * len(rest)
    d_q = c.ibase.q[bb]
    d_rh = c.ibase.ratio_hi[bb]
    d_rl = c.ibase.ratio_lo[bb]
    y = m32.mul_mod_shoup32(x, c.ihat_inv[bb], c.ihat_inv_shoup[bb],
                            d_q)
    int_part = bc32._accumulate_reduce32(y, c.omega_mod_out, c.obase,
                                         c.pow2, c.pow2_shoup)

    # frac: y_i * rho_i = g_i * d_i + r_i (exact u64 divmod), then refine
    # r_i/d_i three more 2^32 fixed-point levels:
    #   r_i/d_i = f2_i/2^32 + f3_i/2^64 + f4_i/2^96 + eps_i/2^96, eps_i < 1
    ph, pl = m32.mul_wide32(y, c.rho[bb])
    g, r = m32.barrett_div_mod_u64_32(ph, pl, d_q, d_rh, d_rl)
    f2, r2 = m32.barrett_div_mod_u64_32(r, jnp.zeros_like(r), d_q, d_rh, d_rl)
    f3, r3 = m32.barrett_div_mod_u64_32(r2, jnp.zeros_like(r2), d_q, d_rh,
                                        d_rl)
    f4, _ = m32.barrett_div_mod_u64_32(r3, jnp.zeros_like(r3), d_q, d_rh,
                                       d_rl)

    # G1 = sum g_i (u64 pair); E2/E3/E4 = per-level sums (u64 pairs)
    g_hi = jnp.zeros(rest, dtype=jnp.uint32)
    g_lo = jnp.zeros(rest, dtype=jnp.uint32)
    e2_hi = jnp.zeros(rest, dtype=jnp.uint32)
    e2_lo = jnp.zeros(rest, dtype=jnp.uint32)
    e3_hi = jnp.zeros(rest, dtype=jnp.uint32)
    e3_lo = jnp.zeros(rest, dtype=jnp.uint32)
    e4_hi = jnp.zeros(rest, dtype=jnp.uint32)
    e4_lo = jnp.zeros(rest, dtype=jnp.uint32)
    for i in range(k_in):
        g_lo, cr = m32.add_u32_carry(g_lo, g[i])
        g_hi = g_hi + cr
        e2_lo, cr = m32.add_u32_carry(e2_lo, f2[i])
        e2_hi = e2_hi + cr
        e3_lo, cr = m32.add_u32_carry(e3_lo, f3[i])
        e3_hi = e3_hi + cr
        e4_lo, cr = m32.add_u32_carry(e4_lo, f4[i])
        e4_hi = e4_hi + cr
    # F_add = floor((E2*2^64 + E3*2^32 + E4 + 2^95) / 2^96): assemble the
    # 128-bit numerator words v0..v3 (v_i = bits [32i, 32i+32)) and keep v3
    t1, c1 = m32.add_u32_carry(e3_lo, e4_hi)               # v1 (no carry-in)
    t2a, c2a = m32.add_u32_carry(e2_lo, e3_hi)
    t2b, c2b = m32.add_u32_carry(t2a, jnp.full_like(t2a, m32.U32(1 << 31))
                                 + c1)                     # v2 + 2^95 bit
    f_add = e2_hi + c2a + c2b                              # v3 = F_add < k+1
    f_lo, cr3 = m32.add_u32_carry(g_lo, f_add)
    f_hi = g_hi + cr3
    frac_part = bc32.reduce_u96_any32(jnp.zeros((1,) + rest,
                                                dtype=jnp.uint32),
                                      f_hi[None], f_lo[None], c.obase)
    return m32.add_mod32(int_part, frac_part,
                         c.obase.q[(slice(None),) + (None,) * len(rest)])
