"""RNS fast base conversion on device (XLA path).

TPU-native re-design of the reference's base-conversion kernels
(src/rns_bconv.cu): the O(k_in * k_out * N) multiply-accumulate is expressed
as a lax.scan over input limbs with a 128-bit (hi, lo) accumulator — the
structure XLA needs to software-pipeline it; the Pallas/MXU version drops in
behind the same interface.

The reference corrects the base-conversion overshoot v = floor(sum y_i/q_i)
with double-precision arithmetic (bConv_HPS, rns_bconv.cu:354).  Here v is
computed exactly in integer arithmetic using 2^64 = U_i*q_i + V_i and exact
Barrett division — see floor_sum_div — with residual error < k*2^-64 (vs the
reference's 2^-52 double error), making this path strictly more accurate.

All functions take (k_in, N) residue tensors (vmap for extra batch dims).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import modmath as mm
from .rns_host import ModulusVec, modulus_vec, to_u64_array


class BaseConvConsts(NamedTuple):
    """Device constants for one ibase -> obase conversion.

    Equivalent of the reference's DBaseConverter (include/rns_bconv.cuh:3-87).
    """

    ibase: ModulusVec              # (k_in,)
    obase: ModulusVec              # (k_out,)
    qhat_inv: jnp.ndarray          # (k_in,)  (Q/q_i)^{-1} mod q_i
    qhat_inv_shoup: jnp.ndarray    # (k_in,)
    qhat_mod_p: jnp.ndarray        # (k_out, k_in)
    q_mod_p: jnp.ndarray           # (k_out,)
    pow64_mod_p: jnp.ndarray       # (k_out,) 2^64 mod p_j
    U: jnp.ndarray                 # (k_in,) floor(2^64/q_i)
    V: jnp.ndarray                 # (k_in,) 2^64 mod q_i


def consts_from_host(conv) -> BaseConvConsts:
    """Build device constants from a host BaseConverter (host/rns.py)."""
    ib, ob = conv.ibase, conv.obase
    return BaseConvConsts(
        ibase=modulus_vec(ib.moduli),
        obase=modulus_vec(ob.moduli),
        qhat_inv=jnp.asarray(to_u64_array(ib.qhat_inv_mod_qi)),
        qhat_inv_shoup=jnp.asarray(to_u64_array(ib.qhat_inv_shoup)),
        qhat_mod_p=jnp.asarray(
            np.array(conv.qhat_mod_p, dtype=np.uint64).reshape(
                ob.size, ib.size)),
        q_mod_p=jnp.asarray(to_u64_array(conv.q_mod_p)),
        pow64_mod_p=jnp.asarray(to_u64_array(conv.pow64_mod_p)),
        U=jnp.asarray(to_u64_array(ib.U)),
        V=jnp.asarray(to_u64_array(ib.V)),
    )


def accumulate_matmul_128(y: jnp.ndarray, mat: jnp.ndarray):
    """sum_i y[i, :] * mat[:, i] with an exact 128-bit accumulator.

    y: (k_in, N) values < 2^61; mat: (k_out, k_in) values < 2^61.
    Returns (hi, lo) of shape (k_out, N).  Exact for k_in <= 63
    (63 * 2^122 < 2^128); the framework's bases never exceed this
    (reference bound: 64 primes, defines.h:4-28).
    """
    k_in, n = y.shape
    k_out = mat.shape[0]
    assert mat.shape[1] == k_in and k_in <= 63
    init = (jnp.zeros((k_out, n), dtype=jnp.uint64),
            jnp.zeros((k_out, n), dtype=jnp.uint64))

    def body(acc, inp):
        hi, lo = acc
        yi, mi = inp  # (N,), (k_out,)
        h, l = mm.mul_wide(yi[None, :], mi[:, None])
        return mm.add_wide(hi, lo, h, l), None

    (hi, lo), _ = jax.lax.scan(body, init, (y, mat.T), unroll=4)
    return hi, lo


def reduce_u128_any(x_hi, x_lo, p, ratio_lo, ratio_hi, pow64_mod_p):
    """(x_hi*2^64 + x_lo) mod p for ARBITRARY 128-bit x and any p < 2^61.

    Unlike barrett_reduce_u128 (which needs x < p*2^64), this works for small
    output primes (e.g. the plain modulus t) by reducing the high word first.
    """
    hi_red = mm.barrett_reduce_u64(x_hi, p, ratio_hi)
    lo_red = mm.barrett_reduce_u64(x_lo, p, ratio_hi)
    hi_term = mm.mul_mod(hi_red, pow64_mod_p, p, ratio_lo, ratio_hi)
    return mm.add_mod(hi_term, lo_red, p)


def scale_by_qhat_inv(x: jnp.ndarray, c: BaseConvConsts) -> jnp.ndarray:
    """y_i = [x_i * (Q/q_i)^{-1}]_{q_i} — the bconv entry multiply.

    Reference: bconv_mult_kernel (src/rns_bconv.cu:22).
    """
    return mm.mul_mod_shoup(x, c.qhat_inv[:, None], c.qhat_inv_shoup[:, None],
                            c.ibase.q[:, None])


def floor_sum_div_arrays(y: jnp.ndarray, mv: ModulusVec, U: jnp.ndarray,
                         V: jnp.ndarray) -> jnp.ndarray:
    """v = floor(sum_i y_i / q_i) computed in exact 2^-128 fixed point.

    Two cascaded fixed-point levels: with 2^64 = U*q + V,
      y*2^64 = (y*U + q1)*q + r1,   q1, r1 = divmod(y*V, q)   (exact)
      r1*2^64 = s2*q + r2,          s2 = floor(r1*2^64/q)      (exact)
    so  sum y_i/q_i = (S1*2^64 + S2 + e)/2^128 with S1 = sum(y*U + q1),
    S2 = sum s2, 0 <= e < k.  v is the >>128 word; the truncation error e
    flips the floor only when the true fractional part is below k*2^-128 —
    cryptographically negligible, and strictly tighter than the reference's
    double-based (2^-52) correction in bConv_HPS (rns_bconv.cu:354).
    Returns (N,) uint64 (values < k_in).
    """
    k_in, n = y.shape
    q = mv.q[:, None]
    rlo = mv.ratio_lo[:, None]
    rhi = mv.ratio_hi[:, None]
    yU = y * U[:, None]                                # < 2^64, exact mod 2^64
    h, l = mm.mul_wide(y, V[:, None])                  # y*V < 2^122
    q1, r1 = mm.barrett_div_mod_u128(h, l, q, rlo, rhi)
    s2, _ = mm.barrett_div_mod_u128(r1, jnp.zeros_like(r1), q, rlo, rhi)

    s1_hi = jnp.zeros((n,), dtype=jnp.uint64)
    s1_lo = jnp.zeros((n,), dtype=jnp.uint64)
    s2_hi = jnp.zeros((n,), dtype=jnp.uint64)
    s2_lo = jnp.zeros((n,), dtype=jnp.uint64)
    for i in range(k_in):  # unrolled: k_in is small and static
        s1_lo, cr = mm.add_u64_carry(s1_lo, yU[i])
        s1_hi = s1_hi + cr
        s1_lo, cr = mm.add_u64_carry(s1_lo, q1[i])
        s1_hi = s1_hi + cr
        s2_lo, cr = mm.add_u64_carry(s2_lo, s2[i])
        s2_hi = s2_hi + cr
    # v = (S1<<64 + S2) >> 128 = S1_hi + carry(S1_lo + S2_hi)
    _, cr = mm.add_u64_carry(s1_lo, s2_hi)
    return s1_hi + cr


def floor_sum_div(y: jnp.ndarray, c: BaseConvConsts) -> jnp.ndarray:
    return floor_sum_div_arrays(y, c.ibase, c.U, c.V)


def bconv_approx(x: jnp.ndarray, c: BaseConvConsts) -> jnp.ndarray:
    """Approximate (BEHZ-style) fast base conversion: output carries a
    +alpha*Q overshoot with alpha <= k_in.

    x: (k_in, N) residues in ibase -> (k_out, N) residues in obase.
    Reference: bConv_BEHZ (src/rns_bconv.cu:212).
    """
    y = scale_by_qhat_inv(x, c)
    return _matmul_reduce(y, c)


def _matmul_reduce(y: jnp.ndarray, c: BaseConvConsts) -> jnp.ndarray:
    hi, lo = _accumulate(y, c.qhat_mod_p)
    p = c.obase.q[:, None]
    return reduce_u128_any(hi, lo, p, c.obase.ratio_lo[:, None],
                           c.obase.ratio_hi[:, None], c.pow64_mod_p[:, None])


def bconv_exact(x: jnp.ndarray, c: BaseConvConsts) -> jnp.ndarray:
    """Corrected fast base conversion (reference bConv_HPS semantics,
    src/rns_bconv.cu:354, but with the exact integer v).

    Computes [x mod Q]_{p_j} exactly (up to the < k*2^-64 v-boundary case).
    """
    y = scale_by_qhat_inv(x, c)
    raw = _matmul_reduce(y, c)
    v = floor_sum_div(y, c)
    p = c.obase.q[:, None]
    corr = mm.mul_mod(v[None, :], c.q_mod_p[:, None], p,
                      c.obase.ratio_lo[:, None], c.obase.ratio_hi[:, None])
    return mm.sub_mod(raw, corr, p)


def accumulate_matmul_128_mxu(y: jnp.ndarray, mat: jnp.ndarray):
    """MXU-friendly exact 128-bit accumulate matmul.

    Same contract as accumulate_matmul_128, but the u64 x u64 MACs are
    decomposed into 8-bit planes and computed as int32-accumulated dot
    products that XLA tiles onto the MXU (SURVEY.md §2: "bconv as int
    matmul on the MXU"):

        out = sum_s 2^(8s) * P_s,   P_s = sum_{a+b=s} M_a @ Y_b

    with Y_b, M_a the b-th/a-th byte planes.  Each P_s entry is
    < 256^2 * k_in * 8 < 2^28 (k_in <= 63), so int32 accumulation is exact;
    the 15 diagonal partial sums are recombined into an exact (hi, lo)
    uint64 pair with 128-bit carries.
    """
    k_in, n = y.shape
    k_out = mat.shape[0]
    assert mat.shape[1] == k_in and k_in <= 63

    def bytes_of(x, planes):
        # (planes, ...) uint8-valued int32 arrays, little-endian
        return [((x >> jnp.uint64(8 * b)) & jnp.uint64(0xFF)).astype(jnp.int32)
                for b in range(planes)]

    yb = bytes_of(y, 8)          # 8 x (k_in, N)
    mb = bytes_of(mat, 8)        # 8 x (k_out, k_in)

    # diagonal partial sums P_s, s in [0, 15)
    partials = []
    for s_idx in range(15):
        acc = None
        for a in range(max(0, s_idx - 7), min(8, s_idx + 1)):
            b = s_idx - a
            term = jax.lax.dot_general(
                mb[a], yb[b], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = term if acc is None else acc + term
        partials.append(acc.astype(jnp.uint64))

    # recombine: out = sum_s P_s << (8 s), exact over 128 bits
    hi = jnp.zeros((k_out, n), dtype=jnp.uint64)
    lo = jnp.zeros((k_out, n), dtype=jnp.uint64)
    for s_idx, p in enumerate(partials):
        shift = 8 * s_idx
        if shift < 64:
            p_lo = p << jnp.uint64(shift)
            p_hi = p >> jnp.uint64(64 - shift) if shift else jnp.zeros_like(p)
        else:
            p_lo = jnp.zeros_like(p)
            p_hi = p << jnp.uint64(shift - 64)
        hi, lo = mm.add_wide(hi, lo, p_hi, p_lo)
    return hi, lo


# Route the bconv matmuls through the MXU path?  None = auto (TPU yes,
# CPU no — int8 dots on CPU are slower than the scan).
USE_MXU_MATMUL = None


def _accumulate(y, mat):
    use = USE_MXU_MATMUL
    if use is None:
        use = jax.default_backend() not in ("cpu",)
    if use:
        return accumulate_matmul_128_mxu(y, mat)
    return accumulate_matmul_128(y, mat)
