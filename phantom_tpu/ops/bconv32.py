"""RNS base conversion on the 32-bit fast path (q < 2^30).

Mirrors ops/bconv.py with single-u32 residues: products are (hi, lo) u32
pairs, the matmul accumulates into a (carry, hi, lo) u32 triple (exact for
<= 63 input limbs: 63 * 2^60 < 2^66 < 2^96), and the floor-sum-div uses a
three-level 2^32 cascade (error < k * 2^-96, still far tighter than the
reference's 2^-52 doubles — rns_bconv.cu:354).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import modmath32 as m32
from .modmath32 import U32


class ModulusVec32(NamedTuple):
    q: jnp.ndarray          # (L,) uint32, q < 2^30
    ratio_hi: jnp.ndarray   # (L,) floor(2^64/q) >> 32
    ratio_lo: jnp.ndarray   # (L,) floor(2^64/q) & 0xffffffff
    pow32: jnp.ndarray      # (L,) 2^32 mod q
    pow64: jnp.ndarray      # (L,) 2^64 mod q


def modulus_vec32(moduli) -> ModulusVec32:
    qs = [int(q) for q in moduli]
    assert all(q < (1 << 30) for q in qs)
    rh, rl = zip(*[m32.ratio32(q) for q in qs])
    return ModulusVec32(
        q=jnp.asarray(np.array(qs, dtype=np.uint32)),
        ratio_hi=jnp.asarray(np.array(rh, dtype=np.uint32)),
        ratio_lo=jnp.asarray(np.array(rl, dtype=np.uint32)),
        pow32=jnp.asarray(np.array([(1 << 32) % q for q in qs],
                                   dtype=np.uint32)),
        pow64=jnp.asarray(np.array([(1 << 64) % q for q in qs],
                                   dtype=np.uint32)),
    )


class BaseConvConsts32(NamedTuple):
    ibase: ModulusVec32
    obase: ModulusVec32
    qhat_inv: jnp.ndarray        # (k_in,)
    qhat_inv_shoup: jnp.ndarray  # (k_in,) 2^32 fixed point
    qhat_mod_p: jnp.ndarray      # (k_out, k_in)
    q_mod_p: jnp.ndarray         # (k_out,)
    U: jnp.ndarray               # (k_in,) floor(2^32/q)
    V: jnp.ndarray               # (k_in,) 2^32 mod q
    # (k_out, 57) powers 2^e mod p + Shoup companions: the MXU digit-plane
    # matmul folds each diagonal partial with 2^(bits*d) directly (sliced
    # statically per radix) instead of the 96-bit triple + Barrett
    pow2: jnp.ndarray = None
    pow2_shoup: jnp.ndarray = None


def consts32_from_host(conv) -> BaseConvConsts32:
    """From a host BaseConverter (host/rns.py) with < 2^30 moduli."""
    ib, ob = conv.ibase, conv.obase
    u32a = lambda v: jnp.asarray(np.array([int(x) for x in v],
                                          dtype=np.uint32))
    pw, pw_sh = pow2_tables(ob.moduli)
    return BaseConvConsts32(
        ibase=modulus_vec32(ib.moduli),
        obase=modulus_vec32(ob.moduli),
        qhat_inv=u32a(ib.qhat_inv_mod_qi),
        qhat_inv_shoup=u32a([(v << 32) // q for v, q in
                             zip(ib.qhat_inv_mod_qi, ib.moduli)]),
        qhat_mod_p=jnp.asarray(np.array(conv.qhat_mod_p,
                                        dtype=np.uint32)),
        q_mod_p=u32a(conv.q_mod_p),
        U=u32a([(1 << 32) // q for q in ib.moduli]),
        V=u32a([(1 << 32) % q for q in ib.moduli]),
        pow2=pw,
        pow2_shoup=pw_sh,
    )


def accumulate_matmul_96(y: jnp.ndarray, mat: jnp.ndarray):
    """sum_i y[i, :] * mat[:, i] as an exact (carry, hi, lo) u32 triple.

    y: (k_in, ...) any trailing data shape, mat: (k_out, k_in),
    entries < 2^30."""
    k_in = y.shape[0]
    rest = y.shape[1:]
    k_out = mat.shape[0]
    mb = (slice(None),) + (None,) * len(rest)
    c = jnp.zeros((k_out,) + rest, dtype=jnp.uint32)
    hi = jnp.zeros((k_out,) + rest, dtype=jnp.uint32)
    lo = jnp.zeros((k_out,) + rest, dtype=jnp.uint32)
    for i in range(k_in):
        h, l = m32.mul_wide32(y[i][None], mat[:, i][mb])
        lo, cr = m32.add_u32_carry(lo, l)
        hi2, cr2 = m32.add_u32_carry(hi, h + cr)  # h < 2^28, no overflow
        hi = hi2
        c = c + cr2
    return c, hi, lo


def reduce_u96_any32(c, hi, lo, mv: ModulusVec32):
    """(c*2^64 + hi*2^32 + lo) mod q_j, per output row (broadcast consts)."""
    bb = (slice(None),) + (None,) * (c.ndim - 1)
    q = mv.q[bb]
    rh = mv.ratio_hi[bb]
    rl = mv.ratio_lo[bb]
    t_c = m32.mul_mod32(m32.barrett_reduce_u32(c, q, rh), mv.pow64[bb],
                        q, rh, rl)
    t_h = m32.mul_mod32(m32.barrett_reduce_u32(hi, q, rh), mv.pow32[bb],
                        q, rh, rl)
    t_l = m32.barrett_reduce_u32(lo, q, rh)
    return m32.add_mod32(m32.add_mod32(t_c, t_h, q), t_l, q)


def scale_by_qhat_inv32(x: jnp.ndarray, c: BaseConvConsts32) -> jnp.ndarray:
    bb = (slice(None),) + (None,) * (x.ndim - 1)
    return m32.mul_mod_shoup32(x, c.qhat_inv[bb],
                               c.qhat_inv_shoup[bb], c.ibase.q[bb])


def bconv_approx32(x: jnp.ndarray, c: BaseConvConsts32) -> jnp.ndarray:
    y = scale_by_qhat_inv32(x, c)
    return _accumulate_reduce32(y, c.qhat_mod_p, c.obase, c.pow2,
                                c.pow2_shoup)


def matmul_reduce32(y: jnp.ndarray, c: BaseConvConsts32) -> jnp.ndarray:
    """The bconv matmul + reduction on *pre-scaled* y (x * QhatInv already
    applied, e.g. fused into an inverse NTT — reference: ntt_modup.cu)."""
    return _accumulate_reduce32(y, c.qhat_mod_p, c.obase, c.pow2,
                                c.pow2_shoup)


def floor_sum_div32(y: jnp.ndarray, c: BaseConvConsts32) -> jnp.ndarray:
    """v = floor(sum y_i / q_i), three-level 2^32 cascade (error 2^-96).
    y: (k_in, ...) — any trailing data shape (flat N or blocked n1 x n2)."""
    k_in = y.shape[0]
    rest = y.shape[1:]
    bc = (slice(None),) + (None,) * len(rest)
    q = c.ibase.q[bc]
    rh = c.ibase.ratio_hi[bc]
    rl = c.ibase.ratio_lo[bc]
    yU = y * c.U[bc]
    h, l = m32.mul_wide32(y, c.V[bc])
    q1, r1 = m32.barrett_div_mod_u64_32(h, l, q, rh, rl)
    s2, r2 = m32.barrett_div_mod_u64_32(r1, jnp.zeros_like(r1), q, rh, rl)
    s3, _ = m32.barrett_div_mod_u64_32(r2, jnp.zeros_like(r2), q, rh, rl)

    a_hi = jnp.zeros(rest, dtype=jnp.uint32)
    a_lo = jnp.zeros(rest, dtype=jnp.uint32)
    b_hi = jnp.zeros(rest, dtype=jnp.uint32)
    b_lo = jnp.zeros(rest, dtype=jnp.uint32)
    c_hi = jnp.zeros(rest, dtype=jnp.uint32)
    c_lo = jnp.zeros(rest, dtype=jnp.uint32)
    for i in range(k_in):
        a_lo, cr = m32.add_u32_carry(a_lo, yU[i])
        a_hi = a_hi + cr
        a_lo, cr = m32.add_u32_carry(a_lo, q1[i])
        a_hi = a_hi + cr
        b_lo, cr = m32.add_u32_carry(b_lo, s2[i])
        b_hi = b_hi + cr
        c_lo, cr = m32.add_u32_carry(c_lo, s3[i])
        c_hi = c_hi + cr
    # v = (A*2^64 + B*2^32 + C) >> 96: ripple the word carries upward
    p1, cr1 = m32.add_u32_carry(b_lo, c_hi)
    p2, cr2 = m32.add_u32_carry(a_lo, b_hi + cr1)
    return a_hi + cr2


def bconv_exact32(x: jnp.ndarray, c: BaseConvConsts32) -> jnp.ndarray:
    """Value-exact conversion (reference bConv_HPS semantics)."""
    y = scale_by_qhat_inv32(x, c)
    raw = _accumulate_reduce32(y, c.qhat_mod_p, c.obase, c.pow2,
                               c.pow2_shoup)
    v = floor_sum_div32(y, c)
    bb = (slice(None),) + (None,) * (x.ndim - 1)
    q = c.obase.q[bb]
    corr = m32.mul_mod32(v[None], c.q_mod_p[bb], q,
                         c.obase.ratio_hi[bb], c.obase.ratio_lo[bb])
    return m32.sub_mod32(raw, corr, q)


# None = auto: 7-bit int8 planes on TPU (native int8 MXU mode), 8-bit
# int32 planes elsewhere.  Both exact and bit-identical.
MXU_PLANE_BITS = None


def _mxu_plane_bits() -> int:
    import jax
    if MXU_PLANE_BITS is not None:
        return MXU_PLANE_BITS
    return 7 if jax.default_backend() == "tpu" else 8


def accumulate_matmul_96_mxu(y: jnp.ndarray, mat: jnp.ndarray):
    """MXU variant of accumulate_matmul_96: digit-plane dots (radix 2^7
    int8 for the native int8 MXU mode, or radix 2^8 int32 — see
    ops/bconv.py accumulate_matmul_128_mxu), recombined into the
    (carry, hi, lo) u32 triple.  Exact: partials < (2^b-1)^2 * k * P
    < 2^31 for k <= 63 input limbs."""
    import jax
    k_in = y.shape[0]
    rest = y.shape[1:]   # flat (N,) or blocked (n1, n2)
    k_out = mat.shape[0]
    bits = _mxu_plane_bits()
    nplanes = -(-32 // bits)
    mask = U32((1 << bits) - 1)
    pdt = jnp.int8 if bits <= 7 else jnp.int32

    def planes_of(x):
        return [((x >> U32(bits * b)) & mask).astype(pdt)
                for b in range(nplanes)]

    yb = planes_of(y)
    mb = planes_of(mat)
    partials = []
    for s_idx in range(2 * nplanes - 1):
        acc = None
        for a in range(max(0, s_idx - nplanes + 1), min(nplanes, s_idx + 1)):
            b = s_idx - a
            term = jax.lax.dot_general(
                mb[a], yb[b], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = term if acc is None else acc + term
        partials.append(acc.astype(jnp.uint32))

    c = jnp.zeros((k_out,) + rest, dtype=jnp.uint32)
    hi = jnp.zeros((k_out,) + rest, dtype=jnp.uint32)
    lo = jnp.zeros((k_out,) + rest, dtype=jnp.uint32)
    zero = jnp.zeros((k_out,) + rest, dtype=jnp.uint32)
    for s_idx, p_ in enumerate(partials):
        shift = bits * s_idx
        # split p * 2^shift into three u32 words (wrapping shifts keep the
        # low word; explicit >> recovers the spilled bits)
        if shift == 0:
            w0, w1, w2 = p_, zero, zero
        elif shift < 32:
            w0 = p_ << U32(shift)
            w1 = p_ >> U32(32 - shift)
            w2 = zero
        elif shift == 32:
            w0, w1, w2 = zero, p_, zero
        else:
            w0 = zero
            w1 = p_ << U32(shift - 32)
            w2 = p_ >> U32(64 - shift)
        lo, cr = m32.add_u32_carry(lo, w0)
        hi, cra = m32.add_u32_carry(hi, w1)
        hi, crb = m32.add_u32_carry(hi, cr)
        c = c + cra + crb + w2
    return c, hi, lo


# None = auto (accelerators yes, CPU no)
USE_MXU_MATMUL32 = None
# MXU path reduction strategy (mirror of ntt_mxu.FOLD_DIAGONALS):
# True = per-diagonal Shoup folds, False = (carry,hi,lo) triple
FOLD_DIAGONALS32 = True


def _use_mxu() -> bool:
    import jax
    use = USE_MXU_MATMUL32
    if use is None:
        use = jax.default_backend() not in ("cpu",)
    return use


def _accumulate32(y, mat):
    if _use_mxu():
        return accumulate_matmul_96_mxu(y, mat)
    return accumulate_matmul_96(y, mat)


def pow2_tables(moduli):
    """(k, 57) device tables of 2^e mod p + Shoup companions, the fold
    constants for every diagonal shift either plane radix produces."""
    po = np.array([int(p) for p in moduli], dtype=np.uint64)
    pw = np.array([[pow(2, e, int(p)) for e in range(57)]
                   for p in po], dtype=np.uint64)
    return (jnp.asarray(pw.astype(np.uint32)),
            jnp.asarray(((pw << np.uint64(32)) // po[:, None]
                         ).astype(np.uint32)))


def accumulate_fold32(y: jnp.ndarray, mat: jnp.ndarray, obase: ModulusVec32,
                      pow2: jnp.ndarray,
                      pow2_shoup: jnp.ndarray) -> jnp.ndarray:
    """MXU digit-plane matmul with per-diagonal Shoup folds: returns
    sum_i y[i,:] * mat[:,i] mod p directly in [0, p) — no 96-bit triple
    (mirror of ntt_mxu._fold_diagonals; operands < 2^30, k_in <= 63 so
    every int32 diagonal partial < 2^31, a valid Shoup input)."""
    import jax
    bits = _mxu_plane_bits()
    nplanes = -(-30 // bits)
    mask = U32((1 << bits) - 1)
    pdt = jnp.int8 if bits <= 7 else jnp.int32

    def planes_of(x):
        return [((x >> U32(bits * b)) & mask).astype(pdt)
                for b in range(nplanes)]

    yb = planes_of(y)
    mb = planes_of(mat)
    bb = (slice(None),) + (None,) * (y.ndim - 1)
    q = obase.q[bb]
    two_q = q * U32(2)
    partials = []
    for s_idx in range(2 * nplanes - 1):
        p_ = None
        for a in range(max(0, s_idx - nplanes + 1), min(nplanes, s_idx + 1)):
            term = jax.lax.dot_general(
                mb[a], yb[s_idx - a],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            p_ = term if p_ is None else p_ + term
        partials.append(p_)
    # pair adjacent diagonals into one u32 word when provably overflow-free
    # (mirror of ntt_mxu._fold_diagonals): halves the Shoup fold count
    max_partial = ((1 << bits) - 1) ** 2 * y.shape[0] * nplanes
    if max_partial * ((1 << bits) + 1) <= 0xFFFFFFFF:
        words = []
        for j in range(0, len(partials), 2):
            w = partials[j].astype(jnp.uint32)
            if j + 1 < len(partials):
                w = w + (partials[j + 1].astype(jnp.uint32) << U32(bits))
            words.append((w, j))
    else:
        words = [(p_.astype(jnp.uint32), j) for j, p_ in enumerate(partials)]
    acc = None
    for w, j in words:
        folded = m32.mul_mod_shoup_lazy32(
            w, pow2[:, bits * j][bb],
            pow2_shoup[:, bits * j][bb], q)
        acc = folded if acc is None else m32.csub32(acc + folded, two_q)
    return m32.csub32(acc, q)


def _accumulate_reduce32(y, mat, obase: ModulusVec32, pow2=None,
                         pow2_shoup=None) -> jnp.ndarray:
    """sum_i y[i,:] * mat[:,i] mod p over obase, via whichever accumulate
    path is active."""
    if pow2 is not None and y.ndim == 2:
        from . import bconv_pallas as bp
        n_ = y.shape[-1]
        if bp._enabled() and n_ % 128 == 0 and (n_ <= bp.BLOCK_N
                                                or n_ % bp.BLOCK_N == 0):
            return bp.fold_matmul_pallas(y, mat, obase, pow2, pow2_shoup,
                                         _mxu_plane_bits())
    if _use_mxu() and FOLD_DIAGONALS32 and pow2 is not None:
        return accumulate_fold32(y, mat, obase, pow2, pow2_shoup)
    cc, hh, ll = _accumulate32(y, mat)
    return reduce_u96_any32(cc, hh, ll, obase)
