"""Fused Pallas kernel for the four-step MXU NTT ("mxu-pallas" engine).

Same math and tables as ops/ntt_mxu.py (digit-plane modular matmuls with
per-diagonal Shoup folds, reference counterpart fntt_2d.cu/intt_2d.cu),
but the whole per-limb transform runs inside ONE Pallas program: plane
extraction, the 2x ~16 int8 MXU dots, the paired-diagonal folds, the
twiddle product and the moddown/rescale epilogue never leave VMEM.  The
XLA formulation materializes every diagonal partial to HBM (~7 x 8 MB
per (32, N) matmul at N=65536 — the dominant cost of the headline step,
measured via benchmarks/profile_trace.py); here HBM sees one read of x,
one read of the limb's tables, one write of the result.

Mosaic-legality notes (hard-won; the retired reshape-butterfly engine
predated them): data blocks are rank-3 (1, n1, n2) so the trailing two dims span
the array (the block-shape rule demands multiples of (8, 128) or full
dims — Mosaic applies it to SMEM blocks too, so scalar/fold-constant
tables ride as FULL-array SMEM blocks indexed dynamically in-kernel by
the limb id); int8 table blocks (P, 1, m, k) satisfy the (32, 128) int8
tile; index maps use pure-i32 lax arithmetic (jnp's `%` emits an
i64-promoted remainder jaxpr under x64 that fails legalization); no
in-kernel reshape, stack or transpose anywhere.

Plane dots run as s8 x s8 -> s32 `dot_general` on the MXU by default;
set DOT_MODE = "bf16" if a Mosaic version rejects integer matmuls — the
bf16 x bf16 -> f32 form is exact while (2^bits - 1)^2 * contract < 2^24
(asserted) and converts back to i32 losslessly.

Bit-identical to ntt_mxu / ntt32 / the u64 engine on every path
(tests/test_ntt_mxu_pallas.py; interpret mode on CPU, Mosaic on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath32 as m32
from .modmath32 import U32, csub32, csub32_i31, mul_mod_shoup_lazy32
from .ntt_mxu import MXUNTTTables, _max_partial

# "int8": s8 dots with s32 accumulation (native MXU int8 mode).
# "bf16": bf16 dots with f32 accumulation (fallback; exact below 2^24).
# Env knobs for hardware-day bisection without code edits:
#   PHANTOM_DOT_MODE=bf16      if Mosaic rejects integer matmuls
#   PHANTOM_MODUP_IP=0         disable the modup+IP mega-kernel
import os as _os

# Mosaic requires i32 index-map returns; a Python 0 traces as weak i64 under
# jax_enable_x64 and fails to legalize (seen on hardware 2026-08-19)
_I0 = np.int32(0)
DOT_MODE = _os.environ.get("PHANTOM_DOT_MODE", "int8")

# Mosaic's default scoped-vmem budget is 16 MiB; the mega-kernel's resident
# y buffer + pipelined evk/table blocks need more at the headline config
# (L=28, N=2^16 wants ~18 MiB; seen on hardware 2026-08-19).  A v5e core
# has 128 MiB of VMEM — claim most of it for these single-kernel programs.
VMEM_LIMIT = int(_os.environ.get("PHANTOM_VMEM_LIMIT", 100 * 1024 * 1024))
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _i32(i):
    return jax.lax.convert_element_type(i, jnp.int32)


def _csub_for(q_bits: int):
    """Signed-compare csub when every lazy [0, 4q) intermediate provably
    stays below 2^31 (q_bits <= 29) — ~1.6x faster on the v5e VPU."""
    return csub32_i31 if q_bits <= 29 else csub32


def _mod(i, m: int):
    """i % m as pure-i32 lax.rem: jnp's `%` builds a remainder jaxpr with
    i64 constants under jax_enable_x64, which Mosaic's index-map
    legalization rejects (seen on hardware 2026-08-19)."""
    return jax.lax.rem(_i32(i), np.int32(m))


def _row(g, k: int, j):
    return _i32(g) * np.int32(k) + _i32(j)


def _plane_list(x, bits: int, value_bits: int):
    nplanes = -(-value_bits // bits)
    mask = U32((1 << bits) - 1)
    if DOT_MODE == "bf16":
        # Mosaic has no u32->bf16 cast; hop through i32 (exact: planes
        # are < 2^8 <= bf16's 2^8 mantissa range)
        return [((x >> U32(bits * p)) & mask).astype(jnp.int32
                                                     ).astype(jnp.bfloat16)
                for p in range(nplanes)]
    dt = jnp.int8 if bits <= 7 else jnp.int32  # 2^8-1 overflows s8
    return [((x >> U32(bits * p)) & mask).astype(dt) for p in range(nplanes)]


def _dot(a, b, dn):
    if DOT_MODE == "int8":
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.int32)

    def cast(v):
        if v.dtype == jnp.bfloat16:
            return v
        # table planes are stored int8/int32; exact for values < 2^8
        return v.astype(jnp.int32).astype(jnp.bfloat16)
    return jax.lax.dot_general(cast(a), cast(b), dimension_numbers=dn,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)


_DN = (((1,), (0,)), ((), ()))  # plain (m, k) @ (k, c)


def _mm_fold(aps, bps, q, pd_ref, pds_ref, lid, bits, contract_len, cs,
             q_bits=32):
    """sum over planes of aps[a] @ bps[b] * 2^(bits*(a+b)) mod q, all in
    VMEM.  Adjacent diagonals are computed in pairs and merged into one
    u32 word before the Shoup fold when provably overflow-free (mirror of
    ntt_mxu._fold_diagonals), so peak live partials stay at two i32
    buffers and the fold count is ~halved.  pd_ref/pds_ref are full
    (L, D) SMEM tables read at dynamic row `lid`."""
    nd = len(aps) + len(bps) - 1
    mp = _max_partial(bits, contract_len, len(aps), len(bps))
    # pair-merging halves the fold count for a shift+add per element; the
    # honest interleaved A/B on v5e (2026-08-19, post-D2H mode — see
    # CLAUDE.md on axon timing) favored it ~3%.  PHANTOM_PAIR_FOLD=0
    # disables for bisection.
    pair = (_os.environ.get("PHANTOM_PAIR_FOLD") != "0"
            and mp * ((1 << bits) + 1) <= 0xFFFFFFFF)
    if DOT_MODE == "bf16":
        assert ((1 << bits) - 1) ** 2 * contract_len < (1 << 24), \
            "bf16 dot mode inexact at this plane radix / tile size"
    two_q = q * U32(2)

    def diag(d):
        p = None
        for a in range(max(0, d - len(bps) + 1), min(len(aps), d + 1)):
            t = _dot(aps[a], bps[d - a], _DN)
            p = t if p is None else p + t
        return p

    acc = None
    step = 2 if pair else 1
    n_words = (nd + step - 1) // step
    # fully lazy accumulation when n_words * 2q provably fits int31
    # (28-bit chains: 4 x 2^29 = 2^31): the Shoup folds become
    # independent — no serializing csub between them (VPU ILP) — and
    # reduce once through a halving csub ladder.  Bit-identical.
    lazy = (_os.environ.get("PHANTOM_LAZY_FOLD") != "0"
            and (n_words << (q_bits + 1)) <= (1 << 31))
    for j in range(0, nd, step):
        w = diag(j).astype(jnp.uint32)
        if pair and j + 1 < nd:
            w = w + (diag(j + 1).astype(jnp.uint32) << U32(bits))
        term = mul_mod_shoup_lazy32(w, pd_ref[lid, j], pds_ref[lid, j], q)
        if acc is None:
            acc = term
        elif lazy:
            acc = acc + term
        else:
            acc = cs(acc + term, two_q)
    if lazy:
        k = n_words
        while k > 1:
            k = (k + 1) // 2
            acc = csub32_i31(acc, two_q * U32(k))
        return csub32_i31(acc, q)
    return cs(acc, q)


def _ntt_core(x, wa_ref, d_ref, ds_ref, wb_ref, q, pd_ref, pds_ref, lid,
              bits, q_bits):
    """Four-step forward NTT of one strictly-reduced (n1, n2) block, all
    in VMEM; returns the NTT-form block in [0, q)."""
    n1, n2 = x.shape
    cs = _csub_for(q_bits)
    xps = _plane_list(x, bits, q_bits)
    waps = _plane_list(wa_ref[0], bits, q_bits)
    z = _mm_fold(waps, xps, q, pd_ref, pds_ref, lid, bits, n1, cs, q_bits)
    v = cs(mul_mod_shoup_lazy32(z, d_ref[0], ds_ref[0], q), q)
    vps = _plane_list(v, bits, q_bits)
    wbps = _plane_list(wb_ref[0], bits, q_bits)
    return _mm_fold(vps, wbps, q, pd_ref, pds_ref, lid, bits, n2, cs,
                    q_bits)


def _fwd_kernel(bits, q_bits, num_l, fused, has_tadd, rh_rl, x_ref, wa_ref,
                d_ref, ds_ref, wb_ref, q_ref, pd_ref, pds_ref, *rest):
    rest = list(rest)
    s_ref = sc_ref = scs_ref = None
    rh_ref = rl_ref = None
    ta0_ref = ta1_ref = tb0_ref = tb1_ref = None
    if fused:
        s_ref, sc_ref, scs_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    if rh_rl:
        rh_ref, rl_ref = rest.pop(0), rest.pop(0)
    if has_tadd:
        ta0_ref, ta1_ref = rest.pop(0), rest.pop(0)
        tb0_ref, tb1_ref = rest.pop(0), rest.pop(0)
    (o_ref,) = rest
    lid = _mod(pl.program_id(0), num_l)
    cs = _csub_for(q_bits)
    q = q_ref[lid, 0]
    x = cs(x_ref[0], q)                          # tolerate lazy [0, 2q)
    out = _ntt_core(x, wa_ref, d_ref, ds_ref, wb_ref, q, pd_ref, pds_ref,
                    lid, bits, q_bits)
    if fused:
        diff = s_ref[0] - out + q                # sub_from in [0, q)
        out = cs(mul_mod_shoup_lazy32(diff, sc_ref[lid, 0],
                                      scs_ref[lid, 0], q), q)
    if not has_tadd:
        o_ref[0] = out
        return
    # tensor-term epilogue add (groups of num_l rows): group 0 adds the
    # dyadic c0 = a0 ∘ b0, group 1 the cross term a0 ∘ b1 + a1 ∘ b0 —
    # the relin-output adds fused into the moddown fNTT, c0/c1 never in
    # HBM (mirror of pipeline32._tensor_2x2)
    gid = jax.lax.div(_i32(pl.program_id(0)), np.int32(num_l))
    rh = rh_ref[lid, 0]
    rl = rl_ref[lid, 0]

    @pl.when(gid == 0)
    def _add_c0():
        c0 = m32.mul_mod32(ta0_ref[0], tb0_ref[0], q, rh, rl)
        o_ref[0] = m32.add_mod32(out, c0, q)

    @pl.when(gid > 0)
    def _add_c1():
        h1, l1 = m32.mul_wide32(ta0_ref[0], tb1_ref[0])
        h2, l2 = m32.mul_wide32(ta1_ref[0], tb0_ref[0])
        hs, ls = m32.add_wide32(h1, l1, h2, l2)
        c1 = m32.barrett_reduce_u64_32(hs, ls, q, rh, rl)
        o_ref[0] = m32.add_mod32(out, c1, q)


def _inv_kernel(bits, q_bits, num_l, has_mul, emit_v, x_ref, *refs):
    refs = list(refs)
    m_ref = rh_ref = rl_ref = None
    u_ref = vv_ref = None
    if has_mul:
        m_ref, rh_ref, rl_ref = refs[:3]
        refs = refs[3:]
    if emit_v:
        u_ref, vv_ref, rh_ref, rl_ref = refs[:4]
        refs = refs[4:]
    (wbi_ref, di_ref, dis_ref, wai_ref, q_ref, pd_ref, pds_ref,
     pd2_ref, pds2_ref, o_ref) = refs[:10]
    refs = refs[10:]
    v_ref = acc_ref = None
    if emit_v:
        v_ref, acc_ref = refs
    lid = _mod(pl.program_id(0), num_l)
    cs = _csub_for(q_bits)
    q = q_ref[lid, 0]
    n1 = x_ref.shape[1]
    n2 = x_ref.shape[2]
    x = cs(x_ref[0], q)
    if has_mul:
        # tensor-product prologue: x = x * mul_by mod q in VMEM — the
        # dyadic c2 = a1 ∘ b1 (reference tensor_prod_2x2_rns_poly,
        # polymath.cu:463) never exists in HBM when fused here
        x = m32.mul_mod32(x, cs(m_ref[0], q), q, rh_ref[lid, 0],
                          rl_ref[lid, 0])
    xps = _plane_list(x, bits, q_bits)
    wbips = _plane_list(wbi_ref[0], bits, q_bits)
    s = _mm_fold(xps, wbips, q, pd_ref, pds_ref, lid, bits, n2, cs, q_bits)
    # scale-in-fold: the epilogue scale is pre-multiplied into the final
    # matmul's fold constants (pd2) — one fewer Shoup stage per element
    v = cs(mul_mod_shoup_lazy32(s, di_ref[0], dis_ref[0], q), q)
    vps = _plane_list(v, bits, q_bits)
    waips = _plane_list(wai_ref[0], bits, q_bits)
    out = _mm_fold(waips, vps, q, pd2_ref, pds2_ref, lid, bits, n1, cs,
                   q_bits)
    o_ref[0] = out
    if not emit_v:
        return
    # fused floor-sum: accumulate this row's v = floor(sum y/q) terms
    # across the group's rows (sequential grid + VMEM scratch; mirror of
    # bconv32.floor_sum_div32's three-level 2^32 cascade) and emit the
    # group's v plane at the last row — the exact-bconv correction for
    # moddown never touches XLA
    rh = rh_ref[lid, 0]
    rl = rl_ref[lid, 0]

    @pl.when(lid == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    yU = out * u_ref[lid, 0]                     # < 2^32: y < q, U <= 2^32/q
    h, l_ = m32.mul_wide32(out, vv_ref[lid, 0])
    q1, r1 = m32.barrett_div_mod_u64_32(h, l_, q, rh, rl)
    s2, r2 = m32.barrett_div_mod_u64_32(r1, jnp.zeros_like(r1), q, rh, rl)
    s3, _ = m32.barrett_div_mod_u64_32(r2, jnp.zeros_like(r2), q, rh, rl)
    a_lo, cr = m32.add_u32_carry(acc_ref[1], yU)
    a_hi = acc_ref[0] + cr
    a_lo, cr = m32.add_u32_carry(a_lo, q1)
    a_hi = a_hi + cr
    b_lo, cr = m32.add_u32_carry(acc_ref[3], s2)
    b_hi = acc_ref[2] + cr
    c_lo, cr = m32.add_u32_carry(acc_ref[5], s3)
    c_hi = acc_ref[4] + cr
    acc_ref[0] = a_hi
    acc_ref[1] = a_lo
    acc_ref[2] = b_hi
    acc_ref[3] = b_lo
    acc_ref[4] = c_hi
    acc_ref[5] = c_lo

    @pl.when(lid == num_l - 1)
    def _emit_v():
        p1, cr1 = m32.add_u32_carry(b_lo, c_hi)
        del p1
        p2, cr2 = m32.add_u32_carry(a_lo, b_hi + cr1)
        del p2
        v_ref[0] = a_hi + cr2


def _specs(t: MXUNTTTables, num_l: int, fused: bool, inverse: bool):
    n1, n2 = t.n1, t.n2
    n_diag = t.pow_diag.shape[1]
    data = pl.BlockSpec((1, n1, n2), lambda l: (l, _I0, _I0),
                        memory_space=pltpu.VMEM)
    # packed-u32 table blocks (planes extracted in-kernel; int8 stacks
    # would pay a full-array relayout at the custom-call boundary on
    # every launch)
    left = pl.BlockSpec((1, n1, n1), lambda l: (_mod(l, num_l), _I0, _I0),
                        memory_space=pltpu.VMEM)
    right = pl.BlockSpec((1, n2, n2), lambda l: (_mod(l, num_l), _I0, _I0),
                         memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((1, n1, n2), lambda l: (_mod(l, num_l), _I0, _I0),
                      memory_space=pltpu.VMEM)
    # scalars/fold constants: FULL-array SMEM blocks, indexed in-kernel
    # (Mosaic's block-shape rule covers SMEM; (1, 1) blocks of an (L, 1)
    # array fail lowering — seen on hardware 2026-08-19)
    scalar = pl.BlockSpec((num_l, 1), lambda l: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    diag = pl.BlockSpec((num_l, n_diag), lambda l: (_I0, _I0),
                        memory_space=pltpu.SMEM)
    if inverse:
        return [data, right, tw, tw, left, scalar, diag, diag, diag, diag]
    specs = [data, left, tw, tw, right, scalar, diag, diag]
    if fused:
        specs += [data, scalar, scalar]
    return specs



def _layout(x, t):
    """Accept flat (..., L, N) or pre-blocked (..., L, n1, n2) input.
    Returns (lead_shape, num_l, rows_view, blocked) — pre-blocked callers
    skip the flat<->blocked physical relayout entirely (u32 reshape
    between (L, N) and (L, n1, n2) tilings moves the whole array through
    the VPU; several per op dominated the inter-kernel time in the
    batch-8 trace)."""
    n1, n2 = t.n1, t.n2
    if x.ndim >= 3 and x.shape[-2:] == (n1, n2):
        lead = x.shape[:-2]
        num_l = x.shape[-3]
        return lead, num_l, x.reshape(-1, n1, n2), True
    lead = x.shape[:-1]
    num_l = x.shape[-2]
    return lead, num_l, x.reshape(-1, n1, n2), False


def ntt_forward_mxu_pallas(x: jnp.ndarray, t: MXUNTTTables,
                           sub_from=None, epi_scale=None,
                           epi_scale_shoup=None, tensor_add=None,
                           interpret=None) -> jnp.ndarray:
    """x: (..., L, N) uint32 in [0, q) -> NTT form in [0, q); with
    sub_from/epi_scale: (sub_from - NTT(x)) * epi_scale, the fused
    moddown/rescale epilogue (reference: ntt_moddown.cu:222).

    tensor_add = (d1, d2), each (2, L, ...): requires x leading shape
    (2, L, ...); the epilogue output of group g gets the tensor term
    c_g added in-kernel (g=0: d1[0] ∘ d2[0]; g=1: the cross term) — the
    moddown-pair + relin-output-add fusion."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    lead, num_l, xm, blocked = _layout(x, t)
    nrows = int(np.prod(lead)) if lead else 1
    assert t.q.shape[0] == num_l, (t.q.shape, num_l)
    fused = sub_from is not None
    has_tadd = tensor_add is not None
    assert not has_tadd or nrows == 2 * num_l
    kern = functools.partial(_fwd_kernel, t.plane_bits, t.q_bits, num_l,
                             fused, has_tadd, has_tadd)
    args = [xm, t.wa, t.d.reshape(-1, n1, n2),
            t.d_shoup.reshape(-1, n1, n2), t.wb, t.q.reshape(-1, 1),
            t.pow_diag, t.pow_diag_shoup]
    specs = _specs(t, num_l, fused, inverse=False)
    if fused:
        args += [jnp.asarray(sub_from, jnp.uint32).reshape(nrows, n1, n2),
                 jnp.asarray(epi_scale, jnp.uint32).reshape(-1, 1),
                 jnp.asarray(epi_scale_shoup, jnp.uint32).reshape(-1, 1)]
    if has_tadd:
        scalar = pl.BlockSpec((num_l, 1), lambda l: (_I0, _I0),
                              memory_space=pltpu.SMEM)
        row0 = pl.BlockSpec((1, n1, n2),
                            lambda l: (_mod(l, num_l), _I0, _I0),
                            memory_space=pltpu.VMEM)
        row1 = pl.BlockSpec((1, n1, n2),
                            lambda l: (np.int32(num_l) + _mod(l, num_l),
                                       _I0, _I0),
                            memory_space=pltpu.VMEM)
        d1m = jnp.asarray(tensor_add[0], jnp.uint32).reshape(2 * num_l,
                                                             n1, n2)
        d2m = jnp.asarray(tensor_add[1], jnp.uint32).reshape(2 * num_l,
                                                             n1, n2)
        args += [t.mv.ratio_hi.reshape(-1, 1), t.mv.ratio_lo.reshape(-1, 1),
                 d1m, d1m, d2m, d2m]
        specs += [scalar, scalar, row0, row1, row0, row1]
    out = pl.pallas_call(
        kern,
        grid=(nrows,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, n1, n2), lambda l: (l, _I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, n1, n2), jnp.uint32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    if blocked:
        return out.reshape(*lead, n1, n2)
    return out.reshape(*lead, n1 * n2)


def ntt_inverse_mxu_pallas(x: jnp.ndarray, t: MXUNTTTables,
                           scale: Optional[jnp.ndarray] = None,
                           scale_shoup: Optional[jnp.ndarray] = None,
                           mul_by: Optional[jnp.ndarray] = None,
                           emit_floor_div=None,
                           interpret=None):
    """x: (..., L, N) uint32 in [0, 2q) -> coefficients in [0, q).
    `scale` (default inv_degree) REPLACES the 1/N normalization.
    `mul_by` (same shape as x): transform x * mul_by mod q instead — the
    in-kernel dyadic-product prologue (e.g. iNTT of the tensor term
    c2 = a1 ∘ b1 without materializing c2).
    `emit_floor_div` = (U, V) per-limb consts (bconv32.BaseConvConsts32
    .U/.V): additionally return v = floor(sum_rows y/q) per leading
    group — the exact-bconv correction fused into the transform (the
    caller's y rows must be the pre-scaled x*QhatInv moddown input)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    lead, num_l, xm, blocked = _layout(x, t)
    nrows = int(np.prod(lead)) if lead else 1
    if scale is None:
        scale = t.inv_degree
        scale_shoup = t.inv_degree_shoup
    assert t.q.shape[0] == num_l, (t.q.shape, num_l)
    # scale-in-fold (see ntt_mxu.scaled_diag): (L, D)-sized, trace noise
    from .ntt_mxu import scaled_diag
    pd2, pds2, _ = scaled_diag(t, scale,
                               (t.pow_diag, t.pow_diag_shoup, t.q_bits))
    has_mul = mul_by is not None
    emit_v = emit_floor_div is not None
    assert not (has_mul and emit_v)
    kern = functools.partial(_inv_kernel, t.plane_bits, t.q_bits, num_l,
                             has_mul, emit_v)
    data = pl.BlockSpec((1, n1, n2), lambda l: (l, _I0, _I0),
                        memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((num_l, 1), lambda l: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    args = [xm]
    specs = [data]
    if has_mul:
        args += [jnp.asarray(mul_by, jnp.uint32).reshape(nrows, n1, n2),
                 t.mv.ratio_hi.reshape(-1, 1), t.mv.ratio_lo.reshape(-1, 1)]
        specs += [data, scalar, scalar]
    if emit_v:
        u_c, v_c = emit_floor_div
        args += [jnp.asarray(u_c, jnp.uint32).reshape(-1, 1),
                 jnp.asarray(v_c, jnp.uint32).reshape(-1, 1),
                 t.mv.ratio_hi.reshape(-1, 1), t.mv.ratio_lo.reshape(-1, 1)]
        specs += [scalar, scalar, scalar, scalar]
    args += [t.wbi, t.di.reshape(-1, n1, n2), t.di_shoup.reshape(-1, n1, n2),
             t.wai, t.q.reshape(-1, 1), t.pow_diag, t.pow_diag_shoup,
             pd2, pds2]
    specs += _specs(t, num_l, fused=False, inverse=True)[1:]
    out_specs = pl.BlockSpec((1, n1, n2), lambda l: (l, _I0, _I0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nrows, n1, n2), jnp.uint32)
    scratch = []
    if emit_v:
        n_grp = nrows // num_l
        out_specs = (out_specs,
                     pl.BlockSpec((1, n1, n2),
                                  lambda l: (jax.lax.div(_i32(l),
                                                         np.int32(num_l)),
                                             _I0, _I0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n_grp, n1, n2), jnp.uint32))
        scratch = [pltpu.VMEM((6, n1, n2), jnp.uint32)]
    out = pl.pallas_call(
        kern,
        grid=(nrows,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    if emit_v:
        out, v = out
        out = (out.reshape(*lead, n1, n2) if blocked
               else out.reshape(*lead, n1 * n2))
        return out, (v if blocked else v.reshape(v.shape[0], n1 * n2))
    if blocked:
        return out.reshape(*lead, n1, n2)
    return out.reshape(*lead, n1 * n2)


# ---------------------------------------------------------------------------
# base-conversion prologue fused into the forward NTT
# ---------------------------------------------------------------------------

def _bconv_fwd_kernel(bits, q_bits, alpha, k_out, k_data, has_v, has_post,
                      has_self, fused, has_tadd, y_ref, mat_ref, wa_ref,
                      d_ref, ds_ref, wb_ref, q_ref, rh_ref, rl_ref, p32_ref,
                      p64_ref, pd_ref, pds_ref, *rest):
    rest = list(rest)
    v_ref = vm_ref = post_ref = self_ref = s_ref = sc_ref = scs_ref = None
    ta0_ref = ta1_ref = tb0_ref = tb1_ref = None
    if has_v:
        v_ref = rest.pop(0)
        vm_ref = rest.pop(0)
    if has_post:
        post_ref = rest.pop(0)
    if has_self:
        self_ref = rest.pop(0)
    if fused:
        s_ref, sc_ref, scs_ref = rest.pop(0), rest.pop(0), rest.pop(0)
    if has_tadd:
        ta0_ref, ta1_ref = rest.pop(0), rest.pop(0)
        tb0_ref, tb1_ref = rest.pop(0), rest.pop(0)
    (o_ref,) = rest
    gid = _i32(pl.program_id(0))
    jid = _i32(pl.program_id(1))
    mrow = gid * np.int32(k_out) + jid           # mat/consts row
    q = q_ref[jid, 0]
    rh = rh_ref[jid, 0]
    rl = rl_ref[jid, 0]
    shape = y_ref.shape[1:]

    def _transform():
        # exact base-conversion row: sum_i y[i] * mat[j, i] accumulated as
        # a (carry, hi, lo) u32 triple (mirror of
        # bconv32.accumulate_matmul_96; exact for <= 63 input limbs),
        # reduced mod q_j
        c = jnp.zeros(shape, dtype=jnp.uint32)
        hi = jnp.zeros(shape, dtype=jnp.uint32)
        lo = jnp.zeros(shape, dtype=jnp.uint32)
        for i in range(alpha):
            h, l = m32.mul_wide32(y_ref[i], mat_ref[mrow, i])
            lo, cr = m32.add_u32_carry(lo, l)
            hi2, cr2 = m32.add_u32_carry(hi, h + cr)  # h < 2^28: no ovfl
            hi = hi2
            c = c + cr2
        t_c = m32.mul_mod32(m32.barrett_reduce_u32(c, q, rh),
                            p64_ref[jid, 0], q, rh, rl)
        t_h = m32.mul_mod32(m32.barrett_reduce_u32(hi, q, rh),
                            p32_ref[jid, 0], q, rh, rl)
        t_l = m32.barrett_reduce_u32(lo, q, rh)
        x = m32.add_mod32(m32.add_mod32(t_c, t_h, q), t_l, q)
        if has_v:
            # exact-bconv correction: x -= v * (q_in mod q_j)
            x = m32.sub_mod32(x, m32.mul_mod32(v_ref[0], vm_ref[jid, 0],
                                               q, rh, rl), q)
        if has_post:
            x = m32.sub_mod32(x, post_ref[jid, 0], q)
        return _ntt_core(x, wa_ref, d_ref, ds_ref, wb_ref, q, pd_ref,
                         pds_ref, jid, bits, q_bits)

    def _epi(out):
        if fused:
            diff = s_ref[0] - out + q            # sub_from in [0, q)
            out = _csub_for(q_bits)(mul_mod_shoup_lazy32(
                diff, sc_ref[jid, 0], scs_ref[jid, 0], q), q)
        return out

    def _emit(out):
        if not has_tadd:
            o_ref[0] = out
            return
        # in-kernel tensor-term epilogue add: group 0 adds the dyadic
        # c0 = a0 ∘ b0; group 1 adds the cross term a0 ∘ b1 + a1 ∘ b0
        # (one lazy 64-bit add, one Barrett — mirror of
        # pipeline32._tensor_2x2; reference tensor_prod_2x2_rns_poly).
        # The step's final adds out_i = c_i + moddown_i therefore happen
        # here, and c0/c1 never exist in HBM.
        @pl.when(gid == 0)
        def _add_c0():
            c0 = m32.mul_mod32(ta0_ref[0], tb0_ref[0], q, rh, rl)
            o_ref[0] = m32.add_mod32(out, c0, q)

        @pl.when(gid > 0)
        def _add_c1():
            h1, l1 = m32.mul_wide32(ta0_ref[0], tb1_ref[0])
            h2, l2 = m32.mul_wide32(ta1_ref[0], tb0_ref[0])
            hs, ls = m32.add_wide32(h1, l1, h2, l2)
            c1 = m32.barrett_reduce_u64_32(hs, ls, q, rh, rl)
            o_ref[0] = m32.add_mod32(out, c1, q)

    if has_self:
        # modup digit-own rows take the NTT-form input verbatim; the
        # bconv+NTT is SKIPPED for them (predicated, not just selected —
        # alpha of every k_out programs per digit).  The upper bound
        # clamps to k_data for the (possibly shorter) last digit of a
        # non-divisible chain (k % alpha != 0: its pad rows are zeros
        # that contribute nothing to the matmul and are NOT self rows).
        hi_d = jnp.minimum((gid + np.int32(1)) * np.int32(alpha),
                           np.int32(k_data))
        in_digit = (jid >= gid * np.int32(alpha)) & (jid < hi_d)

        @pl.when(jnp.logical_not(in_digit))
        def _compute():
            o_ref[0] = _epi(_transform())

        @pl.when(in_digit)
        def _passthrough():
            o_ref[0] = _epi(self_ref[0])
    else:
        _emit(_epi(_transform()))


def bconv_ntt_forward_mxu_pallas(y: jnp.ndarray, mat: jnp.ndarray,
                                 t: MXUNTTTables,
                                 v=None, vmul=None, post_sub=None,
                                 self_rows=None,
                                 sub_from=None, epi_scale=None,
                                 epi_scale_shoup=None,
                                 tensor_add=None, k_data=None,
                                 interpret=None) -> jnp.ndarray:
    """Base conversion + forward NTT in ONE Pallas program per output row.

    y: (G, alpha, N) u32 input rows in [0, q_in), q_in < 2^30;
    mat: (G, k_out, alpha) u32 conversion matrix (entries < 2^30).
    For group g, output limb j (tables/consts indexed by j over t's L=k_out
    limbs):

        x     = (sum_i y[g,i] * mat[g,j,i]) mod q_j     (exact 96-bit triple)
                [- v[g] * vmul[j] mod q_j]   (exact-bconv floor correction)
                [- post_sub[j]]              (rescale half correction)
        out[g,j] = NTT_j(x)  [fused epilogue (sub_from[g,j]-out)*epi_scale_j]

    self_rows (G*alpha, N): modup digit-own passthrough — output rows
    g*alpha <= j < (g+1)*alpha take self_rows[j] verbatim (they are already
    NTT-form), so the caller needs no scatter/concat afterwards.

    tensor_add = (d1, d2), each (2, k_out, ...) NTT-form canonical: adds
    the tensor term c_g to the epilogue output in-kernel — group 0 gets
    c0 = d1[0] ∘ d2[0], group 1 the cross term d1[0] ∘ d2[1] + d1[1] ∘ d2[0]
    (requires G == 2; the moddown-pair + post-keyswitch-add fusion).

    One HBM read of y per group, zero intermediate materialization — the
    fused form of modup's complement transform (reference ntt_modup.cu),
    moddown's delta+fNTT (ntt_moddown.cu:222) and the rescale correction
    path.  Bit-identical to the composed bconv32 + ntt ops
    (tests/test_ntt_mxu_pallas.py)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    blocked = y.ndim == 4 and y.shape[-2:] == (n1, n2)
    G, alpha = y.shape[:2]
    n = n1 * n2
    k_out = mat.shape[1]
    assert mat.shape == (G, k_out, alpha)
    assert blocked or y.shape == (G, alpha, n), y.shape
    assert alpha <= 63, "96-bit triple exactness bound"
    assert t.q.shape[0] == k_out, (t.q.shape, k_out)
    ym = y.reshape(G * alpha, n1, n2)
    matm = jnp.asarray(mat, jnp.uint32).reshape(G * k_out, alpha)
    mv = t.mv
    n_diag = t.pow_diag.shape[1]
    has_v = v is not None
    has_post = post_sub is not None
    has_self = self_rows is not None
    fused = sub_from is not None
    has_tadd = tensor_add is not None
    assert not (has_tadd and has_self)
    assert not has_tadd or G == 2

    y_spec = pl.BlockSpec((alpha, n1, n2), lambda g, j: (g, _I0, _I0),
                          memory_space=pltpu.VMEM)
    # mat + per-limb consts: full-array SMEM blocks, indexed in-kernel
    mat_spec = pl.BlockSpec((G * k_out, alpha), lambda g, j: (_I0, _I0),
                            memory_space=pltpu.SMEM)
    left = pl.BlockSpec((1, n1, n1), lambda g, j: (j, _I0, _I0),
                        memory_space=pltpu.VMEM)
    right = pl.BlockSpec((1, n2, n2), lambda g, j: (j, _I0, _I0),
                         memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((1, n1, n2), lambda g, j: (j, _I0, _I0),
                      memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((k_out, 1), lambda g, j: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    diag = pl.BlockSpec((k_out, n_diag), lambda g, j: (_I0, _I0),
                        memory_space=pltpu.SMEM)
    gdata = pl.BlockSpec((1, n1, n2),
                         lambda g, j: (_row(g, k_out, j), _I0, _I0),
                         memory_space=pltpu.VMEM)

    col = lambda a: jnp.asarray(a, jnp.uint32).reshape(-1, 1)
    args = [ym, matm, t.wa, t.d.reshape(-1, n1, n2),
            t.d_shoup.reshape(-1, n1, n2), t.wb,
            col(mv.q), col(mv.ratio_hi), col(mv.ratio_lo),
            col(mv.pow32), col(mv.pow64), t.pow_diag, t.pow_diag_shoup]
    specs = [y_spec, mat_spec, left, tw, tw, right,
             scalar, scalar, scalar, scalar, scalar, diag, diag]
    if has_v:
        args += [jnp.asarray(v, jnp.uint32).reshape(G, n1, n2), col(vmul)]
        specs += [pl.BlockSpec((1, n1, n2), lambda g, j: (g, _I0, _I0),
                               memory_space=pltpu.VMEM), scalar]
    if has_post:
        args += [col(post_sub)]
        specs += [scalar]
    if has_self:
        k_in_total = G * alpha
        args += [jnp.asarray(self_rows, jnp.uint32
                             ).reshape(k_in_total, n1, n2)]
        specs += [pl.BlockSpec((1, n1, n2),
                               lambda g, j: (_mod(j, k_in_total), _I0, _I0),
                               memory_space=pltpu.VMEM)]
    if fused:
        args += [jnp.asarray(sub_from, jnp.uint32).reshape(G * k_out, n1, n2),
                 col(epi_scale), col(epi_scale_shoup)]
        specs += [gdata, scalar, scalar]
    if has_tadd:
        d1m = jnp.asarray(tensor_add[0], jnp.uint32).reshape(2 * k_out,
                                                             n1, n2)
        d2m = jnp.asarray(tensor_add[1], jnp.uint32).reshape(2 * k_out,
                                                             n1, n2)
        row0 = pl.BlockSpec((1, n1, n2), lambda g, j: (j, _I0, _I0),
                            memory_space=pltpu.VMEM)
        row1 = pl.BlockSpec((1, n1, n2),
                            lambda g, j: (np.int32(k_out) + _i32(j),
                                          _I0, _I0),
                            memory_space=pltpu.VMEM)
        args += [d1m, d1m, d2m, d2m]
        specs += [row0, row1, row0, row1]

    if k_data is None:
        k_data = G * alpha      # divisible chains: every digit is full
    kern = functools.partial(_bconv_fwd_kernel, t.plane_bits, t.q_bits,
                             alpha, k_out, k_data, has_v, has_post,
                             has_self, fused, has_tadd)
    out = pl.pallas_call(
        kern,
        grid=(G, k_out),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, n1, n2),
                               lambda g, j: (_row(g, k_out, j), _I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * k_out, n1, n2), jnp.uint32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    if blocked:
        return out.reshape(G, k_out, n1, n2)
    return out.reshape(G, k_out, n)


# ---------------------------------------------------------------------------
# moddown with the base conversion on the in-kernel MXU (R rows/program)
# ---------------------------------------------------------------------------

def _bconv_mxu_kernel(bits, q_bits, alpha, k_pad, R, has_tadd,
                      y_ref, mat_ref, v_ref, vm_ref, s_ref,
                      ta0_ref, ta1_ref, tb0_ref, tb1_ref,
                      wa_ref, d_ref, ds_ref, wb_ref,
                      q_ref, rh_ref, rl_ref, pw_ref, pws_ref,
                      pd_ref, pds_ref, sc_ref, scs_ref, o_ref):
    """R moddown rows per program: the (R, alpha) x (alpha, n1, n2) base
    conversion runs as int8 digit-plane dots on the MXU with per-row
    Shoup folds (the per-row VPU accumulation at alpha ~ 20 costs more
    than the row's NTT; in XLA the same matmul pays plane-extract /
    recombine fusions at ~30% HBM peak — in VMEM both costs vanish).
    Everything else (exact v correction, forward NTT, the
    (sub - NTT(delta)) * P^-1 epilogue and the relin tensor adds) is as
    in _bconv_fwd_kernel, per row."""
    gid = _i32(pl.program_id(0))
    jp = _i32(pl.program_id(1))
    cs = _csub_for(q_bits)
    n1, n2 = v_ref.shape[1:]
    y = y_ref[0]                                  # (alpha, n1, n2)
    # y ranges over the SPECIAL primes (< 2^30), not the Ql q_bits
    nplanes_y = -(-30 // bits)
    nplanes_m = -(-30 // bits)
    mask = U32((1 << bits) - 1)
    dt = jnp.int8 if bits <= 7 else jnp.int32
    yps = [((y >> U32(bits * p_)) & mask).astype(dt)
           for p_ in range(nplanes_y)]
    mblk = mat_ref[...]                           # (R, alpha) u32 VMEM
    mps = [((mblk >> U32(bits * p_)) & mask).astype(dt)
           for p_ in range(nplanes_m)]
    nd = nplanes_y + nplanes_m - 1
    # diagonal partials: (R, n1, n2) i32, exact (< 2^31); the dot has two
    # trailing non-contracting dims on the rhs
    partials = []
    for dg in range(nd):
        acc = None
        for a in range(max(0, dg - nplanes_y + 1), min(nplanes_m, dg + 1)):
            t_ = jax.lax.dot_general(
                mps[a], yps[dg - a], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = t_ if acc is None else acc + t_
        partials.append(acc)
    mp = ((1 << bits) - 1) ** 2 * alpha * min(nplanes_y, nplanes_m)
    pair = mp * ((1 << bits) + 1) <= 0xFFFFFFFF

    for r in range(R):
        jid = jp * np.int32(R) + np.int32(r)
        q = q_ref[jid, 0]
        rh = rh_ref[jid, 0]
        rl = rl_ref[jid, 0]
        two_q = q * U32(2)
        # per-row fold of the diagonal partials with 2^(bits*dg) mod q_j
        acc = None
        n_words = (nd + 1) // 2 if pair else nd
        lazy = (n_words << (q_bits + 1)) <= (1 << 31)
        step = 2 if pair else 1
        for dg in range(0, nd, step):
            w = partials[dg][r].astype(jnp.uint32)
            if pair and dg + 1 < nd:
                w = w + (partials[dg + 1][r].astype(jnp.uint32)
                         << U32(bits))
            term = mul_mod_shoup_lazy32(w, pw_ref[jid, bits * dg],
                                        pws_ref[jid, bits * dg], q)
            if acc is None:
                acc = term
            elif lazy:
                acc = acc + term
            else:
                acc = cs(acc + term, two_q)
        if lazy:
            kk = n_words
            while kk > 1:
                kk = (kk + 1) // 2
                acc = csub32_i31(acc, two_q * U32(kk))
            x = csub32_i31(acc, q)
        else:
            x = cs(acc, q)
        x = m32.sub_mod32(x, m32.mul_mod32(v_ref[0], vm_ref[jid, 0],
                                           q, rh, rl), q)
        out = _ntt_core(x, wa_ref.at[r:r + 1], d_ref.at[r:r + 1],
                        ds_ref.at[r:r + 1], wb_ref.at[r:r + 1], q,
                        pd_ref, pds_ref, jid, bits, q_bits)
        diff = s_ref[r] - out + q
        out = cs(mul_mod_shoup_lazy32(diff, sc_ref[jid, 0],
                                      scs_ref[jid, 0], q), q)
        if not has_tadd:
            o_ref[r] = out
            continue

        @pl.when(gid == 0)
        def _add_c0(out=out, r=r, q=q, rh=rh, rl=rl):
            c0 = m32.mul_mod32(ta0_ref[r], tb0_ref[r], q, rh, rl)
            o_ref[r] = m32.add_mod32(out, c0, q)

        @pl.when(gid > 0)
        def _add_c1(out=out, r=r, q=q, rh=rh, rl=rl):
            h1, l1 = m32.mul_wide32(ta0_ref[r], tb1_ref[r])
            h2, l2 = m32.mul_wide32(ta1_ref[r], tb0_ref[r])
            hs, ls = m32.add_wide32(h1, l1, h2, l2)
            c1 = m32.barrett_reduce_u64_32(hs, ls, q, rh, rl)
            o_ref[r] = m32.add_mod32(out, c1, q)


def moddown_mxu_bconv_pallas(y, mat, v, vmul, sub_from, tensor_add,
                             t: MXUNTTTables, pow2, pow2_shoup,
                             epi_scale, epi_scale_shoup,
                             rows_per_program: int = 8, interpret=None):
    """Moddown of both keyswitch halves with the base conversion on the
    in-kernel MXU, R rows per program.  y: (2, alpha, n1, n2); mat:
    (k, alpha); v: (2, n1, n2); sub_from/tensor_add rows over (2, k, ..).
    k is padded up to a multiple of R by repeating the last limb (pad
    rows are sliced off).  Bit-identical to bconv_ntt_forward_mxu_pallas
    with the same operands."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    k = int(t.q.shape[0])
    alpha = y.shape[1]
    R = rows_per_program
    k_pad = -(-k // R) * R
    pad_idx = np.concatenate([np.arange(k), np.full(k_pad - k, k - 1)])
    tp = t.limb_slice(pad_idx) if k_pad != k else t
    mv = tp.mv
    n_diag = t.pow_diag.shape[1]

    def padrows(a, lead2=True):
        """(2, k, n1, n2) -> (2*k_pad, n1, n2) with repeated last rows."""
        a = jnp.asarray(a, jnp.uint32).reshape(2, k, n1, n2)
        if k_pad != k:
            tail = jnp.broadcast_to(a[:, k - 1:k], (2, k_pad - k, n1, n2))
            a = jnp.concatenate([a, tail], axis=1)
        return a.reshape(2 * k_pad, n1, n2)

    def padc(a):
        a = jnp.asarray(a, jnp.uint32).reshape(-1)
        if k_pad != k:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[k - 1:k], (k_pad - k,))])
        return a.reshape(-1, 1)

    matp = jnp.asarray(mat, jnp.uint32)
    if k_pad != k:
        matp = jnp.concatenate(
            [matp, jnp.broadcast_to(matp[k - 1:k], (k_pad - k, alpha))],
            axis=0)
    pw = jnp.asarray(pow2, jnp.uint32)
    pws = jnp.asarray(pow2_shoup, jnp.uint32)
    if k_pad != k:
        pw = jnp.concatenate(
            [pw, jnp.broadcast_to(pw[k - 1:k], (k_pad - k, pw.shape[1]))])
        pws = jnp.concatenate(
            [pws, jnp.broadcast_to(pws[k - 1:k],
                                   (k_pad - k, pws.shape[1]))])

    gprog = k_pad // R
    ydata = pl.BlockSpec((1, alpha, n1, n2),
                         lambda g, jp: (g, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM)
    matspec = pl.BlockSpec((R, alpha), lambda g, jp: (jp, _I0),
                           memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, n1, n2), lambda g, jp: (g, _I0, _I0),
                         memory_space=pltpu.VMEM)
    grows = pl.BlockSpec((R, n1, n2),
                         lambda g, jp: (_i32(g) * np.int32(gprog) + _i32(jp),
                                        _I0, _I0),
                         memory_space=pltpu.VMEM)
    row0 = pl.BlockSpec((R, n1, n2), lambda g, jp: (jp, _I0, _I0),
                        memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((R, n1, n2),
                        lambda g, jp: (np.int32(gprog) + _i32(jp),
                                       _I0, _I0),
                        memory_space=pltpu.VMEM)
    left = pl.BlockSpec((R, n1, n1), lambda g, jp: (jp, _I0, _I0),
                        memory_space=pltpu.VMEM)
    right = pl.BlockSpec((R, n2, n2), lambda g, jp: (jp, _I0, _I0),
                         memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((R, n1, n2), lambda g, jp: (jp, _I0, _I0),
                      memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((k_pad, 1), lambda g, jp: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    powt = pl.BlockSpec((k_pad, pw.shape[1]), lambda g, jp: (_I0, _I0),
                        memory_space=pltpu.SMEM)
    diag = pl.BlockSpec((k_pad, n_diag), lambda g, jp: (_I0, _I0),
                        memory_space=pltpu.SMEM)

    has_tadd = tensor_add is not None
    d1m = padrows(tensor_add[0]) if has_tadd else jnp.zeros(
        (2 * k_pad, n1, n2), jnp.uint32)
    d2m = padrows(tensor_add[1]) if has_tadd else d1m
    args = [y, matp, v.reshape(2, n1, n2),
            padc(vmul),
            padrows(sub_from), d1m, d1m, d2m, d2m,
            tp.wa, tp.d.reshape(-1, n1, n2), tp.d_shoup.reshape(-1, n1, n2),
            tp.wb, padc(mv.q[:k_pad]), padc(mv.ratio_hi[:k_pad]),
            padc(mv.ratio_lo[:k_pad]), pw, pws,
            tp.pow_diag, tp.pow_diag_shoup,
            padc(epi_scale), padc(epi_scale_shoup)]
    specs = [ydata, matspec, vspec, scalar, grows,
             row0, row1, row0, row1,
             left, tw, tw, right, scalar, scalar, scalar, powt, powt,
             diag, diag, scalar, scalar]
    kern = functools.partial(_bconv_mxu_kernel, t.plane_bits, t.q_bits,
                             alpha, k_pad, R, has_tadd)
    out = pl.pallas_call(
        kern,
        grid=(2, gprog),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (R, n1, n2),
            lambda g, jp: (_i32(g) * np.int32(gprog) + _i32(jp), _I0, _I0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * k_pad, n1, n2), jnp.uint32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    return out.reshape(2, k_pad, n1, n2)[:, :k]


# ---------------------------------------------------------------------------
# moddown + relin-add + rescale in one launch (CKKS epilogue mega-kernel)
# ---------------------------------------------------------------------------

def _intt_core(x, wbi_ref, di_ref, dis_ref, wai_ref, q, pd_ref, pds_ref,
               pd2_ref, pds2_ref, bits, q_bits):
    """Four-step inverse NTT of one canonical (n1, n2) block in VMEM with
    scale-in-fold (single-limb tables at SMEM row 0)."""
    n1, n2 = x.shape
    cs = _csub_for(q_bits)
    xps = _plane_list(x, bits, q_bits)
    wbips = _plane_list(wbi_ref[0], bits, q_bits)
    s = _mm_fold(xps, wbips, q, pd_ref, pds_ref, _I0, bits, n2, cs, q_bits)
    v = cs(mul_mod_shoup_lazy32(s, di_ref[0], dis_ref[0], q), q)
    vps = _plane_list(v, bits, q_bits)
    waips = _plane_list(wai_ref[0], bits, q_bits)
    return _mm_fold(waips, vps, q, pd2_ref, pds2_ref, _I0, bits, n1, cs,
                    q_bits)


def _moddown_rescale_kernel(bits, q_bits, alpha, k, y_ref, mat_ref, v_ref,
                            vm_ref, s_ref, ta0_ref, ta1_ref, tb0_ref,
                            tb1_ref, wa_ref, d_ref, ds_ref, wb_ref,
                            q_ref, rh_ref, rl_ref, p32_ref, p64_ref,
                            pd_ref, pds_ref, pinv_ref, pinvs_ref,
                            hmq_ref, qinv_ref, qinvs_ref, half_ref,
                            wbi_ref, di_ref, dis_ref, wai_ref,
                            pdl_ref, pdsl_ref, pd2l_ref, pds2l_ref,
                            o_ref, scr_ref):
    """Per program (g, j'): moddown row j = (j'+k-1) mod k of keyswitch
    half g, the relin tensor add, and (for j < k-1) the rescale — the
    last limb transforms FIRST so its inverse transform (+half) sits in
    VMEM scratch for every later row of the group.  One forward NTT per
    row: by linearity (mod q, exact),
        out_j = (s_j*P^-1 + c_g - NTT_j(delta_j*P^-1 + delta2_j)) * qlast^-1
    Bit-identical to moddown32_pair + _rescale composed
    (tests/test_pipeline32.py)."""
    gid = _i32(pl.program_id(0))
    jp = _i32(pl.program_id(1))
    jid = jax.lax.rem(jp + np.int32(k - 1), np.int32(k))
    q = q_ref[jid, 0]
    rh = rh_ref[jid, 0]
    rl = rl_ref[jid, 0]
    cs = _csub_for(q_bits)
    shape = y_ref.shape[2:]

    # exact bconv delta for row j (96-bit triple + v floor correction)
    c = jnp.zeros(shape, dtype=jnp.uint32)
    hi = jnp.zeros(shape, dtype=jnp.uint32)
    lo = jnp.zeros(shape, dtype=jnp.uint32)
    for i in range(alpha):
        h, l = m32.mul_wide32(y_ref[0, i], mat_ref[jid, i])
        lo, cr = m32.add_u32_carry(lo, l)
        hi2, cr2 = m32.add_u32_carry(hi, h + cr)
        hi = hi2
        c = c + cr2
    t_c = m32.mul_mod32(m32.barrett_reduce_u32(c, q, rh),
                        p64_ref[jid, 0], q, rh, rl)
    t_h = m32.mul_mod32(m32.barrett_reduce_u32(hi, q, rh),
                        p32_ref[jid, 0], q, rh, rl)
    t_l = m32.barrett_reduce_u32(lo, q, rh)
    delta = m32.add_mod32(m32.add_mod32(t_c, t_h, q), t_l, q)
    delta = m32.sub_mod32(delta, m32.mul_mod32(v_ref[0], vm_ref[jid, 0],
                                               q, rh, rl), q)

    # tensor term c_g staged via scratch plane 1 (branchy per half)
    @pl.when(gid == 0)
    def _c0():
        scr_ref[1] = m32.mul_mod32(ta0_ref[0], tb0_ref[0], q, rh, rl)

    @pl.when(gid > 0)
    def _c1():
        h1, l1 = m32.mul_wide32(ta0_ref[0], tb1_ref[0])
        h2, l2 = m32.mul_wide32(ta1_ref[0], tb0_ref[0])
        hs, ls = m32.add_wide32(h1, l1, h2, l2)
        scr_ref[1] = m32.barrett_reduce_u64_32(hs, ls, q, rh, rl)
    c_g = scr_ref[1]
    pinv = pinv_ref[jid, 0]
    pinvs = pinvs_ref[jid, 0]

    @pl.when(jp == 0)
    def _last_limb():
        # full moddown of the last limb, then its inverse transform + half
        tn = _ntt_core(delta, wa_ref, d_ref, ds_ref, wb_ref, q, pd_ref,
                       pds_ref, jid, bits, q_bits)
        diff = s_ref[0] - tn + q
        m = m32.add_mod32(cs(mul_mod_shoup_lazy32(diff, pinv, pinvs, q), q),
                          c_g, q)
        o_ref[0] = m
        xl = _intt_core(m, wbi_ref, di_ref, dis_ref, wai_ref, q,
                        pdl_ref, pdsl_ref, pd2l_ref, pds2l_ref, bits,
                        q_bits)
        scr_ref[0] = cs(xl + half_ref[0, 0], q)      # q == qlast here

    @pl.when(jp > 0)
    def _rescaled_row():
        red = m32.barrett_reduce_u32(scr_ref[0], q, rh)
        delta2 = m32.sub_mod32(red, hmq_ref[jid, 0], q)
        w = m32.add_mod32(
            cs(mul_mod_shoup_lazy32(delta, pinv, pinvs, q), q), delta2, q)
        tn = _ntt_core(w, wa_ref, d_ref, ds_ref, wb_ref, q, pd_ref,
                       pds_ref, jid, bits, q_bits)
        s_term = cs(mul_mod_shoup_lazy32(s_ref[0], pinv, pinvs, q), q)
        a = m32.add_mod32(s_term, c_g, q)
        diff = a - tn + q
        o_ref[0] = cs(mul_mod_shoup_lazy32(diff, qinv_ref[jid, 0],
                                           qinvs_ref[jid, 0], q), q)


def moddown_rescale_mxu_pallas(y, mat, v, vmul, sub_from, tensor_add,
                               t: MXUNTTTables, pinv, pinv_shoup,
                               half, half_mod_q, qlast_inv,
                               qlast_inv_shoup, interpret=None):
    """Fused CKKS step epilogue: moddown of both keyswitch halves + the
    relin tensor adds + rescale, ONE launch, one forward NTT per row.

    y: (2, alpha, n1, n2) pre-scaled P-row iNTT output; mat: (k, alpha)
    qhat_mod_p; v: (2, n1, n2); sub_from: (2, k, n1, n2) s halves;
    tensor_add = (d1, d2) each (2, k, n1, n2).  Returns (2, k, n1, n2)
    whose rows [0, k-1) are the RESCALED result and row k-1 is the
    unrescaled moddown output (callers slice it off).  Reference flow:
    moddown_from_NTT + add_to_ct + divide_and_round_q_last_ntt
    (rns_bconv.cu:776, evaluate.cu:1545)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    k = int(t.q.shape[0])
    alpha = y.shape[1]
    assert y.shape == (2, alpha, n1, n2), y.shape
    n_diag = t.pow_diag.shape[1]
    kk = np.int32(k)

    def jrow(g, jp):  # actual limb row for program (g, jp)
        return jax.lax.rem(_i32(jp) + np.int32(k - 1), kk)

    ydata = pl.BlockSpec((1, alpha, n1, n2),
                         lambda g, jp: (g, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((k, alpha), lambda g, jp: (_I0, _I0),
                            memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec((1, n1, n2), lambda g, jp: (g, _I0, _I0),
                         memory_space=pltpu.VMEM)
    grow = pl.BlockSpec((1, n1, n2),
                        lambda g, jp: (_i32(g) * kk + jrow(g, jp),
                                       _I0, _I0),
                        memory_space=pltpu.VMEM)
    row0 = pl.BlockSpec((1, n1, n2), lambda g, jp: (jrow(g, jp), _I0, _I0),
                        memory_space=pltpu.VMEM)
    row1 = pl.BlockSpec((1, n1, n2),
                        lambda g, jp: (kk + jrow(g, jp), _I0, _I0),
                        memory_space=pltpu.VMEM)
    left = pl.BlockSpec((1, n1, n1), lambda g, jp: (jrow(g, jp), _I0, _I0),
                        memory_space=pltpu.VMEM)
    right = pl.BlockSpec((1, n2, n2), lambda g, jp: (jrow(g, jp), _I0, _I0),
                         memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((1, n1, n2), lambda g, jp: (jrow(g, jp), _I0, _I0),
                      memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((k, 1), lambda g, jp: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    diag = pl.BlockSpec((k, n_diag), lambda g, jp: (_I0, _I0),
                        memory_space=pltpu.SMEM)
    one = pl.BlockSpec((1, 1), lambda g, jp: (_I0, _I0),
                       memory_space=pltpu.SMEM)
    diag1 = pl.BlockSpec((1, n_diag), lambda g, jp: (_I0, _I0),
                         memory_space=pltpu.SMEM)
    cleft = pl.BlockSpec((1, n1, n1), lambda g, jp: (_I0, _I0, _I0),
                         memory_space=pltpu.VMEM)
    cright = pl.BlockSpec((1, n2, n2), lambda g, jp: (_I0, _I0, _I0),
                          memory_space=pltpu.VMEM)
    ctw = pl.BlockSpec((1, n1, n2), lambda g, jp: (_I0, _I0, _I0),
                       memory_space=pltpu.VMEM)

    mv = t.mv
    col = lambda a: jnp.asarray(a, jnp.uint32).reshape(-1, 1)

    def pad_k(a):  # (k-1,) rescale consts padded to k rows (row k-1 unused)
        a = jnp.asarray(a, jnp.uint32).reshape(-1)
        return jnp.concatenate([a, a[-1:]]).reshape(-1, 1)

    # last-limb inverse tables (single limb, scale-in-fold = 1/N)
    from .ntt_mxu import scaled_diag
    t_last = t.limb_slice(np.array([k - 1]))
    pd2l, pds2l, _ = scaled_diag(
        t_last, t_last.inv_degree,
        (t_last.pow_diag, t_last.pow_diag_shoup, t_last.q_bits))

    d1m = jnp.asarray(tensor_add[0], jnp.uint32).reshape(2 * k, n1, n2)
    d2m = jnp.asarray(tensor_add[1], jnp.uint32).reshape(2 * k, n1, n2)
    args = [y, jnp.asarray(mat, jnp.uint32), v.reshape(2, n1, n2),
            col(vmul),
            jnp.asarray(sub_from, jnp.uint32).reshape(2 * k, n1, n2),
            d1m, d1m, d2m, d2m,
            t.wa, t.d.reshape(-1, n1, n2), t.d_shoup.reshape(-1, n1, n2),
            t.wb, col(mv.q), col(mv.ratio_hi), col(mv.ratio_lo),
            col(mv.pow32), col(mv.pow64), t.pow_diag, t.pow_diag_shoup,
            col(pinv), col(pinv_shoup), pad_k(half_mod_q),
            pad_k(qlast_inv), pad_k(qlast_inv_shoup),
            jnp.asarray(half, jnp.uint32).reshape(1, 1),
            t_last.wbi, t_last.di.reshape(1, n1, n2),
            t_last.di_shoup.reshape(1, n1, n2), t_last.wai,
            t_last.pow_diag, t_last.pow_diag_shoup, pd2l, pds2l]
    specs = [ydata, mat_spec, vspec, scalar, grow,
             row0, row1, row0, row1,
             left, tw, tw, right, scalar, scalar, scalar, scalar, scalar,
             diag, diag, scalar, scalar, scalar, scalar, scalar, one,
             cright, ctw, ctw, cleft, diag1, diag1, diag1, diag1]
    kern = functools.partial(_moddown_rescale_kernel, t.plane_bits,
                             t.q_bits, alpha, k)
    out = pl.pallas_call(
        kern,
        grid=(2, k),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, n1, n2),
                               lambda g, jp: (_i32(g) * kk + jrow(g, jp),
                                              _I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * k, n1, n2), jnp.uint32),
        # plane 0: the group's xl2 = iNTT(m_{k-1}) + half; plane 1: the
        # per-program tensor term staging
        scratch_shapes=[pltpu.VMEM((2, n1, n2), jnp.uint32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    return out.reshape(2, k, n1, n2)


# ---------------------------------------------------------------------------
# modup + evaluation-key inner product in one program
# ---------------------------------------------------------------------------

def _modup_ip_kernel(bits, q_bits, alpha, beta, k_out, k_data, has_self,
                     self_mul, resident_y, preconv, y_ref, mat_ref, *rest):
    rest = list(rest)
    c2_ref = c2b_ref = None
    if has_self:
        c2_ref = rest.pop(0)
        if self_mul:
            c2b_ref = rest.pop(0)
    (evk_ref, wa_ref, d_ref, ds_ref, wb_ref,
     q_ref, rh_ref, rl_ref, p32_ref, p64_ref,
     pd_ref, pds_ref, o_ref, acc_ref) = rest
    jid = _i32(pl.program_id(0))
    did = _i32(pl.program_id(1))
    mrow = did * np.int32(k_out) + jid           # mat row
    q = q_ref[jid, 0]
    rh = rh_ref[jid, 0]
    rl = rl_ref[jid, 0]
    shape = y_ref.shape[2:]  # (n1, n2)

    @pl.when(did == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # digit `did`'s contribution to QlP row j: bconv + NTT (or the
    # passthrough NTT-form row when j lies inside the digit).
    # resident_y: the WHOLE (beta, alpha, n1, n2) y buffer sits in VMEM
    # once (constant block index) and rows are read at the dynamic digit
    # offset.  The per-digit streaming variant re-DMAs the alpha-row
    # block on EVERY program because the grid iterates digits fastest
    # (block index alternates 0,1,0,1..), i.e. k_out*beta*alpha*N*4
    # bytes of HBM traffic — ~730 MB per launch at the capability config
    # vs ~11 MB resident (measured r5; the "crowds VMEM" concern that
    # motivated streaming was mis-priced).
    def _transform(t_ref):
        if preconv:
            # base conversion already done (int8 MXU matmul in XLA);
            # this program only transforms its row
            t_ref[...] = _ntt_core(y_ref[0, 0], wa_ref, d_ref, ds_ref,
                                   wb_ref, q, pd_ref, pds_ref, jid, bits,
                                   q_bits)
            return
        c = jnp.zeros(shape, dtype=jnp.uint32)
        hi = jnp.zeros(shape, dtype=jnp.uint32)
        lo = jnp.zeros(shape, dtype=jnp.uint32)
        for i in range(alpha):
            row = y_ref[did, i] if resident_y else y_ref[0, i]
            h, l = m32.mul_wide32(row, mat_ref[mrow, i])
            lo, cr = m32.add_u32_carry(lo, l)
            hi2, cr2 = m32.add_u32_carry(hi, h + cr)
            hi = hi2
            c = c + cr2
        t_c = m32.mul_mod32(m32.barrett_reduce_u32(c, q, rh),
                            p64_ref[jid, 0], q, rh, rl)
        t_h = m32.mul_mod32(m32.barrett_reduce_u32(hi, q, rh),
                            p32_ref[jid, 0], q, rh, rl)
        t_l = m32.barrett_reduce_u32(lo, q, rh)
        x = m32.add_mod32(m32.add_mod32(t_c, t_h, q), t_l, q)
        t_ref[...] = _ntt_core(x, wa_ref, d_ref, ds_ref, wb_ref, q,
                               pd_ref, pds_ref, jid, bits, q_bits)

    if has_self:
        # predicated: digit-own rows SKIP the bconv+NTT entirely (alpha
        # of every k_out programs per digit — a third of the grid at
        # alpha = k/2) and take the NTT-form input verbatim.  hi clamps
        # to k_data so a short last digit's zero-pad rows are NOT
        # treated as self rows (k % alpha != 0 chains).
        hi_d = jnp.minimum((did + np.int32(1)) * np.int32(alpha),
                           np.int32(k_data))
        in_digit = (jid >= did * np.int32(alpha)) & (jid < hi_d)
        t_ref = acc_ref.at[6]

        @pl.when(jnp.logical_not(in_digit))
        def _compute():
            _transform(t_ref)

        @pl.when(in_digit)
        def _passthrough():
            if self_mul:
                # in-kernel dyadic product: the self rows take
                # a1 ∘ b1 mod q directly, so the tensor term c2 never
                # exists in HBM (reference tensor product fused into the
                # keyswitch the way evaluate.cu:769-796 chains them)
                t_ref[...] = m32.mul_mod32(c2_ref[0], c2b_ref[0], q, rh, rl)
            else:
                t_ref[...] = c2_ref[0]
        t_dj = t_ref[...]
    else:
        t_ref = acc_ref.at[6]
        _transform(t_ref)
        t_dj = t_ref[...]

    # accumulate t_dj * evk[did, half, j] into the two 96-bit triples
    for half in range(2):
        h, l = m32.mul_wide32(t_dj, evk_ref[0, half, 0])
        lo_a, cr = m32.add_u32_carry(acc_ref[3 * half + 2], l)
        hi_a, cr2 = m32.add_u32_carry(acc_ref[3 * half + 1], h + cr)
        acc_ref[3 * half] = acc_ref[3 * half] + cr2
        acc_ref[3 * half + 1] = hi_a
        acc_ref[3 * half + 2] = lo_a

    @pl.when(did == beta - 1)
    def _emit():
        for half in range(2):
            cc = acc_ref[3 * half]
            hh = acc_ref[3 * half + 1]
            ll = acc_ref[3 * half + 2]
            t_c2 = m32.mul_mod32(m32.barrett_reduce_u32(cc, q, rh),
                                 p64_ref[jid, 0], q, rh, rl)
            t_h2 = m32.mul_mod32(m32.barrett_reduce_u32(hh, q, rh),
                                 p32_ref[jid, 0], q, rh, rl)
            t_l2 = m32.barrett_reduce_u32(ll, q, rh)
            o_ref[half, 0] = m32.add_mod32(
                m32.add_mod32(t_c2, t_h2, q), t_l2, q)


def _ip_kernel(beta, t_ref, evk_ref, q_ref, rh_ref, rl_ref, p32_ref,
               p64_ref, o_ref, acc_ref):
    """Evaluation-key inner product over the digit axis: per QlP row j,
    accumulate sum_d t[d,j] * evk[d,half,j] in two VMEM-resident 96-bit
    triples across the (sequential) digit grid axis, reduce once at the
    last digit (reference: key_switch_inner_prod_c2_and_evk,
    eval_key_switch.cu:14-69)."""
    jid = _i32(pl.program_id(0))
    did = _i32(pl.program_id(1))
    q = q_ref[jid, 0]
    rh = rh_ref[jid, 0]
    rl = rl_ref[jid, 0]

    @pl.when(did == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    t_dj = t_ref[0, 0]
    for half in range(2):
        h, l = m32.mul_wide32(t_dj, evk_ref[0, half, 0])
        lo_a, cr = m32.add_u32_carry(acc_ref[3 * half + 2], l)
        hi_a, cr2 = m32.add_u32_carry(acc_ref[3 * half + 1], h + cr)
        acc_ref[3 * half] = acc_ref[3 * half] + cr2
        acc_ref[3 * half + 1] = hi_a
        acc_ref[3 * half + 2] = lo_a

    @pl.when(did == beta - 1)
    def _emit():
        for half in range(2):
            cc = acc_ref[3 * half]
            hh = acc_ref[3 * half + 1]
            ll = acc_ref[3 * half + 2]
            t_c = m32.mul_mod32(m32.barrett_reduce_u32(cc, q, rh),
                                p64_ref[jid, 0], q, rh, rl)
            t_h = m32.mul_mod32(m32.barrett_reduce_u32(hh, q, rh),
                                p32_ref[jid, 0], q, rh, rl)
            t_l = m32.barrett_reduce_u32(ll, q, rh)
            o_ref[half, 0] = m32.add_mod32(
                m32.add_mod32(t_c, t_h, q), t_l, q)


def ip_mxu_pallas(t_up: jnp.ndarray, evk: jnp.ndarray, mv,
                  t: MXUNTTTables, interpret=None):
    """Pure inner-product kernel on the blocked layout: t_up
    (beta, k_out, n1, n2), evk (beta, 2, k_out, [n1, n2]) ->
    (s0, s1) each (k_out, n1, n2) in [0, q).  Bit-identical to
    pipeline32.inner_product32 (the XLA triple path) but keeps the
    per-row accumulators in VMEM and streams evk through the grid —
    the 500+ us of XLA select/subtract fusions the triple path costs at
    L=43 collapse into the kernel (r5 trace)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    beta, k_out = t_up.shape[:2]
    assert t_up.shape[-2:] == (n1, n2)
    evkm = evk.reshape(beta, 2, k_out, n1, n2)
    col = lambda a: jnp.asarray(a, jnp.uint32).reshape(-1, 1)
    t_spec = pl.BlockSpec((1, 1, n1, n2), lambda j, d: (d, j, _I0, _I0),
                          memory_space=pltpu.VMEM)
    evk_spec = pl.BlockSpec((1, 2, 1, n1, n2),
                            lambda j, d: (d, _I0, j, _I0, _I0),
                            memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((k_out, 1), lambda j, d: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_ip_kernel, beta),
        grid=(k_out, beta),
        in_specs=[t_spec, evk_spec, scalar, scalar, scalar, scalar, scalar],
        out_specs=pl.BlockSpec((2, 1, n1, n2),
                               lambda j, d: (_I0, j, _I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, k_out, n1, n2), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((6, n1, n2), jnp.uint32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(t_up, evkm, col(mv.q), col(mv.ratio_hi), col(mv.ratio_lo),
      col(mv.pow32), col(mv.pow64))
    return out[0], out[1]


# fall back to the split modup + XLA inner product when the resident
# y buffer would crowd VMEM (~16 MB/core; tables + evk blocks + scratch
# need the rest); PHANTOM_MODUP_IP=0 disables the mega-kernel entirely,
# PHANTOM_MODUP_IP_MB raises the cap (the capability-matched L=43 config
# has size_ql*N*4 = 11.3 MB and still fits with the 100 MB vmem limit)
MODUP_IP_MAX_Y_BYTES = (
    0 if _os.environ.get("PHANTOM_MODUP_IP") == "0"
    else int(float(_os.environ.get("PHANTOM_MODUP_IP_MB", "14")) * (1 << 20)))


def modup_ip_mxu_pallas(y: jnp.ndarray, mats: jnp.ndarray,
                        c2_ntt: jnp.ndarray, evk: jnp.ndarray,
                        t: MXUNTTTables, k_data=None, preconv=False,
                        alpha=None, interpret=None):
    """Fused modup + hybrid-keyswitch inner product: for each QlP row j,
    every digit's contribution (bconv + NTT, or the NTT-form passthrough
    inside the digit) is multiplied by evk[d, half, j] and accumulated in
    a VMEM-resident 96-bit triple across the digit grid axis — the modup
    tensor t (beta, size_qlp, N) never exists in HBM.

    y: (beta*alpha, N) pre-scaled iNTT rows; mats: (beta, k_out, alpha);
    c2_ntt: (beta*alpha, N); evk: (beta, 2, k_out, N).
    Returns (s0, s1), each (k_out, N) in [0, q) — bit-identical to
    inner_product32(modup_from_ntt32(...)) (reference pipeline:
    ntt_modup.cu + key_switch_inner_prod_c2_and_evk).

    c2_ntt=None is the coefficient-form variant: no passthrough rows —
    the caller's mats carry the digit qhat diagonal so the kernel's
    matmul recovers x_j = y_j * qhat_j for self rows (then transforms
    them like every other row).

    c2_ntt may also be a PAIR (a, b) of NTT-form operands: passthrough
    rows compute a ∘ b mod q in-kernel (the fused tensor product — c2
    itself never materializes).

    preconv=True: y is the PRE-CONVERTED (beta, k_out, n1, n2) delta
    tensor (base conversion already done as an int8 MXU matmul in XLA —
    ~free vs ~10us/row for the in-kernel VPU accumulation at alpha=22;
    self rows arbitrary, never read).  Each program only transforms its
    row and MACs it against evk; `alpha` must be given (digit width for
    the passthrough predicate) and mats is ignored."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    n = n1 * n2
    mv = t.mv
    n_diag = t.pow_diag.shape[1]
    self_mul = isinstance(c2_ntt, tuple)
    has_self = c2_ntt is not None
    resident_y = False
    if preconv:
        assert alpha is not None
        beta, k_out = y.shape[:2]
        assert y.shape[-2:] == (n1, n2), y.shape
        k = beta * alpha
        ym = y
        matm = jnp.zeros((1, 1), jnp.uint32)         # unused in preconv
        y_spec = pl.BlockSpec((1, 1, n1, n2),
                              lambda j, d: (d, j, _I0, _I0),
                              memory_space=pltpu.VMEM)
        mat_spec = pl.BlockSpec((1, 1), lambda j, d: (_I0, _I0),
                                memory_space=pltpu.SMEM)
    else:
        blocked_y = y.ndim == 3 and y.shape[-2:] == (n1, n2)
        k = y.shape[0]
        beta, k_out, alpha = mats.shape
        assert k == beta * alpha
        assert blocked_y or y.shape == (k, n), y.shape
        ym = y.reshape(beta, alpha, n1, n2)
        matm = jnp.asarray(mats, jnp.uint32).reshape(beta * k_out, alpha)
        # resident y: fetched ONCE (constant block index) instead of per
        # program — see the kernel comment.  PHANTOM_MEGA_Y=stream
        # restores the per-digit streaming blocks for A/B.
        resident_y = _os.environ.get("PHANTOM_MEGA_Y",
                                     "resident") == "resident"
        if resident_y:
            y_spec = pl.BlockSpec((beta, alpha, n1, n2),
                                  lambda j, d: (_I0, _I0, _I0, _I0),
                                  memory_space=pltpu.VMEM)
        else:
            y_spec = pl.BlockSpec((1, alpha, n1, n2),
                                  lambda j, d: (d, _I0, _I0, _I0),
                                  memory_space=pltpu.VMEM)
        mat_spec = pl.BlockSpec((beta * k_out, alpha),
                                lambda j, d: (_I0, _I0),
                                memory_space=pltpu.SMEM)
    assert t.q.shape[0] == k_out, (t.q.shape, k_out)
    # pass evk pre-blocked (beta, 2, k_out, n1, n2) to avoid re-tiling the
    # ~44 MB key stream on every step
    evkm = evk.reshape(beta, 2, k_out, n1, n2)
    c2_spec = pl.BlockSpec((1, n1, n2), lambda j, d: (_mod(j, k), _I0, _I0),
                           memory_space=pltpu.VMEM)
    evk_spec = pl.BlockSpec((1, 2, 1, n1, n2), lambda j, d: (d, _I0, j, _I0, _I0),
                            memory_space=pltpu.VMEM)
    left = pl.BlockSpec((1, n1, n1), lambda j, d: (j, _I0, _I0),
                        memory_space=pltpu.VMEM)
    right = pl.BlockSpec((1, n2, n2), lambda j, d: (j, _I0, _I0),
                         memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((1, n1, n2), lambda j, d: (j, _I0, _I0),
                      memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((k_out, 1), lambda j, d: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    diag = pl.BlockSpec((k_out, n_diag), lambda j, d: (_I0, _I0),
                        memory_space=pltpu.SMEM)

    col = lambda a: jnp.asarray(a, jnp.uint32).reshape(-1, 1)
    if k_data is None:
        k_data = k
    kern = functools.partial(_modup_ip_kernel, t.plane_bits, t.q_bits,
                             alpha, beta, k_out, k_data, has_self, self_mul,
                             resident_y, preconv)
    args = [ym, matm]
    specs = [y_spec, mat_spec]
    if self_mul:
        args += [c2_ntt[0].reshape(k, n1, n2), c2_ntt[1].reshape(k, n1, n2)]
        specs += [c2_spec, c2_spec]
    elif has_self:
        args += [c2_ntt.reshape(k, n1, n2)]
        specs += [c2_spec]
    args += [evkm, t.wa, t.d.reshape(-1, n1, n2),
             t.d_shoup.reshape(-1, n1, n2), t.wb,
             col(mv.q), col(mv.ratio_hi), col(mv.ratio_lo),
             col(mv.pow32), col(mv.pow64), t.pow_diag, t.pow_diag_shoup]
    specs += [evk_spec, left, tw, tw, right,
              scalar, scalar, scalar, scalar, scalar, diag, diag]
    out = pl.pallas_call(
        kern,
        grid=(k_out, beta),
        in_specs=specs,
        out_specs=pl.BlockSpec((2, 1, n1, n2), lambda j, d: (_I0, j, _I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, k_out, n1, n2), jnp.uint32),
        # 6 accumulator planes (two 96-bit triples) + 1 staging plane for
        # the (possibly predicated) digit contribution
        scratch_shapes=[pltpu.VMEM((7, n1, n2), jnp.uint32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    blocked_out = preconv or (y.ndim == 3 and y.shape[-2:] == (n1, n2))
    if blocked_out:
        out = out.reshape(2, k_out, n1, n2)
    else:
        out = out.reshape(2, k_out, n)
    return out[0], out[1]
