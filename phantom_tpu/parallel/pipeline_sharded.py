"""Coefficient-sharded CKKS mult+relin+rescale: the full hot path with N
sharded over the mesh, all compute local except the NTT phase-boundary
all-to-alls.

This wires the coefficient-sharded NTT (ntt_sharded.py) into the hybrid
keyswitch — the integration SURVEY §5.7 / BASELINE's north star calls for.
Layout: every polynomial lives as (L, n1, n2) with n2 sharded over the
"coeff" mesh axis ("dp" batches ciphertext pairs).  In this layout

  - dyadic tensor products, bconv matmuls (contraction over LIMBS), the
    keyswitch digit inner product, and all scalar corrections are
    embarrassingly parallel over coefficients -> zero communication;
  - each NTT's two phases are local, with one all-to-all at the phase
    boundary and one restoring the canonical layout — the distributed
    analogue of fntt_2d.cu's shared-memory exchange (reference:
    src/ntt/fntt_2d.cu:9-99).

Bit-identical to evaluate.multiply_and_relin + rescale_to_next
(tests/test_pipeline_sharded.py), with the HLO asserted to contain
all-to-all and no all-gather in the steady state.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import modmath as mm
from ..ops import ntt as ntt64
from .ntt_sharded import (ShardedNTTTables, ntt_forward_sharded3,
                          ntt_inverse_sharded3, prepare_sharded_tables)


@flax.struct.dataclass
class ShardedPipelineConsts:
    """All device constants for one (level, relin key) pair, as a pytree
    passed through jit (never captured); geometry fields are static."""

    t_qlp: ShardedNTTTables = None
    t_ql: ShardedNTTTables = None
    t_p: ShardedNTTTables = None
    t_ql_next: ShardedNTTTables = None
    t_last: ShardedNTTTables = None
    ks: object = None         # context.KeySwitchConsts (u64)
    rescale: object = None    # context.RescaleConsts
    mv_ql: object = None      # ModulusVec over Ql
    evk: jnp.ndarray = None   # (beta, 2, size_qlp, N)
    n1: int = flax.struct.field(pytree_node=False, default=0)
    n2: int = flax.struct.field(pytree_node=False, default=0)
    size_ql: int = flax.struct.field(pytree_node=False, default=0)
    size_p: int = flax.struct.field(pytree_node=False, default=0)


def build_sharded_consts(ctx, rlk, chain_index: int = 1):
    from ..schemes.keyswitch import qlp_rows
    cd = ctx.get_context_data(chain_index)
    k = cd.size_ql
    rows = qlp_rows(ctx, k)
    t_qlp = prepare_sharded_tables(ntt64._limb_gather(ctx.ntt, rows))
    beta = len(cd.ks.digit_convs)
    evk_flat = np.asarray(rlk.data)[:beta][:, :, np.asarray(rows)]
    # 3D coefficient layout (n1, n2) to match the pipeline's arrays
    evk = jnp.asarray(evk_flat.reshape(evk_flat.shape[:-1]
                                       + (t_qlp.n1, t_qlp.n2)))
    return ShardedPipelineConsts(
        t_qlp=t_qlp,
        t_ql=prepare_sharded_tables(ctx.tables_q(k)),
        t_p=prepare_sharded_tables(ctx.tables_p()),
        t_ql_next=prepare_sharded_tables(ctx.tables_q(k - 1)),
        t_last=prepare_sharded_tables(ntt64._limb_slice(ctx.ntt, (k - 1, k))),
        ks=cd.ks,
        rescale=cd.rescale,
        mv_ql=cd.mv,
        evk=evk,
        n1=t_qlp.n1, n2=t_qlp.n2,
        size_ql=k, size_p=ctx.params.size_p)


# -- 3D (L, n1, n2) u64 helpers: per-limb consts broadcast over both
#    coefficient axes; contraction only ever over limbs (local) -------------

def _b3(a):
    return a[:, None, None]


def _tensor_2x2_3(mv, a, b):
    q = _b3(mv.q)
    rlo = _b3(mv.ratio_lo)
    rhi = _b3(mv.ratio_hi)
    c0 = mm.mul_mod(a[0], b[0], q, rlo, rhi)
    # cross terms: one lazy 128-bit add, one Barrett (2q^2 < q*2^64)
    h1, l1 = mm.mul_wide(a[0], b[1])
    h2, l2 = mm.mul_wide(a[1], b[0])
    hs, ls = mm.add_wide(h1, l1, h2, l2)
    c1 = mm.barrett_reduce_u128(hs, ls, q, rlo, rhi)
    c2 = mm.mul_mod(a[1], b[1], q, rlo, rhi)
    return c0, c1, c2


def _accumulate3(y, mat):
    """sum_i y[i] * mat[:, i] with a 128-bit accumulator; y: (k_in, n1, n2),
    mat: (k_out, k_in) -> (hi, lo) of (k_out, n1, n2)."""
    k_in = y.shape[0]
    k_out = mat.shape[0]
    sh = (k_out,) + y.shape[1:]
    init = (jnp.zeros(sh, dtype=jnp.uint64), jnp.zeros(sh, dtype=jnp.uint64))

    def body(acc, inp):
        hi, lo = acc
        yi, mi = inp
        h, l = mm.mul_wide(yi[None], mi[:, None, None])
        return mm.add_wide(hi, lo, h, l), None

    (hi, lo), _ = jax.lax.scan(body, init, (y, mat.T), unroll=4)
    return hi, lo


def _bconv_approx3(x, c):
    """bconv.bconv_approx on 3D arrays (mirrors ops/bconv.py)."""
    y = mm.mul_mod_shoup(x, _b3(c.qhat_inv), _b3(c.qhat_inv_shoup),
                         _b3(c.ibase.q))
    hi, lo = _accumulate3(y, c.qhat_mod_p)
    p = _b3(c.obase.q)
    rlo = _b3(c.obase.ratio_lo)
    rhi = _b3(c.obase.ratio_hi)
    hi_red = mm.barrett_reduce_u64(hi, p, rhi)
    lo_red = mm.barrett_reduce_u64(lo, p, rhi)
    hi_term = mm.mul_mod(hi_red, _b3(c.pow64_mod_p), p, rlo, rhi)
    return mm.add_mod(hi_term, lo_red, p)


def _floor_sum_div3(y, c):
    """v = floor(sum y_i / q_i), 2^-128 fixed point (ops/bconv.py
    floor_sum_div_arrays on 3D)."""
    q = _b3(c.ibase.q)
    rlo = _b3(c.ibase.ratio_lo)
    rhi = _b3(c.ibase.ratio_hi)
    yU = y * _b3(c.U)
    h, l = mm.mul_wide(y, _b3(c.V))
    q1, r1 = mm.barrett_div_mod_u128(h, l, q, rlo, rhi)
    s2, _ = mm.barrett_div_mod_u128(r1, jnp.zeros_like(r1), q, rlo, rhi)
    sh = y.shape[1:]
    a_hi = jnp.zeros(sh, dtype=jnp.uint64)
    a_lo = jnp.zeros(sh, dtype=jnp.uint64)
    b_hi = jnp.zeros(sh, dtype=jnp.uint64)
    b_lo = jnp.zeros(sh, dtype=jnp.uint64)
    for i in range(y.shape[0]):
        a_lo, cr = mm.add_u64_carry(a_lo, yU[i])
        a_hi = a_hi + cr
        a_lo, cr = mm.add_u64_carry(a_lo, q1[i])
        a_hi = a_hi + cr
        b_lo, cr = mm.add_u64_carry(b_lo, s2[i])
        b_hi = b_hi + cr
    _, cr2 = mm.add_u64_carry(a_lo, b_hi)
    return a_hi + cr2


def _bconv_exact3(x, c):
    y = mm.mul_mod_shoup(x, _b3(c.qhat_inv), _b3(c.qhat_inv_shoup),
                         _b3(c.ibase.q))
    hi, lo = _accumulate3(y, c.qhat_mod_p)
    p = _b3(c.obase.q)
    rlo = _b3(c.obase.ratio_lo)
    rhi = _b3(c.obase.ratio_hi)
    hi_red = mm.barrett_reduce_u64(hi, p, rhi)
    lo_red = mm.barrett_reduce_u64(lo, p, rhi)
    raw = mm.add_mod(mm.mul_mod(hi_red, _b3(c.pow64_mod_p), p, rlo, rhi),
                     lo_red, p)
    v = _floor_sum_div3(y, c)
    corr = mm.mul_mod(v[None], _b3(c.q_mod_p), p, rlo, rhi)
    return mm.sub_mod(raw, corr, p)


def _sr_exact3(x, c):
    """3D mirror of scaleround.scale_and_round_exact (v-free exact
    round((num/den)*x), 2^-128 fixed-point fraction)."""
    d_q = _b3(c.ibase.q)
    d_rlo = _b3(c.ibase.ratio_lo)
    d_rhi = _b3(c.ibase.ratio_hi)
    y = mm.mul_mod_shoup(x, _b3(c.ihat_inv), _b3(c.ihat_inv_shoup), d_q)
    hi, lo = _accumulate3(y, c.omega_mod_out)
    out_q = _b3(c.obase.q)
    out_rlo = _b3(c.obase.ratio_lo)
    out_rhi = _b3(c.obase.ratio_hi)
    pow64 = _b3(c.pow64_mod_out)
    hi_red = mm.barrett_reduce_u64(hi, out_q, out_rhi)
    lo_red = mm.barrett_reduce_u64(lo, out_q, out_rhi)
    int_part = mm.add_mod(
        mm.mul_mod(hi_red, pow64, out_q, out_rlo, out_rhi), lo_red, out_q)

    ph, plv = mm.mul_wide(y, _b3(c.rho))
    g, r = mm.barrett_div_mod_u128(ph, plv, d_q, d_rlo, d_rhi)
    f2, _ = mm.barrett_div_mod_u128(r, jnp.zeros_like(r), d_q, d_rlo, d_rhi)
    sh = y.shape[1:]
    g_hi = jnp.zeros(sh, dtype=jnp.uint64)
    g_lo = jnp.zeros(sh, dtype=jnp.uint64)
    e_hi = jnp.zeros(sh, dtype=jnp.uint64)
    e_lo = jnp.zeros(sh, dtype=jnp.uint64)
    for i in range(y.shape[0]):
        g_lo, cr = mm.add_u64_carry(g_lo, g[i])
        g_hi = g_hi + cr
        e_lo, cr = mm.add_u64_carry(e_lo, f2[i])
        e_hi = e_hi + cr
    _, c3 = mm.add_u64_carry(e_lo, jnp.uint64(1 << 63) * jnp.ones_like(e_lo))
    g_lo, cr = mm.add_u64_carry(g_lo, e_hi + c3)
    g_hi = g_hi + cr
    gh_red = mm.barrett_reduce_u64(g_hi[None], out_q, out_rhi)
    gl_red = mm.barrett_reduce_u64(g_lo[None], out_q, out_rhi)
    frac_part = mm.add_mod(
        mm.mul_mod(gh_red, pow64, out_q, out_rlo, out_rhi), gl_red, out_q)
    return mm.add_mod(int_part, frac_part, out_q)


def _constrain(mesh, x):
    spec = (None,) * (x.ndim - 1) + ("coeff",)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def _modup3(c: ShardedPipelineConsts, mesh, c2_coeff):
    """(size_ql, n1, n2) coeff form -> (beta, size_qlp, n1, n2) NTT form."""
    k = c.size_ql
    alpha = c.size_p
    beta = len(c.ks.digit_convs)
    out = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        x = _constrain(mesh, c2_coeff[lo:hi])
        compl = _constrain(mesh, _bconv_approx3(x, c.ks.digit_convs[d]))
        assembled = _constrain(
            mesh, jnp.concatenate([compl[:lo], x, compl[lo:]], axis=0))
        out.append(ntt_forward_sharded3(assembled, c.t_qlp, mesh, "coeff"))
    return jnp.stack(out)


def _inner_product3(c: ShardedPipelineConsts, t_modup):
    ks = c.ks
    beta = t_modup.shape[0]
    q = _b3(ks.qlp.q)
    rlo = _b3(ks.qlp.ratio_lo)
    rhi = _b3(ks.qlp.ratio_hi)
    pow64 = _b3(ks.pow64_mod_qlp)
    halves = []
    for j in range(2):
        hi = jnp.zeros(t_modup.shape[1:], dtype=jnp.uint64)
        lo = jnp.zeros(t_modup.shape[1:], dtype=jnp.uint64)
        for d in range(beta):
            h, l = mm.mul_wide(t_modup[d], c.evk[d, j])
            hi, lo = mm.add_wide(hi, lo, h, l)
        hi_red = mm.barrett_reduce_u64(hi, q, rhi)
        lo_red = mm.barrett_reduce_u64(lo, q, rhi)
        halves.append(mm.add_mod(
            mm.mul_mod(hi_red, pow64, q, rlo, rhi), lo_red, q))
    return halves


def _inner_product3_constrained(c, mesh, t_modup):
    s0, s1 = _inner_product3(c, _constrain(mesh, t_modup))
    return _constrain(mesh, s0), _constrain(mesh, s1)


def _moddown_delta3(ks, x_p):
    """delta == x (mod P); BGV additionally forces delta == 0 (mod t)
    (3D mirror of keyswitch._moddown_delta)."""
    if ks.p_to_t is None:
        return _bconv_exact3(x_p, ks.p_to_q)
    q = _b3(ks.p_to_q.obase.q)
    p_q = _b3(ks.p_to_q.ibase.q)
    shifted = mm.add_mod(x_p, _b3(ks.phalf_mod_p), p_q)
    dq = mm.sub_mod(_bconv_exact3(shifted, ks.p_to_q),
                    _b3(ks.phalf_mod_q), q)
    t = ks.t_mv.q[0]
    dt = mm.sub_mod(_bconv_exact3(shifted, ks.p_to_t), ks.phalf_mod_t, t)
    u = mm.mul_mod(dt, ks.neg_pinv_mod_t, t, ks.t_mv.ratio_lo[0],
                   ks.t_mv.ratio_hi[0])
    corr = mm.mul_mod(u, _b3(ks.bigp_mod_q), q,
                      _b3(ks.p_to_q.obase.ratio_lo),
                      _b3(ks.p_to_q.obase.ratio_hi))
    return mm.add_mod(dq, corr, q)


def _moddown3(c: ShardedPipelineConsts, mesh, x):
    """(size_qlp, n1, n2) NTT form -> (size_ql, n1, n2) NTT form."""
    ks = c.ks
    k = c.size_ql
    x_q = _constrain(mesh, x[:k])
    x_p = ntt_inverse_sharded3(x[k:], c.t_p, mesh, "coeff")
    delta = _constrain(mesh, _moddown_delta3(ks, x_p))
    delta_ntt = ntt_forward_sharded3(delta, c.t_ql, mesh, "coeff")
    q = _b3(c.mv_ql.q)
    diff = mm.sub_mod(x_q, delta_ntt, q)
    return mm.mul_mod_shoup(diff, _b3(ks.pinv_mod_q), _b3(ks.pinv_shoup), q)


def _rescale3(c: ShardedPipelineConsts, mesh, x):
    """(size, k, n1, n2) NTT form -> (size, k-1, n1, n2)."""
    rc = c.rescale
    k = c.size_ql
    size = x.shape[0]
    xl = jnp.stack([
        ntt_inverse_sharded3(x[i, k - 1:k], c.t_last, mesh, "coeff")
        for i in range(size)])                       # (size, 1, n1, n2)
    qlast = c.mv_ql.q[k - 1]
    xl = mm.add_mod(xl, rc.half, qlast)
    rest_q = c.mv_ql.q[:k - 1][:, None, None]
    rest_rhi = c.mv_ql.ratio_hi[:k - 1][:, None, None]
    red = mm.barrett_reduce_u64(xl, rest_q, rest_rhi)   # (size, k-1, n1, n2)
    delta = _constrain(mesh, mm.sub_mod(red, rc.half_mod_q[:, None, None],
                                        rest_q))
    delta_ntt = jnp.stack([
        ntt_forward_sharded3(delta[i], c.t_ql_next, mesh, "coeff")
        for i in range(size)])
    diff = mm.sub_mod(x[:, :k - 1], delta_ntt, rest_q)
    return mm.mul_mod_shoup(diff, rc.qlast_inv[:, None, None],
                            rc.qlast_inv_shoup[:, None, None], rest_q)


def sharded_mult_relin_rescale(c: ShardedPipelineConsts, mesh: Mesh,
                               d1: jnp.ndarray, d2: jnp.ndarray):
    """d1, d2: (2, size_ql, n1, n2) NTT form, n2 sharded over "coeff".

    Returns (2, size_ql - 1, n1, n2).  Bit-identical to the local
    evaluate.multiply_and_relin + rescale_to_next."""
    d1 = _constrain(mesh, d1)
    d2 = _constrain(mesh, d2)
    c0, c1, c2 = _tensor_2x2_3(c.mv_ql, d1, d2)
    c2_coeff = ntt_inverse_sharded3(c2, c.t_ql, mesh, "coeff")
    t_up = _modup3(c, mesh, c2_coeff)
    s0, s1 = _inner_product3_constrained(c, mesh, t_up)
    q = _b3(c.mv_ql.q)
    out0 = mm.add_mod(c0, _moddown3(c, mesh, s0), q)
    out1 = mm.add_mod(c1, _moddown3(c, mesh, s1), q)
    return _rescale3(c, mesh, _constrain(mesh, jnp.stack([out0, out1])))


def sharded_bgv_mult_relin_modswitch(c: ShardedPipelineConsts, mesh: Mesh,
                                     bgv, d1, d2):
    """BGV multiply + relinearize (t-corrected moddown) + mod switch,
    coefficient-sharded (mirror of the BGV verbs; the caller tracks the
    host-side correction factor as in the local evaluator).

    bgv: the level's context.BGVConsts (neg_qlast_inv_mod_t etc.);
    d1, d2: (2, size_ql, n1, n2) u64 NTT form."""
    ks = c.ks
    k = c.size_ql
    d1 = _constrain(mesh, d1)
    d2 = _constrain(mesh, d2)
    c0, c1, c2 = _tensor_2x2_3(c.mv_ql, d1, d2)
    c2_coeff = ntt_inverse_sharded3(c2, c.t_ql, mesh, "coeff")
    t_up = _modup3(c, mesh, c2_coeff)
    s0, s1 = _inner_product3_constrained(c, mesh, t_up)
    q = _b3(c.mv_ql.q)
    out0 = mm.add_mod(c0, _moddown3(c, mesh, s0), q)
    out1 = mm.add_mod(c1, _moddown3(c, mesh, s1), q)
    x = _constrain(mesh, jnp.stack([out0, out1]))

    # mod switch: delta == c (mod q_last), == 0 (mod t), exact division
    rc = c.rescale
    t = bgv.t_mv.q[0]
    t_rhi = bgv.t_mv.ratio_hi[0]
    c_last = jnp.stack([
        ntt_inverse_sharded3(x[i, k - 1:k], c.t_last, mesh, "coeff")
        for i in range(2)])
    r_t = mm.barrett_reduce_u64(c_last, t, t_rhi)
    u = mm.mul_mod(r_t, bgv.neg_qlast_inv_mod_t, t,
                   bgv.t_mv.ratio_lo[0], t_rhi)
    rest_q = c.mv_ql.q[:k - 1][:, None, None]
    rest_rlo = c.mv_ql.ratio_lo[:k - 1][:, None, None]
    rest_rhi = c.mv_ql.ratio_hi[:k - 1][:, None, None]
    c_last_mod_qi = mm.barrett_reduce_u64(c_last, rest_q, rest_rhi)
    delta = mm.add_mod(
        c_last_mod_qi,
        mm.mul_mod(u, bgv.qlast_mod_qi[:, None, None], rest_q, rest_rlo,
                   rest_rhi),
        rest_q)
    delta = _constrain(mesh, delta)
    delta_ntt = jnp.stack([
        ntt_forward_sharded3(delta[i], c.t_ql_next, mesh, "coeff")
        for i in range(2)])
    diff = mm.sub_mod(x[:, :k - 1], delta_ntt, rest_q)
    return mm.mul_mod_shoup(diff, rc.qlast_inv[:, None, None],
                            rc.qlast_inv_shoup[:, None, None], rest_q)


@flax.struct.dataclass
class BFVShardedConsts:
    """Extra tables for the coefficient-sharded BFV HPS multiply."""

    base: ShardedPipelineConsts = None
    hps: object = None            # context.HPSMulConsts (u64)
    mv_d: object = None           # ModulusVec over D = Ql u Rl
    t_d: ShardedNTTTables = None  # sharded tables over D


def build_bfv_sharded_consts(ctx, rlk, chain_index: int = 1):
    from ..ops import ntt as ntt64
    base = build_sharded_consts(ctx, rlk, chain_index)
    cd = ctx.get_context_data(chain_index)
    k = cd.size_ql
    t_d64 = ntt64.concat_tables(ctx.tables_q(k), ctx.tables_r(k + 1))
    return BFVShardedConsts(
        base=base,
        hps=cd.hps,
        mv_d=cd.hps.dbase,
        t_d=prepare_sharded_tables(t_d64),
    )


def sharded_bfv_mult_relin(bc3: BFVShardedConsts, mesh: Mesh, d1, d2):
    """BFV HPS multiply + relinearize, coefficient-sharded (mirror of
    evaluate.bfv_multiply_hps + relinearize).

    d1, d2: (2, size_ql, n1, n2) u64 coefficient form ->
    (2, size_ql, n1, n2)."""
    c = bc3.base
    ks = c.ks
    hps = bc3.hps
    k = c.size_ql

    def lift(d):
        polys = []
        for i in range(d.shape[0]):
            x_q = _constrain(mesh, d[i])
            x_r = _constrain(mesh, _bconv_exact3(x_q, hps.q_to_r))
            polys.append(jnp.concatenate([x_q, x_r], axis=0))
        return jnp.stack(polys)

    a = jnp.stack([ntt_forward_sharded3(p_, bc3.t_d, mesh, "coeff")
                   for p_ in lift(d1)])
    b = jnp.stack([ntt_forward_sharded3(p_, bc3.t_d, mesh, "coeff")
                   for p_ in lift(d2)])
    t0, t1, t2 = _tensor_2x2_3(bc3.mv_d, a, b)
    prod = jnp.stack([
        ntt_inverse_sharded3(p_, bc3.t_d, mesh, "coeff")
        for p_ in (t0, t1, t2)])

    # round(t/Ql): D -> Rl (v-free exact), centered shift, exact Rl -> Ql
    outs = []
    for i in range(3):
        w_r = _sr_exact3(_constrain(mesh, prod[i]), hps.sr_to_r)
        shifted = mm.add_mod(w_r, _b3(hps.rl_half_mod_r),
                             _b3(hps.sr_to_r.obase.q))
        conv = _bconv_exact3(_constrain(mesh, shifted), hps.r_to_q)
        outs.append(mm.sub_mod(conv, _b3(hps.rl_half_mod_q),
                               _b3(hps.r_to_q.obase.q)))

    # relinearize c2 (coefficient-form keyswitch) and fold into c0, c1
    t_up = _modup3(c, mesh, _constrain(mesh, outs[2]))
    s0, s1 = _inner_product3_constrained(c, mesh, t_up)
    sw0 = ntt_inverse_sharded3(_moddown3(c, mesh, s0), c.t_ql, mesh, "coeff")
    sw1 = ntt_inverse_sharded3(_moddown3(c, mesh, s1), c.t_ql, mesh, "coeff")
    q = _b3(c.mv_ql.q)
    return jnp.stack([mm.add_mod(outs[0], sw0, q),
                      mm.add_mod(outs[1], sw1, q)])


def build_sharded_step(ctx, rlk, mesh: Mesh, chain_index: int = 1):
    """Jitted batched step over a ("dp", "coeff") mesh.

    Returns (consts, step) with step(d1, d2) over (B, 2, L, n1, n2)
    batches; B sharded over "dp", n2 over "coeff"."""
    consts = build_sharded_consts(ctx, rlk, chain_index)

    def one(cc, d1, d2):
        return sharded_mult_relin_rescale(cc, mesh, d1, d2)

    batched = jax.vmap(one, in_axes=(None, 0, 0))
    sh = NamedSharding(mesh, P("dp", None, None, None, "coeff"))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(batched, in_shardings=(rep, sh, sh), out_shardings=sh)
    return consts, lambda d1, d2: jitted(consts, d1, d2)
