"""BFV HPS multiply (+ relinearize) on the 32-bit fast path.

u32 mirror of evaluate.bfv_multiply_hps + relinearize (reference:
bfv_multiply_hps, src/evaluate.cu:648-817; bfv_mul_relin_hps, :819):
exact lift Ql -> D = Ql u Rl, dyadic product in NTT(D), exact v-free
round(t/Ql * .) back to Ql (through Rl with the centered half-shift),
then hybrid keyswitch of c2 with the shared KeySwitch32 engine.

Bit-identical to the u64 evaluator path (tested in tests/test_fastpath32.py).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

from . import bconv32 as bc32
from . import modmath32 as m32
from . import scaleround32 as sr32
from . import ntt_mxu
from .bconv32 import BaseConvConsts32, ModulusVec32, modulus_vec32
from .pipeline32 import (KeySwitch32, _conv_tables, _fwd, _inv, _qcol,
                         _tensor_2x2, _u32, build_keyswitch32, convert_key32,
                         keyswitch32)


@flax.struct.dataclass
class BFVPipeline32:
    """Precomputed u32 state for BFV HPS multiply+relin at one level."""

    ks: KeySwitch32 = None
    evk: jnp.ndarray = None          # (beta, 2, size_qlp, N) u32 relin key
    mv_d: ModulusVec32 = None        # combined base D = Ql u Rl
    t_d: object = None               # NTT tables over D
    q_to_r: BaseConvConsts32 = None  # exact Ql -> Rl lift
    sr_to_r: sr32.ExactScaleRound32 = None  # round(t/Ql): D -> Rl
    r_to_q: BaseConvConsts32 = None  # exact Rl -> Ql
    rl_half_mod_r: jnp.ndarray = None
    rl_half_mod_q: jnp.ndarray = None
    # HPSoverQ: 1/Ql moves onto ct2 before the product
    sr_ql_to_rl: sr32.ExactScaleRound32 = None  # round(Rl/Ql): Ql -> Rl
    sr_final_overq: sr32.ExactScaleRound32 = None  # round(t/Rl): D -> Ql
    # fused lift: (size_d, size_ql) matrix [qhat_i mod d_j] over ALL D
    # rows — for the Ql rows the v floor term vanishes (Q = 0 mod q_j),
    # so one bconv+NTT kernel lifts AND transforms every D row
    lift_mats: Optional[jnp.ndarray] = None
    lift_vmul: Optional[jnp.ndarray] = None


def build_bfv32(ctx, rlk, chain_index: int = 1,
                use_pallas: bool = False) -> BFVPipeline32:
    from ..host.rns import BaseConverter, RNSBase
    from ..ops import ntt as ntt64mod
    cd = ctx.get_context_data(chain_index)
    hps = cd.hps
    k = cd.size_ql
    ql = list(cd.moduli)
    rl = [int(v) for v in np.asarray(hps.sr_to_r.obase.q)]
    d_moduli = ql + rl
    t = int(ctx.params.plain_modulus)
    big_ql = 1
    for q in ql:
        big_ql *= q
    big_rl = 1
    for r in rl:
        big_rl *= r
    t_d64 = ntt64mod.concat_tables(ctx.tables_q(k), ctx.tables_r(k + 1))
    # fused-lift matrix over ALL D rows: conv of x = sum_i y_i*qhat_i - v*Q
    # with Q = 0 mod q_j on the Ql rows (exact recombine, no correction)
    ql_to_ql = BaseConverter(RNSBase(ql), RNSBase(ql))
    lift_mats = np.concatenate(
        [np.array(ql_to_ql.qhat_mod_p, dtype=np.uint32),
         np.array(BaseConverter(RNSBase(ql), RNSBase(rl)).qhat_mod_p,
                  dtype=np.uint32)], axis=0)
    lift_vmul = np.concatenate(
        [np.zeros(k, dtype=np.uint32),
         np.array(BaseConverter(RNSBase(ql),
                                RNSBase(rl)).q_mod_p, dtype=np.uint32)])
    return BFVPipeline32(
        lift_mats=jnp.asarray(lift_mats),
        lift_vmul=jnp.asarray(lift_vmul),
        ks=build_keyswitch32(ctx, chain_index, use_pallas),
        evk=convert_key32(ctx, rlk.data, chain_index),
        mv_d=modulus_vec32(d_moduli),
        t_d=_conv_tables(t_d64, use_pallas),
        q_to_r=bc32.consts32_from_host(
            BaseConverter(RNSBase(ql), RNSBase(rl))),
        sr_to_r=sr32.make_exact_scale_round32(d_moduli, t, big_ql, rl),
        r_to_q=bc32.consts32_from_host(
            BaseConverter(RNSBase(rl), RNSBase(ql))),
        rl_half_mod_r=_u32(hps.rl_half_mod_r),
        rl_half_mod_q=_u32(hps.rl_half_mod_q),
        sr_ql_to_rl=sr32.make_exact_scale_round32(ql, big_rl, big_ql, rl),
        sr_final_overq=sr32.make_exact_scale_round32(d_moduli, t, big_rl,
                                                     ql),
    )


def _scale_and_round_hps32(p: BFVPipeline32, x_d: jnp.ndarray) -> jnp.ndarray:
    """round((t/Ql) * x) : D -> Ql via the exact Rl intermediate with the
    centered half-shift (mirror of scaleround.scale_and_round_hps)."""
    w_r = sr32.scale_and_round_exact32(x_d, p.sr_to_r)
    shifted = m32.add_mod32(w_r, _qcol(p.rl_half_mod_r, w_r),
                            _qcol(p.sr_to_r.obase.q, w_r))
    conv = bc32.bconv_exact32(shifted, p.r_to_q)
    return m32.sub_mod32(conv, _qcol(p.rl_half_mod_q, conv),
                         _qcol(p.r_to_q.obase.q, conv))


def _lift_ntt_fused(p: BFVPipeline32, polys: jnp.ndarray) -> jnp.ndarray:
    """(P, size_ql, [n1, n2]) coeff form -> (P, size_d, ..) NTT over D in
    ONE bconv+NTT launch: every D row is the exact conversion
    sum_i y_i*qhat_i - v*Q of the pre-scaled y = x*QhatInv — on the Ql
    rows Q = 0 mod q_j, so the same contraction reproduces x exactly
    (no identity/passthrough special case).  Replaces the XLA
    bconv_exact per poly + separate fNTT (their plane-extract/recombine
    fusions dominated the BFV step's device time, r5 trace)."""
    import jax

    from . import ntt_mxu_pallas as nmp
    ks = p.ks
    c = p.q_to_r
    bb = (slice(None),) + (None,) * (polys.ndim - 2)
    y = m32.mul_mod_shoup32(polys, c.qhat_inv[bb], c.qhat_inv_shoup[bb],
                            c.ibase.q[bb])
    v = jax.vmap(lambda yy: bc32.floor_sum_div32(yy, c))(y)
    np_ = polys.shape[0]
    mats = jnp.broadcast_to(p.lift_mats[None],
                            (np_,) + p.lift_mats.shape)
    return nmp.bconv_ntt_forward_mxu_pallas(y, mats, p.t_d, v=v,
                                            vmul=p.lift_vmul)


def bfv_mult32(p: BFVPipeline32, d1: jnp.ndarray,
               d2: jnp.ndarray) -> jnp.ndarray:
    """d1, d2: (2, size_ql, N) u32 coefficient form -> (3, size_ql, N).

    Mirror of evaluate.bfv_multiply_hps; bit-identical to the u64 path."""
    ks = p.ks
    t_ = ks.t_ql

    import os as _os
    # v5e A/B (L=28 alpha=14, chained K=48): fused lift 15.5 ms vs XLA
    # lift 14.9 — the in-kernel 28-row accumulation costs slightly MORE
    # than the XLA plane-extract/recombine it replaces (same tradeoff as
    # the CKKS kernel-vs-xla bconv at large alpha).  Off by default.
    if (p.lift_mats is not None
            and isinstance(t_, ntt_mxu.MXUNTTTables) and t_.fused_kernel
            and _os.environ.get("PHANTOM_BFV_LIFT", "xla") == "kernel"):
        ab = _lift_ntt_fused(p, jnp.concatenate([d1, d2], axis=0))
        a, b = ab[:2], ab[2:]
    else:
        def lift(d):
            polys = []
            for i in range(d.shape[0]):
                x_q = d[i]
                x_r = bc32.bconv_exact32(x_q, p.q_to_r)
                polys.append(jnp.concatenate([x_q, x_r], axis=0))
            return jnp.stack(polys)

        # both operands' polys transform in ONE batched launch
        ab = _fwd(ks, jnp.stack([lift(d1), lift(d2)]), p.t_d)
        a, b = ab[0], ab[1]
    c0, c1, c2 = _tensor_2x2(p.mv_d, a, b)
    prod = _inv(ks, jnp.stack([c0, c1, c2]), p.t_d)
    return jnp.stack([_scale_and_round_hps32(p, prod[i]) for i in range(3)])


def bfv_relin32(p: BFVPipeline32, d3: jnp.ndarray) -> jnp.ndarray:
    """(3, size_ql, N) coeff form -> (2, size_ql, N): keyswitch c2 and fold
    into c0, c1 (mirror of evaluate.relinearize, coeff-form branch)."""
    ks = p.ks
    switched_ntt = keyswitch32(ks, d3[2], p.evk)
    switched = _inv(ks, switched_ntt, ks.t_ql)
    q = _qcol(ks.mv_ql.q, d3[0])
    return jnp.stack([m32.add_mod32(d3[0], switched[0], q),
                      m32.add_mod32(d3[1], switched[1], q)])


def _blocked_step(p, d1, d2, step):
    """Run a coeff-form BFV step in the kernels' blocked (L, n1, n2)
    tiling on the mxu-pallas engine (one relayout in/out; CLAUDE.md)."""
    ks = p.ks
    t = ks.t_ql
    blk = isinstance(t, ntt_mxu.MXUNTTTables) and t.fused_kernel
    if not blk:
        return step(p, d1, d2)
    lead = d1.shape[:-1]
    out = step(p, d1.reshape(*lead, t.n1, t.n2),
               d2.reshape(*lead, t.n1, t.n2))
    return out.reshape(*out.shape[:-2], t.n1 * t.n2)


def bfv_mult_relin32(p: BFVPipeline32, d1: jnp.ndarray,
                     d2: jnp.ndarray) -> jnp.ndarray:
    """Fused multiply + relinearize (reference: bfv_mul_relin_hps,
    evaluate.cu:819)."""
    return _blocked_step(p, d1, d2,
                         lambda p_, a, b: bfv_relin32(p_, bfv_mult32(p_, a, b)))


def bfv_mult_hps_overq32(p: BFVPipeline32, d1: jnp.ndarray,
                         d2: jnp.ndarray) -> jnp.ndarray:
    """HPSoverQ multiply: the 1/Ql scaling moves onto ct2 before the
    tensor product (mirror of evaluate.bfv_multiply_hps_overq, non-leveled;
    reference: bfv_multiply_hps with mul_tech hps_overq, evaluate.cu:648).
    Bit-identical to the u64 path."""
    ks = p.ks

    def lift_a(d):
        polys = []
        for i in range(d.shape[0]):
            x = d[i]
            polys.append(jnp.concatenate(
                [x, bc32.bconv_exact32(x, p.q_to_r)], axis=0))
        return jnp.stack(polys)

    def lift_b(d):
        polys = []
        for i in range(d.shape[0]):
            w_rl = sr32.scale_and_round_exact32(d[i], p.sr_ql_to_rl)
            w_ql = bc32.bconv_exact32(w_rl, p.r_to_q)
            polys.append(jnp.concatenate([w_ql, w_rl], axis=0))
        return jnp.stack(polys)

    ab = _fwd(ks, jnp.stack([lift_a(d1), lift_b(d2)]), p.t_d)
    a, b = ab[0], ab[1]
    c0, c1, c2 = _tensor_2x2(p.mv_d, a, b)
    prod = _inv(ks, jnp.stack([c0, c1, c2]), p.t_d)
    return jnp.stack([sr32.scale_and_round_exact32(prod[i], p.sr_final_overq)
                      for i in range(3)])


def bfv_mult_relin_overq32(p: BFVPipeline32, d1: jnp.ndarray,
                           d2: jnp.ndarray) -> jnp.ndarray:
    return _blocked_step(
        p, d1, d2,
        lambda p_, a, b: bfv_relin32(p_, bfv_mult_hps_overq32(p_, a, b)))


# ---------------------------------------------------------------------------
# BEHZ
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class BFVBehz32:
    """u32 state for BEHZ multiply+relin (reference: bfv_multiply_behz,
    evaluate.cu:451).  Requires a context whose Bsk primes are < 2^30
    (make_context picks such a pool for u32-compatible parameters), so the
    result bit-matches the u64 BEHZ path on the shared base."""

    ks: KeySwitch32 = None
    evk: jnp.ndarray = None
    behz: object = None        # behz32.BEHZConsts32
    t_bsk: object = None       # NTT tables over B u {m_sk}


def build_bfv_behz32(ctx, rlk, chain_index: int = 1,
                     use_pallas: bool = False) -> BFVBehz32:
    from . import behz32 as bz32
    cd = ctx.get_context_data(chain_index)
    k = cd.size_ql
    bsk64 = ctx.tables_bsk(k)
    bsk_moduli = [int(v) for v in np.asarray(bsk64.q)]
    return BFVBehz32(
        ks=build_keyswitch32(ctx, chain_index, use_pallas),
        evk=convert_key32(ctx, rlk.data, chain_index),
        behz=bz32.make_behz_consts32(list(cd.moduli), bsk_moduli,
                                     int(ctx.params.plain_modulus)),
        t_bsk=_conv_tables(bsk64, use_pallas),
    )


def bfv_mult_behz32(p: BFVBehz32, d1: jnp.ndarray,
                    d2: jnp.ndarray) -> jnp.ndarray:
    """BEHZ multiply: lift to Ql u Bsk with SmMRq, dyadic products in both
    bases, multiply by t, divide-and-floor by Ql in Bsk, Shenoy-Kumaresan
    back to Ql (mirror of evaluate.bfv_multiply_behz)."""
    from . import behz32 as bz32
    ks = p.ks
    c = p.behz
    mv_bsk = c.bsk

    def lift(d):
        qs, bs = [], []
        for i in range(d.shape[0]):
            x_q = d[i]
            qs.append(x_q)
            bs.append(bz32.sm_mrq32(x_q, c))
        return jnp.stack(qs), jnp.stack(bs)

    a_q, a_bsk = lift(d1)
    b_q, b_bsk = lift(d2)
    ab_q = _fwd(ks, jnp.stack([a_q, b_q]), ks.t_ql)
    ab_bsk = _fwd(ks, jnp.stack([a_bsk, b_bsk]), p.t_bsk)
    a_q, b_q = ab_q[0], ab_q[1]
    a_bsk, b_bsk = ab_bsk[0], ab_bsk[1]
    prod_q = jnp.stack(_tensor_2x2(ks.mv_ql, a_q, b_q))
    prod_bsk = jnp.stack(_tensor_2x2(mv_bsk, a_bsk, b_bsk))
    prod_q = _inv(ks, prod_q, ks.t_ql)
    prod_bsk = _inv(ks, prod_bsk, p.t_bsk)
    tq_prod = m32.mul_mod_shoup32(prod_q, c.t_mod_q[:, None],
                                  c.t_mod_q_shoup[:, None],
                                  ks.mv_ql.q[:, None])
    tbsk_prod = m32.mul_mod_shoup32(prod_bsk, c.t_mod_bsk[:, None],
                                    c.t_mod_bsk_shoup[:, None],
                                    mv_bsk.q[:, None])
    out = []
    for i in range(3):
        floored = bz32.fast_floor32(tq_prod[i], tbsk_prod[i], c)
        out.append(bz32.fastbconv_sk32(floored, c))
    return jnp.stack(out)


def bfv_mult_relin_behz32(p: BFVBehz32, d1: jnp.ndarray,
                          d2: jnp.ndarray) -> jnp.ndarray:
    d3 = bfv_mult_behz32(p, d1, d2)
    switched = _inv(p.ks, keyswitch32(p.ks, d3[2], p.evk), p.ks.t_ql)
    q = p.ks.mv_ql.q[:, None]
    return jnp.stack([m32.add_mod32(d3[0], switched[0], q),
                      m32.add_mod32(d3[1], switched[1], q)])


# ---------------------------------------------------------------------------
# HPSoverQ-leveled
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class BFVLeveled32:
    """u32 state for HPSoverQ-leveled multiply at a fixed level drop
    (reference: bfv_multiply_hps with mul_tech hps_overq_leveled,
    evaluate.cu:648-805 + FindLevelsToDrop :550-643).

    The drop count is static per pipeline (determined by the noise model
    from the operands' noise_scale_deg, as in the u64 evaluator)."""

    ks: KeySwitch32 = None          # keyswitch at the FULL level
    evk: jnp.ndarray = None
    mv_d: ModulusVec32 = None       # D = Ql u Rl at the dropped level
    t_d: object = None
    q_to_r: BaseConvConsts32 = None   # exact Ql -> Rl (level)
    r_to_q: BaseConvConsts32 = None   # exact Rl -> Ql (level)
    sr_final: sr32.ExactScaleRound32 = None  # round(t/Rl): D -> Ql
    q_to_rl: sr32.ExactScaleRound32 = None   # round(Rl/Q): full Q -> Rl
    q_to_ql: sr32.ExactScaleRound32 = None   # round(Ql/Q): Q -> Ql (if lvl)
    ql_to_drop: BaseConvConsts32 = None      # Ql -> dropped primes
    qlhalf_mod_ql: jnp.ndarray = None
    qlhalf_mod_drop: jnp.ndarray = None
    lvl: int = flax.struct.field(pytree_node=False, default=0)


def build_bfv_leveled32(ctx, rlk, noise_scale_deg: int = 1,
                        use_pallas: bool = False,
                        force_lvl: int = None) -> BFVLeveled32:
    from ..host.noise import find_levels_to_drop
    from ..host.rns import BaseConverter, RNSBase
    from ..ops import ntt as ntt64mod
    p = ctx.params
    cd_full = ctx.get_context_data(1)
    beta = len(cd_full.ks.digit_convs)
    dcrt_bits = max(int(q).bit_length() for q in p.data_moduli)
    lvl = force_lvl if force_lvl is not None else find_levels_to_drop(
        p.n, p.size_q, p.size_p, beta, p.plain_modulus, dcrt_bits,
        noise_scale_deg - 1, False, True)
    cd = ctx.get_context_data(1 + lvl)
    k_l = cd.size_ql
    ql = list(cd.moduli)
    full = list(p.data_moduli)
    dropped = full[k_l:]
    hps = cd.hps
    rl = [int(v) for v in np.asarray(hps.sr_to_r.obase.q)]
    d_moduli = ql + rl
    t = int(p.plain_modulus)
    big_q = 1
    for q in full:
        big_q *= q
    big_ql = 1
    for q in ql:
        big_ql *= q
    big_rl = 1
    for r in rl:
        big_rl *= r
    qlhalf = (big_ql - 1) >> 1
    t_d64 = ntt64mod.concat_tables(ctx.tables_q(k_l), ctx.tables_r(k_l + 1))
    extra = {}
    if lvl:
        extra = dict(
            q_to_ql=sr32.make_exact_scale_round32(full, big_ql, big_q, ql),
            ql_to_drop=bc32.consts32_from_host(
                BaseConverter(RNSBase(ql), RNSBase(dropped))),
            qlhalf_mod_ql=_u32(np.array([qlhalf % q for q in ql],
                                        dtype=np.uint64).astype(np.uint32)),
            qlhalf_mod_drop=_u32(np.array(
                [qlhalf % d for d in dropped],
                dtype=np.uint64).astype(np.uint32)),
        )
    return BFVLeveled32(
        ks=build_keyswitch32(ctx, 1, use_pallas),
        evk=convert_key32(ctx, rlk.data, 1),
        mv_d=modulus_vec32(d_moduli),
        t_d=_conv_tables(t_d64, use_pallas),
        q_to_r=bc32.consts32_from_host(
            BaseConverter(RNSBase(ql), RNSBase(rl))),
        r_to_q=bc32.consts32_from_host(
            BaseConverter(RNSBase(rl), RNSBase(ql))),
        sr_final=sr32.make_exact_scale_round32(d_moduli, t, big_rl, ql),
        q_to_rl=sr32.make_exact_scale_round32(full, big_rl, big_q, rl),
        lvl=lvl,
        **extra,
    )


def bfv_mult_leveled32(p: BFVLeveled32, d1: jnp.ndarray,
                       d2: jnp.ndarray) -> jnp.ndarray:
    """HPSoverQ-leveled multiply: operands scaled from the full base Q down
    to Ql before the product, result expanded back (mirror of
    evaluate.bfv_multiply_hps_overq with lvl > 0)."""
    ks = p.ks

    a_polys = []
    for i in range(d1.shape[0]):
        x = d1[i]
        if p.lvl:
            x = sr32.scale_and_round_exact32(x, p.q_to_ql)
        a_polys.append(jnp.concatenate(
            [x, bc32.bconv_exact32(x, p.q_to_r)], axis=0))
    b_polys = []
    for i in range(d2.shape[0]):
        w_rl = sr32.scale_and_round_exact32(d2[i], p.q_to_rl)
        w_ql = bc32.bconv_exact32(w_rl, p.r_to_q)
        b_polys.append(jnp.concatenate([w_ql, w_rl], axis=0))

    ab = _fwd(ks, jnp.stack([jnp.stack(a_polys), jnp.stack(b_polys)]),
              p.t_d)
    a, b = ab[0], ab[1]
    c0, c1, c2 = _tensor_2x2(p.mv_d, a, b)
    prod = _inv(ks, jnp.stack([c0, c1, c2]), p.t_d)
    out = [sr32.scale_and_round_exact32(prod[i], p.sr_final)
           for i in range(3)]
    if p.lvl:
        # centered exact expand Ql -> full Q (ExpandCRTBasis_Ql_Q)
        expanded = []
        for w in out:
            shifted = m32.add_mod32(w, p.qlhalf_mod_ql[:, None],
                                    p.sr_final.obase.q[:, None])
            drop = bc32.bconv_exact32(shifted, p.ql_to_drop)
            drop = m32.sub_mod32(drop, p.qlhalf_mod_drop[:, None],
                                 p.ql_to_drop.obase.q[:, None])
            expanded.append(jnp.concatenate([w, drop], axis=0))
        out = expanded
    return jnp.stack(out)


def bfv_mult_relin_leveled32(p: BFVLeveled32, d1: jnp.ndarray,
                             d2: jnp.ndarray) -> jnp.ndarray:
    d3 = bfv_mult_leveled32(p, d1, d2)
    switched = _inv(p.ks, keyswitch32(p.ks, d3[2], p.evk), p.ks.t_ql)
    q = p.ks.mv_ql.q[:, None]
    return jnp.stack([m32.add_mod32(d3[0], switched[0], q),
                      m32.add_mod32(d3[1], switched[1], q)])
