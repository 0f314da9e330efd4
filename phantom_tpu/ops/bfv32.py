"""BFV HPS multiply (+ relinearize) on the 32-bit fast path.

u32 mirror of evaluate.bfv_multiply_hps + relinearize (reference:
bfv_multiply_hps, src/evaluate.cu:648-817; bfv_mul_relin_hps, :819):
exact lift Ql -> D = Ql u Rl, dyadic product in NTT(D), exact v-free
round(t/Ql * .) back to Ql (through Rl with the centered half-shift),
then hybrid keyswitch of c2 with the shared KeySwitch32 engine.

Bit-identical to the u64 evaluator path (tested in tests/test_fastpath32.py).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from . import bconv32 as bc32
from . import modmath32 as m32
from . import scaleround32 as sr32
from .bconv32 import BaseConvConsts32, ModulusVec32, modulus_vec32
from .pipeline32 import (KeySwitch32, _conv_tables, _fwd, _inv, _tensor_2x2,
                         _u32, build_keyswitch32, convert_key32, keyswitch32)


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
    return BFVPipeline32(
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
    shifted = m32.add_mod32(w_r, p.rl_half_mod_r[:, None],
                            p.sr_to_r.obase.q[:, None])
    conv = bc32.bconv_exact32(shifted, p.r_to_q)
    return m32.sub_mod32(conv, p.rl_half_mod_q[:, None],
                         p.r_to_q.obase.q[:, None])


def bfv_mult32(p: BFVPipeline32, d1: jnp.ndarray,
               d2: jnp.ndarray) -> jnp.ndarray:
    """d1, d2: (2, size_ql, N) u32 coefficient form -> (3, size_ql, N).

    Mirror of evaluate.bfv_multiply_hps; bit-identical to the u64 path."""
    ks = p.ks

    def lift(d):
        polys = []
        for i in range(d.shape[0]):
            x_q = d[i]
            x_r = bc32.bconv_exact32(x_q, p.q_to_r)
            polys.append(jnp.concatenate([x_q, x_r], axis=0))
        return jnp.stack(polys)

    a = _fwd(ks, lift(d1), p.t_d)
    b = _fwd(ks, lift(d2), p.t_d)
    c0, c1, c2 = _tensor_2x2(p.mv_d, a, b)
    prod = _inv(ks, jnp.stack([c0, c1, c2]), p.t_d)
    return jnp.stack([_scale_and_round_hps32(p, prod[i]) for i in range(3)])


def bfv_relin32(p: BFVPipeline32, d3: jnp.ndarray) -> jnp.ndarray:
    """(3, size_ql, N) coeff form -> (2, size_ql, N): keyswitch c2 and fold
    into c0, c1 (mirror of evaluate.relinearize, coeff-form branch)."""
    ks = p.ks
    switched_ntt = keyswitch32(ks, d3[2], p.evk)
    switched = _inv(ks, switched_ntt, ks.t_ql)
    q = ks.mv_ql.q[:, None]
    return jnp.stack([m32.add_mod32(d3[0], switched[0], q),
                      m32.add_mod32(d3[1], switched[1], q)])


def bfv_mult_relin32(p: BFVPipeline32, d1: jnp.ndarray,
                     d2: jnp.ndarray) -> jnp.ndarray:
    """Fused multiply + relinearize (reference: bfv_mul_relin_hps,
    evaluate.cu:819)."""
    return bfv_relin32(p, bfv_mult32(p, d1, d2))


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

    a = _fwd(ks, lift_a(d1), p.t_d)
    b = _fwd(ks, lift_b(d2), p.t_d)
    c0, c1, c2 = _tensor_2x2(p.mv_d, a, b)
    prod = _inv(ks, jnp.stack([c0, c1, c2]), p.t_d)
    return jnp.stack([sr32.scale_and_round_exact32(prod[i], p.sr_final_overq)
                      for i in range(3)])


def bfv_mult_relin_overq32(p: BFVPipeline32, d1: jnp.ndarray,
                           d2: jnp.ndarray) -> jnp.ndarray:
    return bfv_relin32(p, bfv_mult_hps_overq32(p, d1, d2))
