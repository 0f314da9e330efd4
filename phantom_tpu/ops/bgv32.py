"""BGV multiply + relinearize + modulus switch on the 32-bit fast path.

u32 mirror of the BGV verbs (reference: multiply_inplace BGV branch +
relinearize, evaluate.cu; mod_t_and_divide_q_last_ntt, rns.cu:1209): dyadic
tensor product in NTT form, hybrid keyswitch with the t-corrected moddown
(bgv_moddown_kernel, rns_bconv.cu:636), and the mod-t-preserving q_last
division.  Correction factors are host-side integers tracked by the caller
(as in the u64 scheme layer).

Bit-identical to the u64 evaluator path (tested in tests/test_fastpath32.py).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from . import modmath32 as m32
from . import ntt_mxu
from .pipeline32 import (KeySwitch32, _conv_tables, _fwd, _inv, _qcol,
                         _shoup32_from64, _tensor_2x2, _u32,
                         build_keyswitch32, convert_key32,
                         keyswitch_from_ntt32, slice_tables32)


@flax.struct.dataclass
class BGVPipeline32:
    """Precomputed u32 state for BGV mult+relin+modswitch at one level."""

    ks: KeySwitch32 = None            # with BGV t-correction tables
    evk: jnp.ndarray = None
    t_ql_next: object = None
    qlast_inv: jnp.ndarray = None
    qlast_inv_shoup: jnp.ndarray = None
    neg_qlast_inv_mod_t: jnp.ndarray = None  # () [-q_last^{-1}]_t
    qlast_mod_qi: jnp.ndarray = None         # (k-1,)


def build_bgv32(ctx, rlk, chain_index: int = 1,
                use_pallas: bool = False) -> BGVPipeline32:
    cd = ctx.get_context_data(chain_index)
    rc = cd.rescale
    bgv = cd.bgv
    return BGVPipeline32(
        ks=build_keyswitch32(ctx, chain_index, use_pallas, for_bgv=True),
        evk=(convert_key32(ctx, rlk.data, chain_index)
             if rlk is not None else None),
        t_ql_next=_conv_tables(ctx.tables_q(cd.size_ql - 1), use_pallas),
        qlast_inv=_u32(rc.qlast_inv),
        qlast_inv_shoup=_shoup32_from64(np.asarray(rc.qlast_inv_shoup)),
        neg_qlast_inv_mod_t=_u32(bgv.neg_qlast_inv_mod_t),
        qlast_mod_qi=_u32(bgv.qlast_mod_qi),
    )


def bgv_mult_relin32(p: BGVPipeline32, d1: jnp.ndarray,
                     d2: jnp.ndarray) -> jnp.ndarray:
    """d1, d2: (2, size_ql, N) or blocked (2, size_ql, n1, n2) u32 NTT
    form -> same layout.

    The caller multiplies the host-side correction factors mod t."""
    ks = p.ks
    c0, c1, c2 = _tensor_2x2(ks.mv_ql, d1, d2)
    switched = keyswitch_from_ntt32(ks, c2, p.evk)
    q = _qcol(ks.mv_ql.q, d1[0])
    return jnp.stack([m32.add_mod32(c0, switched[0], q),
                      m32.add_mod32(c1, switched[1], q)])


def bgv_mod_switch32(p: BGVPipeline32, x: jnp.ndarray) -> jnp.ndarray:
    """Drop q_last while keeping the value mod t intact
    (mirror of evaluate._bgv_mod_switch; reference:
    mod_t_and_divide_q_last_ntt, rns.cu:1209).

    x: (size, k, N) NTT form -> (size, k-1, N).  The caller multiplies the
    correction factor by q_last^{-1} mod t."""
    import jax
    ks = p.ks
    k = ks.size_ql
    t = ks.t_mv.q[0]
    t_rh = ks.t_mv.ratio_hi[0]
    t_rl = ks.t_mv.ratio_lo[0]
    tq = p.t_ql_next
    blocked = (isinstance(tq, ntt_mxu.MXUNTTTables) and x.ndim >= 3
               and x.shape[-2:] == (tq.n1, tq.n2))
    limb_ax = -3 if blocked else -2
    xlast = jax.lax.slice_in_dim(x, k - 1, k, axis=limb_ax)
    xrest = jax.lax.slice_in_dim(x, 0, k - 1, axis=limb_ax)
    t_last = slice_tables32(ks.use_pallas, ks.t_ql, k - 1, k)
    c_last = _inv(ks, xlast, t_last)
    r_t = m32.barrett_reduce_u32(c_last, t, t_rh)
    u = m32.mul_mod32(r_t, p.neg_qlast_inv_mod_t, t, t_rh, t_rl)
    bq = lambda v: _qcol(v, c_last[..., 0, :] if not blocked
                         else c_last[..., 0, :, :])
    rest_q = bq(ks.mv_ql.q[:k - 1])
    rest_rh = bq(ks.mv_ql.ratio_hi[:k - 1])
    rest_rl = bq(ks.mv_ql.ratio_lo[:k - 1])
    c_last_mod_qi = m32.barrett_reduce_u32(c_last, rest_q, rest_rh)
    delta = m32.add_mod32(
        c_last_mod_qi,
        m32.mul_mod32(u, bq(p.qlast_mod_qi), rest_q, rest_rh, rest_rl),
        rest_q)
    delta_ntt = _fwd(ks, delta, p.t_ql_next)
    diff = m32.sub_mod32(xrest, delta_ntt, rest_q)
    return m32.mul_mod_shoup32(diff, bq(p.qlast_inv),
                               bq(p.qlast_inv_shoup), rest_q)


def bgv_mult_relin_modswitch32(p: BGVPipeline32, d1: jnp.ndarray,
                               d2: jnp.ndarray) -> jnp.ndarray:
    """The BGV headline step: multiply + relinearize + modulus switch.

    On the mxu-pallas engine the whole step runs in the kernels' blocked
    (L, n1, n2) tiling — one relayout in, one out (see CLAUDE.md)."""
    ks = p.ks
    t = ks.t_ql
    blk = isinstance(t, ntt_mxu.MXUNTTTables) and t.fused_kernel
    if not blk:
        return bgv_mod_switch32(p, bgv_mult_relin32(p, d1, d2))
    lead = d1.shape[:-1]
    d1 = d1.reshape(*lead, t.n1, t.n2)
    d2 = d2.reshape(*lead, t.n1, t.n2)
    out = bgv_mod_switch32(p, bgv_mult_relin32(p, d1, d2))
    return out.reshape(*lead[:-1], ks.size_ql - 1, t.n1 * t.n2)
