"""End-to-end 32-bit CKKS pipeline: multiply + relinearize + rescale.

The TPU-native fast path for the headline benchmark (BASELINE north star):
all residues are single uint32 words (primes < 2^30), NTTs run on the u32
engine (optionally the Pallas kernel), base conversions on ops/bconv32.
Consts convert losslessly from a u64 Context; results are bit-identical to
the u64 evaluator path, so encrypt/decrypt/encode stay on the generic
stack and only the hot loop switches representation.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np

from . import bconv32 as bc32
from . import modmath32 as m32
from . import ntt32
from . import ntt_pallas as ntp
from .bconv32 import BaseConvConsts32, ModulusVec32, modulus_vec32


def _u32(v) -> jnp.ndarray:
    return jnp.asarray(np.asarray(v).astype(np.uint32))


def _shoup32_from64(shoup64) -> jnp.ndarray:
    return jnp.asarray((np.asarray(shoup64) >> 32).astype(np.uint32))


@flax.struct.dataclass
class CKKSPipeline32:
    """Precomputed u32 state for one (context level, relin key) pair.

    Static geometry fields are pytree aux data so the whole pipeline object
    can ride through jit as an argument (tables stay runtime parameters,
    never constant-folded)."""

    n: int = flax.struct.field(pytree_node=False)
    size_ql: int = flax.struct.field(pytree_node=False)
    size_p: int = flax.struct.field(pytree_node=False)
    mv_ql: ModulusVec32 = None
    mv_qlp: ModulusVec32 = None
    # NTT tables
    t_qlp: object = None     # rows: Ql then P
    t_ql: object = None
    t_p: object = None
    t_ql_next: object = None  # Ql minus last (rescale output)
    use_pallas: bool = flax.struct.field(pytree_node=False, default=False)
    # keyswitch
    digit_convs: Tuple[BaseConvConsts32, ...] = None
    p_to_q: BaseConvConsts32 = None
    pinv: jnp.ndarray = None
    pinv_shoup: jnp.ndarray = None
    evk: jnp.ndarray = None  # (beta, 2, size_qlp, N) uint32
    # rescale
    qlast_inv: jnp.ndarray = None
    qlast_inv_shoup: jnp.ndarray = None
    half: jnp.ndarray = None  # () u32
    half_mod_q: jnp.ndarray = None  # (k-1,)


def build_pipeline32(ctx, rlk, chain_index: int = 1,
                     use_pallas: bool = False) -> CKKSPipeline32:
    from ..schemes.keyswitch import qlp_rows
    from ..ops import ntt as ntt64mod
    cd = ctx.get_context_data(chain_index)
    ks = cd.ks
    rc = cd.rescale
    k = cd.size_ql
    rows = qlp_rows(ctx, k)
    t_qlp64 = ntt64mod._limb_gather(ctx.ntt, rows)

    def conv_tables(t64):
        t32 = ntt32.tables32_from_tables64(t64)
        return ntp.prepare_tables(t32) if use_pallas else t32

    qlp_moduli = [int(v) for v in np.asarray(t_qlp64.q)]
    evk64 = np.asarray(rlk.data)  # (dnum, 2, K, N)
    beta = len(ks.digit_convs)
    evk32 = evk64[:beta][:, :, np.asarray(rows)].astype(np.uint32)

    from ..host.rns import BaseConverter, RNSBase
    data_moduli = list(cd.moduli)
    alpha = ctx.params.size_p
    special = list(ctx.params.special_moduli)
    digit_convs = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        digit = data_moduli[lo:hi]
        compl = data_moduli[:lo] + data_moduli[hi:] + special
        digit_convs.append(bc32.consts32_from_host(
            BaseConverter(RNSBase(digit), RNSBase(compl))))
    p_to_q = bc32.consts32_from_host(
        BaseConverter(RNSBase(special), RNSBase(data_moduli)))

    return CKKSPipeline32(
        n=ctx.params.n,
        size_ql=k,
        size_p=alpha,
        mv_ql=modulus_vec32(data_moduli),
        mv_qlp=modulus_vec32(qlp_moduli),
        t_qlp=conv_tables(t_qlp64),
        t_ql=conv_tables(ctx.tables_q(k)),
        t_p=conv_tables(ctx.tables_p()),
        t_ql_next=conv_tables(ctx.tables_q(k - 1)),
        use_pallas=use_pallas,
        digit_convs=tuple(digit_convs),
        p_to_q=p_to_q,
        pinv=_u32(ks.pinv_mod_q),
        pinv_shoup=_shoup32_from64(np.asarray(ks.pinv_shoup)),
        evk=jnp.asarray(evk32),
        qlast_inv=_u32(rc.qlast_inv),
        qlast_inv_shoup=_shoup32_from64(np.asarray(rc.qlast_inv_shoup)),
        half=_u32(rc.half),
        half_mod_q=_u32(rc.half_mod_q),
    )


def _fwd(p: CKKSPipeline32, x, tables):
    if p.use_pallas:
        return ntp.ntt_forward_pallas(x, tables)
    return ntt32.ntt_forward32(x, tables)


def _inv(p: CKKSPipeline32, x, tables, **kw):
    if p.use_pallas:
        return ntp.ntt_inverse_pallas(x, tables, **kw)
    return ntt32.ntt_inverse32(x, tables, **kw)


def _tensor_2x2(p: CKKSPipeline32, a, b):
    q = p.mv_ql.q[:, None]
    rh = p.mv_ql.ratio_hi[:, None]
    rl = p.mv_ql.ratio_lo[:, None]
    c0 = m32.mul_mod32(a[0], b[0], q, rh, rl)
    c1 = m32.add_mod32(m32.mul_mod32(a[0], b[1], q, rh, rl),
                       m32.mul_mod32(a[1], b[0], q, rh, rl), q)
    c2 = m32.mul_mod32(a[1], b[1], q, rh, rl)
    return c0, c1, c2


def _modup(p: CKKSPipeline32, c2_coeff):
    k = p.size_ql
    alpha = p.size_p
    beta = len(p.digit_convs)
    assembled = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        x = c2_coeff[lo:hi]
        compl = bc32.bconv_approx32(x, p.digit_convs[d])
        assembled.append(jnp.concatenate([compl[:lo], x, compl[lo:]], axis=0))
    return _fwd(p, jnp.stack(assembled), p.t_qlp)


def _inner_product(p: CKKSPipeline32, t_modup):
    """128-bit-free inner product: per-digit u32xu32 products accumulate in
    a (carry, hi, lo) u32 triple, one reduction at the end."""
    if p.use_pallas:
        out = ntp.keyswitch_inner_product_pallas(t_modup, p.evk, p.mv_qlp)
        return out[0], out[1]
    beta = t_modup.shape[0]
    halves = []
    for j in range(2):
        c = jnp.zeros(t_modup.shape[1:], dtype=jnp.uint32)
        hi = jnp.zeros(t_modup.shape[1:], dtype=jnp.uint32)
        lo = jnp.zeros(t_modup.shape[1:], dtype=jnp.uint32)
        for d in range(beta):
            h, l = m32.mul_wide32(t_modup[d], p.evk[d, j])
            lo, cr = m32.add_u32_carry(lo, l)
            hi2, cr2 = m32.add_u32_carry(hi, h + cr)
            hi = hi2
            c = c + cr2
        halves.append(bc32.reduce_u96_any32(c, hi, lo, p.mv_qlp))
    return halves


def _moddown(p: CKKSPipeline32, x):
    k = p.size_ql
    x_q = x[:k]
    x_p = _inv(p, x[k:], p.t_p)
    delta = bc32.bconv_exact32(x_p, p.p_to_q)
    delta_ntt = _fwd(p, delta, p.t_ql)
    q = p.mv_ql.q[:, None]
    diff = m32.sub_mod32(x_q, delta_ntt, q)
    return m32.mul_mod_shoup32(diff, p.pinv[:, None], p.pinv_shoup[:, None],
                               q)


def _rescale(p: CKKSPipeline32, x):
    """round(x / q_last) on NTT-form (k, N) -> (k-1, N)."""
    k = p.size_ql
    t_last = _slice_tables(p, p.t_ql, k - 1, k)
    xl = _inv(p, x[..., k - 1:k, :], t_last)
    qlast = p.mv_ql.q[k - 1]
    xl = m32.add_mod32(xl, p.half, qlast)
    rest_q = p.mv_ql.q[:k - 1][:, None]
    rest_rh = p.mv_ql.ratio_hi[:k - 1][:, None]
    red = m32.barrett_reduce_u32(xl, rest_q, rest_rh)
    delta = m32.sub_mod32(red, p.half_mod_q[:, None], rest_q)
    delta_ntt = _fwd(p, delta, p.t_ql_next)
    diff = m32.sub_mod32(x[..., :k - 1, :], delta_ntt, rest_q)
    return m32.mul_mod_shoup32(diff, p.qlast_inv[:, None],
                               p.qlast_inv_shoup[:, None], rest_q)


def _slice_tables(p: CKKSPipeline32, tables, lo, hi):
    if p.use_pallas:
        return ntp.PallasNTTTables(
            q=tables.q[lo:hi], fwd=tables.fwd[lo:hi],
            fwd_shoup=tables.fwd_shoup[lo:hi], inv=tables.inv[lo:hi],
            inv_shoup=tables.inv_shoup[lo:hi],
            inv_degree=tables.inv_degree[lo:hi],
            inv_degree_shoup=tables.inv_degree_shoup[lo:hi],
            n1=tables.n1, n2=tables.n2)
    return ntt32.NTTTables32(*(a[lo:hi] for a in tables))


def mult_relin_rescale32(p: CKKSPipeline32, d1: jnp.ndarray,
                         d2: jnp.ndarray) -> jnp.ndarray:
    """d1, d2: (2, size_ql, N) uint32 NTT form -> (2, size_ql-1, N).

    Bit-identical to evaluate.multiply_and_relin + rescale_to_next on the
    u64 path."""
    c0, c1, c2 = _tensor_2x2(p, d1, d2)
    c2_coeff = _inv(p, c2, p.t_ql)
    t_up = _modup(p, c2_coeff)
    s0, s1 = _inner_product(p, t_up)
    q = p.mv_ql.q[:, None]
    out0 = m32.add_mod32(c0, _moddown(p, s0), q)
    out1 = m32.add_mod32(c1, _moddown(p, s1), q)
    out = jnp.stack([out0, out1])
    return _rescale(p, out)
