"""Context chain: per-level parameters and device-resident precompute.

Equivalent of the reference's PhantomContext / ContextData / DRNSTool
(src/context.cu:121-232, src/rns.cu:11-983): one ContextData per modulus
level, each carrying the device constants the evaluator verbs need —
hybrid-keyswitch digit converters, rescale inverses, BFV plaintext-lift and
decrypt tables, HPS multiplication tables.

Everything is a flax.struct dataclass / NamedTuple of jnp arrays: passing a
Context (or one of its ContextData) into a jitted verb specializes the trace
on the static metadata (chain index, limb counts) exactly like the
reference's per-level host dispatch, while the tables ride along as device
constants.

Chain indexing matches the reference (include/context.cuh:186-207):
index 0 is the key level (all of Q, P); index 1 is the first data level
(all of Q); each subsequent level drops one data prime.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np

from ..host import numth
from ..host.modulus import Modulus, compute_shoup
from ..host.ntt_tables import make_rns_ntt_tables
from ..host.rns import BaseConverter, RNSBase
from ..ops import bconv as bc
from ..ops import ntt as nttmod
from ..ops import scaleround as sr
from ..ops.rns_host import ModulusVec, modulus_vec, to_u64_array
from .params import EncryptionParameters, MulTech, Scheme


class RescaleConsts(NamedTuple):
    """Constants for dropping the last prime with rounding
    (reference: DRNSTool::divide_and_round_q_last(_ntt), rns.cu:1114,1160)."""

    qlast_inv: jnp.ndarray        # (k-1,) q_last^{-1} mod q_i
    qlast_inv_shoup: jnp.ndarray  # (k-1,)
    half: jnp.ndarray             # ()  floor(q_last / 2)
    half_mod_q: jnp.ndarray       # (k-1,) half mod q_i


class KeySwitchConsts(NamedTuple):
    """Per-level hybrid key-switching tables
    (reference: DRNSTool hybrid-KS members, include/rns.cuh:37-44).

    digit_convs[d] converts digit d's base to the *complement* of that digit
    inside QlP (reference: v_base_part_Ql_to_compl_part_QlP_conv_,
    src/rns.cu:101-180); the digit's own rows are copied verbatim during
    modup, exactly like modup_copy_partQl_kernel (rns_bconv.cu:522).
    """

    digit_convs: Tuple[bc.BaseConvConsts, ...]  # beta convs digit->complement
    p_to_q: bc.BaseConvConsts                   # P -> Ql (moddown)
    pinv_mod_q: jnp.ndarray                     # (size_Ql,) P^{-1} mod q_i
    pinv_shoup: jnp.ndarray
    bigp_mod_q: jnp.ndarray                     # (size_Ql,) P mod q_i
    bigp_shoup: jnp.ndarray
    qlp: ModulusVec                             # (size_QlP,) Ql then P rows
    pow64_mod_qlp: jnp.ndarray                  # (size_QlP,) 2^64 mod each
    # fused modup-from-NTT scale: n^-1 * (digit-base QhatInv) per Ql row
    # (reference: the iNTT x QHatInv fusion in ntt_modup.cu)
    modup_scale: Optional[jnp.ndarray] = None   # (size_Ql,)
    modup_scale_shoup: Optional[jnp.ndarray] = None
    # BGV-only: t-corrected moddown so noise stays divisible by t
    # (reference: bgv_moddown_kernel, rns_bconv.cu:636)
    p_to_t: Optional[bc.BaseConvConsts] = None  # P -> {t}, exact
    phalf_mod_p: Optional[jnp.ndarray] = None   # (size_P,) (P-1)/2 mod p_j
    phalf_mod_q: Optional[jnp.ndarray] = None   # (size_Ql,) (P-1)/2 mod q_i
    phalf_mod_t: Optional[jnp.ndarray] = None   # () (P-1)/2 mod t
    neg_pinv_mod_t: Optional[jnp.ndarray] = None  # () [-P^{-1}]_t
    t_mv: Optional[ModulusVec] = None


class BGVConsts(NamedTuple):
    """Per-level BGV tables: exact centered CRT conversion Ql -> {t} for
    decryption (reference: exact_convert_array / decrypt_mod_t,
    rns_bconv.cu:416, rns.cu:1237) and the mod-t-preserving q_last division
    for modulus switching (mod_t_and_divide_q_last_ntt, rns.cu:1209)."""

    q_to_t: bc.BaseConvConsts       # Ql -> {t}, exact
    qhalf_mod_q: jnp.ndarray        # (k,) (Ql-1)/2 mod q_i (center shift)
    qhalf_mod_t: jnp.ndarray        # ()  (Ql-1)/2 mod t
    t_mv: ModulusVec                # modulus constants for t
    # mod switch (absent at the last data level):
    neg_qlast_inv_mod_t: Optional[jnp.ndarray]  # () [-q_last^{-1}]_t
    qlast_mod_qi: Optional[jnp.ndarray]         # (k-1,) q_last mod q_i


class HPSMulConsts(NamedTuple):
    """Per-level BFV HPS multiplication tables
    (reference: DRNSTool HPS members, include/rns.cuh:119-147).

    The scale-and-round round(t/Ql * x) from D = Ql u Rl lands in base Rl
    first: modulo r_j the CRT-overshoot term v*t*Rl vanishes identically
    (t*Rl == 0 mod r_j), so that step is *unconditionally* exact — no
    floating-point correction at all (the reference needs doubles here,
    scaleAndRound_HPS_QlRl_Ql, rns.cu:1789).  The result (< n*t*Ql << Rl)
    is then exact-base-converted Rl -> Ql.
    """

    q_to_r: bc.BaseConvConsts      # exact Ql -> Rl lift
    dbase: ModulusVec              # (k_d,) combined base D
    sr_to_r: sr.ExactScaleRoundConsts  # round(t/Ql): D -> Rl, v-free exact
    r_to_q: bc.BaseConvConsts      # exact Rl -> Ql conversion
    rl_half_mod_r: jnp.ndarray     # (size_Rl,) (Rl-1)/2 mod r_j (center shift)
    rl_half_mod_q: jnp.ndarray     # (size_Ql,) (Rl-1)/2 mod q_j
    # HPSoverQ: the 1/Ql scaling moves onto ct2 *before* the product
    # (reference: bConv_BEHZ_var1 + scaleAndRound over Rl, evaluate.cu:748)
    sr_ql_to_rl: sr.ExactScaleRoundConsts  # round(Rl/Ql): Ql -> Rl
    sr_final_overq: sr.ExactScaleRoundConsts  # round(t/Rl): D -> Ql


class LeveledConsts(NamedTuple):
    """HPSoverQ-leveled tables: scale the operands from the full base Q down
    to Ql before multiplying, expand the result back afterwards
    (reference: scaleAndRound_HPS_Q_Ql + ExpandCRTBasis_Ql_Q,
    rns.cu:1739,1825; driven by FindLevelsToDrop, evaluate.cu:550-643)."""

    q_to_ql: Optional[sr.ExactScaleRoundConsts]  # round(Ql/Q): Q -> Ql
    q_to_rl: sr.ExactScaleRoundConsts  # round(Rl/Q): full Q -> Rl
    ql_to_drop: Optional[bc.BaseConvConsts]  # Ql -> dropped primes (expand)
    qlhalf_mod_ql: jnp.ndarray       # (k_l,) (Ql-1)/2 mod q_i
    qlhalf_mod_drop: Optional[jnp.ndarray]  # (k-k_l,) (Ql-1)/2 mod dropped


@flax.struct.dataclass
class ContextData:
    mv: ModulusVec                                   # Ql
    rescale: Optional[RescaleConsts]
    ks: Optional[KeySwitchConsts]
    plain_lift: Optional[sr.PlainLiftConsts]         # BFV
    decrypt_sr: Optional[sr.DecryptScaleRoundConsts]  # BFV
    hps: Optional[HPSMulConsts]                      # BFV
    bgv: Optional[BGVConsts] = None                  # BGV
    behz: Optional[object] = None                    # BFV BEHZ (ops/behz.py)
    leveled: Optional[LeveledConsts] = None          # BFV HPSoverQ-leveled
    chain_index: int = flax.struct.field(pytree_node=False, default=0)
    moduli: Tuple[int, ...] = flax.struct.field(pytree_node=False, default=())

    @property
    def size_ql(self) -> int:
        return len(self.moduli)


@flax.struct.dataclass
class Context:
    key_mv: ModulusVec                     # all QP moduli
    ntt: nttmod.NTTTablesDevice            # tables for all QP rows
    plain_ntt: Optional[nttmod.NTTTablesDevice]  # BFV/BGV: mod-t tables
    rl_ntt: Optional[nttmod.NTTTablesDevice]     # BFV HPS: aux base R rows
    chain: Tuple[ContextData, ...]
    t_mod_q: Optional[jnp.ndarray]         # (size_q,) t mod q_i (BGV noise)
    t_mod_q_shoup: Optional[jnp.ndarray]
    params: EncryptionParameters = flax.struct.field(pytree_node=False,
                                                     default=None)
    bsk_ntt: Optional[nttmod.NTTTablesDevice] = None  # BFV BEHZ: B + m_sk
    # Galois permutation-table cache (reference: PhantomGaloisTool member of
    # PhantomContext, src/context.cu:229-231). Static field: tables are a
    # pure function of n, hashed on n (see GaloisTool.__hash__).
    galois: Optional[object] = flax.struct.field(pytree_node=False,
                                                 default=None)

    # ---- static helpers -------------------------------------------------
    @property
    def first_data_index(self) -> int:
        return 1

    def get_context_data(self, chain_index: int) -> ContextData:
        return self.chain[chain_index]

    def data_level_count(self) -> int:
        return len(self.chain) - 1

    def tables_q(self, size_ql: int) -> nttmod.NTTTablesDevice:
        """NTT tables for the first size_ql data primes."""
        return nttmod._limb_slice(self.ntt, (0, size_ql))

    def tables_p(self) -> nttmod.NTTTablesDevice:
        """NTT tables for the special primes."""
        k = self.params.size_q
        return nttmod._limb_slice(self.ntt, (k, k + self.params.size_p))

    def tables_digit(self, digit: int, size_ql: int) -> nttmod.NTTTablesDevice:
        alpha = self.params.size_p
        lo = digit * alpha
        hi = min(lo + alpha, size_ql)
        return nttmod._limb_slice(self.ntt, (lo, hi))

    def tables_r(self, size_rl: int) -> nttmod.NTTTablesDevice:
        return nttmod._limb_slice(self.rl_ntt, (0, size_rl))

    def tables_bsk(self, size_b: int) -> nttmod.NTTTablesDevice:
        """B[:size_b] rows plus the final m_sk row."""
        total = self.bsk_ntt.q.shape[0]
        return nttmod._limb_gather(self.bsk_ntt,
                                   list(range(size_b)) + [total - 1])


def _rescale_consts(moduli) -> Optional[RescaleConsts]:
    if len(moduli) < 2:
        return None
    qlast = moduli[-1]
    rest = moduli[:-1]
    inv = [numth.invert_mod(qlast % q, q) for q in rest]
    half = qlast >> 1
    return RescaleConsts(
        qlast_inv=jnp.asarray(to_u64_array(inv)),
        qlast_inv_shoup=jnp.asarray(to_u64_array(
            [compute_shoup(v, q) for v, q in zip(inv, rest)])),
        half=jnp.uint64(half),
        half_mod_q=jnp.asarray(to_u64_array([half % q for q in rest])),
    )


def _keyswitch_consts(data_moduli, special_moduli,
                      t: int = 0, n: int = 0) -> KeySwitchConsts:
    size_ql = len(data_moduli)
    alpha = len(special_moduli)
    beta = -(-size_ql // alpha)
    qlp = list(data_moduli) + list(special_moduli)
    digit_convs = []
    modup_scale = []
    modup_scale_shoup = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, size_ql)
        digit = data_moduli[lo:hi]
        compl = data_moduli[:lo] + data_moduli[hi:] + list(special_moduli)
        base_digit = RNSBase(digit)
        conv = BaseConverter(base_digit, RNSBase(compl))
        digit_convs.append(bc.consts_from_host(conv))
        if n:
            for qi, qhi in zip(digit, base_digit.qhat_inv_mod_qi):
                sc = (numth.invert_mod(n, qi) * qhi) % qi
                modup_scale.append(sc)
                modup_scale_shoup.append(compute_shoup(sc, qi))
    p_base = RNSBase(special_moduli)
    p_to_q = bc.consts_from_host(BaseConverter(p_base, RNSBase(data_moduli)))
    big_p = p_base.prod
    pinv = [numth.invert_mod(big_p % q, q) for q in data_moduli]
    pmod = [big_p % q for q in data_moduli]
    bgv_extra = {}
    if t:  # BGV t-corrected moddown tables
        phalf = (big_p - 1) >> 1
        bgv_extra = dict(
            p_to_t=bc.consts_from_host(
                BaseConverter(p_base, RNSBase([t]))),
            phalf_mod_p=jnp.asarray(
                to_u64_array([phalf % p for p in special_moduli])),
            phalf_mod_q=jnp.asarray(
                to_u64_array([phalf % q for q in data_moduli])),
            phalf_mod_t=jnp.uint64(phalf % t),
            neg_pinv_mod_t=jnp.uint64(
                (t - numth.invert_mod(big_p % t, t)) % t),
            t_mv=modulus_vec([t]),
        )
    return KeySwitchConsts(
        digit_convs=tuple(digit_convs),
        p_to_q=p_to_q,
        pinv_mod_q=jnp.asarray(to_u64_array(pinv)),
        pinv_shoup=jnp.asarray(to_u64_array(
            [compute_shoup(v, q) for v, q in zip(pinv, data_moduli)])),
        bigp_mod_q=jnp.asarray(to_u64_array(pmod)),
        bigp_shoup=jnp.asarray(to_u64_array(
            [compute_shoup(v, q) for v, q in zip(pmod, data_moduli)])),
        qlp=modulus_vec(qlp),
        pow64_mod_qlp=jnp.asarray(to_u64_array([(1 << 64) % q for q in qlp])),
        modup_scale=(jnp.asarray(to_u64_array(modup_scale)) if n else None),
        modup_scale_shoup=(jnp.asarray(to_u64_array(modup_scale_shoup))
                           if n else None),
        **bgv_extra,
    )


def _hps_mul_consts(data_moduli, rl_moduli, t: int) -> HPSMulConsts:
    """Tables for round((t/Ql) * x) : D = Ql u Rl -> Ql, all exact integers.

    Reference counterpart: HPS tables in DRNSTool (src/rns.cu:690-980) —
    the double-precision t*QHatInv/q int+frac split becomes the exact pair
    (omega_i, rho_i) with t*Rl = omega_i*d_i + rho_i.
    """
    size_ql = len(data_moduli)
    size_rl = size_ql + 1
    rl = rl_moduli[:size_rl]
    d_moduli = list(data_moduli) + list(rl)
    ql_base = RNSBase(data_moduli)
    q_to_r = bc.consts_from_host(
        BaseConverter(ql_base, RNSBase(rl)))
    r_to_q = bc.consts_from_host(
        BaseConverter(RNSBase(rl), ql_base))
    big_rl = 1
    for r in rl:
        big_rl *= r
    return HPSMulConsts(
        q_to_r=q_to_r,
        dbase=modulus_vec(d_moduli),
        sr_to_r=sr.make_exact_scale_round(d_moduli, t, ql_base.prod, rl),
        r_to_q=r_to_q,
        rl_half_mod_r=jnp.asarray(
            to_u64_array([((big_rl - 1) >> 1) % r for r in rl])),
        rl_half_mod_q=jnp.asarray(
            to_u64_array([((big_rl - 1) >> 1) % q for q in data_moduli])),
        sr_ql_to_rl=sr.make_exact_scale_round(data_moduli, big_rl,
                                              ql_base.prod, rl),
        sr_final_overq=sr.make_exact_scale_round(d_moduli, t, big_rl,
                                                 data_moduli),
    )


def _leveled_consts(full_moduli, ql, rl_moduli) -> LeveledConsts:
    ql_base = RNSBase(list(ql))
    full_base = RNSBase(list(full_moduli))
    rl = rl_moduli[: len(ql) + 1]
    dropped = list(full_moduli[len(ql):])
    qlhalf = (ql_base.prod - 1) >> 1
    if dropped:
        q_to_ql = sr.make_exact_scale_round(full_moduli, ql_base.prod,
                                            full_base.prod, ql)
        ql_to_drop = bc.consts_from_host(
            BaseConverter(ql_base, RNSBase(dropped)))
        qlhalf_mod_drop = jnp.asarray(
            to_u64_array([qlhalf % d for d in dropped]))
    else:
        q_to_ql = None
        ql_to_drop = None
        qlhalf_mod_drop = None
    big_rl = 1
    for r in rl:
        big_rl *= r
    return LeveledConsts(
        q_to_ql=q_to_ql,
        q_to_rl=sr.make_exact_scale_round(full_moduli, big_rl,
                                          full_base.prod, rl),
        ql_to_drop=ql_to_drop,
        qlhalf_mod_ql=jnp.asarray(to_u64_array([qlhalf % q for q in ql])),
        qlhalf_mod_drop=qlhalf_mod_drop,
    )


def _bgv_consts(data_moduli, t: int) -> BGVConsts:
    base = RNSBase(data_moduli)
    q_to_t = bc.consts_from_host(BaseConverter(base, RNSBase([t])))
    half = (base.prod - 1) >> 1
    k = len(data_moduli)
    if k >= 2:
        qlast = data_moduli[-1]
        neg_inv = (t - numth.invert_mod(qlast % t, t)) % t
        neg_qlast_inv_mod_t = jnp.uint64(neg_inv)
        qlast_mod_qi = jnp.asarray(
            to_u64_array([qlast % q for q in data_moduli[:-1]]))
    else:
        neg_qlast_inv_mod_t = None
        qlast_mod_qi = None
    return BGVConsts(
        q_to_t=q_to_t,
        qhalf_mod_q=jnp.asarray(to_u64_array([half % q for q in data_moduli])),
        qhalf_mod_t=jnp.uint64(half % t),
        t_mv=modulus_vec([t]),
        neg_qlast_inv_mod_t=neg_qlast_inv_mod_t,
        qlast_mod_qi=qlast_mod_qi,
    )


def make_context(params: EncryptionParameters) -> Context:
    """Build the full context chain (reference: PhantomContext ctor)."""
    n = params.n
    scheme = params.scheme
    t = params.plain_modulus
    data_moduli = list(params.data_moduli)
    special_moduli = list(params.special_moduli)
    qp = data_moduli + special_moduli

    # global NTT tables over QP
    ntt_dev = nttmod.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qp]))

    plain_ntt = None
    if scheme in (Scheme.BFV, Scheme.BGV):
        if (t - 1) % (2 * n) != 0:
            raise ValueError("plain modulus must support batching (== 1 mod 2N)")
        plain_ntt = nttmod.tables_from_host(
            make_rns_ntt_tables(n, [Modulus(t)]))

    # BFV HPS auxiliary base R: size_q+1 primes below min(q_i)
    rl_moduli: list = []
    rl_ntt = None
    bsk_moduli: list = []
    bsk_ntt = None
    if scheme == Scheme.BFV:
        rl_moduli = numth.get_primes_below(min(qp), 2 * n,
                                           params.size_q + 1)
        rl_ntt = nttmod.tables_from_host(
            make_rns_ntt_tables(n, [Modulus(r) for r in rl_moduli]))
        if params.mul_tech == MulTech.BEHZ:
            # BEHZ aux base: size_q B-primes + m_sk, distinct from QP.
            # 61-bit like the reference, EXCEPT when every QP prime fits the
            # u32 fast path (< 2^30): then Bsk stays < 2^30 too so the u32
            # BEHZ pipeline (ops/behz32.py) can share the exact same base
            # and bit-match (prod(Bsk)/Q >= 2^(2k+29) >> n*t, so the BEHZ
            # overshoot bounds still hold comfortably)
            used = set(qp)
            bsk_bits = 61 if max(qp) >= (1 << 30) else 29
            pool = [p for p in numth.get_primes(
                2 * n, bsk_bits, params.size_q + 1 + len(qp))
                if p not in used]
            bsk_moduli = pool[: params.size_q + 1]  # B then m_sk
            bsk_ntt = nttmod.tables_from_host(
                make_rns_ntt_tables(n, [Modulus(b) for b in bsk_moduli]))

    # chain: index 0 = key level (QP), then data levels dropping one prime
    chain = []
    # key level
    chain.append(ContextData(
        mv=modulus_vec(qp), rescale=None, ks=None, plain_lift=None,
        decrypt_sr=None, hps=None, chain_index=0, moduli=tuple(qp)))

    num_levels = len(data_moduli)
    for lvl in range(num_levels):
        ql = data_moduli[: num_levels - lvl]
        base_ql = RNSBase(ql)
        plain_lift = decrypt_sr = hps = bgv = behz = leveled = None
        if scheme == Scheme.BFV:
            plain_lift = sr.make_plain_lift_consts(base_ql, t)
            decrypt_sr = sr.make_decrypt_consts(base_ql, t)
            hps = _hps_mul_consts(ql, rl_moduli, t)
            if params.mul_tech == MulTech.HPS_OVERQ_LEVELED:
                leveled = _leveled_consts(data_moduli, ql, rl_moduli)
            if bsk_moduli:
                from ..ops.behz import make_behz_consts
                lvl_bsk = bsk_moduli[: len(ql)] + [bsk_moduli[-1]]
                behz = make_behz_consts(ql, lvl_bsk, t)
        if scheme == Scheme.BGV:
            bgv = _bgv_consts(ql, t)
        chain.append(ContextData(
            mv=modulus_vec(ql),
            rescale=_rescale_consts(ql),
            ks=_keyswitch_consts(ql, special_moduli,
                                 t if scheme == Scheme.BGV else 0, n),
            plain_lift=plain_lift,
            decrypt_sr=decrypt_sr,
            hps=hps,
            bgv=bgv,
            behz=behz,
            leveled=leveled,
            chain_index=lvl + 1,
            moduli=tuple(ql)))

    t_mod_q = t_mod_q_shoup = None
    if scheme == Scheme.BGV:
        tm = [t % q for q in data_moduli]
        t_mod_q = jnp.asarray(to_u64_array(tm))
        t_mod_q_shoup = jnp.asarray(to_u64_array(
            [compute_shoup(v, q) for v, q in zip(tm, data_moduli)]))

    from . import galois as gal
    return Context(
        key_mv=modulus_vec(qp),
        ntt=ntt_dev,
        plain_ntt=plain_ntt,
        rl_ntt=rl_ntt,
        chain=tuple(chain),
        t_mod_q=t_mod_q,
        t_mod_q_shoup=t_mod_q_shoup,
        params=params,
        bsk_ntt=bsk_ntt,
        galois=gal.GaloisTool(n),
    )
