"""End-to-end 32-bit fast pipelines: the TPU-native hot path for all
schemes.

All residues are single uint32 words (primes < 2^30), NTTs run on the u32
engine (optionally the Pallas kernels), base conversions on ops/bconv32.
Consts convert losslessly from a u64 Context; results are bit-identical to
the u64 evaluator path (tested in tests/test_pipeline32.py /
test_fastpath32.py), so encrypt/decrypt/encode stay on the generic stack
and only the hot loop switches representation.

Layout:
  KeySwitch32 + modup32/inner_product32/moddown32/keyswitch32 — the shared
    hybrid-keyswitch engine (reference: eval_key_switch.cu:95-183,
    rns_bconv.cu:530-828), incl. the BGV t-corrected moddown and the fused
    NTT-form modup (iNTT x QhatInv, digit rows reused — ntt_modup.cu).
  CKKSPipeline32 + mult_relin_rescale32 — the headline benchmark step
    (reference: multiply_and_relin + rescale, ckks_bench.cu workload).
  Galois32 + rotate32/hoisting_sum32 — NTT-domain rotations and hoisted
    rotation sums (reference: apply_galois/hoisting, evaluate.cu:1567-1865).

Scheme-specific multiply pipelines: ops/bfv32.py (HPS), ops/bgv32.py.
"""

from __future__ import annotations

import os as _os
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from . import bconv32 as bc32
from . import modmath32 as m32
from ..utils import debug
from . import ntt32
from . import ntt_mxu
from . import ntt_pallas_roll as ntr
from .bconv32 import BaseConvConsts32, ModulusVec32, modulus_vec32


def _u32(v) -> jnp.ndarray:
    return jnp.asarray(np.asarray(v).astype(np.uint32))


def _qcol(vec: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-limb (L,) constant against (L, ...) data — (L, 1)
    for flat rows, (L, 1, 1) for blocked (L, n1, n2) rows."""
    return vec[(slice(None),) + (None,) * (data.ndim - 1)]


def normalize_engine(use_pallas) -> str:
    """Engine selector: False/'xla' = u32 butterfly stages, True/'pallas' =
    fused-VMEM Pallas kernels, 'pallas-roll' = the reshape-free
    roll/select Pallas kernels (ops/ntt_pallas_roll), 'mxu' = four-step
    matmul NTT (ops/ntt_mxu), 'mxu-pallas' = the same four-step NTT fused
    into one Pallas program per limb row (ops/ntt_mxu_pallas)."""
    if use_pallas is True:
        return "pallas-roll"
    if use_pallas in (False, None):
        return "xla"
    assert use_pallas in ("xla", "pallas-roll", "mxu",
                          "mxu-pallas"), use_pallas
    return use_pallas


def _shoup32_from64(shoup64) -> jnp.ndarray:
    """floor(w*2^64/q) >> 32 == floor(w*2^32/q): exact u32 Shoup word."""
    return jnp.asarray((np.asarray(shoup64) >> 32).astype(np.uint32))


# ---------------------------------------------------------------------------
# Shared hybrid key-switch engine
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class KeySwitch32:
    """u32 tables for hybrid key switching at one context level.

    Holds no key material: the evaluation key rides as a separate function
    argument so one KeySwitch32 serves relinearization, every rotation
    element, and hoisting (the reference's DRNSTool split,
    include/rns.cuh:37-44)."""

    n: int = flax.struct.field(pytree_node=False)
    size_ql: int = flax.struct.field(pytree_node=False)
    size_p: int = flax.struct.field(pytree_node=False)
    engine: str = flax.struct.field(pytree_node=False, default="xla")
    mv_ql: ModulusVec32 = None
    mv_qlp: ModulusVec32 = None
    # NTT tables
    t_qlp: object = None     # rows: Ql then P
    t_ql: object = None
    t_p: object = None
    # modup / moddown
    digit_convs: Tuple[BaseConvConsts32, ...] = None
    p_to_q: BaseConvConsts32 = None
    pinv: jnp.ndarray = None
    pinv_shoup: jnp.ndarray = None
    # fused NTT-form modup: iNTT scale = n^-1 * QhatInv per Ql row
    modup_scale: Optional[jnp.ndarray] = None
    modup_scale_shoup: Optional[jnp.ndarray] = None
    # mxu-pallas engine: bconv prologue fused into the forward-NTT kernel
    # (ops/ntt_mxu_pallas.bconv_ntt_forward_mxu_pallas).  modup_mats is the
    # (beta, size_qlp, alpha) digit->QlP matrix with zeroed self rows;
    # moddown_scale folds n^-1 * PhatInv into the P-rows iNTT so the
    # kernel's matmul operand is the pre-scaled moddown input.
    modup_mats: Optional[jnp.ndarray] = None
    moddown_scale: Optional[jnp.ndarray] = None
    moddown_scale_shoup: Optional[jnp.ndarray] = None
    # coefficient-form modup: mats with the digit qhat diagonal on the
    # self rows (the kernel recovers x_j = y_j * qhat_j), plus the per-row
    # QhatInv pre-scale over all Ql rows
    modup_mats_coeff: Optional[jnp.ndarray] = None
    modup_qhat_inv: Optional[jnp.ndarray] = None
    modup_qhat_inv_shoup: Optional[jnp.ndarray] = None
    # xla-bconv modup: engine NTT tables for the CONCATENATED per-digit
    # complement rows (digit-own rows ride through in NTT form, so only
    # sum_d (size_qlp - nd) rows transform — the zeros-assembled variant
    # wastes beta*alpha transforms); compl_sizes are the per-digit counts
    t_qlp_compl: object = None
    compl_sizes: Optional[Tuple[int, ...]] = flax.struct.field(
        pytree_node=False, default=None)
    # BGV-only t-corrected moddown (reference: bgv_moddown_kernel)
    p_to_t: Optional[BaseConvConsts32] = None
    phalf_mod_p: Optional[jnp.ndarray] = None
    phalf_mod_q: Optional[jnp.ndarray] = None
    phalf_mod_t: Optional[jnp.ndarray] = None
    neg_pinv_mod_t: Optional[jnp.ndarray] = None
    bigp_mod_q: Optional[jnp.ndarray] = None
    t_mv: Optional[ModulusVec32] = None

    @property
    def use_pallas(self) -> bool:
        # the roll engine shares the VMEM inner-product kernel
        return self.engine == "pallas-roll"


def _conv_tables(t64, use_pallas):
    engine = normalize_engine(use_pallas)
    t32 = ntt32.tables32_from_tables64(t64)
    if engine == "pallas-roll":
        return ntr.prepare_roll_tables(t32)
    if engine == "mxu":
        return ntt_mxu.prepare_mxu_tables(t32)
    if engine == "mxu-pallas":
        return ntt_mxu.prepare_mxu_tables(t32, fused_kernel=True)
    return t32


def build_keyswitch32(ctx, chain_index: int = 1,
                      use_pallas: bool = False,
                      for_bgv: bool = False) -> KeySwitch32:
    """Convert one level's u64 keyswitch consts to the u32 representation."""
    from ..host.rns import BaseConverter, RNSBase
    from ..ops import ntt as ntt64mod
    from ..schemes.keyswitch import qlp_rows

    cd = ctx.get_context_data(chain_index)
    ks = cd.ks
    k = cd.size_ql
    rows = qlp_rows(ctx, k)
    t_qlp64 = ntt64mod._limb_gather(ctx.ntt, rows)
    qlp_moduli = [int(v) for v in np.asarray(t_qlp64.q)]

    data_moduli = list(cd.moduli)
    alpha = ctx.params.size_p
    special = list(ctx.params.special_moduli)
    beta = len(ks.digit_convs)
    digit_convs = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        digit = data_moduli[lo:hi]
        compl = data_moduli[:lo] + data_moduli[hi:] + special
        digit_convs.append(bc32.consts32_from_host(
            BaseConverter(RNSBase(digit), RNSBase(compl))))
    p_to_q = bc32.consts32_from_host(
        BaseConverter(RNSBase(special), RNSBase(data_moduli)))

    bgv_extra = {}
    if for_bgv and ks.p_to_t is not None:
        t = int(ctx.params.plain_modulus)
        bgv_extra = dict(
            p_to_t=bc32.consts32_from_host(
                BaseConverter(RNSBase(special), RNSBase([t]))),
            phalf_mod_p=_u32(ks.phalf_mod_p),
            phalf_mod_q=_u32(ks.phalf_mod_q),
            phalf_mod_t=_u32(ks.phalf_mod_t),
            neg_pinv_mod_t=_u32(ks.neg_pinv_mod_t),
            bigp_mod_q=_u32(ks.bigp_mod_q),
            t_mv=modulus_vec32([t]),
        )

    fused = ks.modup_scale is not None

    engine = normalize_engine(use_pallas)
    modup_mats = modup_mats_coeff = None
    modup_qhat_inv = modup_qhat_inv_shoup = None
    moddown_scale = moddown_scale_shoup = None
    if engine == "mxu-pallas":
        if fused:
            # digit d covers data rows [lo, hi); a non-divisible chain's
            # last digit is SHORT (hi - lo < alpha): its missing matrix
            # columns stay zero and the kernels feed zero-padded y rows,
            # so the contraction is exact for any k (reference modup
            # handles the short digit the same way, rns_bconv.cu:567)
            size_qlp = k + alpha
            mats = np.zeros((beta, size_qlp, alpha), dtype=np.uint32)
            for d in range(beta):
                lo, hi = d * alpha, min((d + 1) * alpha, k)
                nd = hi - lo
                src = np.asarray(digit_convs[d].qhat_mod_p)
                mats[d, :lo, :nd] = src[:lo]
                mats[d, hi:, :nd] = src[lo:]
            modup_mats = jnp.asarray(mats)
            # coefficient-form variant: self rows get the digit qhat
            # diagonal so the kernel reconstructs x_j from the pre-scaled
            # y_j = x_j * qhat_inv_j
            mats_c = mats.copy()
            for d in range(beta):
                lo, hi = d * alpha, min((d + 1) * alpha, k)
                db = RNSBase(data_moduli[lo:hi])
                for i in range(hi - lo):
                    mats_c[d, lo + i, i] = db.qhat_mod_qi[i]
            modup_mats_coeff = jnp.asarray(mats_c)
            modup_qhat_inv = jnp.concatenate(
                [c.qhat_inv for c in digit_convs])
            modup_qhat_inv_shoup = jnp.concatenate(
                [c.qhat_inv_shoup for c in digit_convs])
        # (x - delta) * P^{-1} moddown: fold n^-1 * PhatInv into the P-rows
        # iNTT (canonical values match scale_by_qhat_inv32 after a plain
        # iNTT, so results stay bit-identical)
        conv_p = BaseConverter(RNSBase(special), RNSBase(data_moduli))
        md = [(int(v) * pow(ctx.params.n, -1, int(p_))) % int(p_)
              for v, p_ in zip(conv_p.ibase.qhat_inv_mod_qi, special)]
        moddown_scale = _u32(md)
        moddown_scale_shoup = _u32([(s << 32) // int(p_)
                                    for s, p_ in zip(md, special)])

    # engine tables for the concatenated per-digit complement rows (the
    # xla-bconv modup variant transforms ONLY these)
    t_qlp_compl = None
    compl_sizes = None
    if fused:
        size_qlp = k + alpha
        compl_rows = []
        compl_sizes = []
        for d in range(beta):
            lo, hi = d * alpha, min((d + 1) * alpha, k)
            r = list(range(lo)) + list(range(hi, size_qlp))
            compl_rows += [rows[i] for i in r]
            compl_sizes.append(len(r))
        t_qlp_compl = _conv_tables(
            ntt64mod._limb_gather(ctx.ntt, compl_rows), use_pallas)
        compl_sizes = tuple(compl_sizes)

    return KeySwitch32(
        n=ctx.params.n,
        size_ql=k,
        size_p=alpha,
        engine=normalize_engine(use_pallas),
        mv_ql=modulus_vec32(data_moduli),
        mv_qlp=modulus_vec32(qlp_moduli),
        t_qlp=_conv_tables(t_qlp64, use_pallas),
        t_qlp_compl=t_qlp_compl,
        compl_sizes=compl_sizes,
        t_ql=_conv_tables(ctx.tables_q(k), use_pallas),
        t_p=_conv_tables(ctx.tables_p(), use_pallas),
        digit_convs=tuple(digit_convs),
        p_to_q=p_to_q,
        pinv=_u32(ks.pinv_mod_q),
        pinv_shoup=_shoup32_from64(np.asarray(ks.pinv_shoup)),
        modup_scale=_u32(ks.modup_scale) if fused else None,
        modup_scale_shoup=(_shoup32_from64(np.asarray(ks.modup_scale_shoup))
                           if fused else None),
        modup_mats=modup_mats,
        moddown_scale=moddown_scale,
        moddown_scale_shoup=moddown_scale_shoup,
        modup_mats_coeff=modup_mats_coeff,
        modup_qhat_inv=modup_qhat_inv,
        modup_qhat_inv_shoup=modup_qhat_inv_shoup,
        **bgv_extra,
    )


def convert_key32(ctx, key_data, chain_index: int = 1) -> jnp.ndarray:
    """(dnum, 2, K, N) u64 key -> (beta, 2, size_qlp, N) u32 at this level."""
    from ..schemes.keyswitch import qlp_rows
    cd = ctx.get_context_data(chain_index)
    rows = qlp_rows(ctx, cd.size_ql)
    beta = len(cd.ks.digit_convs)
    k64 = np.asarray(key_data)
    return jnp.asarray(k64[:beta][:, :, np.asarray(rows)].astype(np.uint32))


def _fwd(ks, x, tables, sub_from=None, epi_scale=None, epi_scale_shoup=None):
    """Forward NTT on whichever engine `tables` belongs to.  With
    sub_from/epi_scale set, computes (sub_from - NTT(x)) * epi_scale —
    fused in VMEM on the Pallas engine, into the matmul epilogue on the
    MXU engine, composed (bit-identically) on the XLA stage engine."""
    if isinstance(tables, ntr.RollNTTTables):
        return ntr.ntt_forward_roll(
            x, tables, sub_from=sub_from, epi_scale=epi_scale,
            epi_scale_shoup=epi_scale_shoup)
    if isinstance(tables, ntt_mxu.MXUNTTTables):
        if tables.fused_kernel:
            from . import ntt_mxu_pallas as nmp
            return nmp.ntt_forward_mxu_pallas(
                x, tables, sub_from=sub_from, epi_scale=epi_scale,
                epi_scale_shoup=epi_scale_shoup)
        return ntt_mxu.ntt_forward_mxu(
            x, tables, sub_from=sub_from, epi_scale=epi_scale,
            epi_scale_shoup=epi_scale_shoup)
    out = ntt32.ntt_forward32(x, tables)
    if sub_from is None:
        return out
    q = tables.q[:, None]
    diff = m32.sub_mod32(sub_from, out, q)
    return m32.mul_mod_shoup32(
        diff, jnp.asarray(epi_scale, dtype=jnp.uint32)[:, None],
        jnp.asarray(epi_scale_shoup, dtype=jnp.uint32)[:, None], q)


def _inv(ks, x, tables, **kw):
    if isinstance(tables, ntr.RollNTTTables):
        return ntr.ntt_inverse_roll(x, tables, **kw)
    if isinstance(tables, ntt_mxu.MXUNTTTables):
        if tables.fused_kernel:
            from . import ntt_mxu_pallas as nmp
            return nmp.ntt_inverse_mxu_pallas(x, tables, **kw)
        return ntt_mxu.ntt_inverse_mxu(x, tables, **kw)
    return ntt32.ntt_inverse32(x, tables, **kw)


def slice_tables32(use_pallas, tables, lo, hi):
    return tables.limb_slice(np.arange(lo, hi))


def _pad_digit_rows(ks: KeySwitch32, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the leading (limb) axis from size_ql to beta*alpha rows —
    the kernels' digit grid is uniform; a short last digit's pad rows are
    zeros that contribute nothing (and are never self rows)."""
    pad = len(ks.digit_convs) * ks.size_p - ks.size_ql
    if pad == 0:
        return x
    z = jnp.zeros((pad,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, z], axis=0)


def _modup_coeff_prescale(ks: KeySwitch32, c2_coeff: jnp.ndarray):
    return m32.mul_mod_shoup32(
        c2_coeff, _qcol(ks.modup_qhat_inv, c2_coeff),
        _qcol(ks.modup_qhat_inv_shoup, c2_coeff),
        _qcol(ks.mv_ql.q, c2_coeff))


# --- bconv placement selectors (consulted at trace time) -------------------
# "kernel": base conversion fused INSIDE the Pallas NTT programs — a
#     per-row (carry, hi, lo) VPU accumulation over alpha input rows.
# "xla"/"xla-split": base conversion as an int8 MXU digit-plane matmul in
#     XLA (ops/bconv32), the NTT kernel taking the converted rows ("xla"
#     = preconv mega, "xla-split" = separate fNTT + XLA inner product).
# Interleaved pair A/B on the v5e at L=43 alpha=22
# (benchmarks/variant_ab.py, r5, K=25 chained):
#   xla-split:kernel 6.77 ms < kernel:kernel 6.88 < xla:kernel 7.43
#   < kernel:xla 7.50 < xla:xla 7.70
# Pattern: any structure where XLA materializes a large delta tensor
# that a kernel then consumes loses ~0.6-0.9 ms to badly-tiled
# {2,0,1:T(2,128)} stages and scheduling gaps, even when its device-busy
# sum is lower.  Defaults: modup = split fNTT + XLA inner product at
# large alpha (in-kernel bconv mega at small alpha, where the per-row
# accumulation is short); moddown = in-kernel bconv always.
MODUP_VARIANT = _os.environ.get("PHANTOM_MODUP_VARIANT", "auto")
MODDOWN_VARIANT = _os.environ.get("PHANTOM_MODDOWN_VARIANT", "auto")
KERNEL_BCONV_ALPHA_MAX = int(_os.environ.get(
    "PHANTOM_KERNEL_BCONV_ALPHA_MAX", "8"))


def _resolve_modup(ks: KeySwitch32) -> str:
    v = MODUP_VARIANT
    if v == "auto":
        return ("kernel" if ks.size_p <= KERNEL_BCONV_ALPHA_MAX
                else "xla-split")
    return "kernel" if v in ("kernel", "mega") else v


def _use_kernel_bconv(ks: KeySwitch32, variant: str) -> bool:
    if variant == "auto":
        return True                      # moddown: kernel bconv wins
    return variant in ("kernel", "mega")


def modup_delta_xla32(ks: KeySwitch32, y: jnp.ndarray) -> jnp.ndarray:
    """Per-digit MXU bconv of the pre-scaled iNTT rows, zero rows at the
    digit-own positions: (beta, size_qlp, ...) — the preconv mega-kernel's
    input (it transforms + MACs these; self rows ride through as the c2
    passthrough and never read the zeros)."""
    k = ks.size_ql
    alpha = ks.size_p
    beta = len(ks.digit_convs)
    out = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        compl = bc32.matmul_reduce32(y[lo:hi], ks.digit_convs[d])
        z = jnp.zeros((hi - lo,) + y.shape[1:], y.dtype)
        out.append(jnp.concatenate([compl[:lo], z, compl[lo:]], axis=0))
    return jnp.stack(out)


def modup_xla32(ks: KeySwitch32, y: jnp.ndarray,
                c2_ntt: jnp.ndarray) -> jnp.ndarray:
    """xla-bconv modup: y = pre-scaled iNTT rows (size_ql, ...), c2_ntt =
    the NTT-form input.  Per digit, the complement rows convert via the
    MXU digit-plane matmul (bconv32) and ONLY those transform (one
    batched fNTT over the concatenated compl rows); digit-own rows splice
    back in NTT form.  Bit-identical to the assembled variant."""
    k = ks.size_ql
    alpha = ks.size_p
    beta = len(ks.digit_convs)
    compl = [bc32.matmul_reduce32(y[d * alpha:min((d + 1) * alpha, k)],
                                  ks.digit_convs[d]) for d in range(beta)]
    tn = _fwd(ks, jnp.concatenate(compl, axis=0), ks.t_qlp_compl)
    out = []
    off = 0
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        cd_ = tn[off:off + ks.compl_sizes[d]]
        off += ks.compl_sizes[d]
        out.append(jnp.concatenate([cd_[:lo], c2_ntt[lo:hi], cd_[lo:]],
                                   axis=0))
    return jnp.stack(out)


def modup32(ks: KeySwitch32, c2_coeff: jnp.ndarray) -> jnp.ndarray:
    """(size_ql, N) coeff form -> (beta, size_qlp, N) NTT form.
    Reference: DRNSTool::modup (rns_bconv.cu:530-628)."""
    k = ks.size_ql
    alpha = ks.size_p
    beta = len(ks.digit_convs)
    if ks.modup_mats_coeff is not None:
        # mxu-pallas: one QhatInv pre-scale pass, then bconv + NTT of
        # every QlP row (self rows recovered via the qhat diagonal) in
        # one Pallas program per row
        from . import ntt_mxu_pallas as nmp
        y = _pad_digit_rows(ks, _modup_coeff_prescale(ks, c2_coeff))
        return nmp.bconv_ntt_forward_mxu_pallas(
            y.reshape(beta, alpha, *y.shape[1:]), ks.modup_mats_coeff,
            ks.t_qlp)
    assembled = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        x = c2_coeff[lo:hi]
        compl = bc32.bconv_approx32(x, ks.digit_convs[d])
        assembled.append(jnp.concatenate([compl[:lo], x, compl[lo:]], axis=0))
    return _fwd(ks, jnp.stack(assembled), ks.t_qlp)


def modup_from_ntt32(ks: KeySwitch32, c2_ntt: jnp.ndarray) -> jnp.ndarray:
    """Fused modup for NTT-form input: one iNTT with the x QhatInv scale
    folded in, own digit rows reused in NTT form, complement rows
    forward-transformed (reference: ntt_modup.cu).  Bit-identical to
    ntt_inverse + modup32.

    All beta digits transform in ONE batched (beta, size_qlp, N) NTT call
    (digit rows ride along as zeros and are replaced by the original
    NTT-form rows afterward): ~alpha/size_qlp wasted rows buys one big
    well-shaped dispatch instead of beta narrow ones — on the MXU engines
    the batched einsum is the difference between full and fractional
    systolic-array utilization."""
    k = ks.size_ql
    alpha = ks.size_p
    beta = len(ks.digit_convs)
    if ks.modup_scale is None:
        return modup32(ks, _inv(ks, c2_ntt, ks.t_ql))
    y = _inv(ks, c2_ntt, ks.t_ql, scale=ks.modup_scale,
             scale_shoup=ks.modup_scale_shoup)
    n = y.shape[-1]
    if (ks.t_qlp_compl is not None
            and not (ks.modup_mats is not None
                     and _resolve_modup(ks) == "kernel")):
        return modup_xla32(ks, y, c2_ntt)
    if ks.modup_mats is not None:
        # mxu-pallas: bconv + forward NTT of every complement row in ONE
        # Pallas program per row — no assembled (beta, size_qlp, N)
        # intermediate, y read from HBM once per digit, digit-own rows
        # passed through in-kernel (no scatter/concat afterwards)
        from . import ntt_mxu_pallas as nmp
        yp = _pad_digit_rows(ks, y)
        return nmp.bconv_ntt_forward_mxu_pallas(
            yp.reshape(beta, alpha, *yp.shape[1:]), ks.modup_mats, ks.t_qlp,
            self_rows=_pad_digit_rows(ks, c2_ntt), k_data=k)
    zeros = jnp.zeros((alpha, n), dtype=jnp.uint32)
    assembled = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        compl = bc32.matmul_reduce32(y[lo:hi], ks.digit_convs[d])
        assembled.append(jnp.concatenate(
            [compl[:lo], zeros[:hi - lo], compl[lo:]], axis=0))
    t_all = _fwd(ks, jnp.stack(assembled), ks.t_qlp)
    out = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        out.append(jnp.concatenate(
            [t_all[d, :lo], c2_ntt[lo:hi], t_all[d, hi:]], axis=0))
    return jnp.stack(out)


def inner_product32(ks: KeySwitch32, t_modup: jnp.ndarray,
                    evk: jnp.ndarray):
    """sum_d t_d * evk[d, j]: per-digit u32xu32 products accumulated in a
    (carry, hi, lo) u32 triple, one reduction at the end (reference:
    key_switch_inner_prod_c2_and_evk, eval_key_switch.cu:14-69)."""
    beta = t_modup.shape[0]
    t = ks.t_qlp
    if (isinstance(t, ntt_mxu.MXUNTTTables) and t.fused_kernel
            and t_modup.ndim == 4 and t_modup.shape[-2:] == (t.n1, t.n2)
            and _os.environ.get("PHANTOM_IP_KERNEL", "0") == "1"):
        # the dedicated Pallas IP kernel (legal on (1, 1, n1, n2) blocks,
        # unlike the flat formulation Mosaic once rejected) — measured
        # SLOWER than the XLA triple path on the v5e (6.84 vs 6.27 ms
        # step at L=43, r5): the tiny per-program MAC cannot hide the
        # evk block DMA, while XLA pipelines the same streams through
        # one fused loop.  Kept selectable for future Mosaic versions.
        from . import ntt_mxu_pallas as nmp
        return list(nmp.ip_mxu_pallas(
            t_modup, _match_evk_layout(evk, t_modup), ks.mv_qlp, t))
    # dnum <= 4 (q < 2^30): the digit sum fits a u64 pair BELOW the
    # Barrett bound q*2^32 — accumulate (hi, lo) and reduce with ONE
    # 64->32 Barrett per element instead of the 96-bit triple + u96
    # reduction (beta * q^2 < q * 2^32 iff beta * q < 2^32)
    if beta * (1 << 30) <= (1 << 32):
        bb = (slice(None),) + (None,) * (t_modup.ndim - 2)
        q = ks.mv_qlp.q[bb]
        rh = ks.mv_qlp.ratio_hi[bb]
        rl = ks.mv_qlp.ratio_lo[bb]
        acc2 = [None, None]
        for d in range(beta):     # one sweep: each t row read once
            t_d = t_modup[d]
            for j in range(2):
                h, l = m32.mul_wide32(t_d, evk[d, j])
                acc2[j] = ((h, l) if acc2[j] is None
                           else m32.add_wide32(*acc2[j], h, l))
        return [m32.barrett_reduce_u64_32(h, l, q, rh, rl)
                for h, l in acc2]
    # XLA triple path: both halves in ONE sweep over the digits so each
    # t_modup[d] row is read from HBM once (the evk stream is the
    # roofline term; t_modup is the next-largest and this halves its
    # traffic)
    acc = [[jnp.zeros(t_modup.shape[1:], dtype=jnp.uint32)
            for _ in range(3)] for _ in range(2)]
    for d in range(beta):
        t_d = t_modup[d]
        for j in range(2):
            c, hi, lo = acc[j]
            h, l = m32.mul_wide32(t_d, evk[d, j])
            lo, cr = m32.add_u32_carry(lo, l)
            hi2, cr2 = m32.add_u32_carry(hi, h + cr)
            acc[j] = [c + cr2, hi2, lo]
    return [bc32.reduce_u96_any32(c, hi, lo, ks.mv_qlp)
            for c, hi, lo in acc]


def modup_ip32(ks: KeySwitch32, c2_ntt: jnp.ndarray,
               evk: jnp.ndarray):
    """modup + evk inner product; on the mxu-pallas engine both run in ONE
    Pallas program per (QlP row, digit) — the (beta, size_qlp, N) modup
    tensor never exists in HBM (see ntt_mxu_pallas.modup_ip_mxu_pallas).
    Returns (s0, s1) bit-identical to
    inner_product32(ks, modup_from_ntt32(ks, c2_ntt), evk)."""
    from . import ntt_mxu_pallas as nmp
    t = ks.t_qlp
    blocked = (isinstance(t, ntt_mxu.MXUNTTTables) and c2_ntt.ndim == 3
               and c2_ntt.shape[-2:] == (t.n1, t.n2))
    n = (c2_ntt.shape[-2] * c2_ntt.shape[-1] if blocked
         else c2_ntt.shape[-1])
    if (ks.modup_mats is not None and c2_ntt.ndim == (3 if blocked else 2)
            and ks.size_ql * n * 4 <= nmp.MODUP_IP_MAX_Y_BYTES
            and _resolve_modup(ks) == "kernel"):
        y = _inv(ks, c2_ntt, ks.t_ql, scale=ks.modup_scale,
                 scale_shoup=ks.modup_scale_shoup)
        return nmp.modup_ip_mxu_pallas(
            _pad_digit_rows(ks, y), ks.modup_mats,
            _pad_digit_rows(ks, c2_ntt), evk, ks.t_qlp,
            k_data=ks.size_ql)
    t_up = modup_from_ntt32(ks, c2_ntt)
    return inner_product32(ks, t_up, _match_evk_layout(evk, t_up))


def _match_evk_layout(evk: jnp.ndarray, t_up: jnp.ndarray) -> jnp.ndarray:
    """Reshape evk's trailing data dims to t_up's.  The builders pre-tile
    evk to the blocked (.., n1, n2) layout only on the fused mxu-pallas
    engine (build_pipeline32), while the BFV/BGV _blocked_step wrappers
    block just the ciphertexts — so when the mega-kernel gate
    (MODUP_IP_MAX_Y_BYTES) sends a call down the split fallback, the two
    operands can arrive in different layouts in either direction."""
    if evk.shape[2:] == t_up.shape[1:]:
        return evk
    return evk.reshape(evk.shape[0], 2, *t_up.shape[1:])


def _moddown_delta32(ks: KeySwitch32, x_p: jnp.ndarray) -> jnp.ndarray:
    """delta == x (mod P) over Ql rows; BGV additionally forces
    delta == 0 (mod t) (reference: moddown vs bgv_moddown_kernel,
    rns_bconv.cu:636,691).  x_p: (alpha, ...) any trailing data shape."""
    if ks.p_to_t is None:
        return bc32.bconv_exact32(x_p, ks.p_to_q)
    bq = lambda v: _qcol(v, x_p)   # (alpha,) -> (alpha, 1[, 1])
    q = bq(ks.p_to_q.obase.q)
    p_q = bq(ks.p_to_q.ibase.q)
    shifted = m32.add_mod32(x_p, bq(ks.phalf_mod_p), p_q)
    dq = m32.sub_mod32(bc32.bconv_exact32(shifted, ks.p_to_q),
                       bq(ks.phalf_mod_q), q)
    t = ks.t_mv.q[0]
    dt = m32.sub_mod32(bc32.bconv_exact32(shifted, ks.p_to_t),
                       ks.phalf_mod_t, t)
    u = m32.mul_mod32(dt, ks.neg_pinv_mod_t, t, ks.t_mv.ratio_hi[0],
                      ks.t_mv.ratio_lo[0])
    corr = m32.mul_mod32(u, bq(ks.bigp_mod_q), q,
                         bq(ks.p_to_q.obase.ratio_hi),
                         bq(ks.p_to_q.obase.ratio_lo))
    return m32.add_mod32(dq, corr, q)


def moddown32(ks: KeySwitch32, x: jnp.ndarray) -> jnp.ndarray:
    """(x_Q - delta(x_P)) * P^{-1} over Ql, NTT in/out (reference:
    DRNSTool::moddown_from_NTT, rns_bconv.cu:776; the forward NTT carries
    the (x - delta) * P^{-1} epilogue fused, ntt_moddown.cu:222)."""
    k = ks.size_ql
    x_q = x[:k]
    if ks.moddown_scale is not None and ks.p_to_t is None:
        # mxu-pallas: iNTT folds n^-1 * PhatInv, then ONE Pallas program
        # per Ql row does the exact bconv (incl. the v floor correction),
        # the forward NTT and the (x_q - .) * P^{-1} epilogue in VMEM
        from . import ntt_mxu_pallas as nmp
        y = _inv(ks, x[k:], ks.t_p, scale=ks.moddown_scale,
                 scale_shoup=ks.moddown_scale_shoup)
        v = bc32.floor_sum_div32(y, ks.p_to_q)
        out = nmp.bconv_ntt_forward_mxu_pallas(
            y[None], ks.p_to_q.qhat_mod_p[None], ks.t_ql,
            v=v[None], vmul=ks.p_to_q.q_mod_p,
            sub_from=x_q[None], epi_scale=ks.pinv,
            epi_scale_shoup=ks.pinv_shoup)
        return out[0]
    x_p = _inv(ks, x[k:], ks.t_p)
    delta = _moddown_delta32(ks, x_p)
    # (x_q - fNTT(delta)) * P^{-1} with the epilogue fused into the engine
    return _fwd(ks, delta, ks.t_ql, sub_from=x_q,
                epi_scale=ks.pinv, epi_scale_shoup=ks.pinv_shoup)


def moddown32_pair(ks: KeySwitch32, x0: jnp.ndarray, x1: jnp.ndarray,
                   tensor_add=None):
    """moddown of BOTH keyswitch halves in ONE batched iNTT + ONE fused
    bconv+fNTT launch (G=2 groups).  Kernel-launch overhead through the
    axon runtime is ~1.4 ms each (CLAUDE.md), so halving the moddown
    launch count is worth ~3 ms per op.  Bit-identical to two moddown32
    calls.

    tensor_add = (d1, d2): additionally add the 2x2 tensor terms in the
    kernel epilogue — out0 += d1[0]∘d2[0], out1 += cross(d1, d2) — the
    relin-output adds of mult_relin_rescale32 without materializing
    c0/c1 (reference flow: evaluate.cu:994-1022 add_to_ct after
    moddown)."""
    if ks.moddown_scale is None or ks.p_to_t is not None:
        assert tensor_add is None
        return moddown32(ks, x0), moddown32(ks, x1)
    from . import ntt_mxu_pallas as nmp
    k = ks.size_ql
    xp = jnp.stack([x0[k:], x1[k:]])             # (2, alpha, N)
    sub = jnp.stack([x0[:k], x1[:k]])
    if isinstance(ks.t_p, ntt_mxu.MXUNTTTables) and ks.t_p.fused_kernel:
        # the exact-bconv floor correction v rides the iNTT kernel
        # (per-row cascade terms accumulate in VMEM scratch across the
        # group's sequential grid rows) — no XLA floor-sum pass
        y, v = nmp.ntt_inverse_mxu_pallas(
            xp, ks.t_p, scale=ks.moddown_scale,
            scale_shoup=ks.moddown_scale_shoup,
            emit_floor_div=(ks.p_to_q.U, ks.p_to_q.V))
    else:
        y = _inv(ks, xp, ks.t_p, scale=ks.moddown_scale,
                 scale_shoup=ks.moddown_scale_shoup)
        v = jax.vmap(bc32.floor_sum_div32, in_axes=(0, None))(y, ks.p_to_q)
    if _use_kernel_bconv(ks, MODDOWN_VARIANT):
        R = int(_os.environ.get("PHANTOM_MODDOWN_R", "0"))
        if (R > 0 and tensor_add is not None
                and isinstance(ks.t_ql, ntt_mxu.MXUNTTTables)
                and ks.t_ql.fused_kernel):
            # R rows per program with the base conversion as in-kernel
            # MXU digit-plane dots (experimental; see
            # moddown_mxu_bconv_pallas)
            out = nmp.moddown_mxu_bconv_pallas(
                y, ks.p_to_q.qhat_mod_p, v, ks.p_to_q.q_mod_p, sub,
                tensor_add, ks.t_ql, ks.p_to_q.pow2,
                ks.p_to_q.pow2_shoup, ks.pinv, ks.pinv_shoup,
                rows_per_program=R)
            return out[0], out[1]
        mat = jnp.broadcast_to(ks.p_to_q.qhat_mod_p[None],
                               (2,) + ks.p_to_q.qhat_mod_p.shape)
        out = nmp.bconv_ntt_forward_mxu_pallas(
            y, mat, ks.t_ql, v=v, vmul=ks.p_to_q.q_mod_p,
            sub_from=sub,
            epi_scale=ks.pinv, epi_scale_shoup=ks.pinv_shoup,
            tensor_add=tensor_add)
        return out[0], out[1]
    # xla-bconv variant: exact delta (MXU matmul + v floor correction) in
    # XLA, then ONE fused-epilogue fNTT launch computing
    # (sub - NTT(delta)) * P^{-1} [+ tensor term] per row
    c = ks.p_to_q
    raw = jax.vmap(lambda yy: bc32.matmul_reduce32(yy, c))(y)
    qb = _qcol(c.obase.q, raw[0])[None]
    rhb = _qcol(c.obase.ratio_hi, raw[0])[None]
    rlb = _qcol(c.obase.ratio_lo, raw[0])[None]
    corr = m32.mul_mod32(v[:, None], _qcol(c.q_mod_p, raw[0])[None],
                         qb, rhb, rlb)
    delta = m32.sub_mod32(raw, corr, qb)
    out = nmp.ntt_forward_mxu_pallas(
        delta, ks.t_ql, sub_from=sub, epi_scale=ks.pinv,
        epi_scale_shoup=ks.pinv_shoup, tensor_add=tensor_add)
    return out[0], out[1]


def moddown_coeff32(ks: KeySwitch32, x: jnp.ndarray) -> jnp.ndarray:
    """Moddown for coefficient-form input (reference: DRNSTool::moddown;
    mirror of keyswitch.moddown_coeff)."""
    k = ks.size_ql
    x_q = x[:k]
    delta = _moddown_delta32(ks, x[k:])
    q = ks.mv_ql.q[:, None]
    diff = m32.sub_mod32(x_q, delta, q)
    return m32.mul_mod_shoup32(diff, ks.pinv[:, None], ks.pinv_shoup[:, None],
                               q)


def keyswitch32(ks: KeySwitch32, c2_coeff: jnp.ndarray,
                evk: jnp.ndarray) -> jnp.ndarray:
    """Full hybrid keyswitch, coeff-form input -> (2, size_ql, N) NTT."""
    from . import ntt_mxu_pallas as nmp
    t = ks.t_qlp
    blocked = (isinstance(t, ntt_mxu.MXUNTTTables) and c2_coeff.ndim == 3
               and c2_coeff.shape[-2:] == (t.n1, t.n2))
    n = (c2_coeff.shape[-2] * c2_coeff.shape[-1] if blocked
         else c2_coeff.shape[-1])
    if (ks.modup_mats_coeff is not None
            and c2_coeff.ndim == (3 if blocked else 2)
            and ks.size_ql * n * 4 <= nmp.MODUP_IP_MAX_Y_BYTES):
        y = _pad_digit_rows(ks, _modup_coeff_prescale(ks, c2_coeff))
        s0, s1 = nmp.modup_ip_mxu_pallas(y, ks.modup_mats_coeff, None,
                                         evk, ks.t_qlp)
    else:
        t_up = modup32(ks, c2_coeff)
        s0, s1 = inner_product32(ks, t_up, _match_evk_layout(evk, t_up))
    m0, m1 = moddown32_pair(ks, s0, s1)
    return jnp.stack([m0, m1])


def keyswitch_from_ntt32(ks: KeySwitch32, c2_ntt: jnp.ndarray,
                         evk: jnp.ndarray) -> jnp.ndarray:
    """Hybrid keyswitch, NTT-form input (fused modup)."""
    s0, s1 = modup_ip32(ks, c2_ntt, evk)
    m0, m1 = moddown32_pair(ks, s0, s1)
    return jnp.stack([m0, m1])


# ---------------------------------------------------------------------------
# CKKS pipeline
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class CKKSPipeline32:
    """Precomputed u32 state for one (context level, relin key) pair."""

    ks: KeySwitch32 = None
    evk: jnp.ndarray = None  # (beta, 2, size_qlp, N) uint32
    t_ql_next: object = None  # Ql minus last (rescale output)
    # rescale
    qlast_inv: jnp.ndarray = None
    qlast_inv_shoup: jnp.ndarray = None
    half: jnp.ndarray = None  # () u32
    half_mod_q: jnp.ndarray = None  # (k-1,)

    # geometry passthroughs
    @property
    def n(self):
        return self.ks.n

    @property
    def size_ql(self):
        return self.ks.size_ql

    @property
    def use_pallas(self):
        return self.ks.use_pallas

    @property
    def mv_ql(self):
        return self.ks.mv_ql


def build_pipeline32(ctx, rlk, chain_index: int = 1,
                     use_pallas: bool = False) -> CKKSPipeline32:
    cd = ctx.get_context_data(chain_index)
    rc = cd.rescale
    ks = build_keyswitch32(ctx, chain_index, use_pallas)
    evk = None if rlk is None else convert_key32(ctx, rlk.data, chain_index)
    if evk is not None and isinstance(ks.t_qlp, ntt_mxu.MXUNTTTables) \
            and ks.t_qlp.fused_kernel:
        # pre-tile the key stream for the mega-kernel: re-tiling ~44 MB
        # from (.., N) to (.., n1, n2) on every step is a full VPU pass
        n1, n2 = ks.t_qlp.n1, ks.t_qlp.n2
        evk = evk.reshape(*evk.shape[:-1], n1, n2)
    return CKKSPipeline32(
        ks=ks,
        # rlk is optional: rescale/add/rotate/matvec workloads never touch
        # the relin evk, so a None key only disables multiply+relin
        evk=evk,
        t_ql_next=_conv_tables(ctx.tables_q(cd.size_ql - 1), use_pallas),
        qlast_inv=_u32(rc.qlast_inv),
        qlast_inv_shoup=_shoup32_from64(np.asarray(rc.qlast_inv_shoup)),
        half=_u32(rc.half),
        half_mod_q=_u32(rc.half_mod_q),
    )


def _tensor_2x2(mv: ModulusVec32, a, b):
    q = _qcol(mv.q, a[0])
    rh = _qcol(mv.ratio_hi, a[0])
    rl = _qcol(mv.ratio_lo, a[0])
    c0 = m32.mul_mod32(a[0], b[0], q, rh, rl)
    # cross terms: one 64-bit lazy add, one Barrett (2*q^2 < q*2^32)
    h1, l1 = m32.mul_wide32(a[0], b[1])
    h2, l2 = m32.mul_wide32(a[1], b[0])
    hs, ls = m32.add_wide32(h1, l1, h2, l2)
    c1 = m32.barrett_reduce_u64_32(hs, ls, q, rh, rl)
    c2 = m32.mul_mod32(a[1], b[1], q, rh, rl)
    return c0, c1, c2


def _tensor_square_2x2(mv: ModulusVec32, a):
    """(a0, a1)^2 with the cross term computed once (mirror of
    polyops.tensor_square_2x2; reference: tensor_square_2x2_rns_poly)."""
    q = _qcol(mv.q, a[0])
    rh = _qcol(mv.ratio_hi, a[0])
    rl = _qcol(mv.ratio_lo, a[0])
    c0 = m32.mul_mod32(a[0], a[0], q, rh, rl)
    # doubled cross term reduced once: 2*q^2 < q*2^32
    h, l = m32.mul_wide32(a[0], a[1])
    hs, ls = m32.add_wide32(h, l, h, l)
    c1 = m32.barrett_reduce_u64_32(hs, ls, q, rh, rl)
    c2 = m32.mul_mod32(a[1], a[1], q, rh, rl)
    return c0, c1, c2


def _rescale(p: CKKSPipeline32, x):
    """round(x / q_last) on NTT-form (..., k, N) or blocked
    (..., k, n1, n2) -> one fewer limb, same layout."""
    ks = p.ks
    k = ks.size_ql
    t = p.t_ql_next
    blocked = (isinstance(t, ntt_mxu.MXUNTTTables) and x.ndim >= 3
               and x.shape[-2:] == (t.n1, t.n2))
    dshape = x.shape[-2:] if blocked else x.shape[-1:]
    limb_ax = -3 if blocked else -2
    xlast = jax.lax.slice_in_dim(x, k - 1, k, axis=limb_ax)
    xrest = jax.lax.slice_in_dim(x, 0, k - 1, axis=limb_ax)
    t_last = slice_tables32(ks.use_pallas, ks.t_ql, k - 1, k)
    xl = _inv(ks, xlast, t_last)
    qlast = ks.mv_ql.q[k - 1]
    xl = m32.add_mod32(xl, p.half, qlast)
    if (isinstance(p.t_ql_next, ntt_mxu.MXUNTTTables)
            and p.t_ql_next.fused_kernel):
        # mxu-pallas: reduce-mod-q_j (alpha=1 bconv), half correction,
        # forward NTT and the (x - .) * qlast^{-1} epilogue in one program
        from . import ntt_mxu_pallas as nmp
        lead = x.shape[:len(x.shape) + limb_ax]
        g = int(np.prod(lead)) if lead else 1
        out = nmp.bconv_ntt_forward_mxu_pallas(
            xl.reshape(g, 1, *dshape), jnp.ones((g, k - 1, 1), jnp.uint32),
            p.t_ql_next, post_sub=p.half_mod_q,
            sub_from=xrest.reshape(g, k - 1, *dshape),
            epi_scale=p.qlast_inv, epi_scale_shoup=p.qlast_inv_shoup)
        return out.reshape(*lead, k - 1, *dshape)
    rest_q = _qcol(ks.mv_ql.q[:k - 1], xrest[..., 0, :] if not blocked
                   else xrest[..., 0, :, :])
    rest_rh = _qcol(ks.mv_ql.ratio_hi[:k - 1], xrest[..., 0, :]
                    if not blocked else xrest[..., 0, :, :])
    red = m32.barrett_reduce_u32(xl, rest_q, rest_rh)
    delta = m32.sub_mod32(red, _qcol(p.half_mod_q, xl[..., 0, :]
                                     if not blocked else xl[..., 0, :, :]),
                          rest_q)
    return _fwd(ks, delta, p.t_ql_next, sub_from=xrest,
                epi_scale=p.qlast_inv, epi_scale_shoup=p.qlast_inv_shoup)


def _moddown_rescale_or_pair(p: CKKSPipeline32, ks: KeySwitch32,
                             s0, s1, d1, d2):
    """Finish the CKKS step from the keyswitch halves: moddown + relin
    tensor adds + rescale.  On the fused engine (CKKS moddown, kernel
    bconv) the whole epilogue runs as ONE launch with a single forward
    NTT per row (ntt_mxu_pallas.moddown_rescale_mxu_pallas); otherwise
    compose moddown32_pair + _rescale.  Returns the RESCALED (2, k-1, ..)
    result."""
    from . import ntt_mxu_pallas as nmp
    k = ks.size_ql
    # interleaved A/B on the v5e (L=43 alpha=22, K=25 chained): composed
    # pair 6.69 ms vs merged 7.08 — the single-NTT-per-row merged kernel
    # LOSES ~0.4 ms despite ~half the transforms (its per-program operand
    # set is ~2x larger, throttling Mosaic's prefetch pipelining).  Off
    # by default; PHANTOM_MERGED_EPILOGUE=1 re-enables for future
    # Mosaic versions.
    merged = (ks.moddown_scale is not None and ks.p_to_t is None
              and _use_kernel_bconv(ks, MODDOWN_VARIANT)
              and _os.environ.get("PHANTOM_MERGED_EPILOGUE", "0") == "1")
    if not merged:
        m0, m1 = moddown32_pair(ks, s0, s1, tensor_add=(d1, d2))
        return _rescale(p, jnp.stack([m0, m1]))
    xp = jnp.stack([s0[k:], s1[k:]])
    y, v = nmp.ntt_inverse_mxu_pallas(
        xp, ks.t_p, scale=ks.moddown_scale,
        scale_shoup=ks.moddown_scale_shoup,
        emit_floor_div=(ks.p_to_q.U, ks.p_to_q.V))
    sub = jnp.stack([s0[:k], s1[:k]])
    out = nmp.moddown_rescale_mxu_pallas(
        y, ks.p_to_q.qhat_mod_p, v, ks.p_to_q.q_mod_p, sub, (d1, d2),
        ks.t_ql, ks.pinv, ks.pinv_shoup, p.half, p.half_mod_q,
        p.qlast_inv, p.qlast_inv_shoup)
    return out[:, :k - 1]


def mult_relin_rescale32(p: CKKSPipeline32, d1: jnp.ndarray,
                         d2: jnp.ndarray) -> jnp.ndarray:
    """d1, d2: (2, size_ql, N) uint32 NTT form -> (2, size_ql-1, N).

    Bit-identical to evaluate.multiply_and_relin + rescale_to_next on the
    u64 path."""
    if p.evk is None:
        raise ValueError("multiply+relin needs a relin key (Fast32 was "
                         "built with rlk=None)")
    ks = p.ks
    # mxu-pallas: run the whole step in the BLOCKED (L, n1, n2) layout —
    # one tiling relayout in and one out instead of one per kernel call
    # (each is a full VPU pass over the ciphertext; see CLAUDE.md).
    # Pre-blocked (2, L, n1, n2) input stays blocked end to end, so a
    # chained caller's loop carry never relayouts at all.
    t = ks.t_ql
    blk = isinstance(t, ntt_mxu.MXUNTTTables) and t.fused_kernel
    pre_blocked = (blk and d1.ndim >= 3
                   and d1.shape[-2:] == (t.n1, t.n2))
    lead = d1.shape[:-2] if pre_blocked else d1.shape[:-1]
    if blk and not pre_blocked:
        d1 = d1.reshape(*lead, t.n1, t.n2)
        d2 = d2.reshape(*lead, t.n1, t.n2)
    q = _qcol(ks.mv_ql.q, d1[0])
    debug.check_range(d1, q, "mult_relin_rescale32: d1 not canonical")
    debug.check_range(d2, q, "mult_relin_rescale32: d2 not canonical")
    n_flat = (d1.shape[-2] * d1.shape[-1]) if blk else d1.shape[-1]
    from . import ntt_mxu_pallas as nmp
    fuse_tensor = (blk and _os.environ.get("PHANTOM_FUSE_TENSOR", "1")
                   != "0")
    use_mega = (ks.modup_mats is not None
                and _resolve_modup(ks) == "kernel"
                and ks.size_ql * n_flat * 4 <= nmp.MODUP_IP_MAX_Y_BYTES)
    if fuse_tensor and use_mega:
        # fully-fused step (kernel-bconv variant): the 2x2 tensor product
        # never exists in HBM.  c2 = d1[1]∘d2[1] is computed in the
        # modup-iNTT prologue and again in the mega-kernel's passthrough
        # rows; c0/c1 ride the moddown-pair epilogue (tensor_add).
        # Bit-identical to the composed path (tests/test_pipeline32.py).
        y = nmp.ntt_inverse_mxu_pallas(
            d1[1], ks.t_ql, scale=ks.modup_scale,
            scale_shoup=ks.modup_scale_shoup, mul_by=d2[1])
        s0, s1 = nmp.modup_ip_mxu_pallas(
            _pad_digit_rows(ks, y), ks.modup_mats,
            (_pad_digit_rows(ks, d1[1]), _pad_digit_rows(ks, d2[1])),
            p.evk, ks.t_qlp, k_data=ks.size_ql)
        out = None
        res = _moddown_rescale_or_pair(p, ks, s0, s1, d1, d2)
    elif fuse_tensor and ks.t_qlp_compl is not None:
        # xla-bconv variant: base conversions as int8 MXU matmuls in
        # XLA; the complement rows' forward NTT and the evk inner
        # product run fused in ONE kernel (preconv mega), with the
        # tensor c2 product in the passthrough rows; the moddown fNTT
        # keeps the (sub - NTT(delta)) * P^-1 epilogue and the c0/c1
        # tensor adds fused in-kernel.
        rh = _qcol(ks.mv_ql.ratio_hi, d1[0])
        rl = _qcol(ks.mv_ql.ratio_lo, d1[0])
        c2 = m32.mul_mod32(d1[1], d2[1], q, rh, rl)
        y = _inv(ks, c2, ks.t_ql, scale=ks.modup_scale,
                 scale_shoup=ks.modup_scale_shoup)
        if _resolve_modup(ks) == "xla-split":
            # two-stage form: batched compl fNTT kernel + XLA IP
            t_up = modup_xla32(ks, y, c2)
            s0, s1 = inner_product32(ks, t_up,
                                     _match_evk_layout(p.evk, t_up))
        else:
            delta = modup_delta_xla32(ks, y)
            s0, s1 = nmp.modup_ip_mxu_pallas(
                delta, None, (_pad_digit_rows(ks, d1[1]),
                              _pad_digit_rows(ks, d2[1])),
                p.evk, ks.t_qlp, k_data=ks.size_ql, preconv=True,
                alpha=ks.size_p)
        out = None
        res = _moddown_rescale_or_pair(p, ks, s0, s1, d1, d2)
    else:
        c0, c1, c2 = _tensor_2x2(ks.mv_ql, d1, d2)
        s0, s1 = modup_ip32(ks, c2, p.evk)
        m0, m1 = moddown32_pair(ks, s0, s1)
        out0 = m32.add_mod32(c0, m0, q)
        out1 = m32.add_mod32(c1, m1, q)
        out = jnp.stack([out0, out1])
    if out is not None:
        res = _rescale(p, out)
    debug.check_range(res, _qcol(ks.mv_ql.q[:-1], res[0]),
                      "rescale output not canonical")
    if blk and not pre_blocked:
        res = res.reshape(*lead[:-1], ks.size_ql - 1, t.n1 * t.n2)
    return res


# ---------------------------------------------------------------------------
# Galois rotations + hoisting
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class Galois32:
    """u32 rotation state: NTT- and coefficient-domain permutation tables +
    per-element keys (reference: PhantomGaloisTool + PhantomGaloisKey,
    galois.cuh:59-159, secretkey.h)."""

    elts: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    perms: jnp.ndarray = None   # (n_elts, N) int32 NTT gather indices
    evks: jnp.ndarray = None    # (n_elts, beta, 2, size_qlp, N) u32
    # coefficient-domain (BFV): index-raw gather + negacyclic sign flips
    coeff_src: jnp.ndarray = None   # (n_elts, N) int32
    coeff_neg: jnp.ndarray = None   # (n_elts, N) bool


def build_galois32(ctx, glk, chain_index: int = 1) -> Galois32:
    from ..schemes import galois as gal
    n = ctx.params.n
    perms = np.stack([gal.make_ntt_perm(e, n) for e in glk.elts])
    coeff = [gal.make_coeff_perm(e, n) for e in glk.elts]
    evks = jnp.stack([convert_key32(ctx, glk.data[i], chain_index)
                      for i in range(len(glk.elts))])
    return Galois32(elts=tuple(glk.elts),
                    perms=jnp.asarray(perms.astype(np.int32)),
                    evks=evks,
                    coeff_src=jnp.asarray(
                        np.stack([c[0] for c in coeff]).astype(np.int32)),
                    coeff_neg=jnp.asarray(
                        np.stack([c[1] for c in coeff]).astype(bool)))


def apply_galois32(ks: KeySwitch32, g: Galois32, d: jnp.ndarray,
                   elt: int) -> jnp.ndarray:
    """NTT-form (2, size_ql, N) -> rotated ciphertext (reference:
    apply_galois_inplace NTT path, evaluate.cu:1567)."""
    kidx = g.elts.index(elt)
    perm = g.perms[kidx]
    c0p = d[0][..., perm]
    c1p = d[1][..., perm]
    switched = keyswitch_from_ntt32(ks, c1p, g.evks[kidx])
    q = ks.mv_ql.q[:, None]
    return jnp.stack([m32.add_mod32(c0p, switched[0], q), switched[1]])


def apply_galois_coeff32(ks: KeySwitch32, g: Galois32, d: jnp.ndarray,
                         elt: int) -> jnp.ndarray:
    """Coefficient-form (BFV) rotation: index-raw gather with negacyclic
    sign flip, then coeff-form keyswitch (reference: apply_galois_inplace
    coefficient branch + apply_galois_permutation, galois.cu:20-39)."""
    kidx = g.elts.index(elt)
    src = g.coeff_src[kidx]
    neg = g.coeff_neg[kidx]
    q = ks.mv_ql.q[:, None]

    def perm(x):
        gathered = x[..., src]
        negated = jnp.where(gathered == 0, m32.U32(0), q - gathered)
        return jnp.where(neg[None, :], negated, gathered)

    c0p = perm(d[0])
    c1p = perm(d[1])
    switched = _inv(ks, keyswitch32(ks, c1p, g.evks[kidx]), ks.t_ql)
    return jnp.stack([m32.add_mod32(c0p, switched[0], q), switched[1]])


def rotate32(ks: KeySwitch32, g: Galois32, d: jnp.ndarray,
             step: int, is_ntt_form: bool = True) -> jnp.ndarray:
    """Slot rotation by `step` (single hop; NAF fallback is the caller's
    job as in evaluate.rotate)."""
    from ..schemes import galois as gal
    elt = gal.get_elt_from_step(step, ks.n)
    if is_ntt_form:
        return apply_galois32(ks, g, d, elt)
    return apply_galois_coeff32(ks, g, d, elt)


def hoisted_linear_combo32(ks: KeySwitch32, g: Galois32, d: jnp.ndarray,
                           steps, pts_qlp32, t_up=None) -> jnp.ndarray:
    """sum_s pt_s * rotate(d, s) with ONE modup and ONE moddown — the
    Halevi-Shoup matvec inner loop on the u32 fast path (mirror of
    evaluate.hoisted_linear_combo; reference building blocks: hoisting,
    evaluate.cu:1670 + multiply_plain).

    pts_qlp32: per-step (size_qlp, N) u32 NTT-form weights (from
    ckks_encoder.encode_extended, cast), aligned with `steps`.

    t_up: optional precomputed modup of c1 so BSGS callers
    (schemes.linear) can share ONE modup across baby-step groups."""
    from ..schemes import galois as gal
    k = ks.size_ql
    c0, c1 = d[0], d[1]
    if t_up is None:
        t_up = modup_from_ntt32(ks, c1)
    q = ks.mv_ql.q[:, None]
    rh = ks.mv_ql.ratio_hi[:, None]
    rl = ks.mv_ql.ratio_lo[:, None]
    qlp_q = ks.mv_qlp.q[:, None]
    qlp_rh = ks.mv_qlp.ratio_hi[:, None]
    qlp_rl = ks.mv_qlp.ratio_lo[:, None]
    acc_c0 = None
    acc_c1 = None
    acc0 = acc1 = None
    half_slots = ks.n // 2
    for s, pt in zip(steps, pts_qlp32):
        if s % half_slots == 0:
            # identity rotation: no keyswitch at all
            term0 = m32.mul_mod32(c0, pt[:k], q, rh, rl)
            term1 = m32.mul_mod32(c1, pt[:k], q, rh, rl)
            acc_c1 = term1 if acc_c1 is None else m32.add_mod32(
                acc_c1, term1, q)
        else:
            elt = gal.get_elt_from_step(s, ks.n)
            kidx = g.elts.index(elt)
            perm = g.perms[kidx]
            c0p = c0[..., perm]
            tperm = t_up[..., perm]
            s0, s1 = inner_product32(ks, tperm, g.evks[kidx])
            w0 = m32.mul_mod32(s0, pt, qlp_q, qlp_rh, qlp_rl)
            w1 = m32.mul_mod32(s1, pt, qlp_q, qlp_rh, qlp_rl)
            term0 = m32.mul_mod32(c0p, pt[:k], q, rh, rl)
            acc0 = w0 if acc0 is None else m32.add_mod32(acc0, w0, qlp_q)
            acc1 = w1 if acc1 is None else m32.add_mod32(acc1, w1, qlp_q)
        acc_c0 = term0 if acc_c0 is None else m32.add_mod32(acc_c0, term0, q)
    if acc0 is not None:
        cx0 = moddown32(ks, acc0)
        cx1 = moddown32(ks, acc1)
        out0 = m32.add_mod32(acc_c0, cx0, q)
        out1 = cx1 if acc_c1 is None else m32.add_mod32(cx1, acc_c1, q)
    else:
        out0 = acc_c0
        out1 = acc_c1
    return jnp.stack([out0, out1])


def hoisting_sum32(ks: KeySwitch32, g: Galois32, d: jnp.ndarray,
                   steps) -> jnp.ndarray:
    """sum_s rotate(d, s): ONE modup, per-step NTT-domain digit permutation
    + evk inner product, ONE moddown (reference: hoisting_inplace,
    evaluate.cu:1670-1865)."""
    from ..schemes import galois as gal
    c0, c1 = d[0], d[1]
    t_up = modup_from_ntt32(ks, c1)
    q = ks.mv_ql.q[:, None]
    qlp_q = ks.mv_qlp.q[:, None]
    acc_c0 = None
    acc0 = acc1 = None
    for s in steps:
        elt = gal.get_elt_from_step(s, ks.n)
        kidx = g.elts.index(elt)
        perm = g.perms[kidx]
        c0p = c0[..., perm]
        tperm = t_up[..., perm]
        s0, s1 = inner_product32(ks, tperm, g.evks[kidx])
        acc_c0 = c0p if acc_c0 is None else m32.add_mod32(acc_c0, c0p, q)
        acc0 = s0 if acc0 is None else m32.add_mod32(acc0, s0, qlp_q)
        acc1 = s1 if acc1 is None else m32.add_mod32(acc1, s1, qlp_q)
    cx0 = moddown32(ks, acc0)
    cx1 = moddown32(ks, acc1)
    return jnp.stack([m32.add_mod32(acc_c0, cx0, q), cx1])
