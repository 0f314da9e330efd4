"""Fast32: the user-facing uint32 evaluator — every verb at device speed
over the whole modulus chain.

The reference runs all schemes and all verbs through its device kernels;
this is the TPU-native equivalent: a per-context wrapper that lazily
builds the u32 pipelines (ops/pipeline32, bfv32, bgv32) for each chain
level and dispatches evaluator verbs on uint32 ciphertexts.  Results are
bit-identical to the u64 scheme layer (tests/test_fast32.py), so
encode/encrypt/decrypt interop with the generic stack by casting.

Usage:
    ev = Fast32(ctx, rlk=rlk, glk=glk)           # once per context
    c = ev.from_ciphertext(ct)                   # u64 Ciphertext -> Ct32
    c = ev.multiply_and_relin(c, c)
    c = ev.rescale_to_next(c)                    # CKKS
    c = ev.rotate(c, 1)
    ct = ev.to_ciphertext(c)                     # back to the u64 layer
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

from .ops import bfv32, bgv32
from .ops import modmath32 as m32
from .ops import pipeline32 as pp
from .schemes.ciphertext import Ciphertext
from .schemes.context import Context
from .schemes.params import MulTech, Scheme


@flax.struct.dataclass
class Ct32:
    """uint32 ciphertext: (size, L, N) residues + static bookkeeping."""

    data: jnp.ndarray
    chain_index: int = flax.struct.field(pytree_node=False, default=1)
    is_ntt_form: bool = flax.struct.field(pytree_node=False, default=False)
    scale: float = flax.struct.field(pytree_node=False, default=1.0)
    correction_factor: int = flax.struct.field(pytree_node=False, default=1)
    noise_scale_deg: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def size(self):
        return self.data.shape[0]


class Fast32:
    """Per-context u32 evaluator with per-level pipeline caches.

    Call the verbs EAGERLY (XLA dispatch is async, so eager calls already
    pipeline on device); to place a verb inside your own jit, prebuild the
    level first (`prebuild(ci)`) or use the ops-level pipelines directly
    with the pipeline object as a jit argument — building pipelines inside
    a trace is an error (table conversion needs concrete arrays)."""

    def __init__(self, ctx: Context, rlk=None, glk=None,
                 use_pallas=False):
        # use_pallas: engine selector — False/"xla" (u32 butterfly stages),
        # True/"pallas-roll" (VMEM butterfly kernels), "mxu" (four-step matmul NTT)
        if any(int(q) >= (1 << 30) for q in ctx.params.coeff_modulus):
            raise ValueError("Fast32 requires all primes < 2^30 "
                             "(the u32 fast-path constraint)")
        self.ctx = ctx
        self.rlk = rlk
        self.glk = glk
        self.use_pallas = use_pallas
        self.scheme = ctx.params.scheme
        self._ks = {}       # chain_index -> KeySwitch32
        self._evk = {}      # chain_index -> relin evk (u32)
        self._galois = {}   # chain_index -> Galois32
        self._ckks = {}     # chain_index -> CKKSPipeline32
        self._bfv = {}      # chain_index -> BFV pipeline (per mul_tech)
        self._bgv = {}      # chain_index -> BGVPipeline32

    # -- conversions --------------------------------------------------------
    def from_ciphertext(self, ct: Ciphertext) -> Ct32:
        return Ct32(data=jnp.asarray(np.asarray(ct.data).astype(np.uint32)),
                    chain_index=ct.chain_index, is_ntt_form=ct.is_ntt_form,
                    scale=ct.scale, correction_factor=ct.correction_factor,
                    noise_scale_deg=ct.noise_scale_deg)

    def to_ciphertext(self, c: Ct32) -> Ciphertext:
        return Ciphertext(
            data=jnp.asarray(np.asarray(c.data).astype(np.uint64)),
            chain_index=c.chain_index, is_ntt_form=c.is_ntt_form,
            scale=c.scale, correction_factor=c.correction_factor,
            noise_scale_deg=c.noise_scale_deg)

    # -- per-level pipeline caches ------------------------------------------
    def prebuild(self, ci: int):
        """Eagerly build every pipeline this level can need (so verbs can
        subsequently run inside a caller's jit without tracing a build)."""
        self.keyswitch_at(ci)
        if self.rlk is not None:
            self.evk_at(ci)
            if self.scheme == Scheme.CKKS:
                if ci + 1 < len(self.ctx.chain):
                    self._ckks_at(ci)
            elif self.scheme == Scheme.BFV:
                self._bfv_at(ci)
            else:
                self._bgv_at(ci)
        if self.glk is not None:
            self.galois_at(ci)
        return self

    def keyswitch_at(self, ci: int) -> pp.KeySwitch32:
        if ci not in self._ks:
            self._ks[ci] = pp.build_keyswitch32(
                self.ctx, ci, self.use_pallas,
                for_bgv=(self.scheme == Scheme.BGV))
        return self._ks[ci]

    def evk_at(self, ci: int) -> jnp.ndarray:
        if ci not in self._evk:
            if self.rlk is None:
                raise ValueError("no relinearization key")
            self._evk[ci] = pp.convert_key32(self.ctx, self.rlk.data, ci)
        return self._evk[ci]

    def galois_at(self, ci: int) -> pp.Galois32:
        if ci not in self._galois:
            if self.glk is None:
                raise ValueError("no galois keys")
            self._galois[ci] = pp.build_galois32(self.ctx, self.glk, ci)
        return self._galois[ci]

    def _ckks_at(self, ci: int) -> pp.CKKSPipeline32:
        if ci not in self._ckks:
            self._ckks[ci] = pp.build_pipeline32(self.ctx, self.rlk, ci,
                                                 self.use_pallas)
        return self._ckks[ci]

    def _bfv_at(self, ci: int):
        if ci not in self._bfv:
            mt = self.ctx.params.mul_tech
            if mt == MulTech.BEHZ:
                p = bfv32.build_bfv_behz32(self.ctx, self.rlk, ci,
                                           self.use_pallas)
            elif mt == MulTech.HPS_OVERQ_LEVELED:
                p = bfv32.build_bfv_leveled32(self.ctx, self.rlk,
                                              use_pallas=self.use_pallas)
            else:
                p = bfv32.build_bfv32(self.ctx, self.rlk, ci,
                                      self.use_pallas)
            self._bfv[ci] = p
        return self._bfv[ci]

    def _bgv_at(self, ci: int) -> bgv32.BGVPipeline32:
        if ci not in self._bgv:
            self._bgv[ci] = bgv32.build_bgv32(self.ctx, self.rlk, ci,
                                              self.use_pallas)
        return self._bgv[ci]

    # -- elementwise verbs --------------------------------------------------
    def _mv(self, ci: int):
        return self.keyswitch_at(ci).mv_ql

    def add(self, c1: Ct32, c2: Ct32) -> Ct32:
        if (self.scheme == Scheme.BGV
                and c1.correction_factor != c2.correction_factor):
            c1, c2 = self._balance(c1, c2)
        q = self._mv(c1.chain_index).q[:, None]
        size = max(c1.size, c2.size)
        a = _pad_to(c1.data, size)
        b = _pad_to(c2.data, size)
        return c1.replace(data=m32.add_mod32(a, b, q))

    def sub(self, c1: Ct32, c2: Ct32) -> Ct32:
        if (self.scheme == Scheme.BGV
                and c1.correction_factor != c2.correction_factor):
            c1, c2 = self._balance(c1, c2)
        q = self._mv(c1.chain_index).q[:, None]
        size = max(c1.size, c2.size)
        a = _pad_to(c1.data, size)
        b = _pad_to(c2.data, size)
        return c1.replace(data=m32.sub_mod32(a, b, q))

    def negate(self, c: Ct32) -> Ct32:
        q = self._mv(c.chain_index).q[:, None]
        return c.replace(data=m32.neg_mod32(c.data, q))

    def _balance(self, c1: Ct32, c2: Ct32):
        """BGV correction-factor balancing, centered multipliers (mirror of
        evaluate._balance_correction)."""
        from .schemes.evaluate import _balance_factors
        t = self.ctx.params.plain_modulus
        f, m1, m2 = _balance_factors(c1.correction_factor,
                                     c2.correction_factor, t)
        mv = self._mv(c1.chain_index)

        def scale(c, m):
            if m == 1:
                return c.replace(correction_factor=f)
            neg = m > t // 2
            mag = jnp.uint32(t - m if neg else m)
            scaled = m32.mul_mod32(c.data, mag, mv.q[:, None],
                                   mv.ratio_hi[:, None],
                                   mv.ratio_lo[:, None])
            if neg:
                scaled = m32.neg_mod32(scaled, mv.q[:, None])
            return c.replace(data=scaled, correction_factor=f)

        return scale(c1, m1), scale(c2, m2)

    def _bgv_lift32(self, ci: int, m_row) -> jnp.ndarray:
        """Mod-t plaintext (N,) -> u32 NTT residues over Ql (u32 mirror of
        keys._bgv_lift_plain_ntt: recenter [ceil(t/2), t) to q - (t-m))."""
        ks = self.keyswitch_at(ci)
        t = self.ctx.params.plain_modulus
        q = ks.mv_ql.q[:, None]
        m = jnp.asarray(m_row).astype(jnp.uint32)[None, :]
        thr = jnp.uint32((t + 1) >> 1)
        lifted = jnp.where(m >= thr, q - (jnp.uint32(t) - m),
                           jnp.broadcast_to(m, (ks.size_ql, m.shape[1])))
        return pp._fwd(ks, lifted, ks.t_ql)

    def _plain_rns32(self, ci: int, plain) -> jnp.ndarray:
        """Lift a Plaintext to u32 (k, N) residues in the ct's domain
        (BFV: round(Q*m/t) coeff form; CKKS: NTT residues as-is; BGV:
        mod-t lift in NTT form) — all device-resident."""
        from .ops import scaleround as sr
        cd = self.ctx.get_context_data(ci)
        if self.scheme == Scheme.BFV:
            return sr.scale_plain_up(jnp.asarray(plain.data[0]),
                                     cd.plain_lift).astype(jnp.uint32)
        if self.scheme == Scheme.CKKS:
            return jnp.asarray(plain.data).astype(jnp.uint32)
        return self._bgv_lift32(ci, plain.data[0])

    def add_plain(self, c: Ct32, plain) -> Ct32:
        """ct + pt (mirror of evaluate.add_plain; for BGV the plaintext
        enters scaled by the ct's correction factor)."""
        q = self._mv(c.chain_index).q[:, None]
        if self.scheme == Scheme.BGV and c.correction_factor % \
                self.ctx.params.plain_modulus != 1:
            t = self.ctx.params.plain_modulus
            f = c.correction_factor % t
            m = (np.asarray(plain.data[0]).astype(object) * f) % t
            plain = plain.replace(data=jnp.asarray(
                m.astype(np.uint64))[None])
        pt32 = self._plain_rns32(c.chain_index, plain)
        c0 = m32.add_mod32(c.data[0], pt32, q)
        return c.replace(data=c.data.at[0].set(c0))

    def sub_plain(self, c: Ct32, plain) -> Ct32:
        """ct - pt (mirror of evaluate.sub_plain)."""
        q = self._mv(c.chain_index).q[:, None]
        if self.scheme == Scheme.BGV and c.correction_factor % \
                self.ctx.params.plain_modulus != 1:
            t = self.ctx.params.plain_modulus
            f = c.correction_factor % t
            m = (np.asarray(plain.data[0]).astype(object) * f) % t
            plain = plain.replace(data=jnp.asarray(
                m.astype(np.uint64))[None])
        pt32 = self._plain_rns32(c.chain_index, plain)
        c0 = m32.sub_mod32(c.data[0], pt32, q)
        return c.replace(data=c.data.at[0].set(c0))

    def multiply_plain(self, c: Ct32, plain) -> Ct32:
        """ct * pt (mirror of evaluate.multiply_plain)."""
        ks = self.keyswitch_at(c.chain_index)
        mv = ks.mv_ql
        q = mv.q[:, None]
        rh = mv.ratio_hi[:, None]
        rl = mv.ratio_lo[:, None]
        if self.scheme == Scheme.BFV:
            # coeff-form ct: NTT both, dyadic product, back (centered lift
            # of m, as in evaluate._bfv_plain_centered_rns)
            from .schemes.evaluate import _bfv_plain_centered_rns
            cd = self.ctx.get_context_data(c.chain_index)
            m_rns = jnp.asarray(np.asarray(_bfv_plain_centered_rns(
                self.ctx, cd, plain.data[0])).astype(np.uint32))
            m_ntt = pp._fwd(ks, m_rns, ks.t_ql)
            ct_ntt = pp._fwd(ks, c.data, ks.t_ql)
            prod = m32.mul_mod32(ct_ntt, m_ntt[None], q, rh, rl)
            return c.replace(data=pp._inv(ks, prod, ks.t_ql))
        pt32 = self._plain_rns32(c.chain_index, plain)
        prod = m32.mul_mod32(c.data, pt32[None], q, rh, rl)
        if self.scheme == Scheme.CKKS:
            return c.replace(data=prod, scale=c.scale * plain.scale)
        return c.replace(data=prod)

    # -- multiply / relinearize ---------------------------------------------
    def multiply_and_relin(self, c1: Ct32, c2: Ct32) -> Ct32:
        ci = c1.chain_index
        if self.scheme == Scheme.CKKS:
            ks = self.keyswitch_at(ci)
            evk = self.evk_at(ci)
            q = ks.mv_ql.q[:, None]
            t0, t1, t2 = pp._tensor_2x2(ks.mv_ql, c1.data, c2.data)
            s0, s1 = pp.modup_ip32(ks, t2, evk)
            out = jnp.stack([m32.add_mod32(t0, pp.moddown32(ks, s0), q),
                             m32.add_mod32(t1, pp.moddown32(ks, s1), q)])
            return c1.replace(data=out, scale=c1.scale * c2.scale)
        if self.scheme == Scheme.BFV:
            p = self._bfv_at(ci)
            mt = self.ctx.params.mul_tech
            if mt == MulTech.BEHZ:
                out = bfv32.bfv_mult_relin_behz32(p, c1.data, c2.data)
            elif mt == MulTech.HPS_OVERQ:
                out = bfv32.bfv_mult_relin_overq32(p, c1.data, c2.data)
            elif mt == MulTech.HPS_OVERQ_LEVELED:
                out = bfv32.bfv_mult_relin_leveled32(p, c1.data, c2.data)
            else:
                out = bfv32.bfv_mult_relin32(p, c1.data, c2.data)
            nsd = max(c1.noise_scale_deg, c2.noise_scale_deg) + (
                1 if mt == MulTech.HPS_OVERQ_LEVELED else 0)
            return c1.replace(data=out, noise_scale_deg=nsd)
        # BGV
        p = self._bgv_at(ci)
        out = bgv32.bgv_mult_relin32(p, c1.data, c2.data)
        t = self.ctx.params.plain_modulus
        f = (c1.correction_factor * c2.correction_factor) % t
        return c1.replace(data=out, correction_factor=f)

    def multiply(self, c1: Ct32, c2: Ct32) -> Ct32:
        """Unrelinearized multiply -> size-3 ciphertext (mirror of
        evaluate.multiply)."""
        ci = c1.chain_index
        if self.scheme == Scheme.BFV:
            p = self._bfv_at(ci)
            mt = self.ctx.params.mul_tech
            if mt == MulTech.BEHZ:
                out = bfv32.bfv_mult_behz32(p, c1.data, c2.data)
            elif mt == MulTech.HPS_OVERQ:
                out = bfv32.bfv_mult_hps_overq32(p, c1.data, c2.data)
            elif mt == MulTech.HPS_OVERQ_LEVELED:
                out = bfv32.bfv_mult_leveled32(p, c1.data, c2.data)
            else:
                out = bfv32.bfv_mult32(p, c1.data, c2.data)
            nsd = max(c1.noise_scale_deg, c2.noise_scale_deg) + (
                1 if mt == MulTech.HPS_OVERQ_LEVELED else 0)
            return c1.replace(data=out, noise_scale_deg=nsd)
        ks = self.keyswitch_at(ci)
        t0, t1, t2 = pp._tensor_2x2(ks.mv_ql, c1.data, c2.data)
        out = jnp.stack([t0, t1, t2])
        if self.scheme == Scheme.CKKS:
            return c1.replace(data=out, scale=c1.scale * c2.scale)
        t = self.ctx.params.plain_modulus
        return c1.replace(
            data=out,
            correction_factor=(c1.correction_factor
                               * c2.correction_factor) % t)

    def relinearize(self, c: Ct32) -> Ct32:
        """size-3 -> size-2 via the relin key (mirror of
        evaluate.relinearize)."""
        if c.size != 3:
            raise ValueError("relinearize expects a size-3 ciphertext")
        ks = self.keyswitch_at(c.chain_index)
        evk = self.evk_at(c.chain_index)
        q = ks.mv_ql.q[:, None]
        if c.is_ntt_form:
            switched = pp.keyswitch_from_ntt32(ks, c.data[2], evk)
        else:
            switched = pp._inv(ks, pp.keyswitch32(ks, c.data[2], evk),
                               ks.t_ql)
        return c.replace(data=jnp.stack(
            [m32.add_mod32(c.data[0], switched[0], q),
             m32.add_mod32(c.data[1], switched[1], q)]))

    def square_and_relin(self, c: Ct32) -> Ct32:
        """ct^2 + relinearize via the square tensor (one fewer dyadic
        multiply; mirror of evaluate.square + relinearize)."""
        ci = c.chain_index
        if self.scheme == Scheme.CKKS:
            ks = self.keyswitch_at(ci)
            evk = self.evk_at(ci)
            q = ks.mv_ql.q[:, None]
            t0, t1, t2 = pp._tensor_square_2x2(ks.mv_ql, c.data)
            s0, s1 = pp.modup_ip32(ks, t2, evk)
            out = jnp.stack([m32.add_mod32(t0, pp.moddown32(ks, s0), q),
                             m32.add_mod32(t1, pp.moddown32(ks, s1), q)])
            return c.replace(data=out, scale=c.scale * c.scale)
        if self.scheme == Scheme.BGV:
            ks = self.keyswitch_at(ci)
            evk = self.evk_at(ci)
            q = ks.mv_ql.q[:, None]
            t0, t1, t2 = pp._tensor_square_2x2(ks.mv_ql, c.data)
            switched = pp.keyswitch_from_ntt32(ks, t2, evk)
            out = jnp.stack([m32.add_mod32(t0, switched[0], q),
                             m32.add_mod32(t1, switched[1], q)])
            t = self.ctx.params.plain_modulus
            return c.replace(data=out,
                             correction_factor=(c.correction_factor ** 2)
                             % t)
        # BFV: square via the general multiply (the HPS square shortcut
        # shares the lift; the general path is bit-identical)
        return self.multiply_and_relin(c, c)

    # -- rescale / mod switch -----------------------------------------------
    def rescale_to_next(self, c: Ct32) -> Ct32:
        if self.scheme != Scheme.CKKS:
            raise ValueError("rescale is CKKS-only")
        p = self._ckks_at(c.chain_index)
        qlast = int(self.ctx.params.data_moduli[p.size_ql - 1])
        out = pp._rescale(p, c.data)
        return c.replace(data=out, chain_index=c.chain_index + 1,
                         scale=c.scale / qlast)

    def mod_switch_to_next(self, c: Ct32) -> Ct32:
        if self.scheme == Scheme.CKKS:
            k = self.keyswitch_at(c.chain_index).size_ql
            return c.replace(data=c.data[..., :k - 1, :],
                             chain_index=c.chain_index + 1)
        if self.scheme == Scheme.BGV:
            p = self._bgv_at(c.chain_index)
            out = bgv32.bgv_mod_switch32(p, c.data)
            from .host import numth
            t = self.ctx.params.plain_modulus
            k = self.keyswitch_at(c.chain_index).size_ql
            qlast = int(self.ctx.params.data_moduli[k - 1])
            f = (c.correction_factor
                 * numth.invert_mod(qlast % t, t)) % t
            return c.replace(data=out, chain_index=c.chain_index + 1,
                             correction_factor=f)
        # BFV: round(x / q_last), coefficient form (mirror of
        # evaluate._divide_round_qlast_coeff; reference:
        # divide_and_round_q_last, rns.cu:1114)
        rc = self.ctx.get_context_data(c.chain_index).rescale
        mv = self._mv(c.chain_index)
        k = self.keyswitch_at(c.chain_index).size_ql
        qlast = mv.q[k - 1]
        half = jnp.uint32(int(np.asarray(rc.half)))
        xl = m32.add_mod32(c.data[..., k - 1:k, :], half, qlast)
        rest_q = mv.q[:k - 1][:, None]
        rest_rh = mv.ratio_hi[:k - 1][:, None]
        red = m32.barrett_reduce_u32(xl, rest_q, rest_rh)
        half_mod_q = jnp.asarray(
            np.asarray(rc.half_mod_q).astype(np.uint32))
        delta = m32.sub_mod32(red, half_mod_q[:, None], rest_q)
        diff = m32.sub_mod32(c.data[..., :k - 1, :], delta, rest_q)
        qinv = jnp.asarray(np.asarray(rc.qlast_inv).astype(np.uint32))
        qinv_sh = jnp.asarray(
            (np.asarray(rc.qlast_inv_shoup) >> 32).astype(np.uint32))
        out = m32.mul_mod_shoup32(diff, qinv[:, None], qinv_sh[:, None],
                                  rest_q)
        return c.replace(data=out, chain_index=c.chain_index + 1)

    # -- rotations ----------------------------------------------------------
    def rotate(self, c: Ct32, step: int) -> Ct32:
        ks = self.keyswitch_at(c.chain_index)
        g = self.galois_at(c.chain_index)
        out = pp.rotate32(ks, g, c.data, step,
                          is_ntt_form=c.is_ntt_form)
        return c.replace(data=out)

    def apply_galois(self, c: Ct32, elt: int) -> Ct32:
        ks = self.keyswitch_at(c.chain_index)
        g = self.galois_at(c.chain_index)
        if c.is_ntt_form:
            out = pp.apply_galois32(ks, g, c.data, elt)
        else:
            out = pp.apply_galois_coeff32(ks, g, c.data, elt)
        return c.replace(data=out)

    def hoisting(self, c: Ct32, steps) -> Ct32:
        ks = self.keyswitch_at(c.chain_index)
        g = self.galois_at(c.chain_index)
        return c.replace(data=pp.hoisting_sum32(ks, g, c.data, steps))

    def hoisted_linear_combo(self, c: Ct32, steps, pts_qlp,
                             pts_scale: float = 1.0) -> Ct32:
        """sum_s pt_s * rotate(c, s), one modup/moddown (CKKS matvec
        primitive); pts_qlp from ckks_encoder.encode_extended."""
        ks = self.keyswitch_at(c.chain_index)
        g = self.galois_at(c.chain_index)
        pts32 = [jnp.asarray(np.asarray(p_).astype(np.uint32))
                 for p_ in pts_qlp]
        out = pp.hoisted_linear_combo32(ks, g, c.data, steps, pts32)
        return c.replace(data=out, scale=c.scale * pts_scale)

    # -- key generation (u32 fast path) ---------------------------------------
    def _key32(self):
        """Key-level u32 state: engine NTT tables + ModulusVec32 over the
        full QP base (cached)."""
        from .ops import bconv32 as bc32
        if not hasattr(self, "_keyt"):
            self._keyt = (
                pp._conv_tables(self.ctx.ntt, self.use_pallas),
                bc32.modulus_vec32(
                    [int(q) for q in self.ctx.params.coeff_modulus]))
        return self._keyt

    def _bgv_key_mult32(self):
        if self.scheme != Scheme.BGV:
            return None, None
        t = int(self.ctx.params.plain_modulus)
        qs = [int(q) for q in self.ctx.params.coeff_modulus]
        mult = jnp.asarray(np.array([t % q for q in qs], dtype=np.uint32))
        mult_shoup = jnp.asarray(np.array(
            [m32.compute_shoup32(t % q, q) for q in qs], dtype=np.uint32))
        return mult, mult_shoup

    def _kswitch_consts32(self):
        """Static consts for u32 kswitch keygen: (P mod q, Shoup, digit
        mask) over the key base (cached)."""
        if not hasattr(self, "_ksc32"):
            p = self.ctx.params
            alpha = p.size_p
            dnum = -(-p.size_q // alpha)
            big_p = 1
            for q in p.special_moduli:
                big_p *= q
            qs = [int(q) for q in p.coeff_modulus]
            pm = jnp.asarray(np.array([big_p % q for q in qs],
                                      dtype=np.uint32))
            pm_shoup = jnp.asarray(np.array(
                [m32.compute_shoup32(big_p % q, q) for q in qs],
                dtype=np.uint32))
            mask = np.zeros((dnum, p.size_qp, 1), dtype=bool)
            for d in range(dnum):
                mask[d, d * alpha: min((d + 1) * alpha, p.size_q)] = True
            self._ksc32 = (pm, pm_shoup, jnp.asarray(mask), dnum)
        return self._ksc32

    def gen_secret_key(self, rng):
        """Ternary secret in NTT form over QP, u32 NTT engine —
        bit-identical to keys.gen_secret_key (same ternary draw, exact
        transform).  Reference: gen_secretkey, src/secretkey.cu:343."""
        from .schemes.keys import SecretKey
        t32, mv = self._key32()
        return SecretKey(data=gen_secret_core32(
            t32, mv, rng, self.ctx.params.n).astype(jnp.uint64))

    def _encrypt_zero_sym32(self, s32_ntt, rng, mult, mult_shoup):
        t32, mv = self._key32()
        return encrypt_zero_sym_core32(t32, mv, self.ctx.key_mv, s32_ntt,
                                       rng, self.ctx.params.n, mult,
                                       mult_shoup)

    def gen_public_key(self, sk, rng):
        """u32 mirror of keys.gen_public_key (bit-identical)."""
        from .schemes.keys import PublicKey
        mult, mult_shoup = self._bgv_key_mult32()
        s32 = jnp.asarray(sk.data).astype(jnp.uint32)
        c0, c1 = self._encrypt_zero_sym32(s32, rng, mult, mult_shoup)
        return PublicKey(data=jnp.stack([c0, c1]).astype(jnp.uint64))

    def _gen_kswitch_key32(self, s32, new_key32, rng):
        t32, mv = self._key32()
        mult, mult_shoup = self._bgv_key_mult32()
        pm, pm_shoup, mask, dnum = self._kswitch_consts32()
        return gen_kswitch_core32(t32, mv, self.ctx.key_mv, s32, new_key32,
                                  rng, self.ctx.params.n, dnum, pm,
                                  pm_shoup, mask, mult, mult_shoup)

    def gen_relin_key(self, sk, rng):
        """u32 mirror of keys.gen_relin_key (bit-identical)."""
        from .schemes.keys import RelinKey
        _, mv = self._key32()
        s32 = jnp.asarray(sk.data).astype(jnp.uint32)
        s_sq = m32.mul_mod32(s32, s32, mv.q[:, None],
                             mv.ratio_hi[:, None], mv.ratio_lo[:, None])
        return RelinKey(
            data=self._gen_kswitch_key32(s32, s_sq, rng
                                         ).astype(jnp.uint64))

    def create_galois_keys(self, sk, rng, steps=None, elts=None):
        """u32 mirror of keys.create_galois_keys: one kswitch key per
        element, switching sigma_elt(s) -> s (bit-identical)."""
        import jax

        from .schemes import galois as gal
        from .schemes.keys import GaloisKeys
        n = self.ctx.params.n
        if elts is None:
            if steps is not None:
                elts = gal.get_elts_from_steps(steps, n)
            elif self.ctx.params.galois_elts:
                elts = list(self.ctx.params.galois_elts)
            else:
                elts = gal.default_elts(n)
        s32 = jnp.asarray(sk.data).astype(jnp.uint32)
        all_keys = []
        for elt in elts:
            rng, sub = jax.random.split(rng)
            perm = jnp.asarray(gal.make_ntt_perm(elt, n).astype(np.int32))
            all_keys.append(self._gen_kswitch_key32(s32, s32[..., perm],
                                                    sub))
        return GaloisKeys(data=jnp.stack(all_keys).astype(jnp.uint64),
                          elts=tuple(int(e) for e in elts))

    # -- encrypt / decrypt ----------------------------------------------------
    def _enc_consts32(self, pk, ci: int):
        """Device-resident u32 encrypt constants, cached per level: the
        QlP-row cast of the public key and the BGV noise multiplier
        (t mod q with Shoup companions)."""
        from .schemes.keyswitch import qlp_rows
        if not hasattr(self, "_enc32"):
            self._enc32 = {}
        ent = self._enc32.get(ci)
        if ent is not None and ent[0] is pk:
            return ent[1], ent[2], ent[3]
        rows = np.asarray(qlp_rows(self.ctx, self.keyswitch_at(ci).size_ql))
        pk32 = jnp.asarray(pk.data)[:, rows, :].astype(jnp.uint32)
        mult = mult_shoup = None
        if self.scheme == Scheme.BGV:
            t = int(self.ctx.params.plain_modulus)
            qlp = [int(self.ctx.params.coeff_modulus[r]) for r in rows]
            mult = jnp.asarray(np.array([t % q for q in qlp],
                                        dtype=np.uint32))
            mult_shoup = jnp.asarray(np.array(
                [m32.compute_shoup32(t % q, q) for q in qlp],
                dtype=np.uint32))
        self._enc32[ci] = (pk, pk32, mult, mult_shoup)
        return pk32, mult, mult_shoup

    def _encrypt_zero_asym32(self, pk, ci: int, rng, is_ntt: bool):
        pk32, mult, mult_shoup = self._enc_consts32(pk, ci)
        return encrypt_zero_core32(self.keyswitch_at(ci), pk32, rng,
                                   is_ntt, mult, mult_shoup)

    def encrypt_asymmetric(self, pk, plain, rng) -> Ct32:
        """u32 asymmetric encryption; bit-identical to
        keys.encrypt_asymmetric (tests/test_fast32.py)."""
        from .ops import scaleround as sr
        ctx = self.ctx
        p = ctx.params
        if p.scheme == Scheme.BFV:
            ci = ctx.first_data_index
            cd = ctx.get_context_data(ci)
            zero = self._encrypt_zero_asym32(pk, ci, rng, is_ntt=False)
            lifted = sr.scale_plain_up(jnp.asarray(plain.data[0]),
                                       cd.plain_lift).astype(jnp.uint32)
            q = self._mv(ci).q[:, None]
            c0 = m32.add_mod32(zero[0], lifted, q)
            return Ct32(data=jnp.stack([c0, zero[1]]), chain_index=ci,
                        is_ntt_form=False)
        if p.scheme == Scheme.CKKS:
            ci = plain.chain_index
            zero = self._encrypt_zero_asym32(pk, ci, rng, is_ntt=True)
            pt32 = jnp.asarray(plain.data).astype(jnp.uint32)
            q = self._mv(ci).q[:, None]
            c0 = m32.add_mod32(zero[0], pt32, q)
            return Ct32(data=jnp.stack([c0, zero[1]]), chain_index=ci,
                        is_ntt_form=True, scale=plain.scale)
        # BGV: mod-t lift recentered into each q_i, u32 NTT over Ql
        ci = ctx.first_data_index
        zero = self._encrypt_zero_asym32(pk, ci, rng, is_ntt=True)
        q = self._mv(ci).q[:, None]
        pt32 = self._bgv_lift32(ci, plain.data[0])
        c0 = m32.add_mod32(zero[0], pt32, q)
        return Ct32(data=jnp.stack([c0, zero[1]]), chain_index=ci,
                    is_ntt_form=True)

    def _decrypt_consts(self, ci: int):
        if not hasattr(self, "_dec"):
            self._dec = {}
        if ci not in self._dec:
            from .host.rns import BaseConverter, RNSBase
            from .ops import bconv32 as bc32
            from .ops import scaleround32 as sr32
            cd = self.ctx.get_context_data(ci)
            ql = list(cd.moduli)
            t = int(self.ctx.params.plain_modulus)
            big_q = 1
            for q in ql:
                big_q *= q
            if self.scheme == Scheme.BFV:
                # round(t/Q * x) mod t IS the v-free construction with
                # out = {t}: t | t*Q/Q, and the +v*t overshoot vanishes mod t
                self._dec[ci] = sr32.make_exact_scale_round32(
                    ql, t, big_q, [t])
            elif self.scheme == Scheme.BGV:
                half = (big_q - 1) >> 1
                self._dec[ci] = (
                    bc32.consts32_from_host(
                        BaseConverter(RNSBase(ql), RNSBase([t]))),
                    jnp.asarray(np.array([half % q for q in ql],
                                         dtype=np.uint32)),
                    jnp.uint32(half % t),
                )
        return self._dec.get(ci)

    def decrypt(self, sk, c: Ct32):
        """u32 decryption to a Plaintext (mirror of keys.decrypt)."""
        from .host import numth
        from .ops import bconv32 as bc32
        from .ops import scaleround32 as sr32
        from .schemes.ciphertext import Plaintext
        ks = self.keyswitch_at(c.chain_index)
        k = ks.size_ql
        q = ks.mv_ql.q[:, None]
        rh = ks.mv_ql.ratio_hi[:, None]
        rl = ks.mv_ql.ratio_lo[:, None]
        s = jnp.asarray(np.asarray(sk.data)[:k].astype(np.uint32))
        polys = c.data
        if not c.is_ntt_form:
            polys = pp._fwd(ks, polys, ks.t_ql)
        acc = polys[0]
        s_pow = s
        for i in range(1, c.size):
            acc = m32.add_mod32(
                acc, m32.mul_mod32(polys[i], s_pow, q, rh, rl), q)
            if i + 1 < c.size:
                s_pow = m32.mul_mod32(s_pow, s, q, rh, rl)
        if self.scheme == Scheme.CKKS:
            return Plaintext(
                data=jnp.asarray(np.asarray(acc).astype(np.uint64)),
                chain_index=c.chain_index, is_ntt_form=True, scale=c.scale)
        x = pp._inv(ks, acc, ks.t_ql)
        t = int(self.ctx.params.plain_modulus)
        if self.scheme == Scheme.BFV:
            consts = self._decrypt_consts(c.chain_index)
            m = sr32.scale_and_round_exact32(x, consts)[0]
            return Plaintext(
                data=jnp.asarray(np.asarray(m).astype(np.uint64))[None],
                chain_index=c.chain_index)
        # BGV: centered exact conversion Ql -> t + correction-factor fix
        q_to_t, qhalf_mod_q, qhalf_mod_t = self._decrypt_consts(
            c.chain_index)
        shifted = m32.add_mod32(x, qhalf_mod_q[:, None], q)
        conv = bc32.bconv_exact32(shifted, q_to_t)
        tq = q_to_t.obase.q[:, None]
        m = m32.sub_mod32(conv, qhalf_mod_t, tq)
        f = c.correction_factor % t
        if f != 1:
            finv = numth.invert_mod(f, t)
            m = m32.mul_mod32(m, jnp.uint32(finv), tq,
                              q_to_t.obase.ratio_hi[:, None],
                              q_to_t.obase.ratio_lo[:, None])
        return Plaintext(
            data=jnp.asarray(np.asarray(m).astype(np.uint64)),
            chain_index=c.chain_index)


def gen_secret_core32(t32, mv, rng, n: int) -> jnp.ndarray:
    """Functional u32 secret keygen body (tables as args, jit-safe):
    same ternary draw as keys.gen_secret_key, u32 NTT over QP."""
    from .ops import sampling as smp
    s32 = smp.lift_signed_to_rns32(smp.sample_ternary_vec(rng, n), mv)
    return pp._fwd(None, s32, t32)


def encrypt_zero_sym_core32(t32, mv, key_mv, s32_ntt, rng, n: int,
                            mult=None, mult_shoup=None):
    """(c0, c1) = (-(a s + e), a) in NTT form at the key level, all u32
    (same threefry draws as keys._encrypt_zero_symmetric_ntt; reference:
    encrypt_zero_symmetric, src/secretkey.cu:232)."""
    import jax

    from .ops import sampling as smp
    k_a, k_e = jax.random.split(rng)
    # same 128-bit uniform draws as the u64 sampler; residues < 2^30
    # cast losslessly
    a = smp.sample_uniform_rns(k_a, n, key_mv).astype(jnp.uint32)
    e32 = smp.lift_signed_to_rns32(smp.sample_error_cbd(k_e, n), mv,
                                   mult, mult_shoup)
    e_ntt = pp._fwd(None, e32, t32)
    q = mv.q[:, None]
    a_s = m32.mul_mod32(a, s32_ntt, q, mv.ratio_hi[:, None],
                        mv.ratio_lo[:, None])
    c0 = m32.neg_mod32(m32.add_mod32(a_s, e_ntt, q), q)
    return c0, a


def gen_kswitch_core32(t32, mv, key_mv, s32, new_key32, rng, n: int,
                       dnum: int, pm, pm_shoup, mask,
                       mult=None, mult_shoup=None) -> jnp.ndarray:
    """(dnum, 2, K, N) u32 key-switching key for new_key (NTT form) —
    mirror of keys._gen_kswitch_key (reference: generate_one_kswitch_key,
    src/secretkey.cu:297)."""
    import jax
    subkeys = jax.random.split(rng, dnum)
    c0s, c1s = jax.vmap(
        lambda k: encrypt_zero_sym_core32(t32, mv, key_mv, s32, k,
                                          n, mult, mult_shoup)
    )(subkeys)
    term = m32.mul_mod_shoup32(new_key32, pm[:, None],
                               pm_shoup[:, None], mv.q[:, None])
    c0s = jnp.where(mask, m32.add_mod32(c0s, term[None], mv.q[:, None]),
                    c0s)
    return jnp.stack([c0s, c1s], axis=1)


def encrypt_zero_core32(ks: pp.KeySwitch32, pk32: jnp.ndarray, rng,
                        is_ntt: bool, mult=None, mult_shoup=None
                        ) -> jnp.ndarray:
    """Functional u32 body of asymmetric zero-encryption — tables ride as
    arguments, so callers may jit/chain it directly (benchmarks/op_table).

    Bit-identical to keys.encrypt_zero_asymmetric: the shared (N,)
    ternary/CBD vectors consume the same threefry streams as the u64
    samplers; every lift, NTT, multiply and moddown stays uint32 and
    device-resident (reference: encrypt_asymmetric + the zero-encryption
    chain, src/secretkey.cu:12-130)."""
    import jax

    from .ops import sampling as smp
    n = ks.n
    k_u, k_e0, k_e1 = jax.random.split(rng, 3)
    u_rows = smp.lift_signed_to_rns32(
        smp.sample_ternary_vec(k_u, n), ks.mv_qlp)
    u_ntt = pp._fwd(ks, u_rows, ks.t_qlp)
    qlp_q = ks.mv_qlp.q[:, None]
    out = []
    for i, k_e in enumerate((k_e0, k_e1)):
        e = smp.sample_error_cbd(k_e, n)
        e32 = smp.lift_signed_to_rns32(e, ks.mv_qlp, mult, mult_shoup)
        prod = m32.mul_mod32(u_ntt, pk32[i], qlp_q,
                             ks.mv_qlp.ratio_hi[:, None],
                             ks.mv_qlp.ratio_lo[:, None])
        if is_ntt:
            ci_poly = m32.add_mod32(prod, pp._fwd(ks, e32, ks.t_qlp),
                                    qlp_q)
            out.append(pp.moddown32(ks, ci_poly))
        else:
            ci_poly = m32.add_mod32(pp._inv(ks, prod, ks.t_qlp), e32,
                                    qlp_q)
            out.append(pp.moddown_coeff32(ks, ci_poly))
    return jnp.stack(out)


def _pad_to(data: jnp.ndarray, size: int) -> jnp.ndarray:
    if data.shape[0] == size:
        return data
    pad = jnp.zeros((size - data.shape[0],) + data.shape[1:],
                    dtype=data.dtype)
    return jnp.concatenate([data, pad], axis=0)
