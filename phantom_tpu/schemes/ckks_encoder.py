"""CKKS encoder: complex slot vectors <-> RNS plaintext polynomials.

Equivalent of the reference's PhantomCKKSEncoder (src/ckks.cu:17-190) and
its special FFT (src/fft.cu).  The canonical embedding evaluates the
plaintext polynomial at the odd primitive 2N-th roots zeta^{5^j}; here that
is expressed as a *twisted* length-N DFT — p(zeta^{2k+1}) = DFT_k(p_j *
zeta^j) — so encode/decode ride a standard FFT plus an O(N) twist, with the
generator-5 slot permutation applied on the evaluation vector.

Precision strategy (SURVEY hard part #3): the TPU has no fast f64, so the
float stage (FFT) runs on host numpy in f64 — identical precision to the
reference's double-precision device FFT — while the exact stages (scaled
rounding to big ints, CRT decompose/compose) use exact Python integers.
Encode/decode are data-ingress operations outside the homomorphic hot loop;
the device-side NTT to/from evaluation form stays jitted.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import ntt as nttmod
from .ciphertext import Plaintext
from .context import Context
from .params import Scheme


class CKKSEncoder:
    def __init__(self, ctx: Context):
        if ctx.params.scheme != Scheme.CKKS:
            raise ValueError("CKKSEncoder requires a CKKS context")
        self.ctx = ctx
        n = ctx.params.n
        self.slots = n // 2
        m = 2 * n
        # slot j <-> evaluation at zeta^{5^j}; exponent e=2k+1 -> index k
        pos = 1
        idx1 = np.zeros(self.slots, dtype=np.int64)
        idx2 = np.zeros(self.slots, dtype=np.int64)
        for j in range(self.slots):
            idx1[j] = (pos - 1) >> 1
            idx2[j] = (m - pos - 1) >> 1
            pos = (pos * 5) % m
        self._idx1, self._idx2 = idx1, idx2
        # twist: zeta^j for j in [0, N)
        self._twist = np.exp(1j * np.pi * np.arange(n) / n)

    # -- float stage ------------------------------------------------------
    def _embed_inverse(self, z: np.ndarray) -> np.ndarray:
        """slots (N/2 complex) -> real coefficient vector (N,) (unscaled)."""
        n = self.ctx.params.n
        ev = np.zeros(n, dtype=np.complex128)
        ev[self._idx1] = z
        ev[self._idx2] = np.conj(z)
        # eval_k = p(zeta^{2k+1}) = n * ifft(p_j * zeta^j)[k]
        p_twisted = np.fft.fft(ev) / n
        return np.real(p_twisted * np.conj(self._twist))

    def _embed_forward(self, coeffs: np.ndarray) -> np.ndarray:
        """real coefficients (N,) -> slots (N/2 complex)."""
        n = self.ctx.params.n
        ev = n * np.fft.ifft(coeffs * self._twist)
        return ev[self._idx1]

    # -- public API -------------------------------------------------------
    def encode(self, values: Sequence, scale: float,
               chain_index: Optional[int] = None) -> Plaintext:
        """Encode complex/real slot values at `scale` into NTT form.

        Reference: encode_internal (src/ckks.cu:68-135), including the
        max-coefficient budget check against Ql."""
        ctx = self.ctx
        ci = ctx.first_data_index if chain_index is None else chain_index
        cd = ctx.get_context_data(ci)
        z = np.zeros(self.slots, dtype=np.complex128)
        v = np.asarray(values, dtype=np.complex128).ravel()
        if v.shape[0] > self.slots:
            raise ValueError("too many values for slot count")
        z[: v.shape[0]] = v
        coeffs = self._embed_inverse(z) * scale
        max_coeff = float(np.max(np.abs(coeffs))) if coeffs.size else 0.0
        total_q = 1
        for q in cd.moduli:
            total_q *= q
        # integer comparison: total_q is a multi-hundred-bit int, and
        # int/float division overflows past ~2^1024 (hit at the
        # capability-matched 43-limb chain, logQ=1204)
        if int(2 * max_coeff) >= total_q:
            raise ValueError("encoded values are too large for parms at this "
                             "level (scale out of bounds)")
        if max_coeff < 2 ** 62:
            # fast path: coefficients fit int64, vectorized numpy decompose
            ints64 = np.round(coeffs).astype(np.int64)
            rns = np.stack([
                (ints64 % np.int64(q)).astype(np.uint64)
                for q in cd.moduli])
        else:
            ints = [int(round(c)) for c in coeffs]
            rns = np.stack([
                np.array([x % q for x in ints], dtype=np.uint64)
                for q in cd.moduli])
        data = nttmod.ntt_forward(jnp.asarray(rns),
                                  ctx.tables_q(cd.size_ql))
        return Plaintext(data=data, chain_index=ci, is_ntt_form=True,
                         scale=scale)

    def decode(self, plain: Plaintext) -> np.ndarray:
        """NTT-form plaintext -> complex slot values.

        Reference: decode_internal (src/ckks.cu:137-190)."""
        ctx = self.ctx
        cd = ctx.get_context_data(plain.chain_index)
        coeffs_rns = np.asarray(
            nttmod.ntt_inverse(plain.data, ctx.tables_q(cd.size_ql)))
        # exact CRT compose, centered
        moduli = list(cd.moduli)
        total = 1
        for q in moduli:
            total *= q
        punct = [total // q for q in moduli]
        from ..host.numth import invert_mod
        inv = [invert_mod(p % q, q) for p, q in zip(punct, moduli)]
        n = ctx.params.n
        half = total // 2
        # vectorized exact CRT compose on object arrays (one numpy pass per
        # limb instead of a Python double loop)
        acc = np.zeros(n, dtype=object)
        for l, q in enumerate(moduli):
            y = (coeffs_rns[l].astype(object) * inv[l]) % q
            acc += y * punct[l]
        acc %= total
        centered = np.where(acc > half, acc - total, acc)
        vals = (centered / plain.scale).astype(np.float64)
        return self._embed_forward(vals)


def _encode_dev32(fftt, t32, mv32, re, im):
    """Jitted device body of the u32 encode: double-float inverse FFT,
    exact rounding to int64, centered reduction into u32 RNS residues and
    the forward NTT on the fast engine — ONE dispatch end to end (the
    reference chains the same stages on-stream, src/ckks.cu:68-135)."""
    from ..ops import ckks_fft as cf
    from ..ops import modmath32 as m32
    from ..ops import pipeline32 as pp32
    coeffs = cf.fft_inverse((re, im), fftt)
    re_hi, re_lo = coeffs[0]
    a = jnp.round(re_hi).astype(jnp.int64)
    b = jnp.round(re_lo + (re_hi - a.astype(jnp.float32))).astype(jnp.int64)
    ints = a + b
    # signed int64 -> u32 residues: two's-complement words Barrett-reduced,
    # minus 2^64 mod q for negatives (exact)
    u = ints.astype(jnp.uint64)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)[None]
    lo = u.astype(jnp.uint32)[None]
    q = mv32.q[:, None]
    r = m32.barrett_reduce_u64_32(hi, lo, q, mv32.ratio_hi[:, None],
                                  mv32.ratio_lo[:, None])
    r = jnp.where((ints < 0)[None],
                  m32.sub_mod32(r, mv32.pow64[:, None], q), r)
    return pp32._fwd(None, r, t32).astype(jnp.uint64)


def _decode_dev32(fftt, t32, mv32, garner, data32, inv_scale):
    """Jitted device body of the u32 decode: u32 inverse NTT, centered
    2-limb Garner compose, double-float forward FFT."""
    from ..ops import ckks_fft as cf
    from ..ops import modmath32 as m32
    from ..ops import pipeline32 as pp32
    x = pp32._inv(None, data32, t32)
    q0, q0_inv_q1 = garner
    if x.shape[0] >= 2:
        q1 = mv32.q[1]
        rh1 = mv32.ratio_hi[1]
        rl1 = mv32.ratio_lo[1]
        x0 = x[0]
        diff = m32.sub_mod32(x[1], m32.barrett_reduce_u32(x0, q1, rh1), q1)
        t_ = m32.mul_mod32(diff, q0_inv_q1, q1, rh1, rl1)
        # center the Garner digit: |m| << 2^60 for any decodable value
        t_c = jnp.where(t_ > q1 // jnp.uint32(2),
                        t_.astype(jnp.int64) - q1.astype(jnp.int64),
                        t_.astype(jnp.int64))
        m = x0.astype(jnp.int64) + q0.astype(jnp.int64) * t_c
    else:
        q0v = mv32.q[0]
        m = jnp.where(x[0] > q0v // jnp.uint32(2),
                      x[0].astype(jnp.int64) - q0v.astype(jnp.int64),
                      x[0].astype(jnp.int64))
    hi = m.astype(jnp.float32)
    lo = (m - hi.astype(jnp.int64)).astype(jnp.float32)
    hi = hi * inv_scale
    lo = lo * inv_scale
    zero = jnp.zeros_like(hi)
    ev = cf.fft_forward(((hi, lo), (zero, zero)), fftt)
    # ONE stacked output = one device->host pull for the caller (each
    # separate pull pays a full tunnel RTT on the axon runtime)
    return jnp.stack([ev[0][0], ev[0][1], ev[1][0], ev[1][1]])


import jax as _jax

_encode_dev32_jit = _jax.jit(_encode_dev32)
_decode_dev32_jit = _jax.jit(_decode_dev32)


class CKKSDeviceEncoder:
    """Device-side encode/decode using the double-float special FFT
    (ops/ckks_fft.py) — the TPU-native analogue of the reference's
    double-precision device encoder (src/ckks.cu encode/decode_internal).

    Precision: ~2^-48 relative (two-f32 double-float) vs the reference's
    2^-52 doubles; both are far below fresh-encryption noise at standard
    scales.  Decode composes the centered value from the first two RNS
    limbs exactly (Garner), valid while |value| < q0*q1/2 — amply true for
    any decodable plaintext.

    When every prime is < 2^30 (the fast-path chains), the whole device
    body — FFT, rounding, RNS reduction, NTT — runs as ONE jitted u32
    dispatch on the selected engine (default mxu-pallas); the generic
    u64 stack is only used for wide-prime contexts."""

    def __init__(self, ctx: Context, engine: str = "mxu-pallas"):
        from ..ops import ckks_fft as cf
        if ctx.params.scheme != Scheme.CKKS:
            raise ValueError("CKKSDeviceEncoder requires a CKKS context")
        self.ctx = ctx
        self.tables = cf.make_fft_tables(ctx.params.n)
        self.slots = ctx.params.n // 2
        self.engine = engine
        self._u32 = all(int(q) < (1 << 30) for q in ctx.params.coeff_modulus)
        self._t32 = {}
        self._mv32 = {}
        self._garner = {}

    def _fast_consts(self, ci: int):
        from ..host.numth import invert_mod
        from ..ops import bconv32 as bc32
        from ..ops import pipeline32 as pp32
        cd = self.ctx.get_context_data(ci)
        k = cd.size_ql
        if k not in self._t32:
            self._t32[k] = pp32._conv_tables(self.ctx.tables_q(k),
                                             self.engine)
            self._mv32[k] = bc32.modulus_vec32([int(q) for q in cd.moduli])
            q0 = int(cd.moduli[0])
            inv = invert_mod(q0 % int(cd.moduli[1]),
                             int(cd.moduli[1])) if k >= 2 else 0
            self._garner[k] = (jnp.uint32(q0), jnp.uint32(inv))
        return self._t32[k], self._mv32[k], self._garner[k]

    def _scatter(self, values, scale: float):
        n = self.ctx.params.n
        z = np.zeros(self.slots, dtype=np.complex128)
        v = np.asarray(values, dtype=np.complex128).ravel()
        z[: v.shape[0]] = v
        z = z * scale  # scale on host (f64), FFT on device
        ev_re = np.zeros(n, dtype=np.float64)
        ev_im = np.zeros(n, dtype=np.float64)
        sp = np.asarray(self.tables.slot_pos)
        sc = np.asarray(self.tables.slot_conj)
        ev_re[sp] = z.real
        ev_im[sp] = z.imag
        ev_re[sc] = z.real
        ev_im[sc] = -z.imag
        from ..ops import ckks_fft as cf
        re = tuple(jnp.asarray(p) for p in cf.df_from_f64(ev_re))
        im = tuple(jnp.asarray(p) for p in cf.df_from_f64(ev_im))
        return re, im

    def encode(self, values, scale: float,
               chain_index: Optional[int] = None) -> Plaintext:
        import jax
        from ..ops import ckks_fft as cf
        from ..ops import modmath as mm
        ctx = self.ctx
        ci = ctx.first_data_index if chain_index is None else chain_index
        cd = ctx.get_context_data(ci)
        re, im = self._scatter(values, scale)
        if self._u32:
            t32, mv32, _ = self._fast_consts(ci)
            data = _encode_dev32_jit(self.tables, t32, mv32, re, im)
            return Plaintext(data=data, chain_index=ci, is_ntt_form=True,
                             scale=scale)
        coeffs = cf.fft_inverse((re, im), self.tables)
        re_hi, re_lo = coeffs[0]
        # round the double-float real part to int64 exactly enough
        a = jnp.round(re_hi).astype(jnp.int64)
        b = jnp.round(re_lo + (re_hi - a.astype(jnp.float32))).astype(jnp.int64)
        ints = a + b
        rns = mm.reduce_i64_centered(ints[None, :], cd.mv.q[:, None])
        data = nttmod.ntt_forward(rns, ctx.tables_q(cd.size_ql))
        return Plaintext(data=data, chain_index=ci, is_ntt_form=True,
                         scale=scale)

    def decode(self, plain: Plaintext) -> np.ndarray:
        import jax
        from ..host.numth import invert_mod
        from ..ops import ckks_fft as cf
        from ..ops import modmath as mm
        ctx = self.ctx
        cd = ctx.get_context_data(plain.chain_index)
        if self._u32:
            t32, mv32, garner = self._fast_consts(plain.chain_index)
            evs = np.asarray(_decode_dev32_jit(
                self.tables, t32, mv32, garner,
                jnp.asarray(plain.data).astype(jnp.uint32),
                jnp.float32(1.0 / plain.scale)))
            sp = np.asarray(self.tables.slot_pos)
            re = evs[0][sp].astype(np.float64) + evs[1][sp].astype(
                np.float64)
            im = evs[2][sp].astype(np.float64) + evs[3][sp].astype(
                np.float64)
            return re + 1j * im
        else:
            x = nttmod.ntt_inverse(plain.data, ctx.tables_q(cd.size_ql))
            q0 = int(cd.moduli[0])
            if cd.size_ql >= 2:
                # Garner 2-limb compose, centered (|value| << q0*q1/2)
                q1 = int(cd.moduli[1])
                q0_inv_q1 = invert_mod(q0 % q1, q1)
                x0 = x[0]
                x1 = x[1]
                mv1_q = cd.mv.q[1]
                diff = mm.sub_mod(mm.barrett_reduce_u64(
                    x1, mv1_q, cd.mv.ratio_hi[1]),
                    mm.barrett_reduce_u64(x0, mv1_q, cd.mv.ratio_hi[1]),
                    mv1_q)
                t_ = mm.mul_mod(diff, jnp.uint64(q0_inv_q1), mv1_q,
                                cd.mv.ratio_lo[1], cd.mv.ratio_hi[1])
                # center the Garner digit first: for any decodable
                # magnitude |m| << 2^62, so m = x0 + q0 * t_centered fits
                # int64 even though q0*q1 itself does not
                t_c = jnp.where(t_ > jnp.uint64(q1 // 2),
                                t_.astype(jnp.int64) - jnp.int64(q1),
                                t_.astype(jnp.int64))
                m = x0.astype(jnp.int64) + jnp.int64(q0) * t_c
            else:
                half = q0 // 2
                m = jnp.where(x[0] > jnp.uint64(half),
                              x[0].astype(jnp.int64) - jnp.int64(q0),
                              x[0].astype(jnp.int64))
            inv_scale = 1.0 / plain.scale
            hi = (m.astype(jnp.float32))
            lo = (m - hi.astype(jnp.int64)).astype(jnp.float32)
            hi = hi * jnp.float32(inv_scale)
            lo = lo * jnp.float32(inv_scale)
            zero = jnp.zeros_like(hi)
            ev = cf.fft_forward(((hi, lo), (zero, zero)), self.tables)
        sp = self.tables.slot_pos
        re = np.asarray(ev[0][0])[sp].astype(np.float64) + \
            np.asarray(ev[0][1])[sp].astype(np.float64)
        im = np.asarray(ev[1][0])[sp].astype(np.float64) + \
            np.asarray(ev[1][1])[sp].astype(np.float64)
        return re + 1j * im


def encode_extended(enc: CKKSEncoder, values, scale: float,
                    chain_index: int = 1):
    """Encode slot values over the *extended* base QlP in NTT form.

    Used by weighted hoisting (evaluate.hoisted_linear_combo): the
    plaintext weights multiply keyswitch products that still live over
    QlP, so their residues must cover the special primes too."""
    from .keyswitch import qlp_rows, tables_qlp
    ctx = enc.ctx
    cd = ctx.get_context_data(chain_index)
    z = np.zeros(enc.slots, dtype=np.complex128)
    v = np.asarray(values, dtype=np.complex128).ravel()
    z[: v.shape[0]] = v
    coeffs = enc._embed_inverse(z) * scale
    rows = qlp_rows(ctx, cd.size_ql)
    moduli = [int(ctx.params.coeff_modulus[r]) for r in rows]
    # same budget guard + big-coefficient fallback as CKKSEncoder.encode:
    # weights at a large scale must not silently wrap int64
    max_coeff = float(np.max(np.abs(coeffs))) if coeffs.size else 0.0
    total_qlp = 1
    for q in moduli:
        total_qlp *= q
    if max_coeff >= total_qlp / 2:
        raise ValueError("encoded values are too large for parms at this "
                         "level (scale out of bounds)")
    if max_coeff < 2 ** 62:
        ints64 = np.round(coeffs).astype(np.int64)
        rns = np.stack([(ints64 % np.int64(q)).astype(np.uint64)
                        for q in moduli])
    else:
        ints = [int(round(c)) for c in coeffs]
        rns = np.stack([np.array([x % q for x in ints], dtype=np.uint64)
                        for q in moduli])
    data = nttmod.ntt_forward(jnp.asarray(rns), tables_qlp(ctx, cd.size_ql))
    return data  # (size_qlp, N) NTT form
