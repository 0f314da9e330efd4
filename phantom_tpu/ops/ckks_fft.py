"""Device-side CKKS special FFT in double-float (two-f32) arithmetic.

TPU-native counterpart of the reference's double-precision device FFT
(src/fft.cu, special_fft_forward/backward) — SURVEY hard part #3: the TPU
has no f64, so each real is a *double-float* (hi, lo) f32 pair giving ~48
mantissa bits (vs 53 for the reference's doubles; encode noise differs by
a factor < 32 at equal scale, far below the fresh-encryption noise floor).

The transform IS the negacyclic evaluation map used by the NTT engine:
  out[k] = p(psi^(2*rev(k)+1)),  psi = exp(i*pi/n)
realized with the same Cooley-Tukey / Gentleman-Sande stage structure and
bit-reversed twiddle tables (ops/ntt.py), but complex double-float
butterflies instead of modular ones.  Slot scatter/gather indices compose
the generator-5 order with the rev-ordering of the evaluation domain.

Error-free double-float primitives (Dekker/Knuth, FMA-free: Veltkamp
splitting keeps 12x12-bit partial products exact in f32).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)  # 2^12 + 1 (Veltkamp split for f32)


# -- double-float primitives ------------------------------------------------

def two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_add(x, y):
    """(xh, xl) + (yh, yl) -> double-float."""
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return quick_two_sum(s, e)


def df_neg(x):
    return (-x[0], -x[1])


def df_sub(x, y):
    return df_add(x, df_neg(y))


def df_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    return quick_two_sum(p, e)


def df_from_f64(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# complex double-float: tuple (re, im), each a (hi, lo) pair
def cdf_add(a, b):
    return (df_add(a[0], b[0]), df_add(a[1], b[1]))


def cdf_sub(a, b):
    return (df_sub(a[0], b[0]), df_sub(a[1], b[1]))


def cdf_mul(a, b):
    re = df_sub(df_mul(a[0], b[0]), df_mul(a[1], b[1]))
    im = df_add(df_mul(a[0], b[1]), df_mul(a[1], b[0]))
    return (re, im)


# -- tables -----------------------------------------------------------------

import flax.struct


@flax.struct.dataclass
class CKKSFFTTables:
    """Bit-reversed psi-power tables as complex double-float planes, plus
    slot scatter/gather indices (generator-5 order composed with the
    rev-indexed evaluation domain).  flax struct (not NamedTuple) so the
    int geometry survives jit as a static (CLAUDE.md invariant)."""

    n: int = flax.struct.field(pytree_node=False, default=0)
    # (N,) f32 planes: forward table psi^bitrev, inverse psi^-bitrev
    fwd_re_hi: jnp.ndarray = None
    fwd_re_lo: jnp.ndarray = None
    fwd_im_hi: jnp.ndarray = None
    fwd_im_lo: jnp.ndarray = None
    inv_re_hi: jnp.ndarray = None
    inv_re_lo: jnp.ndarray = None
    inv_im_hi: jnp.ndarray = None
    inv_im_lo: jnp.ndarray = None
    slot_pos: jnp.ndarray = None  # (N/2,) position of slot j in eval vec
    slot_conj: jnp.ndarray = None  # (N/2,) position of conj(slot j)


def make_fft_tables(n: int) -> CKKSFFTTables:
    from ..schemes.galois import reverse_bits
    logn = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.array([reverse_bits(int(i), logn) for i in idx])
    ang = np.pi * rev / n             # psi^rev(i), psi = e^{i pi/n}
    fwd = np.exp(1j * ang)
    inv = np.exp(-1j * ang)
    m = 2 * n
    pos = 1
    slot_pos = np.zeros(n // 2, dtype=np.int64)
    slot_conj = np.zeros(n // 2, dtype=np.int64)
    inv_rev = np.zeros(n, dtype=np.int64)
    inv_rev[rev] = idx
    for j in range(n // 2):
        slot_pos[j] = inv_rev[(pos - 1) >> 1]
        slot_conj[j] = inv_rev[(m - pos - 1) >> 1]
        pos = (pos * 5) % m

    def planes(c):
        re_hi, re_lo = df_from_f64(c.real)
        im_hi, im_lo = df_from_f64(c.imag)
        return tuple(jnp.asarray(p) for p in (re_hi, re_lo, im_hi, im_lo))

    f = planes(fwd)
    iv = planes(inv)
    return CKKSFFTTables(
        n=n, fwd_re_hi=f[0], fwd_re_lo=f[1], fwd_im_hi=f[2], fwd_im_lo=f[3],
        inv_re_hi=iv[0], inv_re_lo=iv[1], inv_im_hi=iv[2], inv_im_lo=iv[3],
        slot_pos=jnp.asarray(slot_pos), slot_conj=jnp.asarray(slot_conj))


def _table_w(t: CKKSFFTTables, forward: bool, m: int):
    src = (t.fwd_re_hi, t.fwd_re_lo, t.fwd_im_hi, t.fwd_im_lo) if forward \
        else (t.inv_re_hi, t.inv_re_lo, t.inv_im_hi, t.inv_im_lo)
    sl = [p[m:2 * m].reshape(m, 1) for p in src]
    return ((sl[0], sl[1]), (sl[2], sl[3]))


# -- transforms -------------------------------------------------------------

def fft_forward(x, t: CKKSFFTTables):
    """Coefficients -> evaluations at psi^(2rev(k)+1).

    x: complex double-float ((re_hi, re_lo), (im_hi, im_lo)), each (N,)."""
    n = t.n
    m = 1
    half = n >> 1
    while m < n:
        xr = [[p.reshape(m, 2, half) for p in comp] for comp in x]
        u = ((xr[0][0][:, 0], xr[0][1][:, 0]), (xr[1][0][:, 0], xr[1][1][:, 0]))
        v = ((xr[0][0][:, 1], xr[0][1][:, 1]), (xr[1][0][:, 1], xr[1][1][:, 1]))
        w = _table_w(t, True, m)
        wv = cdf_mul(v, w)
        hi_ = cdf_add(u, wv)
        lo_ = cdf_sub(u, wv)
        x = tuple(
            tuple(jnp.stack([hi_[c][p_], lo_[c][p_]], axis=1).reshape(n)
                  for p_ in range(2))
            for c in range(2))
        m <<= 1
        half >>= 1
    return x


def fft_inverse(x, t: CKKSFFTTables):
    """Evaluations -> coefficients (includes the 1/n scale)."""
    n = t.n
    m = n >> 1
    half = 1
    while m >= 1:
        xr = [[p.reshape(m, 2, half) for p in comp] for comp in x]
        u = ((xr[0][0][:, 0], xr[0][1][:, 0]), (xr[1][0][:, 0], xr[1][1][:, 0]))
        v = ((xr[0][0][:, 1], xr[0][1][:, 1]), (xr[1][0][:, 1], xr[1][1][:, 1]))
        w = _table_w(t, False, m)
        s = cdf_add(u, v)
        d = cdf_mul(cdf_sub(u, v), w)
        x = tuple(
            tuple(jnp.stack([s[c][p_], d[c][p_]], axis=1).reshape(n)
                  for p_ in range(2))
            for c in range(2))
        m >>= 1
        half <<= 1
    inv_n = np.float32(1.0 / n)
    return tuple(tuple(p * inv_n for p in comp) for comp in x)
