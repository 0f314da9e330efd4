"""Random polynomial sampling on device.

TPU-native re-design of the reference's device samplers (src/prng.cu):
instead of a hand-rolled Salsa20 stream cipher we use JAX's counter-based
threefry PRNG (keyed, splittable, reproducible under jit) — the PRNG swap is
documented; Salsa20 is reimplemented in utils/salsa20.py solely for
seed-compressed serialization compatibility.

Sampler disciplines match the reference:
  - ternary secret / u: one shared ternary vector lifted to every RNS limb
    (sample_ternary_poly, prng.cu:142 — same noise across limbs)
  - uniform: per-limb independent uniform in [0, q_i); we draw 128 bits per
    residue and reduce (statistical distance < 2^-64, vs the reference's
    rejection loop)
  - error: centered binomial with sigma ~= 3.2 (prng.cu:212), shared across
    limbs
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import modmath as mm
from .rns_host import ModulusVec

# Centered binomial: e = sum_{i<21}(b_i) - sum_{i<21}(b'_i), sigma = sqrt(42)/2 ~= 3.24
_CBD_BITS = 21
NOISE_MAX_DEVIATION = 6 * 3.2  # reference clamp convention (hestdparms sigma)


def _u64_bits(key, shape):
    return jax.random.bits(key, shape, dtype=jnp.uint64)


def sample_uniform_rns(key, n: int, mv: ModulusVec) -> jnp.ndarray:
    """(L, N) uniform residues, independent per limb."""
    num_l = mv.q.shape[0]
    k_hi, k_lo = jax.random.split(key)
    hi = _u64_bits(k_hi, (num_l, n))
    lo = _u64_bits(k_lo, (num_l, n))
    # (hi*2^64 + lo) mod q  ==  ((hi mod q) * (2^64 mod q) + lo mod q) mod q
    q = mv.q[:, None]
    rlo = mv.ratio_lo[:, None]
    rhi = mv.ratio_hi[:, None]
    hi_red = mm.barrett_reduce_u64(hi, q, rhi)
    lo_red = mm.barrett_reduce_u64(lo, q, rhi)
    # 2^64 mod q = ((2^64 - 1) mod q + 1) mod q, computed on device
    pow64 = mm.add_mod(mm.barrett_reduce_u64(jnp.uint64(0xFFFFFFFFFFFFFFFF),
                                             q, rhi),
                       jnp.uint64(1) * jnp.ones_like(q), q)
    return mm.add_mod(mm.mul_mod(hi_red, pow64, q, rlo, rhi), lo_red, q)


def sample_ternary_rns(key, n: int, mv: ModulusVec) -> jnp.ndarray:
    """(L, N): one ternary vector in {-1, 0, 1}, lifted to all limbs."""
    t = jax.random.randint(key, (n,), 0, 3, dtype=jnp.int64) - 1  # {-1,0,1}
    q = mv.q[:, None]
    lifted = jnp.where(t[None, :] < 0, q - jnp.uint64(1),
                       t[None, :].astype(jnp.uint64) * jnp.ones_like(q))
    return jnp.where(t[None, :] == 0, jnp.uint64(0), lifted)


def sample_error_cbd(key, n: int) -> jnp.ndarray:
    """(N,) int64 centered-binomial noise, sigma ~= 3.2."""
    bits = jax.random.bits(key, (2, n), dtype=jnp.uint32)
    mask = jnp.uint32((1 << _CBD_BITS) - 1)
    a = jax.lax.population_count(bits[0] & mask).astype(jnp.int64)
    b = jax.lax.population_count(bits[1] & mask).astype(jnp.int64)
    return a - b


def lift_signed_to_rns(e: jnp.ndarray, mv: ModulusVec,
                       multiplier: jnp.ndarray | None = None) -> jnp.ndarray:
    """Lift a signed (N,) int64 vector into (L, N) RNS residues.

    Optionally multiply by a per-limb uint64 `multiplier` (L,) — used by BGV,
    which encrypts with noise t*e (src/secretkey.cu BGV branch).
    """
    q = mv.q[:, None]
    r = mm.reduce_i64_centered(e[None, :], q)
    if multiplier is not None:
        r = mm.mul_mod(r, multiplier[:, None], q, mv.ratio_lo[:, None],
                       mv.ratio_hi[:, None])
    return r


def sample_error_rns(key, n: int, mv: ModulusVec,
                     multiplier: jnp.ndarray | None = None) -> jnp.ndarray:
    """(L, N) CBD noise, same noise vector across limbs."""
    return lift_signed_to_rns(sample_error_cbd(key, n), mv, multiplier)


# ---------------------------------------------------------------------------
# u32 fast-path lifts (primes < 2^30): same random draws as the u64
# samplers above — the (N,) small-int vectors are drawn identically and
# lifted directly to uint32 residues, so a u32 encrypt that uses these is
# bit-identical to the u64 path at ~1/10 the emulated-arithmetic cost.
# ---------------------------------------------------------------------------

def lift_signed_to_rns32(e: jnp.ndarray, mv32,
                         multiplier: jnp.ndarray | None = None,
                         multiplier_shoup: jnp.ndarray | None = None
                         ) -> jnp.ndarray:
    """Signed (N,) small ints (|e| < min q) -> (L, N) uint32 residues.
    Optional per-limb Shoup multiplier (BGV t*e noise)."""
    from . import modmath32 as m32
    q = mv32.q[:, None]
    e32 = e.astype(jnp.int32)[None, :]            # (1, N)
    r = jnp.where(e32 < 0, q - (-e32).astype(jnp.uint32),
                  e32.astype(jnp.uint32))         # (L, N)
    if multiplier is not None:
        r = m32.mul_mod_shoup32(r, multiplier[:, None],
                                multiplier_shoup[:, None], q)
    return r


def sample_ternary_vec(key, n: int) -> jnp.ndarray:
    """(N,) ternary in {-1, 0, 1} — the shared secret/u vector (same draw
    as sample_ternary_rns)."""
    return jax.random.randint(key, (n,), 0, 3, dtype=jnp.int64) - 1
