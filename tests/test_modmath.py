"""Device modular arithmetic vs exact Python integers (fuzz tests)."""

import numpy as np
import jax.numpy as jnp

from phantom_tpu.host import numth
from phantom_tpu.ops import modmath as mm
from phantom_tpu.ops.rns_host import modulus_vec

RNG = np.random.default_rng(0)


def rand_u64(shape, bound=1 << 64):
    return RNG.integers(0, bound, size=shape, dtype=np.uint64)


def obj(a):
    """numpy uint64 array -> exact python-int object array."""
    return np.asarray(a).astype(object)


def test_mul_wide_exact():
    a = rand_u64((256,))
    b = rand_u64((256,))
    hi, lo = mm.mul_wide(jnp.asarray(a), jnp.asarray(b))
    p = obj(a) * obj(b)
    np.testing.assert_array_equal(obj(lo), p & ((1 << 64) - 1))
    np.testing.assert_array_equal(obj(hi), p >> 64)


def test_barrett_reduce_u64():
    q = numth.get_primes(8192, 59, 1)[0]
    mv = modulus_vec([q])
    x = rand_u64((512,))
    r = mm.barrett_reduce_u64(jnp.asarray(x), mm.u64(q), mv.ratio_hi[0])
    np.testing.assert_array_equal(obj(r), obj(x) % q)


def test_barrett_reduce_u128():
    q = numth.get_primes(8192, 61, 1)[0]
    mv = modulus_vec([q])
    # x < q * 2^64
    xs = [int(RNG.integers(0, 1 << 62)) * int(RNG.integers(0, 1 << 61))
          for _ in range(256)]
    xs += [q * (1 << 64) - 1, 0, q - 1, (q - 1) * ((1 << 64) - 1)]
    hi = jnp.asarray(np.array([x >> 64 for x in xs], dtype=np.uint64))
    lo = jnp.asarray(np.array([x & ((1 << 64) - 1) for x in xs], dtype=np.uint64))
    r = mm.barrett_reduce_u128(hi, lo, mm.u64(q), mv.ratio_lo[0], mv.ratio_hi[0])
    np.testing.assert_array_equal(obj(r), np.array([x % q for x in xs], dtype=object))


def test_mul_mod_multi_limb_broadcast():
    qs = numth.get_primes(8192, 50, 3)
    mv = modulus_vec(qs)
    a = np.stack([rand_u64((128,), q) for q in qs])  # (3, 128)
    b = np.stack([rand_u64((128,), q) for q in qs])
    r = mm.mul_mod(jnp.asarray(a), jnp.asarray(b),
                   mv.q.reshape(3, 1), mv.ratio_lo.reshape(3, 1),
                   mv.ratio_hi.reshape(3, 1))
    qcol = np.array(qs, dtype=object).reshape(3, 1)
    np.testing.assert_array_equal(obj(r), (obj(a) * obj(b)) % qcol)


def test_shoup_mul():
    from phantom_tpu.host.modulus import compute_shoup
    q = numth.get_primes(8192, 60, 1)[0]
    w = int(rand_u64((), q))
    ws = compute_shoup(w, q)
    x = rand_u64((512,))  # arbitrary 64-bit input
    lazy = obj(mm.mul_mod_shoup_lazy(jnp.asarray(x), mm.u64(w), mm.u64(ws), mm.u64(q)))
    strict = obj(mm.mul_mod_shoup(jnp.asarray(x), mm.u64(w), mm.u64(ws), mm.u64(q)))
    expect = (obj(x) * w) % q
    np.testing.assert_array_equal(strict, expect)
    np.testing.assert_array_equal(lazy % q, expect)
    assert (lazy < 2 * q).all()


def test_add_sub_neg_mod():
    q = numth.get_primes(8192, 45, 1)[0]
    a = rand_u64((256,), q)
    b = rand_u64((256,), q)
    qj = mm.u64(q)
    np.testing.assert_array_equal(
        obj(mm.add_mod(jnp.asarray(a), jnp.asarray(b), qj)), (obj(a) + obj(b)) % q)
    np.testing.assert_array_equal(
        obj(mm.sub_mod(jnp.asarray(a), jnp.asarray(b), qj)), (obj(a) - obj(b)) % q)
    np.testing.assert_array_equal(
        obj(mm.neg_mod(jnp.asarray(a), qj)), (-obj(a)) % q)


def test_reduce_centered():
    q = numth.get_primes(8192, 40, 1)[0]
    x = RNG.integers(-(1 << 40), 1 << 40, size=(256,), dtype=np.int64)
    r = mm.reduce_i64_centered(jnp.asarray(x), mm.u64(q))
    np.testing.assert_array_equal(obj(r), np.asarray(x).astype(object) % q)
