"""32-bit fast-path modular arithmetic vs exact Python integers."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.ops import modmath32 as m32

RNG = np.random.default_rng(7)
Q = numth.get_primes(2048, 30, 3)


@pytest.mark.parametrize("q", Q)
def test_mul_wide32(q):
    a = RNG.integers(0, 2**32, 4096, dtype=np.uint32)
    b = RNG.integers(0, 2**32, 4096, dtype=np.uint32)
    hi, lo = m32.mul_wide32(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))


@pytest.mark.parametrize("q", Q)
def test_barrett_mul_mod32(q):
    rh, rl = m32.ratio32(q)
    a = RNG.integers(0, 2**32, 4096, dtype=np.uint32)
    b = RNG.integers(0, 2**32, 4096, dtype=np.uint32)
    got = np.asarray(m32.mul_mod32(jnp.asarray(a), jnp.asarray(b),
                                   jnp.uint32(q), jnp.uint32(rh), jnp.uint32(rl)))
    expect = ((a.astype(object) * b.astype(object)) % q).astype(np.uint32)
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("q", Q)
def test_shoup32(q):
    w = int(RNG.integers(1, q))
    ws = m32.compute_shoup32(w, q)
    x = RNG.integers(0, 2**32, 4096, dtype=np.uint32)
    lazy = np.asarray(m32.mul_mod_shoup_lazy32(
        jnp.asarray(x), jnp.uint32(w), jnp.uint32(ws), jnp.uint32(q)))
    expect = ((x.astype(object) * w) % q)
    assert (lazy.astype(object) % q == expect).all()
    assert (lazy < 2 * q).all()
    strict = np.asarray(m32.mul_mod_shoup32(
        jnp.asarray(x), jnp.uint32(w), jnp.uint32(ws), jnp.uint32(q)))
    np.testing.assert_array_equal(strict.astype(object), expect)


@pytest.mark.parametrize("q", Q)
def test_div_mod64_32(q):
    rh, rl = m32.ratio32(q)
    a = RNG.integers(0, q, 4096, dtype=np.uint32)
    b = RNG.integers(0, 2**32, 4096, dtype=np.uint32)
    hi, lo = m32.mul_wide32(jnp.asarray(a), jnp.asarray(b))
    quot, rem = m32.barrett_div_mod_u64_32(hi, lo, jnp.uint32(q),
                                           jnp.uint32(rh), jnp.uint32(rl))
    x = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(quot).astype(object),
                                  [v // q for v in x])
    np.testing.assert_array_equal(np.asarray(rem).astype(object),
                                  [v % q for v in x])
