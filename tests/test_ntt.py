"""NTT engine tests: roundtrip, negacyclic convolution, fused scaling.

Mirrors the reference's test strategy (test/ntt_test.cu:124-151 roundtrips
over dims and batches) plus a cross-check against an exact-integer
negacyclic schoolbook product.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus, compute_shoup
from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
from phantom_tpu.ops import ntt as nttmod
from phantom_tpu.ops import modmath as mm
from phantom_tpu.ops.rns_host import modulus_vec

RNG = np.random.default_rng(42)


def make_tables(n, bits_list):
    qs = []
    for b in sorted(set(bits_list)):
        cnt = bits_list.count(b)
        qs += numth.get_primes(2 * n, b, cnt)
    host = make_rns_ntt_tables(n, [Modulus(q) for q in qs])
    return nttmod.tables_from_host(host), qs


@pytest.mark.parametrize("logn", [3, 8, 11, 13])
def test_roundtrip(logn):
    n = 1 << logn
    tables, qs = make_tables(n, [50, 50])
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint64) for q in qs])
    y = nttmod.ntt_forward(jnp.asarray(x), tables)
    z = nttmod.ntt_inverse(y, tables)
    np.testing.assert_array_equal(np.asarray(z), x)


def test_roundtrip_batched():
    n = 256
    tables, qs = make_tables(n, [58, 58, 58])
    x = RNG.integers(0, qs[0], size=(4, 2, 3, n), dtype=np.uint64)
    for l, q in enumerate(qs):
        x[..., l, :] %= q
    y = nttmod.ntt_forward(jnp.asarray(x), tables)
    z = nttmod.ntt_inverse(y, tables)
    np.testing.assert_array_equal(np.asarray(z), x)


def negacyclic_schoolbook(a, b, q, n):
    out = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            p = int(a[i]) * int(b[j])
            if k < n:
                out[k] = (out[k] + p) % q
            else:
                out[k - n] = (out[k - n] - p) % q
    return np.array(out, dtype=np.uint64)


def test_negacyclic_convolution():
    n = 64
    tables, qs = make_tables(n, [30, 55])
    a = np.stack([RNG.integers(0, q, n, dtype=np.uint64) for q in qs])
    b = np.stack([RNG.integers(0, q, n, dtype=np.uint64) for q in qs])
    fa = nttmod.ntt_forward(jnp.asarray(a), tables)
    fb = nttmod.ntt_forward(jnp.asarray(b), tables)
    mv = modulus_vec(qs)
    prod = mm.mul_mod(fa, fb, mv.q.reshape(-1, 1),
                      mv.ratio_lo.reshape(-1, 1), mv.ratio_hi.reshape(-1, 1))
    res = np.asarray(nttmod.ntt_inverse(prod, tables))
    for l, q in enumerate(qs):
        np.testing.assert_array_equal(res[l], negacyclic_schoolbook(a[l], b[l], q, n))


def test_inverse_fused_scale():
    """ntt_inverse(scale=...) == plain inverse then multiply by s."""
    n = 128
    tables, qs = make_tables(n, [45])
    q = qs[0]
    s = 12345 % q
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint64)])
    fused_scale = (numth.invert_mod(n, q) * s) % q
    y = nttmod.ntt_forward(jnp.asarray(x), tables)
    fused = nttmod.ntt_inverse(
        y, tables,
        scale=jnp.asarray(np.array([fused_scale], dtype=np.uint64)),
        scale_shoup=jnp.asarray(np.array([compute_shoup(fused_scale, q)],
                                         dtype=np.uint64)))
    plain = np.asarray(nttmod.ntt_inverse(y, tables))
    expect = (plain.astype(object) * s) % q
    np.testing.assert_array_equal(np.asarray(fused).astype(object), expect)


def test_forward_lazy_range():
    n = 512
    tables, qs = make_tables(n, [59])
    q = qs[0]
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint64)])
    lazy = np.asarray(nttmod.ntt_forward(jnp.asarray(x), tables, lazy_output=True))
    strict = np.asarray(nttmod.ntt_forward(jnp.asarray(x), tables))
    assert (lazy < 4 * q).all()
    np.testing.assert_array_equal(lazy % q, strict)
    assert (strict < q).all()
