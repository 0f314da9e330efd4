"""BEHZ machinery unit tests against exact big-int oracles
(reference kernels: sm_mrq, fast_floor, fastbconv_sk — src/rns_bconv.cu,
src/rns.cu BEHZ paths)."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.ops import behz as bz

N = 64
T = 65537


@pytest.fixture(scope="module")
def consts():
    qs = numth.get_primes(2 * N, 30, 3)
    bsk = numth.get_primes(2 * N, 32, 4)  # 3 B primes + m_sk
    return bz.make_behz_consts(qs, bsk, T), qs, bsk


def test_sm_mrq_bounded_error(consts):
    """sm_mrq output == x + u*Q with |u| <= (k+1)/2."""
    c, qs, bsk = consts
    Q = qs[0] * qs[1] * qs[2]
    rng = np.random.default_rng(0)
    xs = [int(v) for v in rng.integers(0, Q % (2**63), N)]
    x_q = np.stack([np.array([x % q for x in xs], dtype=np.uint64)
                    for q in qs])
    out = np.asarray(bz.sm_mrq(jnp.asarray(x_q), c))
    for j, m in enumerate(bsk):
        for i, x in enumerate(xs):
            # out == x + u*Q (mod m) for some small u
            diff = (int(out[j, i]) - x) % m
            ok = False
            for u in range(-3, 4):
                if (u * Q) % m == diff:
                    ok = True
                    break
            assert ok, (j, i)


def test_fastbconv_sk_exact(consts):
    """Shenoy-Kumaresan recovers values < B*m_sk/2 exactly mod q."""
    c, qs, bsk = consts
    b_mods = bsk[:-1]
    m_sk = bsk[-1]
    B = 1
    for b in b_mods:
        B *= b
    rng = np.random.default_rng(1)
    vals = [int(v) for v in rng.integers(0, min(B // 4, 2**62), N)]
    x_bsk = np.stack([np.array([v % m for v in vals], dtype=np.uint64)
                      for m in bsk])
    out = np.asarray(bz.fastbconv_sk(jnp.asarray(x_bsk), c))
    for j, q in enumerate(qs):
        np.testing.assert_array_equal(
            out[j].astype(object), np.array([v % q for v in vals],
                                            dtype=object))


def test_fast_floor_close(consts):
    """fast_floor == floor(y/Q) up to the documented +-(k+1) slack."""
    c, qs, bsk = consts
    Q = qs[0] * qs[1] * qs[2]
    rng = np.random.default_rng(2)
    ys = [int(a) * int(b) for a, b in zip(
        rng.integers(0, 2**60, N), rng.integers(0, 2**28, N))]
    y_q = np.stack([np.array([y % q for y in ys], dtype=np.uint64)
                    for q in qs])
    y_bsk = np.stack([np.array([y % m for y in ys], dtype=np.uint64)
                      for m in bsk])
    out = np.asarray(bz.fast_floor(jnp.asarray(y_q), jnp.asarray(y_bsk), c))
    for j, m in enumerate(bsk):
        for i, y in enumerate(ys):
            fl = y // Q
            diff = (int(out[j, i]) - fl) % m
            ok = any((u % m) == diff for u in range(-4, 5))
            assert ok, (j, i)
