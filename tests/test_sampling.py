"""Sampler disciplines (reference: src/prng.cu): ternary values/limb
consistency, CBD sigma, uniform range."""

import jax
import numpy as np

from phantom_tpu.host import numth
from phantom_tpu.ops import sampling as smp
from phantom_tpu.ops.rns_host import modulus_vec


def _mv(n_primes=3, bits=40, n=512):
    return modulus_vec(numth.get_primes(2 * n, bits, n_primes))


def test_ternary_consistent_across_limbs():
    mv = _mv()
    s = np.asarray(smp.sample_ternary_rns(jax.random.PRNGKey(0), 512, mv))
    qs = np.asarray(mv.q)
    # values are {0, 1, q-1} and encode the same ternary digit in every limb
    digits = np.zeros((3, 512), dtype=np.int64)
    for l, q in enumerate(qs):
        row = s[l]
        assert set(np.unique(row)) <= {0, 1, q - 1}
        digits[l] = np.where(row == q - 1, -1, row.astype(np.int64))
    assert (digits[0] == digits[1]).all() and (digits[1] == digits[2]).all()
    # roughly uniform over {-1,0,1}
    frac = np.mean(digits[0] == 0)
    assert 0.2 < frac < 0.47


def test_cbd_sigma():
    e = np.asarray(smp.sample_error_cbd(jax.random.PRNGKey(1), 1 << 16))
    assert abs(float(np.mean(e))) < 0.1
    assert 2.9 < float(np.std(e)) < 3.6  # sigma ~= 3.2 (hestdparms)
    assert np.abs(e).max() <= 21


def test_uniform_range_and_spread():
    mv = _mv(2, 45)
    u = np.asarray(smp.sample_uniform_rns(jax.random.PRNGKey(2), 4096, mv))
    qs = np.asarray(mv.q)
    for l, q in enumerate(qs):
        assert (u[l] < q).all()
        assert float(np.mean(u[l].astype(np.float64))) > 0.4 * float(q)
