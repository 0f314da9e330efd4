"""Pallas two-phase NTT kernel (interpret mode): bit-match vs the reference
u32 stage-by-stage engine, roundtrips, batching.

Equivalent coverage to the reference's ntt_test (test/ntt_test.cu:124-151)
for the fused-kernel engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus
from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
from phantom_tpu.ops import ntt as ntt64
from phantom_tpu.ops import ntt32
from phantom_tpu.ops import ntt_pallas as ntp

RNG = np.random.default_rng(3)


def setup(n, count=2, bits=28):
    qs = numth.get_primes(2 * n, bits, count)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    t32 = ntt32.tables32_from_tables64(t64)
    return ntp.prepare_tables(t32), t32, qs


@pytest.mark.parametrize("logn", [6, 10, 12])
def test_fwd_inv_match(logn):
    n = 1 << logn
    tp, t32, qs = setup(n)
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    ref = np.asarray(ntt32.ntt_forward32(jnp.asarray(x), t32))
    got = np.asarray(ntp.ntt_forward_pallas(jnp.asarray(x), tp,
                                            interpret=True))
    np.testing.assert_array_equal(ref, got)
    back = np.asarray(ntp.ntt_inverse_pallas(jnp.asarray(got), tp,
                                             interpret=True))
    np.testing.assert_array_equal(back, x)


def test_batched():
    n = 256
    tp, t32, qs = setup(n, count=3)
    x = RNG.integers(0, qs[-1], size=(4, 3, n)).astype(np.uint32)
    for l, q in enumerate(qs):
        x[:, l, :] %= np.uint32(q)
    ref = np.asarray(ntt32.ntt_forward32(jnp.asarray(x), t32))
    got = np.asarray(ntp.ntt_forward_pallas(jnp.asarray(x), tp,
                                            interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_inverse_fused_scale():
    n = 128
    tp, t32, qs = setup(n, count=1, bits=25)
    q = qs[0]
    from phantom_tpu.ops.modmath32 import compute_shoup32
    s = 777 % q
    fused = (numth.invert_mod(n, q) * s) % q
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32)])
    y = ntp.ntt_forward_pallas(jnp.asarray(x), tp, interpret=True)
    out = np.asarray(ntp.ntt_inverse_pallas(
        y, tp, scale=np.array([fused], dtype=np.uint32),
        scale_shoup=np.array([compute_shoup32(fused, q)], dtype=np.uint32),
        interpret=True))
    plain = np.asarray(ntp.ntt_inverse_pallas(y, tp, interpret=True))
    np.testing.assert_array_equal(out.astype(object),
                                  (plain.astype(object) * s) % q)
