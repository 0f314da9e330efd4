"""32-bit NTT fast path: roundtrip + bit-match vs the u64 engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus
from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
from phantom_tpu.ops import ntt as ntt64
from phantom_tpu.ops import ntt32

RNG = np.random.default_rng(11)


def make_pair(n, bits, count):
    qs = numth.get_primes(2 * n, bits, count)
    t64 = ntt64.tables_from_host(make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    return t64, ntt32.tables32_from_tables64(t64), qs


@pytest.mark.parametrize("logn", [4, 8, 11])
def test_roundtrip_and_match(logn):
    n = 1 << logn
    t64, t32, qs = make_pair(n, 28, 2)
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint64) for q in qs])
    y64 = np.asarray(ntt64.ntt_forward(jnp.asarray(x), t64))
    y32 = np.asarray(ntt32.ntt_forward32(jnp.asarray(x.astype(np.uint32)), t32))
    np.testing.assert_array_equal(y32, y64.astype(np.uint32))
    z32 = np.asarray(ntt32.ntt_inverse32(jnp.asarray(y32), t32))
    np.testing.assert_array_equal(z32, x.astype(np.uint32))


def test_fused_scale_matches():
    n = 256
    t64, t32, qs = make_pair(n, 25, 1)
    q = qs[0]
    s = 9999 % q
    from phantom_tpu.ops.modmath32 import compute_shoup32
    fused = (numth.invert_mod(n, q) * s) % q
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32)])
    y = ntt32.ntt_forward32(jnp.asarray(x), t32)
    out = np.asarray(ntt32.ntt_inverse32(
        y, t32, scale=jnp.asarray([fused], dtype=jnp.uint32),
        scale_shoup=jnp.asarray([compute_shoup32(fused, q)], dtype=jnp.uint32)))
    plain = np.asarray(ntt32.ntt_inverse32(y, t32))
    np.testing.assert_array_equal(out.astype(object),
                                  (plain.astype(object) * s) % q)


def test_max_degree_roundtrip():
    """Degree-scaling smoke at the reference's max N = 131072
    (defines.h:23): table generation + u32 forward/inverse roundtrip and
    a spot bit-match against the u64 engine (first limb, sampled lanes)."""
    n = 1 << 17
    t64, t32, qs = make_pair(n, 28, 1)
    q = qs[0]
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32)])
    y32 = ntt32.ntt_forward32(jnp.asarray(x), t32)
    z32 = np.asarray(ntt32.ntt_inverse32(y32, t32))
    np.testing.assert_array_equal(z32, x)
    y64 = np.asarray(ntt64.ntt_forward(
        jnp.asarray(x.astype(np.uint64)), t64))
    np.testing.assert_array_equal(np.asarray(y32), y64.astype(np.uint32))
