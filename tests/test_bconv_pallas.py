"""Pallas fold-matmul (base-conversion kernel) bit-match vs the exact
96-bit-triple XLA path, over both plane radixes and odd shapes."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.ops import bconv32 as bc32
from phantom_tpu.ops import bconv_pallas as bp

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("bits", [7, 8])
@pytest.mark.parametrize("k_in,k_out,n", [(3, 5, 256), (28, 13, 1024),
                                          (63, 4, 512)])
def test_fold_matmul_bit_match(bits, k_in, k_out, n):
    ps = numth.get_primes(2 * 1024, 28, k_out)
    obase = bc32.modulus_vec32(ps)
    pow2, pow2_shoup = bc32.pow2_tables(ps)
    y = RNG.integers(0, 1 << 29, (k_in, n)).astype(np.uint32)
    mat = RNG.integers(0, 1 << 29, (k_out, k_in)).astype(np.uint32)
    cc, hh, ll = bc32.accumulate_matmul_96(jnp.asarray(y), jnp.asarray(mat))
    ref = np.asarray(bc32.reduce_u96_any32(cc, hh, ll, obase))
    got = np.asarray(bp.fold_matmul_pallas(
        jnp.asarray(y), jnp.asarray(mat), obase, pow2, pow2_shoup, bits,
        interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_dispatch_shape_gate():
    """_accumulate_reduce32 must fall back cleanly when the Pallas kernel
    is force-enabled but the column count is not 128-aligned."""
    ps = numth.get_primes(2 * 1024, 28, 3)
    obase = bc32.modulus_vec32(ps)
    pow2, pow2_shoup = bc32.pow2_tables(ps)
    y = RNG.integers(0, 1 << 29, (4, 96)).astype(np.uint32)
    mat = RNG.integers(0, 1 << 29, (3, 4)).astype(np.uint32)
    cc, hh, ll = bc32.accumulate_matmul_96(jnp.asarray(y), jnp.asarray(mat))
    ref = np.asarray(bc32.reduce_u96_any32(cc, hh, ll, obase))
    old = bp.USE_PALLAS_BCONV
    try:
        bp.USE_PALLAS_BCONV = True
        got = np.asarray(bc32._accumulate_reduce32(
            jnp.asarray(y), jnp.asarray(mat), obase, pow2, pow2_shoup))
    finally:
        bp.USE_PALLAS_BCONV = old
    np.testing.assert_array_equal(ref, got)
