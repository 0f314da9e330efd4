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


@pytest.mark.parametrize("k_in,k_out,n", [(3, 5, 256), (28, 13, 1024),
                                          (63, 4, 512)])
def test_fold_matmul_bf16_path_bit_match(k_in, k_out, n):
    """The hardware bf16-plane path (radix-2^8 dots with f32 accumulation,
    i32 diagonal sums), forced under interpret mode via force_pdt — the
    round-2 advisor gap: this path previously only ever ran on TPU."""
    ps = numth.get_primes(2 * 1024, 28, k_out)
    obase = bc32.modulus_vec32(ps)
    pow2, pow2_shoup = bc32.pow2_tables(ps)
    y = RNG.integers(0, 1 << 29, (k_in, n)).astype(np.uint32)
    mat = RNG.integers(0, 1 << 29, (k_out, k_in)).astype(np.uint32)
    cc, hh, ll = bc32.accumulate_matmul_96(jnp.asarray(y), jnp.asarray(mat))
    ref = np.asarray(bc32.reduce_u96_any32(cc, hh, ll, obase))
    got = np.asarray(bp.fold_matmul_pallas(
        jnp.asarray(y), jnp.asarray(mat), obase, pow2, pow2_shoup, 8,
        interpret=True, force_pdt=jnp.bfloat16))
    np.testing.assert_array_equal(ref, got)


def test_bf16_exactness_bound_drops_nplanes():
    """With i32 diagonal sums the bf16 exactness bound is per-dot:
    255^2 * k_in < 2^24 allows k_in up to 258, where the old f32-diagonal
    bound (255^2 * k_in * nplanes) cut off at k_in = 64 — the advisor's
    point that f32 diagonal sums needlessly tightened it."""
    assert (255 ** 2) * 258 < (1 << 24) <= (255 ** 2) * 259
    assert (255 ** 2) * 64 * 4 < (1 << 24) <= (255 ** 2) * 65 * 4


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
