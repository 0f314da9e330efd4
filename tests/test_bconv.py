"""Base conversion and exact scale-and-round vs exact CRT arithmetic."""

import numpy as np
import jax.numpy as jnp

from phantom_tpu.host import numth
from phantom_tpu.host.rns import RNSBase, BaseConverter
from phantom_tpu.ops import bconv as bc
from phantom_tpu.ops import scaleround as sr

RNG = np.random.default_rng(7)


def rand_rns(base: RNSBase, n, values=None):
    """Random big ints < Q and their RNS decomposition (k, N)."""
    if values is None:
        values = [int.from_bytes(RNG.bytes(32), "little") % base.prod
                  for _ in range(n)]
    arr = np.zeros((base.size, n), dtype=np.uint64)
    for j, v in enumerate(values):
        for i, q in enumerate(base.moduli):
            arr[i, j] = v % q
    return values, arr


def test_rnsbase_compose_decompose():
    base = RNSBase(numth.get_primes(8192, 50, 4))
    v = 123456789012345678901234567890 % base.prod
    assert base.compose(base.decompose(v)) == v


def test_bconv_exact_matches_crt():
    n = 64
    ibase = RNSBase(numth.get_primes(8192, 50, 3))
    obase = RNSBase(numth.get_primes(8192, 45, 2) + [numth.get_primes(8192, 20, 1)[0]])
    conv = bc.consts_from_host(BaseConverter(ibase, obase))
    values, x = rand_rns(ibase, n)
    out = np.asarray(bc.bconv_exact(jnp.asarray(x), conv))
    for j, v in enumerate(values):
        for i, p in enumerate(obase.moduli):
            assert int(out[i, j]) == v % p, (i, j)


def test_bconv_approx_overshoot_bounded():
    n = 32
    ibase = RNSBase(numth.get_primes(8192, 55, 4))
    obase = RNSBase(numth.get_primes(8192, 48, 2))
    conv = bc.consts_from_host(BaseConverter(ibase, obase))
    values, x = rand_rns(ibase, n)
    out = np.asarray(bc.bconv_approx(jnp.asarray(x), conv))
    for j, v in enumerate(values):
        for i, p in enumerate(obase.moduli):
            # out == (v + alpha*Q) mod p for some 0 <= alpha <= k_in
            diffs = [(v + a * ibase.prod) % p for a in range(ibase.size + 1)]
            assert int(out[i, j]) in diffs


def test_floor_sum_div():
    n = 128
    ibase = RNSBase(numth.get_primes(4096, 59, 5))
    obase = RNSBase(numth.get_primes(4096, 30, 1))
    conv = bc.consts_from_host(BaseConverter(ibase, obase))
    values, x = rand_rns(ibase, n)
    y = np.asarray(bc.scale_by_qhat_inv(jnp.asarray(x), conv))
    v_dev = np.asarray(bc.floor_sum_div(jnp.asarray(y), conv))
    for j in range(n):
        num = sum(int(y[i, j]) * (ibase.prod // q)
                  for i, q in enumerate(ibase.moduli))
        assert int(v_dev[j]) == num // ibase.prod


def test_decrypt_scale_and_round_exact():
    """round(t*x/Q) mod t vs exact bigint arithmetic, random x."""
    n = 64
    base = RNSBase(numth.get_primes(8192, 50, 3))
    t = numth.get_primes(8192, 20, 1)[0]
    c = sr.make_decrypt_consts(base, t)
    values, x = rand_rns(base, n)
    out = np.asarray(sr.decrypt_scale_and_round(jnp.asarray(x), c))
    for j, v in enumerate(values):
        expect = ((t * v * 2 + base.prod) // (2 * base.prod)) % t  # round(t*v/Q)
        assert int(out[j]) == expect, j


def test_scale_plain_up_exact():
    n = 64
    base = RNSBase(numth.get_primes(8192, 50, 3))
    t = numth.get_primes(8192, 20, 1)[0]
    c = sr.make_plain_lift_consts(base, t)
    m = RNG.integers(0, t, size=(n,), dtype=np.uint64)
    out = np.asarray(sr.scale_plain_up(jnp.asarray(m), c))
    for j in range(n):
        expect = (base.prod * int(m[j]) * 2 + t) // (2 * t)  # round(Q*m/t)
        for i, q in enumerate(base.moduli):
            assert int(out[i, j]) == expect % q


def test_bconv32_mxu_matmul_bit_match():
    """The MXU digit-plane accumulate (auto-enabled on accelerators) must
    bit-match the VPU triple accumulate, for both plane radixes."""
    import pytest
    from phantom_tpu.ops import bconv32 as bc32

    n = 64
    ib = RNSBase(numth.get_primes(4096, 28, 4))
    ob = RNSBase(numth.get_primes(4096, 29, 3))
    c32 = bc32.consts32_from_host(BaseConverter(ib, ob))
    x = np.stack([RNG.integers(0, int(q), n) for q in ib.moduli]
                 ).astype(np.uint32)
    xd = jnp.asarray(x)

    ref_approx = np.asarray(bc32.bconv_approx32(xd, c32))
    ref_exact = np.asarray(bc32.bconv_exact32(xd, c32))
    old = (bc32.USE_MXU_MATMUL32, bc32.MXU_PLANE_BITS, bc32.FOLD_DIAGONALS32)
    try:
        bc32.USE_MXU_MATMUL32 = True
        for bits in (7, 8):
            for fold in (True, False):
                bc32.MXU_PLANE_BITS = bits
                bc32.FOLD_DIAGONALS32 = fold
                np.testing.assert_array_equal(
                    np.asarray(bc32.bconv_approx32(xd, c32)), ref_approx)
                np.testing.assert_array_equal(
                    np.asarray(bc32.bconv_exact32(xd, c32)), ref_exact)
    finally:
        (bc32.USE_MXU_MATMUL32, bc32.MXU_PLANE_BITS,
         bc32.FOLD_DIAGONALS32) = old


def test_scaleround32_mxu_fold_bit_match():
    """scale_and_round_exact32's omega matmul under the MXU digit-plane
    fold (accelerator configuration) bit-matches the VPU triple path."""
    from phantom_tpu.ops import bconv32 as bc32
    from phantom_tpu.ops import scaleround32 as sr32

    n = 64
    ib = numth.get_primes(4096, 28, 4)
    ob = numth.get_primes(4096, 29, 2)
    # the v-free rule needs out_j | num*prod(I)/den: num=prod(ob), den=1
    num = int(np.prod([np.uint64(p) for p in ob], dtype=object))
    c = sr32.make_exact_scale_round32(ib, num, 1, ob)
    x = np.stack([RNG.integers(0, int(q), n) for q in ib]).astype(np.uint32)
    xd = jnp.asarray(x)
    ref = np.asarray(sr32.scale_and_round_exact32(xd, c))
    old = (bc32.USE_MXU_MATMUL32, bc32.FOLD_DIAGONALS32, bc32.MXU_PLANE_BITS)
    try:
        bc32.USE_MXU_MATMUL32 = True
        for bits in (7, 8):
            for fold in (True, False):
                bc32.MXU_PLANE_BITS = bits
                bc32.FOLD_DIAGONALS32 = fold
                np.testing.assert_array_equal(
                    np.asarray(sr32.scale_and_round_exact32(xd, c)), ref)
    finally:
        (bc32.USE_MXU_MATMUL32, bc32.FOLD_DIAGONALS32,
         bc32.MXU_PLANE_BITS) = old
