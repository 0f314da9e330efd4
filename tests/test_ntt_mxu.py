"""MXU (matmul) NTT engine: bit-match vs the u32 butterfly engine.

The four-step factorization (ops/ntt_mxu.py) must be bit-identical to
ntt32 for every path: forward, inverse (default and fused scale), the
moddown/rescale epilogue, both digit-plane radixes (int32 and int8 dots),
batched leading dims, and odd log-n splits (n1 != n2).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus
from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
from phantom_tpu.ops import modmath32 as m32
from phantom_tpu.ops import ntt as ntt64
from phantom_tpu.ops import ntt32, ntt_mxu

RNG = np.random.default_rng(23)


def make_tables(n, bits, count):
    qs = numth.get_primes(2 * n, bits, count)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    t32 = ntt32.tables32_from_tables64(t64)
    return t32, ntt_mxu.prepare_mxu_tables(t32), qs


@pytest.fixture(params=[7, 8], ids=["int8-planes", "int32-planes"])
def plane_bits(request):
    old = ntt_mxu.PLANE_BITS
    ntt_mxu.PLANE_BITS = request.param
    yield request.param
    ntt_mxu.PLANE_BITS = old


@pytest.mark.parametrize("logn", [4, 7, 9])
def test_forward_inverse_bit_match(logn, plane_bits):
    n = 1 << logn
    t32, tm, qs = make_tables(n, 28, 3)
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    y32 = np.asarray(ntt32.ntt_forward32(jnp.asarray(x), t32))
    ym = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(x), tm))
    np.testing.assert_array_equal(ym, y32)
    z32 = np.asarray(ntt32.ntt_inverse32(jnp.asarray(y32), t32))
    zm = np.asarray(ntt_mxu.ntt_inverse_mxu(jnp.asarray(y32), tm))
    np.testing.assert_array_equal(zm, z32)
    np.testing.assert_array_equal(zm, x)


def test_batched_lead_dims(plane_bits):
    n = 128
    t32, tm, qs = make_tables(n, 26, 2)
    qv = np.array(qs, dtype=np.uint32)[:, None]
    x = RNG.integers(0, 1 << 25, (3, 2, len(qs), n)).astype(np.uint32) % qv
    y32 = np.asarray(ntt32.ntt_forward32(jnp.asarray(x), t32))
    ym = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(x), tm))
    np.testing.assert_array_equal(ym, y32)


def test_inverse_fused_scale(plane_bits):
    n = 256
    t32, tm, qs = make_tables(n, 25, 2)
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    y = ntt32.ntt_forward32(jnp.asarray(x), t32)
    sc = np.array([999983 % q for q in qs], dtype=np.uint32)
    scs = np.array([m32.compute_shoup32(int(v), q)
                    for v, q in zip(sc, qs)], dtype=np.uint32)
    i32 = np.asarray(ntt32.ntt_inverse32(y, t32, scale=jnp.asarray(sc),
                                         scale_shoup=jnp.asarray(scs)))
    im = np.asarray(ntt_mxu.ntt_inverse_mxu(y, tm, scale=jnp.asarray(sc),
                                            scale_shoup=jnp.asarray(scs)))
    np.testing.assert_array_equal(im, i32)


def test_moddown_epilogue(plane_bits):
    """(sub_from - NTT(x)) * scale fused path == unfused composition."""
    n = 256
    t32, tm, qs = make_tables(n, 25, 2)
    qv = np.array(qs, dtype=np.uint32)[:, None]
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    sub = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    sc = np.array([12345 % q for q in qs], dtype=np.uint32)
    scs = np.array([m32.compute_shoup32(int(v), q)
                    for v, q in zip(sc, qs)], dtype=np.uint32)
    fused = np.asarray(ntt_mxu.ntt_forward_mxu(
        jnp.asarray(x), tm, sub_from=jnp.asarray(sub),
        epi_scale=jnp.asarray(sc), epi_scale_shoup=jnp.asarray(scs)))
    plain = np.asarray(ntt32.ntt_forward32(jnp.asarray(x), t32))
    ref = ((sub.astype(object) - plain.astype(object))
           * sc[:, None].astype(object)) % qv.astype(object)
    np.testing.assert_array_equal(fused.astype(object), ref)


def test_limb_slice(plane_bits):
    n = 64
    t32, tm, qs = make_tables(n, 26, 4)
    sub = tm.limb_slice(np.array([1, 3]))
    x = np.stack([RNG.integers(0, qs[i], n, dtype=np.uint32)
                  for i in (1, 3)])
    full = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    full[1], full[3] = x[0], x[1]
    y_full = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(full), tm))
    y_sub = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(x), sub))
    np.testing.assert_array_equal(y_sub, y_full[[1, 3]])


@pytest.mark.skipif(not __import__("os").environ.get("PHANTOM_FULL_SWEEP"),
                    reason="large-degree sweep (set PHANTOM_FULL_SWEEP=1)")
@pytest.mark.parametrize("logn", [16, 17])
def test_reference_max_degrees(logn):
    """Bit-match vs the u32 engine at the reference's headline degrees
    (N=65536 and its max 131072, 1_bfv.cu sweep / ckks_bench.cu)."""
    n = 1 << logn
    qs = numth.get_primes(2 * n, 28, 2) + numth.get_primes(2 * n, 29, 1)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    t32 = ntt32.tables32_from_tables64(t64)
    tm = ntt_mxu.prepare_mxu_tables(t32)
    x = np.stack([RNG.integers(0, q, n) for q in qs]).astype(np.uint32)
    xd = jnp.asarray(x)
    fwd = np.asarray(ntt_mxu.ntt_forward_mxu(xd, tm))
    np.testing.assert_array_equal(fwd, np.asarray(ntt32.ntt_forward32(xd, t32)))
    inv = np.asarray(ntt_mxu.ntt_inverse_mxu(jnp.asarray(fwd), tm))
    np.testing.assert_array_equal(inv, x)


def test_fold_vs_triple_reduction(plane_bits):
    """Both diagonal-partial reduction strategies are bit-identical."""
    n = 256
    t32, tm, qs = make_tables(n, 28, 3)
    x = np.stack([RNG.integers(0, q, n) for q in qs]).astype(np.uint32)
    xd = jnp.asarray(x)
    old = ntt_mxu.FOLD_DIAGONALS
    try:
        ntt_mxu.FOLD_DIAGONALS = True
        fwd_fold = np.asarray(ntt_mxu.ntt_forward_mxu(xd, tm))
        inv_fold = np.asarray(ntt_mxu.ntt_inverse_mxu(jnp.asarray(fwd_fold), tm))
        ntt_mxu.FOLD_DIAGONALS = False
        fwd_tri = np.asarray(ntt_mxu.ntt_forward_mxu(xd, tm))
        inv_tri = np.asarray(ntt_mxu.ntt_inverse_mxu(jnp.asarray(fwd_tri), tm))
    finally:
        ntt_mxu.FOLD_DIAGONALS = old
    np.testing.assert_array_equal(fwd_fold, fwd_tri)
    np.testing.assert_array_equal(inv_fold, inv_tri)
    np.testing.assert_array_equal(inv_fold, x)
