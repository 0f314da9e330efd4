"""Fused Pallas four-step MXU NTT engine: bit-match vs the XLA MXU engine
(itself bit-matched to the u64/u32 butterflies) on every path — forward,
inverse, fused moddown epilogue, fused inverse scale — over both plane
radixes and both dot modes (interpret mode on CPU, Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus
from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
from phantom_tpu.ops import ntt as ntt64
from phantom_tpu.ops import ntt32, ntt_mxu
from phantom_tpu.ops import ntt_mxu_pallas as nmp
from phantom_tpu.ops.modmath32 import compute_shoup32

RNG = np.random.default_rng(11)


@pytest.fixture(params=[7, 8], autouse=True)
def plane_bits(request):
    old = ntt_mxu.PLANE_BITS
    ntt_mxu.PLANE_BITS = request.param
    yield request.param
    ntt_mxu.PLANE_BITS = old


def setup(n, count=3, bits=28):
    qs = numth.get_primes(2 * n, bits, count)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    t32 = ntt32.tables32_from_tables64(t64)
    tm = ntt_mxu.prepare_mxu_tables(t32)
    tf = ntt_mxu.prepare_mxu_tables(t32, fused_kernel=True)
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    return tm, tf, x, qs


@pytest.mark.parametrize("logn", [8, 12])
def test_fwd_inv_match(logn):
    n = 1 << logn
    tm, tf, x, qs = setup(n)
    ref = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(x), tm))
    got = np.asarray(nmp.ntt_forward_mxu_pallas(jnp.asarray(x), tf,
                                                interpret=True))
    np.testing.assert_array_equal(ref, got)
    iref = np.asarray(ntt_mxu.ntt_inverse_mxu(jnp.asarray(ref), tm))
    igot = np.asarray(nmp.ntt_inverse_mxu_pallas(jnp.asarray(got), tf,
                                                 interpret=True))
    np.testing.assert_array_equal(iref, igot)
    np.testing.assert_array_equal(igot, x)


def test_fused_moddown_epilogue():
    n = 256
    tm, tf, x, qs = setup(n)
    sub = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    sc = np.array([RNG.integers(1, q) for q in qs], dtype=np.uint32)
    scs = np.array([compute_shoup32(int(s), q) for s, q in zip(sc, qs)],
                   dtype=np.uint32)
    ref = np.asarray(ntt_mxu.ntt_forward_mxu(
        jnp.asarray(x), tm, sub_from=jnp.asarray(sub), epi_scale=sc,
        epi_scale_shoup=scs))
    got = np.asarray(nmp.ntt_forward_mxu_pallas(
        jnp.asarray(x), tf, sub_from=jnp.asarray(sub), epi_scale=sc,
        epi_scale_shoup=scs, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_fused_inverse_scale():
    n = 256
    tm, tf, x, qs = setup(n)
    sc = np.array([RNG.integers(1, q) for q in qs], dtype=np.uint32)
    scs = np.array([compute_shoup32(int(s), q) for s, q in zip(sc, qs)],
                   dtype=np.uint32)
    ref = np.asarray(ntt_mxu.ntt_inverse_mxu(jnp.asarray(x), tm, scale=sc,
                                             scale_shoup=scs))
    got = np.asarray(nmp.ntt_inverse_mxu_pallas(
        jnp.asarray(x), tf, scale=sc, scale_shoup=scs, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_batched_rows():
    n = 256
    tm, tf, x, qs = setup(n)
    xb = np.stack([x, (x + 1) % np.array([[q] for q in qs], dtype=np.uint32)])
    ref = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(xb), tm))
    got = np.asarray(nmp.ntt_forward_mxu_pallas(jnp.asarray(xb), tf,
                                                interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_bf16_dot_mode():
    n = 256
    tm, tf, x, qs = setup(n)
    old = nmp.DOT_MODE
    try:
        nmp.DOT_MODE = "bf16"
        got = np.asarray(nmp.ntt_forward_mxu_pallas(jnp.asarray(x), tf,
                                                    interpret=True))
    finally:
        nmp.DOT_MODE = old
    ref = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(x), tm))
    np.testing.assert_array_equal(ref, got)
