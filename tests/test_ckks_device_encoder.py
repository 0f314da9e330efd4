"""Device-side double-float CKKS encoder: bit-match vs host encoder on
encode, quantization-floor-limited decode accuracy, DD FFT precision."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.ops import ckks_fft as cf
from phantom_tpu.ops import ntt as nttmod
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 make_context)
from phantom_tpu.schemes.ckks_encoder import CKKSDeviceEncoder


@pytest.fixture(scope="module")
def setup():
    n = 512
    qs = numth.get_primes(2 * n, 40, 2) + numth.get_primes(2 * n, 30, 1)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, [qs[0], qs[2], qs[1]], special_modulus_size=1)
    ctx = make_context(params)
    return ctx, CKKSEncoder(ctx), CKKSDeviceEncoder(ctx)


def test_encode_matches_host(setup):
    ctx, host_enc, dev_enc = setup
    rng = np.random.default_rng(0)
    z = rng.standard_normal(host_enc.slots) + 1j * rng.standard_normal(
        host_enc.slots)
    scale = 2.0 ** 30
    ch = np.asarray(nttmod.ntt_inverse(
        host_enc.encode(z, scale).data, ctx.tables_q(2))).astype(np.int64)
    cd = np.asarray(nttmod.ntt_inverse(
        dev_enc.encode(z, scale).data, ctx.tables_q(2))).astype(np.int64)
    q0 = int(ctx.params.data_moduli[0])
    delta = np.abs(ch - cd) % q0
    delta = np.minimum(delta, q0 - delta)
    assert delta.max() <= 1  # double-float vs f64 rounding: off-by-one max


def test_decode_roundtrip(setup):
    ctx, host_enc, dev_enc = setup
    rng = np.random.default_rng(1)
    z = rng.standard_normal(host_enc.slots) + 1j * rng.standard_normal(
        host_enc.slots)
    scale = 2.0 ** 30
    pt = dev_enc.encode(z, scale)
    out = dev_enc.decode(pt)
    np.testing.assert_allclose(out, z, atol=1e-6)
    # cross: host decode of device encode
    np.testing.assert_allclose(host_enc.decode(pt), z, atol=1e-6)


def test_dd_fft_precision():
    n = 256
    t = cf.make_fft_tables(n)
    rng = np.random.default_rng(2)
    p = rng.standard_normal(n)
    hi, lo = cf.df_from_f64(p)
    zero = jnp.zeros(n, dtype=jnp.float32)
    ev = cf.fft_forward(((jnp.asarray(hi), jnp.asarray(lo)), (zero, zero)), t)
    back = cf.fft_inverse(ev, t)
    got = np.asarray(back[0][0]).astype(np.float64) + \
        np.asarray(back[0][1]).astype(np.float64)
    assert np.abs(got - p).max() < 1e-10  # far below f32 (~1e-5)
