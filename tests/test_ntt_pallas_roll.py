"""Roll/select Pallas NTT engine: bit-match vs the u32 butterfly engine
(interpret mode; same caveat as test_ntt_pallas — Mosaic needs hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus
from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
from phantom_tpu.ops import modmath32 as m32
from phantom_tpu.ops import ntt as ntt64
from phantom_tpu.ops import ntt32
from phantom_tpu.ops import ntt_pallas_roll as ntr

RNG = np.random.default_rng(31)


def make_tables(n, bits, count):
    qs = numth.get_primes(2 * n, bits, count)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    t32 = ntt32.tables32_from_tables64(t64)
    return t32, ntr.prepare_roll_tables(t32), qs


@pytest.mark.parametrize("logn", [4, 5, 8, 9])
def test_forward_inverse_bit_match(logn):
    n = 1 << logn
    t32, tr, qs = make_tables(n, 26, 3)
    x = np.stack([RNG.integers(0, q, n) for q in qs]).astype(np.uint32)
    xd = jnp.asarray(x)
    fwd = np.asarray(ntr.ntt_forward_roll(xd, tr))
    np.testing.assert_array_equal(fwd, np.asarray(ntt32.ntt_forward32(xd, t32)))
    inv = np.asarray(ntr.ntt_inverse_roll(jnp.asarray(fwd), tr))
    np.testing.assert_array_equal(inv, x)


def test_batched_lead_dims():
    n = 64
    t32, tr, qs = make_tables(n, 26, 2)
    x = np.stack([[RNG.integers(0, q, n) for q in qs] for _ in range(3)]
                 ).astype(np.uint32)
    xd = jnp.asarray(x)
    got = np.asarray(ntr.ntt_forward_roll(xd, tr))
    want = np.asarray(ntt32.ntt_forward32(xd, t32))
    np.testing.assert_array_equal(got, want)


def test_inverse_fused_scale():
    n = 128
    t32, tr, qs = make_tables(n, 26, 3)
    x = np.stack([RNG.integers(0, q, n) for q in qs]).astype(np.uint32)
    fwd = ntt32.ntt_forward32(jnp.asarray(x), t32)
    sc = np.array([7, 11, 13], dtype=np.uint32)
    scs = np.array([(int(s) << 32) // q for s, q in zip(sc, qs)],
                   dtype=np.uint32)
    got = np.asarray(ntr.ntt_inverse_roll(fwd, tr, scale=jnp.asarray(sc),
                                          scale_shoup=jnp.asarray(scs)))
    want = np.asarray(ntt32.ntt_inverse32(fwd, t32, scale=jnp.asarray(sc),
                                          scale_shoup=jnp.asarray(scs)))
    np.testing.assert_array_equal(got, want)


def test_moddown_epilogue():
    n = 128
    t32, tr, qs = make_tables(n, 26, 3)
    qv = np.array(qs, dtype=np.uint64)
    x = np.stack([RNG.integers(0, q, n) for q in qs]).astype(np.uint32)
    sub = np.stack([RNG.integers(0, q, n) for q in qs]).astype(np.uint32)
    sc = np.array([5, 9, 21], dtype=np.uint32)
    scs = np.array([(int(s) << 32) // q for s, q in zip(sc, qs)],
                   dtype=np.uint32)
    fused = np.asarray(ntr.ntt_forward_roll(
        jnp.asarray(x), tr, sub_from=jnp.asarray(sub),
        epi_scale=jnp.asarray(sc), epi_scale_shoup=jnp.asarray(scs)))
    plain = np.asarray(ntt32.ntt_forward32(jnp.asarray(x), t32))
    ref = ((sub.astype(object) - plain.astype(object))
           * sc[:, None].astype(object)) % qv[:, None].astype(object)
    np.testing.assert_array_equal(fused.astype(object), ref)


def test_limb_slice():
    n = 64
    t32, tr, qs = make_tables(n, 26, 4)
    sub = tr.limb_slice(np.array([1, 3]))
    x = np.stack([RNG.integers(0, qs[i], n, dtype=np.uint32)
                  for i in (1, 3)])
    full = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    full[1], full[3] = x[0], x[1]
    y_full = np.asarray(ntr.ntt_forward_roll(jnp.asarray(full), tr))
    y_sub = np.asarray(ntr.ntt_forward_roll(jnp.asarray(x), sub))
    np.testing.assert_array_equal(y_sub, y_full[[1, 3]])
