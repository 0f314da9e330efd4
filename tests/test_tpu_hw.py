"""Hardware validation: the fast-path pipelines bit-match the u64
evaluator ON THE REAL ACCELERATOR.

The generic u64-emulated evaluator compiles impractically slowly through
Mosaic/XLA-TPU, so the references here are computed on the in-process CPU
backend (jax.default_device) and only the u32/Pallas/MXU pipelines under
test are dispatched to the accelerator.  Everything that crosses the
CPU->TPU boundary is normalized to numpy first so no committed-device
mismatch can occur.

Skipped unless PHANTOM_TEST_TPU=1 — on the CPU mesh these paths are
already covered by test_pipeline32 / test_fast32 (same assertions, same
oracle); this file exists to exercise Mosaic + XLA-TPU codegen, mirroring
the reference's on-device example checks (/root/reference/examples/
3_ckks.cu multiply/rotate correctness scenarios).
"""

import os

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu import Fast32
from phantom_tpu.host import numth
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 evaluate, keys, make_context)

pytestmark = pytest.mark.skipif(
    not os.environ.get("PHANTOM_TEST_TPU"),
    reason="hardware suite; set PHANTOM_TEST_TPU=1")

N = 128


def _np_tree(t):
    """Normalize a pytree's array leaves to numpy (host) arrays."""
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, t)


def _build_setup():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        qs = numth.get_primes(2 * N, 28, 5)
        ps = numth.get_primes(2 * N, 29, 2)
        params = EncryptionParameters.create(
            Scheme.CKKS, N, qs + ps, special_modulus_size=2)
        ctx = make_context(params)
        k = jax.random.split(jax.random.PRNGKey(7), 6)
        sk = keys.gen_secret_key(ctx, k[0])
        pk = keys.gen_public_key(ctx, sk, k[1])
        rlk = keys.gen_relin_key(ctx, sk, k[2])
        glk = keys.create_galois_keys(ctx, sk, k[3], steps=[1])
        enc = CKKSEncoder(ctx)
        z = np.random.default_rng(0).standard_normal(enc.slots)
        pt = enc.encode(z, 2.0 ** 20)
        ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k[4])
        ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k[5])
        ref_mrr = np.asarray(evaluate.rescale_to_next(
            ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)).data)
        ref_rot = np.asarray(evaluate.rotate_vector(
            ctx, evaluate.rescale_to_next(
                ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)),
            1, glk).data)
    return (_np_tree(ctx), _np_tree(rlk), _np_tree(glk),
            _np_tree(ct1), _np_tree(ct2), ref_mrr, ref_rot)


@pytest.fixture(scope="module")
def setup():
    return _build_setup()


@pytest.mark.parametrize("engine", [False, True, "pallas-roll", "mxu",
                                    "mxu-pallas"])
def test_mult_relin_rescale_on_hw(setup, engine):
    from phantom_tpu.ops import pipeline32 as pp
    ctx, rlk, _, ct1, ct2, ref, _ = setup
    pipe = _np_tree(pp.build_pipeline32(ctx, rlk, use_pallas=engine))
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    assert d1.devices() == set(jax.devices()[:1])  # on the accelerator
    out = np.asarray(pp.mult_relin_rescale32(pipe, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


@pytest.mark.parametrize("engine", [False, "mxu-pallas"])
def test_fast32_rotate_on_hw(setup, engine):
    ctx, rlk, glk, ct1, ct2, _, ref_rot = setup
    ev = Fast32(ctx, rlk=rlk, glk=glk, use_pallas=engine)
    c = ev.rescale_to_next(ev.multiply_and_relin(
        ev.from_ciphertext(ct1), ev.from_ciphertext(ct2)))
    c = ev.rotate(c, 1)
    np.testing.assert_array_equal(np.asarray(c.data),
                                  ref_rot.astype(np.uint32))


def test_bconv_fold_matmul_on_hw():
    """The standalone Pallas fold-matmul (base-conversion kernel) through
    Mosaic, vs the exact triple computed on the CPU backend."""
    from phantom_tpu.ops import bconv32 as bc32
    from phantom_tpu.ops import bconv_pallas as bp
    rng = np.random.default_rng(9)
    cpu = jax.devices("cpu")[0]
    ps = numth.get_primes(2 * 1024, 28, 6)
    y = rng.integers(0, 1 << 29, (13, 2048)).astype(np.uint32)
    mat = rng.integers(0, 1 << 29, (6, 13)).astype(np.uint32)
    with jax.default_device(cpu):
        obase_c = bc32.modulus_vec32(ps)
        cc, hh, ll = bc32.accumulate_matmul_96(jnp.asarray(y),
                                               jnp.asarray(mat))
        ref = np.asarray(bc32.reduce_u96_any32(cc, hh, ll, obase_c))
    obase = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), obase_c)
    pow2, pow2_shoup = bc32.pow2_tables(ps)
    for bits in (7, 8):
        got = np.asarray(bp.fold_matmul_pallas(
            jnp.asarray(y), jnp.asarray(mat), obase, pow2, pow2_shoup,
            bits, interpret=False))
        np.testing.assert_array_equal(ref, got, err_msg=f"{bits=}")
