"""StreamExecutor: batched serving runtime is bit-identical to direct
per-item execution, across batch sizes, partial tails, and donation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.ops import pipeline32 as pp
from phantom_tpu.runtime import StreamExecutor, pipeline_map
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 keys, make_context)


@pytest.fixture(scope="module")
def setup():
    n = 128
    qs = numth.get_primes(2 * n, 28, 4)
    ps = numth.get_primes(2 * n, 29, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=2)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(7)
    k_sk, k_pk, k_rlk, *ks = jax.random.split(rng, 13)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = CKKSEncoder(ctx)
    gen = np.random.default_rng(3)
    cts = []
    for k in ks:
        pt = enc.encode(gen.standard_normal(enc.slots), 2.0 ** 20)
        ct = keys.encrypt_asymmetric(ctx, pk, pt, k)
        cts.append(jnp.asarray(np.asarray(ct.data).astype(np.uint32)))
    pipe = pp.build_pipeline32(ctx, rlk)
    return pipe, cts


def _direct(pipe, pairs):
    return [np.asarray(pp.mult_relin_rescale32(pipe, a, b))
            for a, b in pairs]


@pytest.mark.parametrize("batch,n_items", [(1, 3), (4, 4), (4, 10), (8, 5)])
def test_executor_matches_direct(setup, batch, n_items):
    """Full batches, multiple batches, and padded partial tails all
    produce bit-identical results in submission order."""
    pipe, cts = setup
    pairs = [(cts[i % len(cts)], cts[(i + 1) % len(cts)])
             for i in range(n_items)]
    ref = _direct(pipe, pairs)
    ex = StreamExecutor(pp.mult_relin_rescale32, pipe, batch=batch)
    outs = ex.map(pairs)
    assert len(outs) == n_items
    for o, r in zip(outs, ref):
        np.testing.assert_array_equal(np.asarray(o), r)
    assert ex.stats.items == n_items
    expected_batches = -(-n_items // batch)
    assert ex.stats.batches == expected_batches
    assert ex.stats.padded_lanes == expected_batches * batch - n_items
    assert ex.throughput() > 0


def test_handle_triggers_flush(setup):
    """result() on an item stuck in a partial batch flushes it."""
    pipe, cts = setup
    ex = StreamExecutor(pp.mult_relin_rescale32, pipe, batch=4)
    h = ex.submit(cts[0], cts[1])
    ref = _direct(pipe, [(cts[0], cts[1])])[0]
    np.testing.assert_array_equal(np.asarray(h.result()), ref)
    assert ex.stats.padded_lanes == 3


def test_pipeline_map_no_donate(setup):
    pipe, cts = setup
    pairs = [(cts[0], cts[1]), (cts[2], cts[3]), (cts[4], cts[5])]
    ref = _direct(pipe, pairs)
    outs = pipeline_map(pp.mult_relin_rescale32, pipe, pairs, batch=2,
                        donate=False)
    for o, r in zip(outs, ref):
        np.testing.assert_array_equal(np.asarray(o), r)
