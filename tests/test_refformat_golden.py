"""Byte-golden fixtures for the reference wire format (VERDICT r3 #6).

The committed blobs under tests/fixtures/refformat/ were authored by an
INDEPENDENT writer (tests/fixtures/gen_refformat_fixtures.py) that
transcribes the reference's save() methods field by field from the
header spec (ciphertext.h:173-307, plaintext.h:69-98,
secretkey.h:85-96,129-162,347-389) — refformat's own writers are never
involved in producing them.  The tests close the loop in both
directions: refformat.load_* must parse the blobs into objects that
decrypt/evaluate correctly, and refformat.save_* must reproduce the
fixture bytes exactly.
"""

import io
import json
import os

import jax
import numpy as np
import pytest

from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters, Scheme,
                                 evaluate, keys, make_context)
from phantom_tpu.utils import refformat

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures", "refformat")


def _blob(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def golden():
    with open(os.path.join(FIX, "expected.json")) as f:
        meta = json.load(f)
    params = EncryptionParameters.create(
        Scheme.BFV, meta["n"], meta["coeff_modulus"],
        plain_modulus=meta["plain_modulus"],
        special_modulus_size=meta["special_modulus_size"])
    ctx = make_context(params)
    return ctx, meta


def test_load_ct_decrypts_to_expected(golden):
    ctx, meta = golden
    sk = refformat.load_secret_key_ref(io.BytesIO(_blob("sk.bin")))
    ct1 = refformat.load_ciphertext_ref(io.BytesIO(_blob("ct1.bin")))
    enc = BatchEncoder(ctx)
    out = enc.decode(keys.decrypt(ctx, sk, ct1))
    np.testing.assert_array_equal(out, np.array(meta["vals1"],
                                                dtype=np.uint64))


def test_load_seed_compressed_symmetric(golden):
    """c1 is regenerated from the 64-byte Salsa20 seed on load
    (reference: load_symmetric, ciphertext.h:246-307)."""
    ctx, meta = golden
    sk = refformat.load_secret_key_ref(io.BytesIO(_blob("sk.bin")))
    ct = refformat.load_ciphertext_symmetric_ref(
        ctx, io.BytesIO(_blob("ct_sym_seeded.bin")))
    enc = BatchEncoder(ctx)
    out = enc.decode(keys.decrypt(ctx, sk, ct))
    np.testing.assert_array_equal(out, np.array(meta["vals1"],
                                                dtype=np.uint64))


def test_loaded_rlk_relinearizes(golden):
    """A multiply+relinearize driven entirely by loaded-key material."""
    ctx, meta = golden
    sk = refformat.load_secret_key_ref(io.BytesIO(_blob("sk.bin")))
    rlk = refformat.load_relin_key_ref(io.BytesIO(_blob("rlk.bin")))
    ct1 = refformat.load_ciphertext_ref(io.BytesIO(_blob("ct1.bin")))
    ct2 = refformat.load_ciphertext_ref(io.BytesIO(_blob("ct2.bin")))
    prod = evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)
    enc = BatchEncoder(ctx)
    out = enc.decode(keys.decrypt(ctx, sk, prod))
    v1 = np.array(meta["vals1"], dtype=np.uint64)
    v2 = np.array(meta["vals2"], dtype=np.uint64)
    t = np.uint64(meta["plain_modulus"])
    np.testing.assert_array_equal(out, (v1 * v2) % t)


def test_loaded_pk_encrypts(golden):
    ctx, meta = golden
    sk = refformat.load_secret_key_ref(io.BytesIO(_blob("sk.bin")))
    pk = refformat.load_public_key_ref(io.BytesIO(_blob("pk.bin")))
    enc = BatchEncoder(ctx)
    vals = np.arange(meta["n"], dtype=np.uint64) % 31
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(9))
    np.testing.assert_array_equal(enc.decode(keys.decrypt(ctx, sk, ct)),
                                  vals)


def test_save_reproduces_fixture_bytes(golden):
    """refformat writers must emit the independently-authored bytes
    verbatim — both parse AND serialize sides are pinned."""
    ctx, meta = golden
    sk = refformat.load_secret_key_ref(io.BytesIO(_blob("sk.bin")))
    pk = refformat.load_public_key_ref(io.BytesIO(_blob("pk.bin")))
    rlk = refformat.load_relin_key_ref(io.BytesIO(_blob("rlk.bin")))
    ct1 = refformat.load_ciphertext_ref(io.BytesIO(_blob("ct1.bin")))
    pt1 = refformat.load_plaintext_ref(io.BytesIO(_blob("pt1.bin")))

    buf = io.BytesIO()
    refformat.save_secret_key_ref(sk, buf)
    assert buf.getvalue() == _blob("sk.bin")

    buf = io.BytesIO()
    refformat.save_public_key_ref(pk, buf)
    assert buf.getvalue() == _blob("pk.bin")

    buf = io.BytesIO()
    refformat.save_relin_key_ref(rlk, buf)
    assert buf.getvalue() == _blob("rlk.bin")

    buf = io.BytesIO()
    refformat.save_ciphertext_ref(ct1, buf, is_asymmetric=True)
    assert buf.getvalue() == _blob("ct1.bin")

    buf = io.BytesIO()
    refformat.save_plaintext_ref(pt1, buf)
    assert buf.getvalue() == _blob("pt1.bin")

    seed = bytes.fromhex(meta["seed_hex"])
    ct_sym = refformat.load_ciphertext_symmetric_ref(
        ctx, io.BytesIO(_blob("ct_sym_seeded.bin")))
    buf = io.BytesIO()
    refformat.save_ciphertext_symmetric_ref(ct_sym, seed, buf)
    assert buf.getvalue() == _blob("ct_sym_seeded.bin")
