"""Serialization examples incl. seed-compressed symmetric ciphertexts
(reference: examples/serialization.cu:201-456)."""

import io

import os

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)
import numpy as np

from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters, Scheme,
                                 keys, make_context)
from phantom_tpu.utils import serialize as ser


def demo(n=1024):
    print(f"[serialization] n={n}")
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40])]
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk = jax.random.split(rng)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    enc = BatchEncoder(ctx)
    vals = np.arange(n, dtype=np.uint64) % t

    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(1))
    blob = ser.to_bytes(ct)
    ct2 = ser.from_bytes(blob)
    assert (enc.decode(keys.decrypt(ctx, sk, ct2)) == vals).all()
    print(f"  ciphertext roundtrip: ok ({len(blob)} bytes)")

    ct_s, seed = ser.encrypt_symmetric_compressed(
        ctx, sk, enc.encode(vals), jax.random.PRNGKey(2))
    buf = io.BytesIO()
    ser.save_ciphertext_symmetric(ct_s, seed, buf)
    ct3 = ser.from_bytes(buf.getvalue(), ctx)
    assert (enc.decode(keys.decrypt(ctx, sk, ct3)) == vals).all()
    print(f"  seed-compressed symmetric: ok ({buf.tell()} bytes, "
          f"{buf.tell() * 100 // len(blob)}% of full)")


if __name__ == "__main__":
    demo()
    print("all serialization examples passed")
