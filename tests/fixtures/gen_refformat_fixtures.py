"""Generate reference-layout byte-golden fixtures for tests/test_refformat_golden.py.

The fixture BYTES are authored here by an independent writer that
transcribes the reference's save() methods field by field
(/root/reference/include/ciphertext.h:173-307, plaintext.h:69-98,
secretkey.h:85-96,129-162,347-389) — it deliberately does NOT call
phantom_tpu.utils.refformat's writers, so the committed blobs are an
independent oracle for BOTH refformat.load_* (parse these bytes) and
refformat.save_* (reproduce these bytes).

Run from the repo root (CPU, ~1 min):

    python tests/fixtures/gen_refformat_fixtures.py
"""

import json
import os
import struct

import numpy as np


OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refformat")


# --- independent byte writers (transcribed from the reference headers) ---

def write_ct_blob(f, chain_index, data, scale=1.0, correction_factor=1,
                  noise_scale_deg=1, is_ntt_form=False, is_asymmetric=True,
                  c0_only=False, seed=None):
    """PhantomCiphertext::save / save_symmetric byte sequence
    (ciphertext.h:173-246): size_t x4, double, u64, size_t, bool x2,
    payload u64 LE; seed-compressed writes c0 then the 64-byte seed."""
    size, num_l, n = data.shape
    f.write(struct.pack("<Q", chain_index))
    f.write(struct.pack("<Q", size))
    f.write(struct.pack("<Q", n))
    f.write(struct.pack("<Q", num_l))
    f.write(struct.pack("<d", scale))
    f.write(struct.pack("<Q", correction_factor))
    f.write(struct.pack("<Q", noise_scale_deg))
    f.write(struct.pack("<?", is_ntt_form))
    f.write(struct.pack("<?", is_asymmetric))
    payload = data[:1] if c0_only else data
    f.write(np.ascontiguousarray(payload, dtype="<u8").tobytes())
    if c0_only:
        assert seed is not None and len(seed) == 64
        f.write(seed)


def write_pt_blob(f, chain_index, data, scale=1.0):
    """PhantomPlaintext::save (plaintext.h:69-81)."""
    num_l, n = data.shape
    f.write(struct.pack("<QQQd", chain_index, n, num_l, scale))
    f.write(np.ascontiguousarray(data, dtype="<u8").tobytes())


def write_sk_blob(f, data, max_power=1):
    """PhantomSecretKey::save (secretkey.h:347-365)."""
    num_l, n = data.shape
    f.write(struct.pack("<QQQ", max_power, n, num_l))
    f.write(np.ascontiguousarray(data, dtype="<u8").tobytes())


def write_pk_blob(f, data):
    """PhantomPublicKey::save = its ciphertext-of-zero's save at the key
    level (secretkey.h:85-96): chain index 0, NTT form, asymmetric."""
    write_ct_blob(f, 0, data, is_ntt_form=True, is_asymmetric=True)


def write_rlk_blob(f, data):
    """PhantomRelinKey::save (secretkey.h:129-141): dnum, then each
    digit's public key blob."""
    dnum = data.shape[0]
    f.write(struct.pack("<Q", dnum))
    for d in range(dnum):
        write_pk_blob(f, data[d])


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from phantom_tpu.host import numth
    from phantom_tpu.host.modulus import PlainModulus
    from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters,
                                     Scheme, keys, make_context)
    from phantom_tpu.utils import refformat

    os.makedirs(OUT, exist_ok=True)

    n = 256
    qs = numth.get_primes(2 * n, 28, 2)
    ps = numth.get_primes(2 * n, 29, 1)
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, qs + ps, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)

    k = jax.random.split(jax.random.PRNGKey(2024), 6)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    vals1 = (np.arange(n, dtype=np.uint64) * 7 + 3) % 97
    vals2 = (np.arange(n, dtype=np.uint64) * 5 + 11) % 89
    pt1 = enc.encode(vals1)
    pt2 = enc.encode(vals2)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt1, k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt2, k[4])
    seed = bytes(range(64))
    ct_sym = refformat.encrypt_symmetric_seeded(ctx, sk, pt1, seed, k[5])

    with open(os.path.join(OUT, "sk.bin"), "wb") as f:
        write_sk_blob(f, np.asarray(sk.data))
    with open(os.path.join(OUT, "pk.bin"), "wb") as f:
        write_pk_blob(f, np.asarray(pk.data))
    with open(os.path.join(OUT, "rlk.bin"), "wb") as f:
        write_rlk_blob(f, np.asarray(rlk.data))
    pt_data = np.asarray(pt1.data)
    if pt_data.ndim == 1:
        pt_data = pt_data[None]
    with open(os.path.join(OUT, "pt1.bin"), "wb") as f:
        write_pt_blob(f, pt1.chain_index, pt_data, scale=pt1.scale)
    for name, ct in (("ct1", ct1), ("ct2", ct2)):
        with open(os.path.join(OUT, f"{name}.bin"), "wb") as f:
            write_ct_blob(f, ct.chain_index, np.asarray(ct.data),
                          scale=ct.scale,
                          correction_factor=ct.correction_factor,
                          noise_scale_deg=ct.noise_scale_deg,
                          is_ntt_form=ct.is_ntt_form, is_asymmetric=True)
    with open(os.path.join(OUT, "ct_sym_seeded.bin"), "wb") as f:
        write_ct_blob(f, ct_sym.chain_index, np.asarray(ct_sym.data),
                      scale=ct_sym.scale,
                      correction_factor=ct_sym.correction_factor,
                      noise_scale_deg=ct_sym.noise_scale_deg,
                      is_ntt_form=ct_sym.is_ntt_form, is_asymmetric=False,
                      c0_only=True, seed=seed)

    meta = {
        "n": n,
        "coeff_modulus": [int(q) for q in qs + ps],
        "plain_modulus": int(t),
        "special_modulus_size": 1,
        "vals1": [int(v) for v in vals1],
        "vals2": [int(v) for v in vals2],
        "seed_hex": seed.hex(),
    }
    with open(os.path.join(OUT, "expected.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
