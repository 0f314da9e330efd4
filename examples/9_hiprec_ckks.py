"""High-precision CKKS on the uint32 fast path: paired-prime rescaling.

The reference reaches high CKKS precision with up to 60-bit primes
(f64/u64 hardware words).  The TPU fast path keeps every residue a
single uint32 (q < 2^30) and gets the same precision a different way:
the working scale is ~2^44 and each multiplication rescales by a PAIR of
~22-bit primes (two chain levels per multiplicative level).  Precision
is set by the scale, not the word size — no f64, no u64, no change to
any kernel.

Self-checks x^2 at scale 2^44 to ~1e-6 absolute error, four orders
tighter than the 2^27-scale demos (examples/7_fast_path.py), using only
the Fast32 u32 pipelines.
"""

import os

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from phantom_tpu import Fast32  # noqa: E402
from phantom_tpu.host import numth  # noqa: E402
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,  # noqa: E402
                                 Scheme, keys, make_context)


def hiprec_demo(n=8192):
    print(f"[hiprec] CKKS n={n}, scale 2^44 on uint32 residues "
          "(paired 22-bit rescale primes)")
    # budget: the product before each double-rescale sits at scale 2^88,
    # so the data modulus must stay >= 88 + q0 bits at every mult level:
    # q0 + 6x22 = 160 -> 116 -> 72 bits across the two levels
    qs28 = numth.get_primes(2 * n, 28, 3)   # q0 + the two special primes
    rs = numth.get_primes(2 * n, 22, 6)     # three pairs
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs28[:1] + rs + qs28[1:], special_modulus_size=2)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(9), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    scale = float(2.0 ** 44)

    ev = Fast32(ctx, rlk=rlk)
    rg = np.random.default_rng(1)
    x = rg.uniform(-1.0, 1.0, enc.slots)
    c = ev.encrypt_asymmetric(pk, enc.encode(x, scale), k[3])

    # one multiplicative level = two chain levels: scale 2^88 -> /r4 -> /r3
    c = ev.multiply_and_relin(c, c)
    c = ev.rescale_to_next(ev.rescale_to_next(c))
    got = enc.decode(ev.decrypt(sk, c)).real
    err = float(np.max(np.abs(got - x ** 2)))
    assert err < 1e-6, f"x^2 at scale 2^44: err {err}"
    print(f"  x^2 @ 2^44, double rescale: ok (max err {err:.2e})")

    # second level: x^4 with the remaining pair
    c = ev.multiply_and_relin(c, c)
    c = ev.rescale_to_next(ev.rescale_to_next(c))
    got = enc.decode(ev.decrypt(sk, c)).real
    err4 = float(np.max(np.abs(got - x ** 4)))
    assert err4 < 1e-5, f"x^4 at scale ~2^44: err {err4}"
    print(f"  x^4 @ ~2^44, second paired rescale: ok (max err {err4:.2e})")


def hiprec54_demo(n=8192):
    """The bench.py --hiprec construction: 27-bit pairs, scale 2^54
    (the n=2^16 prime pool has no 22-bit NTT-friendly primes, so the
    capability-scale high-precision chain pairs 27-bit primes)."""
    print(f"[hiprec54] CKKS n={n}, scale 2^54 (paired 27-bit primes)")
    q0 = numth.get_primes(2 * n, 28, 1)
    rs = numth.get_primes(2 * n, 27, 4)     # two pairs
    ps = numth.get_primes(2 * n, 29, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, q0 + rs + ps, special_modulus_size=2)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(11), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    scale = float(2.0 ** 54)
    ev = Fast32(ctx, rlk=rlk)
    rg = np.random.default_rng(3)
    x = rg.uniform(-1.0, 1.0, enc.slots)
    c = ev.encrypt_asymmetric(pk, enc.encode(x, scale), k[3])
    c = ev.multiply_and_relin(c, c)
    c = ev.rescale_to_next(ev.rescale_to_next(c))
    got = enc.decode(ev.decrypt(sk, c)).real
    err = float(np.max(np.abs(got - x ** 2)))
    assert err < 1e-9, f"x^2 at scale 2^54: err {err}"
    print(f"  x^2 @ 2^54, double 27-bit rescale: ok (max err {err:.2e})")


if __name__ == "__main__":
    hiprec_demo(8192)
    hiprec54_demo(8192)
    print("all high-precision examples passed")
