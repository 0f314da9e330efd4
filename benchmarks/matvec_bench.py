"""Encrypted matvec latency: rotation-schedule comparison.

Times the Halevi-Shoup diagonal matvec (schemes/linear.py) under three
schedules of the SAME code path — bs=1 (per-diagonal keyswitched
rotations, the naive method), bs=d (pure hoisting: one modup, d-1 evk
inner products, one moddown), and bs=sqrt(d) (BSGS) — so the schedule is
the only variable.  Reference building blocks: hoisting_inplace
(/root/reference/src/evaluate.cu:1670-1865) + multiply_plain; the
reference ships no matvec layer, so there is no reference row to match —
this bench motivates the BSGS default.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--limbs", type=int, default=6)
    ap.add_argument("--alpha", type=int, default=2)
    ap.add_argument("--d", type=int, default=32,
                    help="matrix dimension (must divide the slot count)")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--path",
                    choices=["u64", "u32", "pallas", "pallas-roll", "mxu"],
                    default="u32")
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from phantom_tpu import Fast32
    from phantom_tpu.host import numth
    from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                     LinearTransform, Scheme, keys,
                                     make_context)
    from phantom_tpu.utils.timer import OpTimer, print_timer_banner

    n = 1 << args.logn
    d = args.d
    if args.path == "u64":
        qs = numth.get_primes(2 * n, 50, args.limbs)
        ps = numth.get_primes(2 * n, 60, args.alpha)
        scale = 2.0 ** 40
    else:
        qs = numth.get_primes(2 * n, 28, args.limbs)
        ps = numth.get_primes(2 * n, 29, args.alpha)
        scale = 2.0 ** 26
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=args.alpha)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    enc = CKKSEncoder(ctx)

    rg = np.random.default_rng(0)
    M = rg.standard_normal((d, d)) * 0.3
    x = rg.standard_normal(d) * 0.3

    schedules = {"naive": 1, "hoisted": d, "bsgs": None}
    lts = {name: LinearTransform(M, bs=bs) for name, bs in schedules.items()}
    steps = sorted(set().union(*(lt.steps_required()
                                 for lt in lts.values())))
    glk = keys.create_galois_keys(ctx, sk, k[2], steps=steps)
    for lt in lts.values():
        lt.prepare(enc, scale)
    ct = keys.encrypt_asymmetric(ctx, pk,
                                 lts["bsgs"].encode_input(enc, x, scale),
                                 k[3])

    if args.path == "u64":
        def run(lt, c):
            return lt.apply(ctx, c, glk)

        def to_ct(out):
            return out
        ct_in = ct
    else:
        use_pallas = args.path if args.path != "u32" else False
        ev = Fast32(ctx, glk=glk, use_pallas=use_pallas)
        ct_in = ev.from_ciphertext(ct)
        for lt in lts.values():   # warm the u32 plaintext caches
            lt.apply_fast32(ev, ct_in)

        def run(lt, c):
            return lt.apply_fast32(ev, c)

        def to_ct(out):
            return ev.to_ciphertext(out)

    print(f"# matvec d={d}, n={n}, L={args.limbs}, alpha={args.alpha}, "
          f"path={args.path}")
    print_timer_banner()
    out = None
    for name, lt in lts.items():
        t = OpTimer(f"matvec_{name}_bs{lt.bs}_gs{lt.gs}",
                    trials=args.trials)
        out = t.run(run, lt, ct_in)
        t.print_csv()
        # every schedule computes the same transform; self-check each
        y = enc.decode(keys.decrypt(ctx, sk, to_ct(out))).real[:d]
        err = float(np.max(np.abs(y - M @ x)))
        assert err < 1e-2, f"{name} schedule wrong (max err {err})"
    print("# self-check: all schedules match the plaintext matvec")


if __name__ == "__main__":
    main()
