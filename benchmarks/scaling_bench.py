"""Multi-chip scaling benchmark for the coefficient-sharded pipeline.

For each mesh width d in --devices, shards the CKKS mult+relin+rescale
step's coefficient axis over d devices, then reports:

- the collective profile of the compiled program (all-to-all /
  all-gather / all-reduce / collective-permute counts from the HLO) —
  the design target is all-to-all-only at NTT phase boundaries
  (parallel/sharded32.py; reference analogue: the shared-memory phase
  exchange in fntt_2d.cu:9-99 becomes the ICI collective);
- per-step wall time on the current backend.  On the CPU virtual mesh
  the time column is *indicative only* (collectives are memcpys, not
  ICI); the collective profile is the portable signal.

CSV: devices,engine,step_ms,all_to_all,all_gather,all_reduce,cperm

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 with
PHANTOM_PLATFORM=cpu for the virtual mesh, or bare on a real slice.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=13)
    ap.add_argument("--limbs", type=int, default=8)
    ap.add_argument("--alpha", type=int, default=2)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--engine", choices=["xla", "mxu"], default="xla")
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    if os.environ.get("PHANTOM_PLATFORM") == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        want = max(args.devices)
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={want}")
    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from phantom_tpu.host import numth
    from phantom_tpu.parallel import make_coeff_mesh
    from phantom_tpu.parallel import sharded32 as s32
    from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                     Scheme, keys, make_context)

    n = 1 << args.logn
    qs = numth.get_primes(2 * n, 28, args.limbs)
    ps = numth.get_primes(2 * n, 29, args.alpha)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=args.alpha)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    pt = enc.encode(z, 2.0 ** 22)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k[4])

    print("devices,engine,step_ms,all_to_all,all_gather,all_reduce,cperm")
    n_avail = jax.device_count()
    for d in args.devices:
        if d > n_avail:
            print(f"# skipping d={d}: only {n_avail} devices", file=sys.stderr)
            continue
        mesh = make_coeff_mesh(d, dp=1)
        consts = s32.build_sharded32(ctx, rlk, engine=args.engine)
        n1, n2 = consts.n1, consts.n2
        if n2 % d:
            print(f"# skipping d={d}: n2={n2} not divisible", file=sys.stderr)
            continue
        sh = NamedSharding(mesh, P(None, None, None, "coeff"))
        fn = jax.jit(lambda c, a, b, m=mesh: s32.sharded_mult_relin_rescale32(
            c, m, a, b),
            in_shardings=(NamedSharding(mesh, P()), sh, sh),
            out_shardings=sh)
        d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32)
                         ).reshape(2, -1, n1, n2)
        d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32)
                         ).reshape(2, -1, n1, n2)
        compiled = fn.lower(consts, d1, d2).compile()
        hlo = compiled.as_text()
        # Count opcode call sites: in HLO text every instruction reads
        # "%name = type opcode(operands)", so " opcode(" counts instances
        # without conflating all-gather with all-gather-start (async pair
        # halves are counted via their -start form separately below).
        counts = {name: hlo.count(f" {name}(") + hlo.count(f" {name}-start(")
                  for name in ("all-to-all", "all-gather", "all-reduce",
                               "collective-permute")}
        out = fn(consts, d1, d2)
        out.block_until_ready()
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            out = fn(consts, d1, d2)
            out.block_until_ready()
            times.append(time.time() - t0)
        ms = float(np.median(times)) * 1e3
        print(f"{d},{args.engine},{ms:.2f},{counts['all-to-all']},"
              f"{counts['all-gather']},{counts['all-reduce']},"
              f"{counts['collective-permute']}")


if __name__ == "__main__":
    main()
