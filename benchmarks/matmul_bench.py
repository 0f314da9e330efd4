"""Modular GEMM ladder (reference: benchmark/matmul_bench.cu:215-545 —
naive -> tiled -> vectorized uint64 mod-q GEMM v00-v04).

TPU ladder: v0 = u64-emulated scan accumulate, v1 = int8-decomposed MXU
matmul (ops/bconv.py)."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--trials", type=int, default=20)
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from phantom_tpu.ops import bconv as bc
    from phantom_tpu.utils.timer import OpTimer, print_timer_banner

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 1 << 61, (args.k, args.n)).astype(np.uint64))
    mat = jnp.asarray(rng.integers(0, 1 << 61, (args.k, args.k)).astype(np.uint64))
    macs = args.k * args.k * args.n

    print_timer_banner()
    v0 = jax.jit(lambda a, b: bc.accumulate_matmul_128(a, b))
    t = OpTimer("modgemm_v0_scan", trials=args.trials)
    t.run(v0, y, mat)
    t.print_csv()
    print(f"#   -> {macs / (t.median_us * 1e-6) / 1e9:.2f} G MAC128/s",
          file=sys.stderr)

    v1 = jax.jit(lambda a, b: bc.accumulate_matmul_128_mxu(a, b))
    t = OpTimer("modgemm_v1_mxu_int8", trials=args.trials)
    t.run(v1, y, mat)
    t.print_csv()
    print(f"#   -> {macs / (t.median_us * 1e-6) / 1e9:.2f} G MAC128/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
