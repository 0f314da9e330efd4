"""Interleaved A/B of CKKS step-structure variants in ONE process.

Run-to-run drift on the axon tunnel is ±30% (CLAUDE.md), so separate
step_probe runs cannot rank 3-10% structural changes.  This probe builds
one chained jit per variant and alternates dispatches round-robin, each
variant chaining through its own carry (dispatch-cache-safe), so every
variant sees the same thermal/tunnel conditions.

    python benchmarks/variant_ab.py --limbs 43 --alpha 22 --k 25 --reps 4
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--limbs", type=int, default=43)
    ap.add_argument("--alpha", type=int, default=22)
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--variants", default="kernel,xla,xla-split",
                    help="comma list of MODUP_VARIANT values to compare "
                         "(moddown pairs with it: kernel->kernel, else "
                         "xla); an entry 'MU:MD' sets the pair explicitly")
    args = ap.parse_args()

    os.environ.setdefault("PHANTOM_VMEM_LIMIT", str(48 << 20))
    os.environ.setdefault("PHANTOM_MODUP_IP_MB", "14")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/phantom_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from phantom_tpu.ops import modmath32 as m32
    from phantom_tpu.ops import ntt_mxu
    from phantom_tpu.ops import pipeline32 as pp
    from phantom_tpu.utils.benchsetup import setup_bench

    L = args.limbs
    s = setup_bench(scheme="ckks", n=args.n, limbs=L, alpha=args.alpha)
    ctx, rlk = s.ctx, s.rlk
    K = args.k

    d0 = jnp.asarray(np.asarray(s.ct1.data).astype(np.uint32))
    e0 = jnp.asarray(np.asarray(s.ct2.data).astype(np.uint32))

    runners = {}
    for v in args.variants.split(","):
        parts = v.split(":")
        if len(parts) >= 2:
            pp.MODUP_VARIANT = parts[0]
            pp.MODDOWN_VARIANT = parts[1]
        else:
            pp.MODUP_VARIANT = v
            pp.MODDOWN_VARIANT = "kernel" if v == "kernel" else "xla"
        if len(parts) >= 3:   # "merged" | "pair" (moddown+rescale fusion)
            os.environ["PHANTOM_MERGED_EPILOGUE"] = (
                "1" if parts[2] == "merged" else "0")
        if len(parts) >= 4:   # kernel knobs: dot mode / fold strategy
            from phantom_tpu.ops import ntt_mxu_pallas as _nmp
            for tok in parts[3].split("+"):
                if tok in ("int8", "bf16"):
                    _nmp.DOT_MODE = tok
                elif tok == "nopair":
                    os.environ["PHANTOM_PAIR_FOLD"] = "0"
                elif tok == "pairfold":
                    os.environ["PHANTOM_PAIR_FOLD"] = "1"
                elif tok == "nolazy":
                    os.environ["PHANTOM_LAZY_FOLD"] = "0"
                elif tok == "lazy":
                    os.environ.pop("PHANTOM_LAZY_FOLD", None)
        pipe = pp.build_pipeline32(ctx, rlk, use_pallas="mxu-pallas")
        t_ = pipe.ks.t_ql
        blk = isinstance(t_, ntt_mxu.MXUNTTTables) and t_.fused_kernel
        d = d0.reshape(*d0.shape[:-1], t_.n1, t_.n2) if blk else d0
        e = e0.reshape(*e0.shape[:-1], t_.n1, t_.n2) if blk else e0
        ks = pipe.ks
        qlast = ks.mv_ql.q[L - 1]
        rh_last = ks.mv_ql.ratio_hi[L - 1]

        def make(pipe=pipe, ks=ks, qlast=qlast, rh_last=rh_last):
            def remix(out, a, b):
                ax = -3 if a.ndim >= 3 and a.shape[-3] == L else -2
                row0 = jax.lax.slice_in_dim(out, 0, 1, axis=ax)
                pad = m32.barrett_reduce_u32(row0, qlast, rh_last)
                full = jnp.concatenate([out, pad], axis=ax)
                q = ks.mv_ql.q.reshape((-1,) + (1,) * (-ax - 1))
                return m32.add_mod32(a, full, q), b

            @jax.jit
            def chained(p_, a0, b0):
                def body(i, c):
                    a, b = c
                    out = pp.mult_relin_rescale32(p_, a, b)
                    return remix(out, a, b)
                return jax.lax.fori_loop(0, K, body, (a0, b0))

            return chained

        # trace+compile NOW, while the module variant flags still hold
        # this variant's values (they are consulted at trace time)
        np.asarray(jnp.arange(8).sum())   # honest mode (CLAUDE.md)
        fn = make()
        t0 = time.time()
        a, b = fn(pipe, d, e)
        jax.block_until_ready(a)
        print(f"# {v}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        runners[v] = [fn, pipe, a, b]

    times = {v: [] for v in runners}
    for _ in range(args.reps):
        for v, r in runners.items():
            t0 = time.time()
            a, b = r[0](r[1], r[2], r[3])
            jax.block_until_ready(a)
            times[v].append((time.time() - t0) / K)
            r[2], r[3] = a, b

    rec = {"n": args.n, "L": L, "alpha": args.alpha, "k": K,
           "per_op_ms": {v: round(float(np.median(t)) * 1e3, 3)
                         for v, t in times.items()},
           "ops_s": {v: round(1.0 / float(np.median(t)), 1)
                     for v, t in times.items()}}
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
