"""Round-4 headline-step probe: CHAINED per-op time of the full CKKS
mult+relin+rescale on hardware.

Three methodologies side by side (interleaved in ONE process, honest mode
forced by an upfront D2H pull — CLAUDE.md axon rules):

  chained   K steps inside one jit via lax.fori_loop, each iteration's
            input derived from the previous output (limb re-pad + add_mod)
            — a genuine data dependency, immune to dispatch caching.  This
            is the methodology bench.py's headline uses from round 4 on.
  pydep     K top-level dispatches, each fed the previous output (data
            dependency at the Python level; measures per-dispatch overhead
            on top of device time).
  repeat    K dispatches of the SAME inputs, one trailing sync (round-3
            bench.py's probe — kept only to quantify how wrong it was).

    python benchmarks/step_probe.py --limbs 28 --alpha 14 [--batch 8]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--limbs", type=int, default=28)
    ap.add_argument("--alpha", type=int, default=14)
    ap.add_argument("--k", type=int, default=10, help="chained steps/dispatch")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--path", default="mxu-pallas",
                    choices=["mxu-pallas", "mxu", "u32"])
    ap.add_argument("--methods", default="chained,pydep,repeat")
    args = ap.parse_args()

    # chained fori_loop + 100 MiB scoped vmem overflows the 128 MiB
    # alternate-memory cap (SIGABRT in XLA memory assignment)
    os.environ.setdefault("PHANTOM_VMEM_LIMIT", str(64 << 20))
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
    from phantom_tpu.ops import pipeline32 as pp
    from phantom_tpu.utils.benchsetup import setup_bench

    n, L, alpha = args.n, args.limbs, args.alpha
    s = setup_bench(scheme="ckks", n=n, limbs=L, alpha=alpha)
    ctx, rlk = s.ctx, s.rlk

    use_pallas = {"mxu-pallas": "mxu-pallas", "mxu": "mxu",
                  "u32": False}[args.path]
    pipe = pp.build_pipeline32(ctx, rlk, use_pallas=use_pallas)
    d = jnp.asarray(np.asarray(s.ct1.data).astype(np.uint32))
    d2_ = jnp.asarray(np.asarray(s.ct2.data).astype(np.uint32))
    from phantom_tpu.ops import ntt_mxu as _nm
    if isinstance(pipe.ks.t_ql, _nm.MXUNTTTables) \
            and pipe.ks.t_ql.fused_kernel:
        # blocked carry: no flat<->blocked relayout inside the chain
        t_ = pipe.ks.t_ql
        d = d.reshape(*d.shape[:-1], t_.n1, t_.n2)
        d2_ = d2_.reshape(*d2_.shape[:-1], t_.n1, t_.n2)
    if args.batch > 1:
        d = jnp.broadcast_to(d[None], (args.batch,) + d.shape)
        d2_ = jnp.broadcast_to(d2_[None], (args.batch,) + d2_.shape)

    ks = pipe.ks
    qlast = ks.mv_ql.q[L - 1]
    rh_last = ks.mv_ql.ratio_hi[L - 1]

    def step(p, d1, d2):
        if args.batch > 1:
            return jax.vmap(pp.mult_relin_rescale32,
                            in_axes=(None, 0, 0))(p, d1, d2)
        return pp.mult_relin_rescale32(p, d1, d2)

    def remix(p, out, d1, d2):
        """Rebuild full-L canonical ciphertexts from the (L-1)-limb step
        output: re-pad the dropped limb (row 0 reduced mod q_last) and fold
        into the previous inputs — a real data dependency, canonical
        ranges preserved.  Limb axis is -3 for blocked carries."""
        ax = -3 if d1.ndim >= 3 and d1.shape[-3] == L else -2
        row0 = jax.lax.slice_in_dim(out, 0, 1, axis=ax)
        pad = m32.barrett_reduce_u32(row0, qlast, rh_last)
        full = jnp.concatenate([out, pad], axis=ax)
        q = ks.mv_ql.q.reshape((-1,) + (1,) * (-ax - 1))
        nd1 = m32.add_mod32(d1, full, q)
        nd2 = m32.add_mod32(d2, full, q)
        return nd1, nd2

    K = args.k

    @jax.jit
    def chained(p, d1, d2):
        def body(i, c):
            a, b = c
            out = step(p, a, b)
            return remix(p, out, a, b)
        return jax.lax.fori_loop(0, K, body, (d1, d2))[0]

    step_jit = jax.jit(step)

    @jax.jit
    def remix_jit(p, out, d1, d2):
        return remix(p, out, d1, d2)

    # force honest timing mode before ANY measurement (CLAUDE.md)
    np.asarray(jnp.arange(8).sum())

    results = {}
    methods = args.methods.split(",")
    denom = K * args.batch

    if "chained" in methods:
        t0 = time.time()
        out = chained(pipe, d, d2_)
        out.block_until_ready()
        print(f"# chained compile+first {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = chained(pipe, d, d2_)
            out.block_until_ready()
            ts.append((time.time() - t0) / denom)
        results["chained"] = float(np.median(ts))
        print(f"chained  per-op {results['chained']*1e3:8.2f} ms  "
              f"({1.0/results['chained']:.1f} ops/s)", flush=True)

    if "pydep" in methods:
        d1, d2 = d, d2_
        out = step_jit(pipe, d1, d2)
        out.block_until_ready()
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            d1, d2 = d, d2_
            for _ in range(K):
                out = step_jit(pipe, d1, d2)
                d1, d2 = remix_jit(pipe, out, d1, d2)
            d1.block_until_ready()
            ts.append((time.time() - t0) / denom)
        results["pydep"] = float(np.median(ts))
        print(f"pydep    per-op {results['pydep']*1e3:8.2f} ms  "
              f"({1.0/results['pydep']:.1f} ops/s)", flush=True)

    if "repeat" in methods:
        out = step_jit(pipe, d, d2_)
        out.block_until_ready()
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            for _ in range(K):
                out = step_jit(pipe, d, d2_)
            out.block_until_ready()
            ts.append((time.time() - t0) / denom)
        results["repeat"] = float(np.median(ts))
        print(f"repeat   per-op {results['repeat']*1e3:8.2f} ms  "
              f"({1.0/results['repeat']:.1f} ops/s)", flush=True)

    rec = {"n": n, "L": L, "alpha": alpha, "batch": args.batch,
           "path": args.path, "k": K,
           "per_op_ms": {k: round(v * 1e3, 3) for k, v in results.items()},
           "ops_s": {k: round(1.0 / v, 1) for k, v in results.items()}}
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
