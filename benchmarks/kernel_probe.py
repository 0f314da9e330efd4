"""Amortized per-kernel timing of the fused Pallas programs on hardware.

Times K dispatches with ONE final sync (the per-dispatch tunnel round trip
of OpTimer-style sync-per-trial hides everything below ~15 ms), reporting
us/row for the transform kernels — the number PERF_MODEL §2 brackets.

    python benchmarks/kernel_probe.py --logn 16 --limbs 28 [--dot bf16]
"""

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--limbs", type=int, default=28)
    ap.add_argument("--dispatches", type=int, default=20)
    ap.add_argument("--dot", choices=["int8", "bf16"], default=None)
    ap.add_argument("--plane-bits", type=int, default=None)
    args = ap.parse_args()
    if args.dot:
        os.environ["PHANTOM_DOT_MODE"] = args.dot

    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/phantom_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from phantom_tpu.host import numth
    from phantom_tpu.host.modulus import Modulus
    from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
    from phantom_tpu.ops import ntt as ntt64
    from phantom_tpu.ops import ntt32, ntt_mxu
    from phantom_tpu.ops import ntt_mxu_pallas as nmp
    if args.plane_bits:
        ntt_mxu.PLANE_BITS = args.plane_bits

    n = 1 << args.logn
    L = args.limbs
    rng = np.random.default_rng(3)
    qs = numth.get_primes(2 * n, 28, L)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    t32 = ntt32.tables32_from_tables64(t64)
    tf = ntt_mxu.prepare_mxu_tables(t32, fused_kernel=True)
    tx = ntt_mxu.prepare_mxu_tables(t32)  # plane stacks for the XLA engine
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, n, dtype=np.uint32) for q in qs]))

    def timeit(name, fn, rows, aux=None, reps=3):
        # ONE dispatch, K chained executions on-device (per-dispatch tunnel
        # overhead amortizes away and XLA cannot elide the chain).  Tables
        # MUST travel as jit arguments: a closed-over table constant costs
        # ~1.2 ms per pallas launch (XLA re-materializes large constants
        # at the custom-call boundary; measured v5e 2026-08-19), which
        # poisoned every earlier version of this probe.
        K = args.dispatches

        @jax.jit
        def loop(v, a):
            return jax.lax.fori_loop(0, K, lambda i, u: fn(u, a), v)

        out = loop(x, aux)
        out.block_until_ready()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = loop(x, aux)
            out.block_until_ready()
            ts.append((time.time() - t0) / K)
        dt = float(np.median(ts))
        print(f"{name:24s} {dt*1e6:8.0f} us  -> {dt*1e6/rows:7.2f} us/row"
              f"  ({rows} rows)", flush=True)
        return dt

    print(f"# backend={jax.default_backend()} dot="
          f"{os.environ.get('PHANTOM_DOT_MODE', 'int8')} n={n} L={L}",
          flush=True)
    timeit("mxu-pallas fwd",
           lambda v, t: nmp.ntt_forward_mxu_pallas(v, t), L, tf)
    timeit("mxu-pallas inv",
           lambda v, t: nmp.ntt_inverse_mxu_pallas(v, t), L, tf)
    timeit("mxu (xla) fwd", lambda v, t: ntt_mxu.ntt_forward_mxu(v, t), L, tx)
    timeit("u32 butterfly fwd", lambda v, t: ntt32.ntt_forward32(v, t), L,
           t32)

    from phantom_tpu.ops import ntt_pallas_roll as ntr
    tr = ntr.prepare_roll_tables(t32)
    try:
        timeit("pallas roll fwd",
               lambda v, t: ntr.ntt_forward_roll(v, t), L, tr)
        timeit("pallas roll inv",
               lambda v, t: ntr.ntt_inverse_roll(v, t), L, tr)
    except Exception as e:
        print(f"pallas roll failed: {e}"[:300], flush=True)

    # the modup+IP mega-kernel at pipeline-like geometry: alpha=4 digits
    alpha = 4
    beta = L // alpha
    k_out = L + alpha
    qs2 = numth.get_primes(2 * n, 28, k_out)
    t64b = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs2]))
    tfb = ntt_mxu.prepare_mxu_tables(
        ntt32.tables32_from_tables64(t64b), fused_kernel=True)
    y = jnp.asarray(np.stack(
        [rng.integers(0, qs2[i % L], n, dtype=np.uint32)
         for i in range(beta * alpha)]))
    mats = jnp.asarray(
        rng.integers(0, 1 << 28, (beta, k_out, alpha)).astype(np.uint32))
    c2 = jnp.asarray(np.stack(
        [rng.integers(0, qs2[i], n, dtype=np.uint32) for i in range(L)]))
    evk = jnp.asarray(np.stack(
        [rng.integers(0, qs2[j], (beta, 2, n), dtype=np.uint32)
         for j in range(k_out)], axis=2).astype(np.uint32))

    def mega(v, a):
        t, m, c, e = a
        s0, s1 = nmp.modup_ip_mxu_pallas(v, m, c, e, t)
        return s0[:beta * alpha]  # feed back same shape

    x = y  # the chained carry for the keyswitch-shaped probes
    timeit("modup+IP mega", mega, beta * k_out, (tfb, mats, c2, evk))

    # fwd at bconv-kernel geometry: G=beta groups of alpha rows each
    timeit("bconv+fwd (beta groups)",
           lambda v, a: nmp.bconv_ntt_forward_mxu_pallas(
               v.reshape(beta, alpha, n), a[1], a[0]).reshape(
                   beta * k_out, n)[:beta * alpha],
           beta * k_out, (tfb, mats))


if __name__ == "__main__":
    main()
