"""Fast hardware smoke test for the Pallas kernels: every mxu-pallas
program (forward/inverse NTT, fused epilogues, bconv prologue, modup+IP
mega-kernel) compiled through Mosaic on the real accelerator and
bit-matched against the XLA MXU engine computed on the in-process CPU
backend.  Unlike tests/test_tpu_hw.py this never touches the u64
evaluator, so it runs in ~a minute — the first thing to run in any new
hardware window (ROUND2_NOTES "first hour" playbook step 2).

    python benchmarks/hw_smoke.py [--logn 12] [--limbs 6] [--alpha 2]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--limbs", type=int, default=6, help="Ql limbs")
    ap.add_argument("--alpha", type=int, default=2, help="special limbs")
    args = ap.parse_args()

    from phantom_tpu.host import numth
    from phantom_tpu.host.modulus import Modulus
    from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
    from phantom_tpu.ops import ntt as ntt64
    from phantom_tpu.ops import ntt32, ntt_mxu
    from phantom_tpu.ops import ntt_mxu_pallas as nmp
    from phantom_tpu.ops.modmath32 import compute_shoup32

    backend = jax.default_backend()
    print(f"backend: {backend} devices: {jax.devices()}")
    on_accel = backend != "cpu"
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(5)

    n = 1 << args.logn
    k = args.limbs
    alpha = args.alpha
    beta = k // alpha
    assert k % alpha == 0
    k_out = k + alpha

    qs = numth.get_primes(2 * n, 28, k_out)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    t32 = ntt32.tables32_from_tables64(t64)

    def run(name, fn_ref, fn_hw):
        t0 = time.time()
        with jax.default_device(cpu):
            ref = np.asarray(fn_ref())
        t1 = time.time()
        got = np.asarray(fn_hw())
        t2 = time.time()
        ok = np.array_equal(ref, got)
        print(f"{name:28s} {'OK ' if ok else 'FAIL'}  "
              f"ref {t1-t0:5.1f}s  hw {t2-t1:5.1f}s")
        if not ok:
            bad = np.argwhere(ref != got)
            print(f"  first mismatch at {bad[0]}: ref={ref[tuple(bad[0])]} "
                  f"got={got[tuple(bad[0])]}  ({len(bad)} total)")
        return ok

    all_ok = True
    with jax.default_device(cpu):
        tm = ntt_mxu.prepare_mxu_tables(t32)
    # tables for the accelerator: int8 planes when on TPU
    tf = ntt_mxu.prepare_mxu_tables(t32, fused_kernel=True)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in qs])
    xj = jnp.asarray(x)

    all_ok &= run(
        "fwd ntt",
        lambda: ntt_mxu.ntt_forward_mxu(jnp.asarray(x), tm),
        lambda: nmp.ntt_forward_mxu_pallas(xj, tf, interpret=False))
    all_ok &= run(
        "inv ntt (fused scale)",
        lambda: ntt_mxu.ntt_inverse_mxu(jnp.asarray(x), tm),
        lambda: nmp.ntt_inverse_mxu_pallas(xj, tf, interpret=False))

    sub = np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in qs])
    sc = np.array([rng.integers(1, q) for q in qs], dtype=np.uint32)
    scs = np.array([compute_shoup32(int(s), q) for s, q in zip(sc, qs)],
                   dtype=np.uint32)
    all_ok &= run(
        "fwd ntt + moddown epilogue",
        lambda: ntt_mxu.ntt_forward_mxu(
            jnp.asarray(x), tm, sub_from=jnp.asarray(sub), epi_scale=sc,
            epi_scale_shoup=scs),
        lambda: nmp.ntt_forward_mxu_pallas(
            xj, tf, sub_from=jnp.asarray(sub), epi_scale=jnp.asarray(sc),
            epi_scale_shoup=jnp.asarray(scs), interpret=False))

    # bconv prologue: G=beta groups of alpha rows -> k_out limbs each
    from phantom_tpu.ops import bconv32 as bc32
    y = np.stack([rng.integers(0, qs[(i // alpha) * alpha + i % alpha],
                               n, dtype=np.uint32)
                  for i in range(beta * alpha)]).reshape(beta, alpha, n)
    mat = rng.integers(0, 1 << 28, (beta, k_out, alpha)).astype(np.uint32)

    def bconv_ref():
        out = []
        for g in range(beta):
            cc, hh, ll = bc32.accumulate_matmul_96(jnp.asarray(y[g]),
                                                   jnp.asarray(mat[g]))
            xg = bc32.reduce_u96_any32(cc, hh, ll, tm.mv)
            out.append(ntt_mxu.ntt_forward_mxu(xg, tm))
        return jnp.stack(out)

    all_ok &= run(
        "bconv prologue + fwd ntt",
        bconv_ref,
        lambda: nmp.bconv_ntt_forward_mxu_pallas(
            jnp.asarray(y), jnp.asarray(mat), tf, interpret=False))

    # modup + inner product mega-kernel
    c2 = np.stack([rng.integers(0, qs[i], n, dtype=np.uint32)
                   for i in range(k)])
    evk = np.stack([rng.integers(0, qs[j], (beta, 2, n), dtype=np.uint32)
                    for j in range(k_out)], axis=2).astype(np.uint32)
    yk = y.reshape(beta * alpha, n)

    def modup_ip_ref():
        t_all = []
        for d in range(beta):
            cc, hh, ll = bc32.accumulate_matmul_96(
                jnp.asarray(yk[d * alpha:(d + 1) * alpha]),
                jnp.asarray(mat[d]))
            xg = bc32.reduce_u96_any32(cc, hh, ll, tm.mv)
            td = ntt_mxu.ntt_forward_mxu(xg, tm)
            lo, hi_ = d * alpha, (d + 1) * alpha
            row = jnp.arange(k_out)
            own = (row >= lo) & (row < hi_)
            c2row = jnp.asarray(c2)[jnp.clip(row, 0, k - 1)]
            td = jnp.where(own[:, None], c2row, td)
            t_all.append(td)
        t_all = jnp.stack(t_all)
        from phantom_tpu.ops import modmath32 as m32
        acc = [[jnp.zeros((k_out, n), jnp.uint32) for _ in range(3)]
               for _ in range(2)]
        for d in range(beta):
            for h in range(2):
                c_, hi2, lo2 = acc[h]
                hw, lw = m32.mul_wide32(t_all[d], jnp.asarray(evk)[d, h])
                lo2, cr = m32.add_u32_carry(lo2, lw)
                hi3, cr2 = m32.add_u32_carry(hi2, hw + cr)
                acc[h] = [c_ + cr2, hi3, lo2]
        return jnp.stack([bc32.reduce_u96_any32(*a, tm.mv) for a in acc])

    def modup_ip_hw():
        s0, s1 = nmp.modup_ip_mxu_pallas(
            jnp.asarray(yk), jnp.asarray(mat), jnp.asarray(c2),
            jnp.asarray(evk), tf, interpret=False)
        return jnp.stack([s0, s1])

    all_ok &= run("modup+IP mega-kernel", modup_ip_ref, modup_ip_hw)

    print("ALL OK" if all_ok else "FAILURES", flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
