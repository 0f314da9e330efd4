"""Per-op hardware latency table over the reference's benchmark op set.

Mirrors benchmark/{ckks,bfv,bgv}_bench.cu (keygen/encode/encrypt/decrypt/
add/mul+relin/mul_plain/rotate/rescale/hoisting) at the headline config,
with round-4 measurement discipline (CLAUDE.md axon rules):

  * device verbs are timed CHAINED — K steps in one lax.fori_loop whose
    carry feeds each iteration from the previous output (the op's own
    output wherever it is shape-compatible; a one-row limb re-pad where a
    level was dropped), so the dispatch cache cannot serve repeats;
  * host/hybrid verbs (keygen, encode, decode, encrypt) get VARIED inputs
    per trial (fresh rng keys / values) with a sync per trial.

Emits the reference CSV contract (op,trials,median,mean in us) on stdout
plus one JSON record written to --out (merged into BENCH_OPS_r04.json).

    python benchmarks/op_table.py --scheme ckks [--out BENCH_OPS_r04.json]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", choices=["ckks", "bfv", "bgv"],
                    default="ckks")
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--limbs", type=int, default=28)
    ap.add_argument("--alpha", type=int, default=14)
    ap.add_argument("--k", type=int, default=None,
                    help="override the per-op chain length (default: a "
                         "per-op table sized so the ~15-26 ms dispatch "
                         "RTT stays well under 10% of each number)")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--path", default="mxu-pallas",
                    choices=["mxu-pallas", "mxu", "u32"])
    ap.add_argument("--multech", default="hps")
    ap.add_argument("--out", default=None)
    ap.add_argument("--ops", default=None,
                    help="comma list to restrict (e.g. add,rotate)")
    args = ap.parse_args()

    os.environ.setdefault("PHANTOM_VMEM_LIMIT", str(64 << 20))
    os.environ.setdefault("PHANTOM_MODUP_IP_MB", "12")
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

    from phantom_tpu.ops import bfv32, bgv32
    from phantom_tpu.ops import modmath32 as m32
    from phantom_tpu.ops import pipeline32 as pp
    from phantom_tpu.schemes import Scheme, keys
    from phantom_tpu.utils.benchsetup import ensure_galois, setup_bench

    s = setup_bench(scheme=args.scheme, n=args.n, limbs=args.limbs,
                    alpha=args.alpha, multech=args.multech)
    ctx, rlk, sk, pk = s.ctx, s.rlk, s.sk, s.pk
    scheme = {"ckks": Scheme.CKKS, "bfv": Scheme.BFV,
              "bgv": Scheme.BGV}[args.scheme]
    glk = ensure_galois(s, args.scheme, args.n, args.limbs, args.alpha,
                        steps=(1, 2))

    use_pallas = {"mxu-pallas": "mxu-pallas", "mxu": "mxu",
                  "u32": False}[args.path]
    ks = pp.build_keyswitch32(ctx, 1, use_pallas,
                              for_bgv=(scheme == Scheme.BGV))
    evk = pp.convert_key32(ctx, rlk.data, 1)
    g32 = pp.build_galois32(ctx, glk, 1)
    d1 = jnp.asarray(np.asarray(s.ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(s.ct2.data).astype(np.uint32))
    is_ntt = scheme != Scheme.BFV
    # per-op chain lengths: cheap ops need long chains or the dispatch
    # RTT (~15-26 ms, CLAUDE.md) dominates the reading.  Sized so the
    # RTT contributes < 10% of each u32-path row (RTT/K << K * t_op);
    # trip count does not affect compile time.
    K_PER_OP = {"add": 2048, "multiply_plain": 384, "decrypt": 256,
                "rescale": 192, "rotate": 48, "multiply_relin": 48,
                "multiply_relin_rescale": 48,
                "multiply_relin_modswitch": 48, "hoisting_sum2": 32,
                "encrypt": 32, "keygen_secret": 64, "keygen_public": 32,
                "keygen_relin": 16}
    rows = {}

    # honest timing mode before any measurement (CLAUDE.md)
    np.asarray(jnp.arange(8).sum())

    only = set(args.ops.split(",")) if args.ops else None

    def flush_out():
        if not args.out:
            return
        rec = {"scheme": args.scheme, "n": args.n, "limbs": args.limbs,
               "alpha": args.alpha, "path": args.path,
               "multech": args.multech if args.scheme == "bfv" else None,
               "platform": jax.devices()[0].platform,
               "rows": rows}
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        if args.scheme in merged:          # partial re-runs extend, not
            old = merged[args.scheme]      # replace, the scheme's rows
            old.update({k_: v for k_, v in rec.items() if k_ != "rows"})
            old.setdefault("rows", {}).update(rows)
        else:
            merged[args.scheme] = rec
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=1)
        os.replace(tmp, args.out)

    def record(name, med_us, mean_us, trials, method):
        rows[name] = {"median_us": round(med_us, 1),
                      "mean_us": round(mean_us, 1),
                      "trials": trials, "method": method}
        print(f"{name},{trials},{med_us:.1f},{mean_us:.1f}", flush=True)
        flush_out()  # partial tables survive a timeout

    def chained(name, pack, step, carry, per_iter_ops=1):
        """Time K data-dependent steps per dispatch; med/mean per op.

        The TRIALS are chained too: each dispatch takes the previous
        dispatch's output as its carry.  Without this, repeated
        dispatches with identical arguments can be served from the axon
        result cache without executing (observed: BFV multiply_relin
        "27 us" — faster than the dispatch RTT itself)."""
        if only and name not in only:
            return
        K = args.k or K_PER_OP.get(name, 16)

        @jax.jit
        def run(pk_, c):
            return jax.lax.fori_loop(0, K, lambda i, c_: step(pk_, c_), c)

        t0 = time.time()
        c = jax.block_until_ready(run(pack, carry))
        print(f"# [{name}] compile+first {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(args.trials):
            t0 = time.time()
            c = jax.block_until_ready(run(pack, c))
            ts.append((time.time() - t0) / (K * per_iter_ops) * 1e6)
        record(name, float(np.median(ts)), float(np.mean(ts)),
               args.trials, f"chained K={K} x chained trials")

    def varied(name, make_call, trials=None):
        """Time per-dispatch with fresh inputs each trial (host verbs and
        rng-consuming verbs where no output-to-input chain exists)."""
        if only and name not in only:
            return
        trials = trials or args.trials
        calls = [make_call(i) for i in range(trials + 1)]
        jax.block_until_ready(calls[0]())  # warmup/compile
        ts = []
        for c in calls[1:]:
            t0 = time.time()
            jax.block_until_ready(c())
            ts.append((time.time() - t0) * 1e6)
        record(name, float(np.median(ts)), float(np.mean(ts)),
               trials, "varied inputs")

    # ---- keygen (u32 fast path, jitted with tables as args; fresh rng
    # per trial — bit-identical to the u64 keygen, tests/test_fast32) ----
    from phantom_tpu import fast32 as f32k
    evk_gen = f32k.Fast32(ctx, use_pallas=use_pallas)
    t32key, mvkey = evk_gen._key32()
    kmult, kmult_sh = evk_gen._bgv_key_mult32()
    pm, pm_shoup, kmask, dnum = evk_gen._kswitch_consts32()
    s32key = jnp.asarray(sk.data).astype(jnp.uint32)
    n_ = args.n

    # chained keygen: each iteration's PRNG key derives from the previous
    # key's bits (real data dependency; single-dispatch keygen latency on
    # this runtime is RTT-bound at ~15-25 ms regardless of device time)
    def step_kg_sk(pack, carry):
        t, mv = pack
        key, _ = carry
        data = f32k.gen_secret_core32(t, mv, key, n_)
        return (jax.random.PRNGKey(data[0, 0].astype(jnp.int64)), data)

    chained("keygen_secret", (t32key, mvkey), step_kg_sk,
            (jax.random.PRNGKey(100), s32key))

    def step_kg_pk(pack, carry):
        t, mv, kmv, s_ = pack
        key, _ = carry
        data = jnp.stack(f32k.encrypt_zero_sym_core32(
            t, mv, kmv, s_, key, n_, kmult, kmult_sh))
        return (jax.random.PRNGKey(data[0, 0, 0].astype(jnp.int64)), data)

    chained("keygen_public", (t32key, mvkey, ctx.key_mv, s32key),
            step_kg_pk,
            (jax.random.PRNGKey(200), jnp.stack([s32key, s32key])))

    def step_kg_rlk(pack, carry):
        t, mv, kmv, s_ = pack
        key, _ = carry
        q = mv.q[:, None]
        s_sq = m32.mul_mod32(s_, s_, q, mv.ratio_hi[:, None],
                             mv.ratio_lo[:, None])
        data = f32k.gen_kswitch_core32(t, mv, kmv, s_, s_sq, key, n_,
                                       dnum, pm, pm_shoup, kmask,
                                       kmult, kmult_sh)
        return (jax.random.PRNGKey(data[0, 0, 0, 0].astype(jnp.int64)),
                data)

    rlk_init = jnp.zeros((dnum, 2) + s32key.shape, jnp.uint32)
    chained("keygen_relin", (t32key, mvkey, ctx.key_mv, s32key),
            step_kg_rlk, (jax.random.PRNGKey(300), rlk_init))

    # ---- encode / decode (host oracle paths, like the reference's) ----
    enc = s.enc
    if scheme == Scheme.CKKS:
        rngs = [np.random.default_rng(i).standard_normal(enc.slots)
                for i in range(args.trials + 1)]
        varied("encode", lambda i: lambda: enc.encode(rngs[i], s.scale).data)
        pts = [enc.encode(rngs[i], s.scale) for i in range(args.trials + 1)]
        varied("decode", lambda i: lambda: enc.decode(pts[i]))
        # the production encoder: device double-float special FFT + NTT
        # (ops/ckks_fft.py; reference encode_internal runs device-side too)
        from phantom_tpu.schemes.ckks_encoder import CKKSDeviceEncoder
        denc = CKKSDeviceEncoder(s.ctx)
        varied("encode_device",
               lambda i: lambda: denc.encode(rngs[i], s.scale).data)
        varied("decode_device", lambda i: lambda: denc.decode(pts[i]))
    else:
        t_plain = ctx.params.plain_modulus
        rngs = [np.random.default_rng(i).integers(0, t_plain, args.n,
                                                  dtype=np.uint64)
                for i in range(args.trials + 1)]
        varied("encode", lambda i: lambda: enc.encode(rngs[i]).data)
        pts = [enc.encode(rngs[i]) for i in range(args.trials + 1)]
        varied("decode", lambda i: lambda: enc.decode(pts[i]))

    # ---- encrypt / decrypt (u32 device path — the library's production
    # ingress, fast32.Fast32; bit-identical to the u64 evaluator) ----
    # encrypt chains through the PRNG key: the next key is derived from
    # the previous ciphertext's first word, a real data dependency
    from phantom_tpu import fast32 as f32
    from phantom_tpu.ops import scaleround32 as sr32
    ev = f32.Fast32(ctx, rlk=rlk, use_pallas=use_pallas)
    pk32, emult, emult_sh = ev._enc_consts32(pk, 1)
    cd1 = ctx.get_context_data(1)
    if scheme == Scheme.CKKS:
        pt32 = jnp.asarray(s.pt.data).astype(jnp.uint32)
    elif scheme == Scheme.BFV:
        from phantom_tpu.ops import scaleround as sr
        pt32 = sr.scale_plain_up(jnp.asarray(s.pt.data[0]),
                                 cd1.plain_lift).astype(jnp.uint32)
    else:
        pt32 = ev._bgv_lift32(1, s.pt.data[0])

    def step_encrypt(pack, carry):
        ks_, pk_, m_, ms_, pt_ = pack
        key, _ = carry
        zero = f32.encrypt_zero_core32(ks_, pk_, key, is_ntt, m_, ms_)
        c0 = m32.add_mod32(zero[0], pt_, ks_.mv_ql.q[:, None])
        data = jnp.stack([c0, zero[1]])
        nxt = jax.random.PRNGKey(data[0, 0, 0].astype(jnp.int64))
        return (nxt, data)

    chained("encrypt", (ks, pk32, emult, emult_sh, pt32), step_encrypt,
            (jax.random.PRNGKey(400), d1))

    # decrypt: u32 sk-powers dot + the scheme tail; the decrypted
    # plaintext folds back into the carry ciphertext (data dependency)
    s32 = jnp.asarray(np.asarray(sk.data)[:args.limbs].astype(np.uint32))
    dec_consts = ev._decrypt_consts(1)

    def step_decrypt(pack, d):
        ks_, s_, consts = pack
        q = ks_.mv_ql.q[:, None]
        rh = ks_.mv_ql.ratio_hi[:, None]
        rl = ks_.mv_ql.ratio_lo[:, None]
        polys = d if is_ntt else pp._fwd(ks_, d, ks_.t_ql)
        acc = m32.add_mod32(polys[0],
                            m32.mul_mod32(polys[1], s_, q, rh, rl), q)
        if scheme == Scheme.CKKS:
            m = acc                       # NTT-form plaintext (k, N)
            return d.at[0].set(m32.add_mod32(d[0], m, q))
        x = pp._inv(ks_, acc, ks_.t_ql)
        if scheme == Scheme.BFV:
            m = sr32.scale_and_round_exact32(x, consts)[0]
        else:
            q_to_t, qhalf_mod_q, qhalf_mod_t = consts
            from phantom_tpu.ops import bconv32 as bc32
            shifted = m32.add_mod32(x, qhalf_mod_q[:, None], q)
            conv = bc32.bconv_exact32(shifted, q_to_t)
            m = m32.sub_mod32(conv, qhalf_mod_t, q_to_t.obase.q[:, None])[0]
        # m < t <= q_i: fold into row 0 as-is
        return d.at[0].set(m32.add_mod32(d[0], m[None, :], q))

    chained("decrypt", (ks, s32, dec_consts), step_decrypt, d1)

    # ---- u32 device verbs ----
    qcol = ks.mv_ql.q[:, None]

    def step_add(pack, c):
        b, q = pack
        return m32.add_mod32(c, b, q)

    chained("add", (d2, qcol), step_add, d1)

    # multiply(+relin): canonical (2, L, N) output feeds the next step
    if scheme == Scheme.CKKS:
        def mr(pack, c):
            k_, e_, b = pack
            t0, t1, t2 = pp._tensor_2x2(k_.mv_ql, c, b)
            sh0, sh1 = pp.modup_ip32(k_, t2, e_)
            m0, m1 = pp.moddown32_pair(k_, sh0, sh1)
            q = k_.mv_ql.q[:, None]
            return jnp.stack([m32.add_mod32(t0, m0, q),
                              m32.add_mod32(t1, m1, q)])
        chained("multiply_relin", (ks, evk, d2), mr, d1)

        cpipe = pp.build_pipeline32(ctx, rlk, 1, use_pallas)
        qlast = ks.mv_ql.q[args.limbs - 1]
        rh_last = ks.mv_ql.ratio_hi[args.limbs - 1]

        def pad_up(out):
            pad = m32.barrett_reduce_u32(out[..., :1, :], qlast, rh_last)
            return jnp.concatenate([out, pad], axis=-2)

        def step_mrr(pack, c):
            p_, b = pack
            return pad_up(pp.mult_relin_rescale32(p_, c, b))

        chained("multiply_relin_rescale", (cpipe, d2), step_mrr, d1)

        def step_rescale(pack, c):
            p_ = pack
            return pad_up(pp._rescale(p_, c))

        chained("rescale", cpipe, step_rescale, d1)
    elif scheme == Scheme.BFV:
        bpipe = bfv32.build_bfv32(ctx, rlk, 1, use_pallas)

        def step_bfv(pack, c):
            p_, b = pack
            return bfv32.bfv_mult_relin32(p_, c, b)

        chained("multiply_relin", (bpipe, d2), step_bfv, d1)
    else:
        gpipe = bgv32.build_bgv32(ctx, rlk, 1, use_pallas)

        def step_bgv(pack, c):
            p_, b = pack
            return bgv32.bgv_mult_relin32(p_, c, b)

        chained("multiply_relin", (gpipe, d2), step_bgv, d1)

        qlast = ks.mv_ql.q[args.limbs - 1]
        rh_last = ks.mv_ql.ratio_hi[args.limbs - 1]

        def step_bgv_ms(pack, c):
            p_, b = pack
            out = bgv32.bgv_mult_relin_modswitch32(p_, c, b)
            pad = m32.barrett_reduce_u32(out[..., :1, :], qlast, rh_last)
            return jnp.concatenate([out, pad], axis=-2)

        chained("multiply_relin_modswitch", (gpipe, d2), step_bgv_ms, d1)

    # multiply_plain
    if scheme == Scheme.BFV:
        from phantom_tpu.schemes.evaluate import _bfv_plain_centered_rns
        cd = ctx.get_context_data(1)
        m_rns = jnp.asarray(np.asarray(_bfv_plain_centered_rns(
            ctx, cd, s.pt.data[0] if s.pt.data.ndim > 1 else s.pt.data)
        ).astype(np.uint32))
        m_ntt = pp._fwd(ks, m_rns, ks.t_ql)

        def step_mp(pack, c):
            k_, mn = pack
            q = k_.mv_ql.q[:, None]
            rh = k_.mv_ql.ratio_hi[:, None]
            rl = k_.mv_ql.ratio_lo[:, None]
            ct_ntt = pp._fwd(k_, c, k_.t_ql)
            prod = m32.mul_mod32(ct_ntt, mn[None], q, rh, rl)
            return pp._inv(k_, prod, k_.t_ql)

        chained("multiply_plain", (ks, m_ntt), step_mp, d1)
    else:
        pt32 = jnp.asarray(np.asarray(s.pt.data).astype(np.uint32))

        def step_mp(pack, c):
            k_, p_ = pack
            q = k_.mv_ql.q[:, None]
            rh = k_.mv_ql.ratio_hi[:, None]
            rl = k_.mv_ql.ratio_lo[:, None]
            return m32.mul_mod32(c, p_[None], q, rh, rl)

        chained("multiply_plain", (ks, pt32), step_mp, d1)

    # rotate / hoisting (canonical outputs feed directly)
    def step_rot(pack, c):
        k_, g_ = pack
        return pp.rotate32(k_, g_, c, 1, is_ntt_form=is_ntt)

    chained("rotate", (ks, g32), step_rot, d1)

    if scheme == Scheme.CKKS:
        def step_hoist(pack, c):
            k_, g_ = pack
            return pp.hoisting_sum32(k_, g_, c, (1, 2))

        chained("hoisting_sum2", (ks, g32), step_hoist, d1)

    rec = {"scheme": args.scheme, "n": args.n, "limbs": args.limbs,
           "alpha": args.alpha, "path": args.path,
           "multech": args.multech if args.scheme == "bfv" else None,
           "platform": jax.devices()[0].platform,
           "rows": rows}
    print(json.dumps(rec), flush=True)
    flush_out()


if __name__ == "__main__":
    main()
