"""Shared benchmark setup: context + keys + ciphertexts, disk-cached.

Every bench/probe process used to pay 170-315 s of keygen + encrypt
through the generic u64 evaluator before its first measurement (VERDICT
round-3 Weak #6).  The artifacts are deterministic in (parameter set,
seeds), so they are memoized via utils.benchcache: the first run per
config generates and saves raw arrays; later runs rebuild the cheap
context (~6 s warm) and reconstruct the key/ciphertext pytrees from the
.npz in under a second.

Used by bench.py, benchmarks/step_probe.py and benchmarks/scheme_bench.py.
"""

from __future__ import annotations

import sys
import time
from types import SimpleNamespace

import numpy as np

from . import benchcache

_CT_META = ("chain_index", "is_ntt_form", "scale", "correction_factor",
            "noise_scale_deg")


def _ct_meta(ct):
    return {f: getattr(ct, f) for f in _CT_META}


def setup_bench(scheme: str = "ckks", n: int = 65536, limbs: int = 28,
                alpha: int = 14, bits: int = 28, multech: str = "hps",
                galois_steps=(), seed: int = 0, verbose: bool = True,
                hiprec: bool = False):
    """Build (or load) the standard bench setup.

    hiprec (CKKS only): the paired-prime high-precision chain — one
    28-bit q0 + (limbs-1) 27-bit data primes, working scale 2^54, each
    multiplicative level rescaling by a PAIR of 27-bit primes (the
    examples/9_hiprec_ckks.py construction; EXCEEDS the reference CKKS
    bench's scale-2^40 precision on u32 words).  27-bit pairs because
    NTT-friendly primes at n=2^16 must be == 1 mod 2^17: only ~2
    22-bit candidates exist, vs ~52 at 27 bits.

    Returns a SimpleNamespace with: params, ctx, sk, pk, rlk, glk (None
    unless galois_steps), pt, ct1, ct2, enc, values (the encoded payload),
    scale (CKKS) and cached (bool).
    """
    import jax

    from ..host import numth
    from ..host.modulus import PlainModulus
    from ..schemes import (BatchEncoder, CKKSEncoder, EncryptionParameters,
                           Scheme, keys, make_context)
    from ..schemes.ciphertext import Ciphertext, Plaintext

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    t0 = time.time()
    sch = {"ckks": Scheme.CKKS, "bfv": Scheme.BFV, "bgv": Scheme.BGV}[scheme]
    if hiprec:
        assert sch == Scheme.CKKS, "hiprec is a CKKS mode"
        assert (limbs - 1) % 2 == 0, "hiprec: limbs = q0 + prime pairs"
        q0 = numth.get_primes(2 * n, 28, 1)
        rs = numth.get_primes(2 * n, 27, limbs - 1)
        ps = numth.get_primes(2 * n, 29, alpha)
        coeff = q0 + rs + ps           # q0 + 27-bit pairs + special
    else:
        qs = numth.get_primes(2 * n, bits, limbs + 1)
        ps = numth.get_primes(2 * n, bits + 1, alpha)
        coeff = [qs[0]] + qs[1:limbs] + ps  # q0 + rest + special
    extra = {}
    if sch != Scheme.CKKS:
        # batching primes are == 1 mod 2n, so they need > log2(2n) bits
        tbits = max(16, n.bit_length() + 3)
        extra["plain_modulus"] = PlainModulus.batching(n, tbits).value
    if sch == Scheme.BFV:
        from ..schemes import MulTech
        extra["mul_tech"] = {"hps": MulTech.HPS, "behz": MulTech.BEHZ,
                             "overq": MulTech.HPS_OVERQ,
                             "leveled": MulTech.HPS_OVERQ_LEVELED}[multech]
    params = EncryptionParameters.create(
        sch, n, coeff, special_modulus_size=alpha, **extra)
    ctx = make_context(params)
    log(f"# context built in {time.time()-t0:.1f}s "
        f"(scheme={scheme}, n={n}, L={limbs}, alpha={alpha})")

    if sch == Scheme.CKKS:
        enc = CKKSEncoder(ctx)
        scale = 2.0 ** 54 if hiprec else 2.0 ** (bits - 6)
        values = np.random.default_rng(seed).standard_normal(enc.slots)
    else:
        enc = BatchEncoder(ctx)
        scale = 1.0
        values = np.random.default_rng(seed).integers(
            0, params.plain_modulus, n, dtype=np.uint64)

    cfg = dict(scheme=scheme, n=n, limbs=limbs, alpha=alpha,
               bits=(27 if hiprec else bits),
               multech=(multech if sch == Scheme.BFV else
                        "hiprec" if hiprec else ""),
               galois_steps=list(galois_steps), seed=seed)
    hit = benchcache.load_setup(**cfg)
    import jax.numpy as jnp

    if hit is not None:
        arrays, meta = hit
        sk = keys.SecretKey(data=jnp.asarray(arrays["sk"]))
        pk = keys.PublicKey(data=jnp.asarray(arrays["pk"]))
        rlk = keys.RelinKey(data=jnp.asarray(arrays["rlk"]))
        glk = None
        if "glk" in arrays:
            glk = keys.GaloisKeys(data=jnp.asarray(arrays["glk"]),
                                  elts=tuple(meta["glk_elts"]))
        pt = Plaintext(data=jnp.asarray(arrays["pt"]), **meta["pt"])
        ct1 = Ciphertext(data=jnp.asarray(arrays["ct1"]), **meta["ct1"])
        ct2 = Ciphertext(data=jnp.asarray(arrays["ct2"]), **meta["ct2"])
        log(f"# keys+encrypt loaded from cache "
            f"({benchcache.cache_path(**cfg)})")
        return SimpleNamespace(params=params, ctx=ctx, sk=sk, pk=pk, rlk=rlk,
                               glk=glk, pt=pt, ct1=ct1, ct2=ct2, enc=enc,
                               values=values, scale=scale, cached=True)

    t0 = time.time()
    rng = jax.random.PRNGKey(seed)
    k_sk, k_pk, k_rlk, k_glk, k1, k2 = jax.random.split(rng, 6)
    sk = jax.jit(keys.gen_secret_key)(ctx, k_sk)
    pk = jax.jit(keys.gen_public_key)(ctx, sk, k_pk)
    rlk = jax.jit(keys.gen_relin_key)(ctx, sk, k_rlk)
    glk = None
    if galois_steps:
        glk = keys.create_galois_keys(ctx, sk, k_glk,
                                      steps=list(galois_steps))
    if sch == Scheme.CKKS:
        pt = enc.encode(values, scale)
    else:
        pt = enc.encode(values)
    enc_jit = jax.jit(keys.encrypt_asymmetric)
    ct1 = enc_jit(ctx, pk, pt, k1)
    ct2 = enc_jit(ctx, pk, pt, k2)
    log(f"# keys+encrypt generated in {time.time()-t0:.1f}s")

    arrays = {"sk": sk.data, "pk": pk.data, "rlk": rlk.data,
              "pt": pt.data, "ct1": ct1.data, "ct2": ct2.data}
    meta = {"pt": _ct_meta_pt(pt), "ct1": _ct_meta(ct1),
            "ct2": _ct_meta(ct2)}
    if glk is not None:
        arrays["glk"] = glk.data
        meta["glk_elts"] = list(glk.elts)
    benchcache.save_setup(arrays, meta, **cfg)
    return SimpleNamespace(params=params, ctx=ctx, sk=sk, pk=pk, rlk=rlk,
                           glk=glk, pt=pt, ct1=ct1, ct2=ct2, enc=enc,
                           values=values, scale=scale, cached=False)


def _ct_meta_pt(pt):
    return {"chain_index": pt.chain_index, "is_ntt_form": pt.is_ntt_form,
            "scale": pt.scale}


def ensure_galois(s, scheme: str, n: int, limbs: int, alpha: int,
                  bits: int = 28, steps=(1,), seed: int = 0,
                  verbose: bool = True):
    """Load-or-generate Galois keys for an existing setup_bench result
    (separate cache entry, so the expensive main setup is reused when a
    bench later needs rotation keys)."""
    import jax
    import jax.numpy as jnp

    from ..schemes import keys

    if s.glk is not None and tuple(steps) == tuple(
            getattr(s.glk, "_steps", ())):
        return s.glk
    cfg = dict(kind="glk", scheme=scheme, n=n, limbs=limbs, alpha=alpha,
               bits=bits, steps=list(steps), seed=seed)
    hit = benchcache.load_setup(**cfg)
    if hit is not None:
        arrays, meta = hit
        glk = keys.GaloisKeys(data=jnp.asarray(arrays["glk"]),
                              elts=tuple(meta["glk_elts"]))
        if verbose:
            print("# galois keys loaded from cache", file=sys.stderr)
        s.glk = glk
        return glk
    t0 = time.time()
    k_glk = jax.random.split(jax.random.PRNGKey(seed), 6)[3]
    glk = keys.create_galois_keys(s.ctx, s.sk, k_glk, steps=list(steps))
    if verbose:
        print(f"# galois keys generated in {time.time()-t0:.1f}s",
              file=sys.stderr)
    benchcache.save_setup({"glk": glk.data},
                          {"glk_elts": list(glk.elts)}, **cfg)
    s.glk = glk
    return glk
