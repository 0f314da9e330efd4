"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Each process owns 4 virtual CPU devices; the ("dp","coeff") mesh spans all
8 global devices, so the coefficient-sharded pipeline's NTT all-to-alls
cross the process boundary — the multi-host pattern SURVEY §4 requires
(the reference is single-GPU and has no equivalent).

Usage: python _multihost_worker.py <process_id> <num_processes> <port>
"""

import sys


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs,
                               process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from phantom_tpu.host import numth
    from phantom_tpu.parallel.pipeline_sharded import (
        build_sharded_consts, sharded_mult_relin_rescale)
    from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                     Scheme, evaluate, keys, make_context)

    n = 512
    limbs, alpha = 4, 2
    qs = numth.get_primes(2 * n, 30, limbs)
    ps = numth.get_primes(2 * n, 31, alpha)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=alpha)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    pt = enc.encode(z, 2.0 ** 24)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k[4])

    local_ref = np.asarray(evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)).data)

    devs = np.array(jax.devices()).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "coeff"))
    consts = build_sharded_consts(ctx, rlk)
    n1, n2 = consts.n1, consts.n2
    sh = NamedSharding(mesh, P(None, None, None, "coeff"))

    d1_np = np.asarray(ct1.data).reshape(2, -1, n1, n2)
    d2_np = np.asarray(ct2.data).reshape(2, -1, n1, n2)

    def to_global(a):
        return jax.make_array_from_callback(
            a.shape, sh, lambda idx: a[idx])

    d1 = to_global(d1_np)
    d2 = to_global(d2_np)

    fn = jax.jit(lambda c, a, b: sharded_mult_relin_rescale(c, mesh, a, b),
                 in_shardings=(NamedSharding(mesh, P()), sh, sh),
                 out_shardings=sh)
    out = fn(consts, d1, d2)
    out.block_until_ready()

    ref3 = local_ref.reshape(2, -1, n1, n2)
    for shard in out.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      ref3[shard.index])

    # phase 2: the u32 fast representation with the MXU matmul NTT engine
    # across the same 2-process mesh (primes < 2^30)
    from phantom_tpu.ops import pipeline32 as pp
    from phantom_tpu.parallel import sharded32 as s32
    qs2 = numth.get_primes(2 * n, 28, limbs)
    ps2 = numth.get_primes(2 * n, 29, alpha)
    params2 = EncryptionParameters.create(
        Scheme.CKKS, n, qs2 + ps2, special_modulus_size=alpha)
    ctx2 = make_context(params2)
    sk2 = keys.gen_secret_key(ctx2, k[0])
    pk2 = keys.gen_public_key(ctx2, sk2, k[1])
    rlk2 = keys.gen_relin_key(ctx2, sk2, k[2])
    enc2 = CKKSEncoder(ctx2)
    pt2 = enc2.encode(z, 2.0 ** 22)
    ua = keys.encrypt_asymmetric(ctx2, pk2, pt2, k[3])
    ub = keys.encrypt_asymmetric(ctx2, pk2, pt2, k[4])
    u1 = jnp.asarray(np.asarray(ua.data).astype(np.uint32))
    u2 = jnp.asarray(np.asarray(ub.data).astype(np.uint32))
    pipe32 = pp.build_pipeline32(ctx2, rlk2)
    local32 = np.asarray(pp.mult_relin_rescale32(pipe32, u1, u2))

    consts32 = s32.build_sharded32(ctx2, rlk2, engine="mxu")
    n1b, n2b = consts32.n1, consts32.n2
    u1_np = np.asarray(u1).reshape(2, -1, n1b, n2b)
    u2_np = np.asarray(u2).reshape(2, -1, n1b, n2b)
    g1 = jax.make_array_from_callback(u1_np.shape, sh,
                                      lambda idx: u1_np[idx])
    g2 = jax.make_array_from_callback(u2_np.shape, sh,
                                      lambda idx: u2_np[idx])
    fn32 = jax.jit(
        lambda c, a, b: s32.sharded_mult_relin_rescale32(c, mesh, a, b),
        in_shardings=(NamedSharding(mesh, P()), sh, sh), out_shardings=sh)
    out32 = fn32(consts32, g1, g2)
    out32.block_until_ready()
    ref32 = local32.reshape(2, -1, n1b, n2b)
    for shard in out32.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      ref32[shard.index])
    print(f"MULTIHOST_OK pid={pid}")


if __name__ == "__main__":
    main()
