"""Kernel-fusing comparison (reference: examples/4_kernel_fusing.cu:430):
fused inverse-NTT-with-scale vs separate iNTT + scalar multiply."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)
import numpy as np


def demo(n=4096):
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from phantom_tpu.host import numth
    from phantom_tpu.host.modulus import Modulus, compute_shoup
    from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
    from phantom_tpu.ops import ntt as nttmod
    from phantom_tpu.ops import modmath as mm
    from phantom_tpu.utils.timer import OpTimer, print_timer_banner

    qs = numth.get_primes(2 * n, 50, 4)
    tables = nttmod.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, n, dtype=np.uint64) for q in qs]))
    s_vals = [12345 % q for q in qs]
    ninv_s = [(numth.invert_mod(n, q) * s) % q for s, q in zip(s_vals, qs)]

    fused = jax.jit(lambda v: nttmod.ntt_inverse(
        v, tables,
        scale=jnp.asarray(np.array(ninv_s, dtype=np.uint64)),
        scale_shoup=jnp.asarray(np.array(
            [compute_shoup(v_, q) for v_, q in zip(ninv_s, qs)],
            dtype=np.uint64))))

    def separate(v):
        out = nttmod.ntt_inverse(v, tables)
        sarr = jnp.asarray(np.array(s_vals, dtype=np.uint64))[:, None]
        sshoup = jnp.asarray(np.array(
            [compute_shoup(v_, q) for v_, q in zip(s_vals, qs)],
            dtype=np.uint64))[:, None]
        return mm.mul_mod_shoup(out, sarr, sshoup, tables.q[:, None])

    separate = jax.jit(separate)

    print_timer_banner()
    t1 = OpTimer("intt_fused_scale", trials=20)
    r1 = t1.run(fused, x)
    t1.print_csv()
    t2 = OpTimer("intt_then_scale", trials=20)
    r2 = t2.run(separate, x)
    t2.print_csv()
    assert (np.asarray(r1) == np.asarray(r2)).all(), "fusing changed results"
    print(f"  speedup from fusing: {t2.median_us / t1.median_us:.2f}x")


if __name__ == "__main__":
    demo()
