"""Fused Pallas four-step MXU NTT engine: bit-match vs the XLA MXU engine
(itself bit-matched to the u64/u32 butterflies) on every path — forward,
inverse, fused moddown epilogue, fused inverse scale — over both plane
radixes and both dot modes (interpret mode on CPU, Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus
from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
from phantom_tpu.ops import ntt as ntt64
from phantom_tpu.ops import ntt32, ntt_mxu
from phantom_tpu.ops import ntt_mxu_pallas as nmp
from phantom_tpu.ops.modmath32 import compute_shoup32

RNG = np.random.default_rng(11)


@pytest.fixture(params=[7, 8], autouse=True)
def plane_bits(request):
    old = ntt_mxu.PLANE_BITS
    ntt_mxu.PLANE_BITS = request.param
    yield request.param
    ntt_mxu.PLANE_BITS = old


def setup(n, count=3, bits=28):
    qs = numth.get_primes(2 * n, bits, count)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    t32 = ntt32.tables32_from_tables64(t64)
    tm = ntt_mxu.prepare_mxu_tables(t32)
    tf = ntt_mxu.prepare_mxu_tables(t32, fused_kernel=True)
    x = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    return tm, tf, x, qs


@pytest.mark.parametrize("logn", [8, 12])
def test_fwd_inv_match(logn):
    n = 1 << logn
    tm, tf, x, qs = setup(n)
    ref = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(x), tm))
    got = np.asarray(nmp.ntt_forward_mxu_pallas(jnp.asarray(x), tf,
                                                interpret=True))
    np.testing.assert_array_equal(ref, got)
    iref = np.asarray(ntt_mxu.ntt_inverse_mxu(jnp.asarray(ref), tm))
    igot = np.asarray(nmp.ntt_inverse_mxu_pallas(jnp.asarray(got), tf,
                                                 interpret=True))
    np.testing.assert_array_equal(iref, igot)
    np.testing.assert_array_equal(igot, x)


def test_fused_moddown_epilogue():
    n = 256
    tm, tf, x, qs = setup(n)
    sub = np.stack([RNG.integers(0, q, n, dtype=np.uint32) for q in qs])
    sc = np.array([RNG.integers(1, q) for q in qs], dtype=np.uint32)
    scs = np.array([compute_shoup32(int(s), q) for s, q in zip(sc, qs)],
                   dtype=np.uint32)
    ref = np.asarray(ntt_mxu.ntt_forward_mxu(
        jnp.asarray(x), tm, sub_from=jnp.asarray(sub), epi_scale=sc,
        epi_scale_shoup=scs))
    got = np.asarray(nmp.ntt_forward_mxu_pallas(
        jnp.asarray(x), tf, sub_from=jnp.asarray(sub), epi_scale=sc,
        epi_scale_shoup=scs, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_fused_inverse_scale():
    n = 256
    tm, tf, x, qs = setup(n)
    sc = np.array([RNG.integers(1, q) for q in qs], dtype=np.uint32)
    scs = np.array([compute_shoup32(int(s), q) for s, q in zip(sc, qs)],
                   dtype=np.uint32)
    ref = np.asarray(ntt_mxu.ntt_inverse_mxu(jnp.asarray(x), tm, scale=sc,
                                             scale_shoup=scs))
    got = np.asarray(nmp.ntt_inverse_mxu_pallas(
        jnp.asarray(x), tf, scale=sc, scale_shoup=scs, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_batched_rows():
    n = 256
    tm, tf, x, qs = setup(n)
    xb = np.stack([x, (x + 1) % np.array([[q] for q in qs], dtype=np.uint32)])
    ref = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(xb), tm))
    got = np.asarray(nmp.ntt_forward_mxu_pallas(jnp.asarray(xb), tf,
                                                interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_bconv_ntt_fused():
    """bconv prologue + NTT + v/post/epilogue vs the composed XLA ops."""
    from phantom_tpu.ops import bconv32 as bc32
    import jax.numpy as jnp
    n = 256
    count, alpha, g_ = 5, 2, 2
    tm, tf, _, qs = setup(n, count=count)
    qn = np.array(qs, dtype=np.uint32)
    y = RNG.integers(0, 1 << 29, (g_, alpha, n)).astype(np.uint32)
    mat = RNG.integers(0, 1 << 29, (g_, count, alpha)).astype(np.uint32)
    v = RNG.integers(0, 1 << 31, (g_, n)).astype(np.uint32)
    vmul = RNG.integers(1, 1 << 29, count).astype(np.uint32)
    post = np.array([RNG.integers(0, q) for q in qs], dtype=np.uint32)
    sub = RNG.integers(0, qn[:, None], (g_, count, n)).astype(np.uint32)
    sc = np.array([RNG.integers(1, q) for q in qs], dtype=np.uint32)
    scs = np.array([compute_shoup32(int(s), q) for s, q in zip(sc, qs)],
                   dtype=np.uint32)

    from phantom_tpu.ops import modmath32 as m32
    mv = tm.mv

    def ref_group(gi, use_v, use_post, use_epi):
        raw = np.asarray(bc32._accumulate_reduce32(
            jnp.asarray(y[gi]), jnp.asarray(mat[gi]), mv))
        x = jnp.asarray(raw)
        q = mv.q[:, None]
        if use_v:
            corr = m32.mul_mod32(jnp.asarray(v[gi])[None, :], vmul[:, None],
                                 q, mv.ratio_hi[:, None], mv.ratio_lo[:, None])
            x = m32.sub_mod32(x, corr, q)
        if use_post:
            x = m32.sub_mod32(x, post[:, None], q)
        out = ntt_mxu.ntt_forward_mxu(x, tm)
        if use_epi:
            out = m32.mul_mod_shoup32(
                m32.sub_mod32(jnp.asarray(sub[gi]), out, q),
                sc[:, None], scs[:, None], q)
        return np.asarray(out)

    for use_v, use_post, use_epi in [(False, False, False),
                                     (True, False, False),
                                     (False, True, True),
                                     (True, True, True)]:
        kw = {}
        if use_v:
            kw.update(v=jnp.asarray(v), vmul=vmul)
        if use_post:
            kw.update(post_sub=post)
        if use_epi:
            kw.update(sub_from=jnp.asarray(sub), epi_scale=sc,
                      epi_scale_shoup=scs)
        got = np.asarray(nmp.bconv_ntt_forward_mxu_pallas(
            jnp.asarray(y), jnp.asarray(mat), tf, interpret=True, **kw))
        ref = np.stack([ref_group(gi, use_v, use_post, use_epi)
                        for gi in range(g_)])
        np.testing.assert_array_equal(ref, got,
                                      err_msg=f"{use_v=} {use_post=} {use_epi=}")


def test_modup_ip_fused():
    """modup + evk inner product mega-kernel vs the split kernel + an
    exact big-int inner product."""
    import jax.numpy as jnp
    n = 256
    count, alpha, beta = 6, 2, 2
    k = alpha * beta
    tm, tf, _, qs = setup(n, count=count)
    y = RNG.integers(0, 1 << 29, (k, n)).astype(np.uint32)
    mats = RNG.integers(0, 1 << 29, (beta, count, alpha)).astype(np.uint32)
    for d in range(beta):
        mats[d, d * alpha:(d + 1) * alpha] = 0
    c2 = np.stack([RNG.integers(0, qs[j], n)
                   for j in range(k)]).astype(np.uint32)
    evk = RNG.integers(0, 1 << 29, (beta, 2, count, n)).astype(np.uint32)
    s0, s1 = nmp.modup_ip_mxu_pallas(
        jnp.asarray(y), jnp.asarray(mats), jnp.asarray(c2),
        jnp.asarray(evk), tf, interpret=True)
    t_all = np.asarray(nmp.bconv_ntt_forward_mxu_pallas(
        jnp.asarray(y.reshape(beta, alpha, n)), jnp.asarray(mats), tf,
        self_rows=jnp.asarray(c2), interpret=True))
    for half, got in ((0, np.asarray(s0)), (1, np.asarray(s1))):
        for j in range(count):
            acc = np.zeros(n, dtype=object)
            for d in range(beta):
                acc += (t_all[d, j].astype(object)
                        * evk[d, half, j].astype(object))
            ref = (acc % qs[j]).astype(np.uint32)
            np.testing.assert_array_equal(ref, got[j],
                                          err_msg=f"{half=} {j=}")


def test_bf16_dot_mode():
    n = 256
    tm, tf, x, qs = setup(n)
    old = nmp.DOT_MODE
    try:
        nmp.DOT_MODE = "bf16"
        got = np.asarray(nmp.ntt_forward_mxu_pallas(jnp.asarray(x), tf,
                                                    interpret=True))
    finally:
        nmp.DOT_MODE = old
    ref = np.asarray(ntt_mxu.ntt_forward_mxu(jnp.asarray(x), tm))
    np.testing.assert_array_equal(ref, got)
