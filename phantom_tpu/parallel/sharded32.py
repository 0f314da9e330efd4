"""Coefficient-sharded CKKS mult+relin+rescale on the uint32 fast path.

The multichip production configuration: single-u32 residues (the per-chip
fast representation, ops/pipeline32) with coefficients sharded over a
("dp", "coeff") mesh (the layout of parallel/pipeline_sharded.py, where
the only collectives are the NTT phase-boundary all-to-alls).

Reuses the u32 keyswitch/rescale constants from ops/pipeline32
(KeySwitch32 / CKKSPipeline32); only the NTTs and the coefficient layout
change.  Bit-identical to pipeline32.mult_relin_rescale32 — tested at
n=8192 L=8 on the 8-device virtual mesh (tests/test_sharded32.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import modmath32 as m32
from ..ops import ntt32
from ..ops import ntt_mxu
from ..ops.modmath32 import U32, csub32, mul_mod_shoup_lazy32
from .ntt_sharded import _split_n, _transpose_regions
from ..ops.pipeline32 import CKKSPipeline32, KeySwitch32

import flax.struct


@flax.struct.dataclass
class ShardedNTTTables32:
    q: jnp.ndarray
    fwd: jnp.ndarray
    fwd_shoup: jnp.ndarray
    inv: jnp.ndarray
    inv_shoup: jnp.ndarray
    inv_degree: jnp.ndarray
    inv_degree_shoup: jnp.ndarray
    n1: int = flax.struct.field(pytree_node=False, default=0)
    n2: int = flax.struct.field(pytree_node=False, default=0)


def prepare_sharded_tables32(t32: ntt32.NTTTables32) -> ShardedNTTTables32:
    n = t32.n
    n1, n2 = _split_n(n)
    return ShardedNTTTables32(
        q=t32.q,
        fwd=jnp.asarray(_transpose_regions(np.asarray(t32.root_powers), n1)),
        fwd_shoup=jnp.asarray(
            _transpose_regions(np.asarray(t32.root_powers_shoup), n1)),
        inv=jnp.asarray(
            _transpose_regions(np.asarray(t32.inv_root_powers), n1)),
        inv_shoup=jnp.asarray(
            _transpose_regions(np.asarray(t32.inv_root_powers_shoup), n1)),
        inv_degree=t32.inv_degree,
        inv_degree_shoup=t32.inv_degree_shoup,
        n1=n1, n2=n2)


def _sc(mesh, x, axis="coeff"):
    spec = (None,) * (x.ndim - 1) + (axis,)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def ntt_forward_sharded32(xm, t: ShardedNTTTables32, mesh: Mesh,
                          axis: str = "coeff"):
    """x (L, n1, n2) u32 in [0, q), n2 sharded -> NTT form (L, n1, n2)."""
    n1, n2 = t.n1, t.n2
    num_l = xm.shape[0]
    n = n1 * n2
    q = t.q.reshape(num_l, 1, 1)
    xm = _sc(mesh, xm, axis)

    m = 1
    while m < n1:
        h1 = n1 // (2 * m)
        xr = xm.reshape(num_l, m, 2, h1, n2)
        w = t.fwd[:, m:2 * m].reshape(num_l, m, 1, 1)
        ws = t.fwd_shoup[:, m:2 * m].reshape(num_l, m, 1, 1)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        qb = q.reshape(num_l, 1, 1, 1)
        u = u - jnp.where(u >= qb * U32(2), qb * U32(2), U32(0))
        wv = mul_mod_shoup_lazy32(v, w, ws, qb)
        xm = jnp.stack([u + wv, u - wv + qb * U32(2)],
                       axis=2).reshape(num_l, n1, n2)
        xm = _sc(mesh, xm, axis)
        m <<= 1

    xt = _sc(mesh, jnp.swapaxes(xm, 1, 2), axis)  # all-to-all

    while m < n:
        mr = m // n1
        t_len = n2 // (2 * mr)
        xr = xt.reshape(num_l, mr, 2, t_len, n1)
        w = t.fwd[:, m:2 * m].reshape(num_l, mr, 1, n1)
        ws = t.fwd_shoup[:, m:2 * m].reshape(num_l, mr, 1, n1)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        qb = q.reshape(num_l, 1, 1, 1)
        u = u - jnp.where(u >= qb * U32(2), qb * U32(2), U32(0))
        wv = mul_mod_shoup_lazy32(v, w, ws, qb)
        xt = jnp.stack([u + wv, u - wv + qb * U32(2)],
                       axis=2).reshape(num_l, n2, n1)
        xt = _sc(mesh, xt, axis)
        m <<= 1

    out = _sc(mesh, jnp.swapaxes(xt, 1, 2), axis)  # all-to-all back
    return csub32(csub32(out, q * U32(2)), q)


def ntt_inverse_sharded32(xm3, t: ShardedNTTTables32, mesh: Mesh,
                          axis: str = "coeff", scale=None, scale_shoup=None):
    n1, n2 = t.n1, t.n2
    num_l = xm3.shape[0]
    n = n1 * n2
    q = t.q.reshape(num_l, 1, 1, 1)

    xt = _sc(mesh, jnp.swapaxes(_sc(mesh, xm3, axis), 1, 2), axis)

    m = n // 2
    while m >= n1:
        mr = m // n1
        t_len = n2 // (2 * mr)
        xr = xt.reshape(num_l, mr, 2, t_len, n1)
        w = t.inv[:, m:2 * m].reshape(num_l, mr, 1, n1)
        ws = t.inv_shoup[:, m:2 * m].reshape(num_l, mr, 1, n1)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        s = u + v
        s = s - jnp.where(s >= q * U32(2), q * U32(2), U32(0))
        d = mul_mod_shoup_lazy32(u - v + q * U32(2), w, ws, q)
        xt = jnp.stack([s, d], axis=2).reshape(num_l, n2, n1)
        xt = _sc(mesh, xt, axis)
        m >>= 1

    xm = _sc(mesh, jnp.swapaxes(xt, 1, 2), axis)  # all-to-all back

    while m >= 1:
        h1 = n1 // (2 * m)
        xr = xm.reshape(num_l, m, 2, h1, n2)
        w = t.inv[:, m:2 * m].reshape(num_l, m, 1, 1)
        ws = t.inv_shoup[:, m:2 * m].reshape(num_l, m, 1, 1)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        s = u + v
        s = s - jnp.where(s >= q * U32(2), q * U32(2), U32(0))
        d = mul_mod_shoup_lazy32(u - v + q * U32(2), w, ws, q)
        xm = jnp.stack([s, d], axis=2).reshape(num_l, n1, n2)
        xm = _sc(mesh, xm, axis)
        m >>= 1

    qq = t.q.reshape(num_l, 1, 1)
    if scale is None:
        sc_v = t.inv_degree.reshape(num_l, 1, 1)
        sc_s = t.inv_degree_shoup.reshape(num_l, 1, 1)
    else:
        sc_v = scale.reshape(num_l, 1, 1)
        sc_s = scale_shoup.reshape(num_l, 1, 1)
    return csub32(mul_mod_shoup_lazy32(xm, sc_v, sc_s, qq), qq)


# -- sharded MXU (four-step matmul) NTT -------------------------------------
#
# With n2 sharded ("lane" layout) the phase-A matmul contracts the
# *unsharded* n1 axis — fully local; one all-to-all re-shards to n1
# ("row" layout) so the phase-B matmul contracts the now-local n2 axis;
# one all-to-all back restores the pipeline's lane layout.  Exactly the
# butterfly engine's collective structure (2 all-to-alls, nothing else),
# but all compute is MXU matmuls instead of ~log2(N) VPU stage passes.

def _sc_spec(mesh, x, spec):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def ntt_forward_sharded_mxu(xm, t: ntt_mxu.MXUNTTTables, mesh: Mesh,
                            axis: str = "coeff"):
    """xm (L, n1, n2) u32 in [0, q), n2 sharded -> NTT form, n2 sharded."""
    lane = P(None, None, axis)
    row = P(None, axis, None)
    q3 = t.mv.q[:, None, None]
    xm = _sc_spec(mesh, csub32(xm, q3), lane)  # tolerate lazy [0, 2q) input
    z = _sc_spec(mesh, ntt_mxu.mm_left_mod(t.wa, xm, t.mv, t.plane_bits,
                                           t.q_bits, ntt_mxu._diag_of(t)),
                 lane)
    # strict twiddle product keeps the phase-B operand at q_bits planes
    v = csub32(mul_mod_shoup_lazy32(z, t.d, t.d_shoup, q3), q3)
    v = _sc_spec(mesh, v, row)                       # all-to-all
    out = _sc_spec(mesh, ntt_mxu.mm_right_mod(v, t.wb, t.mv, t.plane_bits,
                                              t.q_bits, ntt_mxu._diag_of(t)),
                   row)
    return _sc_spec(mesh, out, lane)                 # all-to-all back


def ntt_inverse_sharded_mxu(xm3, t: ntt_mxu.MXUNTTTables, mesh: Mesh,
                            axis: str = "coeff", scale=None,
                            scale_shoup=None):
    """NTT form (L, n1, n2), n2 sharded -> coefficients, n2 sharded."""
    lane = P(None, None, axis)
    row = P(None, axis, None)
    q3 = t.mv.q[:, None, None]
    x = _sc_spec(mesh, _sc_spec(mesh, xm3, lane), row)   # all-to-all
    x = csub32(x, q3)                                    # [0, 2q) -> [0, q)
    s = _sc_spec(mesh, ntt_mxu.mm_right_mod(x, t.wbi, t.mv, t.plane_bits,
                                            t.q_bits, ntt_mxu._diag_of(t)),
                 row)
    v = mul_mod_shoup_lazy32(s, t.di, t.di_shoup, q3)
    if scale is None:
        sc_v, sc_s = t.inv_degree, t.inv_degree_shoup
    else:
        sc_v, sc_s = scale, scale_shoup
    v = csub32(mul_mod_shoup_lazy32(v, jnp.asarray(sc_v)[:, None, None],
                                    jnp.asarray(sc_s)[:, None, None], q3), q3)
    v = _sc_spec(mesh, v, lane)                          # all-to-all back
    return _sc_spec(mesh, ntt_mxu.mm_left_mod(t.wai, v, t.mv, t.plane_bits,
                                              t.q_bits, ntt_mxu._diag_of(t)),
                    lane)


def _fwd_sharded(x, t, mesh, axis="coeff"):
    if isinstance(t, ntt_mxu.MXUNTTTables):
        return ntt_forward_sharded_mxu(x, t, mesh, axis)
    return ntt_forward_sharded32(x, t, mesh, axis)


def _inv_sharded(x, t, mesh, axis="coeff", scale=None, scale_shoup=None):
    if isinstance(t, ntt_mxu.MXUNTTTables):
        return ntt_inverse_sharded_mxu(x, t, mesh, axis, scale, scale_shoup)
    return ntt_inverse_sharded32(x, t, mesh, axis, scale, scale_shoup)


# -- 3D u32 helpers (broadcast per-limb consts over both coeff axes) --------

def _b3(a):
    return a[:, None, None]


def _accumulate3_32(y, mat):
    """(carry, hi, lo) u32-triple matmul on 3D arrays (mirror of
    bconv32.accumulate_matmul_96)."""
    k_out = mat.shape[0]
    sh = (k_out,) + y.shape[1:]
    c = jnp.zeros(sh, dtype=jnp.uint32)
    hi = jnp.zeros(sh, dtype=jnp.uint32)
    lo = jnp.zeros(sh, dtype=jnp.uint32)
    for i in range(y.shape[0]):
        h, l = m32.mul_wide32(y[i][None], mat[:, i][:, None, None])
        lo, cr = m32.add_u32_carry(lo, l)
        hi2, cr2 = m32.add_u32_carry(hi, h + cr)
        hi = hi2
        c = c + cr2
    return c, hi, lo


def _reduce_u96_3(c, hi, lo, mv):
    q = _b3(mv.q)
    rh = _b3(mv.ratio_hi)
    rl = _b3(mv.ratio_lo)
    t_c = m32.mul_mod32(m32.barrett_reduce_u32(c, q, rh), _b3(mv.pow64),
                        q, rh, rl)
    t_h = m32.mul_mod32(m32.barrett_reduce_u32(hi, q, rh), _b3(mv.pow32),
                        q, rh, rl)
    t_l = m32.barrett_reduce_u32(lo, q, rh)
    return m32.add_mod32(m32.add_mod32(t_c, t_h, q), t_l, q)


def _scale_qhatinv3(x, c):
    return m32.mul_mod_shoup32(x, _b3(c.qhat_inv), _b3(c.qhat_inv_shoup),
                               _b3(c.ibase.q))


def _bconv_approx3_32(x, c):
    y = _scale_qhatinv3(x, c)
    cc, hh, ll = _accumulate3_32(y, c.qhat_mod_p)
    return _reduce_u96_3(cc, hh, ll, c.obase)


def _floor_sum_div3_32(y, c):
    q = _b3(c.ibase.q)
    rh = _b3(c.ibase.ratio_hi)
    rl = _b3(c.ibase.ratio_lo)
    yU = y * _b3(c.U)
    h, l = m32.mul_wide32(y, _b3(c.V))
    q1, r1 = m32.barrett_div_mod_u64_32(h, l, q, rh, rl)
    s2, r2 = m32.barrett_div_mod_u64_32(r1, jnp.zeros_like(r1), q, rh, rl)
    s3, _ = m32.barrett_div_mod_u64_32(r2, jnp.zeros_like(r2), q, rh, rl)
    sh = y.shape[1:]
    a_hi = jnp.zeros(sh, dtype=jnp.uint32)
    a_lo = jnp.zeros(sh, dtype=jnp.uint32)
    b_hi = jnp.zeros(sh, dtype=jnp.uint32)
    b_lo = jnp.zeros(sh, dtype=jnp.uint32)
    c_hi = jnp.zeros(sh, dtype=jnp.uint32)
    c_lo = jnp.zeros(sh, dtype=jnp.uint32)
    for i in range(y.shape[0]):
        a_lo, cr = m32.add_u32_carry(a_lo, yU[i])
        a_hi = a_hi + cr
        a_lo, cr = m32.add_u32_carry(a_lo, q1[i])
        a_hi = a_hi + cr
        b_lo, cr = m32.add_u32_carry(b_lo, s2[i])
        b_hi = b_hi + cr
        c_lo, cr = m32.add_u32_carry(c_lo, s3[i])
        c_hi = c_hi + cr
    p1, cr1 = m32.add_u32_carry(b_lo, c_hi)
    p2, cr2 = m32.add_u32_carry(a_lo, b_hi + cr1)
    return a_hi + cr2


def _bconv_exact3_32(x, c):
    y = _scale_qhatinv3(x, c)
    cc, hh, ll = _accumulate3_32(y, c.qhat_mod_p)
    raw = _reduce_u96_3(cc, hh, ll, c.obase)
    v = _floor_sum_div3_32(y, c)
    q = _b3(c.obase.q)
    corr = m32.mul_mod32(v[None], _b3(c.q_mod_p), q, _b3(c.obase.ratio_hi),
                         _b3(c.obase.ratio_lo))
    return m32.sub_mod32(raw, corr, q)


# -- the sharded u32 pipeline ------------------------------------------------

def _tensor3(mv, a, b):
    q = _b3(mv.q)
    rh = _b3(mv.ratio_hi)
    rl = _b3(mv.ratio_lo)
    c0 = m32.mul_mod32(a[0], b[0], q, rh, rl)
    c1 = m32.add_mod32(m32.mul_mod32(a[0], b[1], q, rh, rl),
                       m32.mul_mod32(a[1], b[0], q, rh, rl), q)
    c2 = m32.mul_mod32(a[1], b[1], q, rh, rl)
    return c0, c1, c2


@flax.struct.dataclass
class Sharded32Consts:
    pipe: CKKSPipeline32 = None             # u32 keyswitch/rescale consts
    st_qlp: ShardedNTTTables32 = None
    st_ql: ShardedNTTTables32 = None
    st_p: ShardedNTTTables32 = None
    st_ql_next: ShardedNTTTables32 = None
    st_last: ShardedNTTTables32 = None
    evk3: jnp.ndarray = None                # (beta, 2, K, n1, n2)

    @property
    def n1(self):
        return self.st_ql.n1

    @property
    def n2(self):
        return self.st_ql.n2


def build_sharded32(ctx, rlk, chain_index: int = 1,
                    engine: str = "xla") -> Sharded32Consts:
    """engine: "xla" = butterfly stages + stage-wise sharding constraints;
    "mxu" = four-step matmul NTT (local matmuls, 2 all-to-alls)."""
    from ..ops import ntt as ntt64mod
    from ..ops import pipeline32 as pp
    from ..schemes.keyswitch import qlp_rows
    pipe = pp.build_pipeline32(ctx, rlk, chain_index, use_pallas=False)
    cd = ctx.get_context_data(chain_index)
    k = cd.size_ql
    rows = qlp_rows(ctx, k)

    def prep(t64):
        t32 = ntt32.tables32_from_tables64(t64)
        if engine == "mxu":
            return ntt_mxu.prepare_mxu_tables(t32)
        return prepare_sharded_tables32(t32)

    st_qlp = prep(ntt64mod._limb_gather(ctx.ntt, rows))
    evk = np.asarray(pipe.evk)
    evk3 = jnp.asarray(evk.reshape(evk.shape[:-1]
                                   + (st_qlp.n1, st_qlp.n2)))
    return Sharded32Consts(
        pipe=pipe,
        st_qlp=st_qlp,
        st_ql=prep(ctx.tables_q(k)),
        st_p=prep(ctx.tables_p()),
        st_ql_next=prep(ctx.tables_q(k - 1)),
        st_last=prep(ntt64mod._limb_slice(ctx.ntt, (k - 1, k))),
        evk3=evk3,
    )


def sharded_mult_relin_rescale32(c: Sharded32Consts, mesh: Mesh,
                                 d1, d2):
    """d1, d2: (2, size_ql, n1, n2) u32 NTT form, n2 sharded over "coeff".

    Bit-identical to pipeline32.mult_relin_rescale32."""
    ks: KeySwitch32 = c.pipe.ks
    k = ks.size_ql
    alpha = ks.size_p
    beta = len(ks.digit_convs)
    d1 = _sc(mesh, d1)
    d2 = _sc(mesh, d2)
    t0, t1, t2 = _tensor3(ks.mv_ql, d1, d2)

    # modup (coeff-form path: iNTT then per-digit conversion)
    c2_coeff = _inv_sharded(t2, c.st_ql, mesh)
    t_up = []
    for d in range(beta):
        lo, hi = d * alpha, min((d + 1) * alpha, k)
        x = _sc(mesh, c2_coeff[lo:hi])
        compl = _sc(mesh, _bconv_approx3_32(x, ks.digit_convs[d]))
        assembled = _sc(mesh, jnp.concatenate(
            [compl[:lo], x, compl[lo:]], axis=0))
        t_up.append(_fwd_sharded(assembled, c.st_qlp, mesh))
    t_up = jnp.stack(t_up)

    # inner product
    halves = []
    for j in range(2):
        cc = jnp.zeros(t_up.shape[1:], dtype=jnp.uint32)
        hh = jnp.zeros(t_up.shape[1:], dtype=jnp.uint32)
        ll = jnp.zeros(t_up.shape[1:], dtype=jnp.uint32)
        for d in range(beta):
            h, l = m32.mul_wide32(t_up[d], c.evk3[d, j])
            ll, cr = m32.add_u32_carry(ll, l)
            hh2, cr2 = m32.add_u32_carry(hh, h + cr)
            hh = hh2
            cc = cc + cr2
        halves.append(_sc(mesh, _reduce_u96_3(cc, hh, ll, ks.mv_qlp)))

    # moddown both halves
    q = _b3(ks.mv_ql.q)
    outs = []
    for s, base in zip(halves, (t0, t1)):
        x_q = _sc(mesh, s[:k])
        x_p = _inv_sharded(s[k:], c.st_p, mesh)
        delta = _sc(mesh, _bconv_exact3_32(x_p, ks.p_to_q))
        delta_ntt = _fwd_sharded(delta, c.st_ql, mesh)
        diff = m32.sub_mod32(x_q, delta_ntt, q)
        down = m32.mul_mod_shoup32(diff, _b3(ks.pinv), _b3(ks.pinv_shoup), q)
        outs.append(m32.add_mod32(base, down, q))
    out = _sc(mesh, jnp.stack(outs))

    # rescale
    p = c.pipe
    xl = jnp.stack([
        _inv_sharded(out[i, k - 1:k], c.st_last, mesh)
        for i in range(2)])
    qlast = ks.mv_ql.q[k - 1]
    xl = m32.add_mod32(xl, p.half, qlast)
    rest_q = ks.mv_ql.q[:k - 1][:, None, None]
    rest_rh = ks.mv_ql.ratio_hi[:k - 1][:, None, None]
    red = m32.barrett_reduce_u32(xl, rest_q, rest_rh)
    delta = _sc(mesh, m32.sub_mod32(red, p.half_mod_q[:, None, None],
                                    rest_q))
    delta_ntt = jnp.stack([
        _fwd_sharded(delta[i], c.st_ql_next, mesh)
        for i in range(2)])
    diff = m32.sub_mod32(out[:, :k - 1], delta_ntt, rest_q)
    return m32.mul_mod_shoup32(diff, p.qlast_inv[:, None, None],
                               p.qlast_inv_shoup[:, None, None], rest_q)


def build_sharded_step32(ctx, rlk, mesh: Mesh, chain_index: int = 1,
                         engine: str = "xla"):
    """Jitted batched step over a ("dp", "coeff") mesh; (B, 2, L, n1, n2)
    u32 batches, B over "dp", n2 over "coeff"."""
    consts = build_sharded32(ctx, rlk, chain_index, engine)

    def one(cc, d1, d2):
        return sharded_mult_relin_rescale32(cc, mesh, d1, d2)

    batched = jax.vmap(one, in_axes=(None, 0, 0))
    sh = NamedSharding(mesh, P("dp", None, None, None, "coeff"))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(batched, in_shardings=(rep, sh, sh), out_shardings=sh)
    return consts, lambda d1, d2: jitted(consts, d1, d2)
