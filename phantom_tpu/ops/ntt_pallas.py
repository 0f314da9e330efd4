"""Pallas TPU kernel for the negacyclic NTT (32-bit fast path).

TPU-native counterpart of the reference's 2D radix-8 shared-memory NTT
(src/ntt/fntt_2d.cu, intt_2d.cu): N = n1 x n2 is processed as
  phase A: cross-row butterfly stages on the (n1, n2) matrix view
           (sublane-axis reshapes; lanes untouched),
  transpose (the VMEM analogue of the reference's shared-memory exchange,
           fntt_2d.cu phase boundary),
  phase B: within-row stages in the transposed layout, with twiddle tables
           pre-transposed on the host so every stage is a static slice +
           broadcast.
The whole transform stays in VMEM: one HBM read + one write per limb row,
versus one round trip per stage for the stage-by-stage XLA path.

Residues are single uint32 words (q < 2^30, ops/modmath32.py); a butterfly
is ~15 native VPU int32 ops.  Grid = one limb row per program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath32 import U32, csub32, mul_mod_shoup_lazy32
from .ntt32 import NTTTables32

# Mosaic requires i32 index-map returns; a Python 0 traces as weak i64 under
# jax_enable_x64 and fails to legalize (seen on hardware 2026-08-19)
_I0 = np.int32(0)


def _mod(i, m: int):
    """i % m as pure-i32 lax.rem (jnp's `%` emits an i64-promoted remainder
    jaxpr under x64 that Mosaic's index-map legalization rejects)."""
    return jax.lax.rem(jax.lax.convert_element_type(i, jnp.int32),
                       np.int32(m))


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _u32cast(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _t32(x):
    """u32 transpose via an i32 bitcast hop: Mosaic's u32 transpose
    lowering crashes the compile helper (exit 1, seen on v5e 2026-08-19);
    the i32 path is its native relayout type.  Bit-identical."""
    return _u32cast(_i32(x).T)


def _stack2(a, b, shape):
    """jnp.stack([a, b], axis=1).reshape(shape) with the same i32 hop
    (u32 stack hits the identical Mosaic crash)."""
    return _u32cast(jnp.stack([_i32(a), _i32(b)], axis=1).reshape(shape))


def _split_n(n: int):
    """n1 x n2 = N with n1 <= n2, both powers of two."""
    logn = n.bit_length() - 1
    log1 = logn // 2
    return 1 << log1, 1 << (logn - log1)


@flax.struct.dataclass
class PallasNTTTables:
    """Per-base tables with phase-B regions pre-transposed.

    For stage m >= n1 the region [m, 2m) stores the (n1, m/n1) natural
    layout transposed to (m/n1, n1) so the kernel reads it with a static
    slice + reshape (no in-kernel gathers)."""

    q: jnp.ndarray           # (L,) uint32
    fwd: jnp.ndarray         # (L, N) value table, phase-B transposed
    fwd_shoup: jnp.ndarray
    inv: jnp.ndarray
    inv_shoup: jnp.ndarray
    inv_degree: jnp.ndarray        # (L,)
    inv_degree_shoup: jnp.ndarray  # (L,)
    n1: int = flax.struct.field(pytree_node=False, default=0)
    n2: int = flax.struct.field(pytree_node=False, default=0)

    def limb_slice(self, idx) -> "PallasNTTTables":
        ia = np.asarray(idx)
        return PallasNTTTables(
            q=self.q[ia], fwd=self.fwd[ia], fwd_shoup=self.fwd_shoup[ia],
            inv=self.inv[ia], inv_shoup=self.inv_shoup[ia],
            inv_degree=self.inv_degree[ia],
            inv_degree_shoup=self.inv_degree_shoup[ia],
            n1=self.n1, n2=self.n2)


def _transpose_regions(table: np.ndarray, n1: int) -> np.ndarray:
    """Transpose every stage region [m, 2m) for m >= n1, per limb row."""
    out = table.copy()
    n = table.shape[-1]
    m = n1
    while m < n:
        seg = table[..., m:2 * m]
        L = seg.shape[0]
        out[..., m:2 * m] = seg.reshape(L, n1, m // n1).transpose(
            0, 2, 1).reshape(L, m)
        m <<= 1
    return out


def prepare_tables(t32: NTTTables32) -> PallasNTTTables:
    n = t32.n
    n1, n2 = _split_n(n)
    fwd = np.asarray(t32.root_powers)
    fws = np.asarray(t32.root_powers_shoup)
    inv = np.asarray(t32.inv_root_powers)
    ivs = np.asarray(t32.inv_root_powers_shoup)
    return PallasNTTTables(
        q=t32.q,
        fwd=jnp.asarray(_transpose_regions(fwd, n1)),
        fwd_shoup=jnp.asarray(_transpose_regions(fws, n1)),
        inv=jnp.asarray(_transpose_regions(inv, n1)),
        inv_shoup=jnp.asarray(_transpose_regions(ivs, n1)),
        inv_degree=t32.inv_degree,
        inv_degree_shoup=t32.inv_degree_shoup,
        n1=n1, n2=n2)


def _fwd_kernel(n1, n2, num_l, x_ref, w_ref, ws_ref, q_ref, o_ref):
    n = n1 * n2
    lid = _mod(pl.program_id(0), num_l)
    q = q_ref[lid, 0]
    two_q = q * U32(2)
    x = x_ref[0, 0].reshape(n1, n2)

    # phase A: cross-row stages m = 1 .. n1/2
    m = 1
    while m < n1:
        h1 = n1 // (2 * m)
        xr = x.reshape(m, 2, h1, n2)
        w = w_ref[0, 0, m:2 * m].reshape(m, 1, 1)
        ws = ws_ref[0, 0, m:2 * m].reshape(m, 1, 1)
        u = xr[:, 0]
        v = xr[:, 1]
        u = csub32(u, two_q)
        wv = mul_mod_shoup_lazy32(v, w, ws, q)
        x = _stack2(u + wv, u - wv + two_q, (n1, n2))
        m <<= 1

    # phase boundary: transpose (the shared-memory exchange)
    xt = _t32(x)  # (n2, n1)

    # phase B: within-row stages m = n1 .. n/2 (transposed twiddle regions)
    while m < n:
        mr = m // n1
        t_len = n2 // (2 * mr)
        xr = xt.reshape(mr, 2, t_len, n1)
        w = w_ref[0, 0, m:2 * m].reshape(mr, 1, n1)
        ws = ws_ref[0, 0, m:2 * m].reshape(mr, 1, n1)
        u = xr[:, 0]
        v = xr[:, 1]
        u = csub32(u, two_q)
        wv = mul_mod_shoup_lazy32(v, w, ws, q)
        xt = _stack2(u + wv, u - wv + two_q, (n2, n1))
        m <<= 1

    out = _t32(xt).reshape(n)
    o_ref[0, 0] = csub32(csub32(out, two_q), q)


def _inv_kernel(n1, n2, num_l, x_ref, w_ref, ws_ref, q_ref, sc_ref,
                scs_ref, o_ref):
    n = n1 * n2
    lid = _mod(pl.program_id(0), num_l)
    q = q_ref[lid, 0]
    two_q = q * U32(2)
    xt = _t32(x_ref[0, 0].reshape(n1, n2))  # (n2, n1)

    # phase B': within-row GS stages m = n/2 .. n1
    m = n // 2
    while m >= n1:
        mr = m // n1
        t_len = n2 // (2 * mr)
        xr = xt.reshape(mr, 2, t_len, n1)
        w = w_ref[0, 0, m:2 * m].reshape(mr, 1, n1)
        ws = ws_ref[0, 0, m:2 * m].reshape(mr, 1, n1)
        u = xr[:, 0]
        v = xr[:, 1]
        s = u + v
        s = csub32(s, two_q)
        d = mul_mod_shoup_lazy32(u - v + two_q, w, ws, q)
        xt = _stack2(s, d, (n2, n1))
        m >>= 1

    x = _t32(xt)  # (n1, n2)

    # phase A': cross-row stages m = n1/2 .. 1
    while m >= 1:
        h1 = n1 // (2 * m)
        xr = x.reshape(m, 2, h1, n2)
        w = w_ref[0, 0, m:2 * m].reshape(m, 1, 1)
        ws = ws_ref[0, 0, m:2 * m].reshape(m, 1, 1)
        u = xr[:, 0]
        v = xr[:, 1]
        s = u + v
        s = csub32(s, two_q)
        d = mul_mod_shoup_lazy32(u - v + two_q, w, ws, q)
        x = _stack2(s, d, (n1, n2))
        m >>= 1

    out = x.reshape(n)
    o_ref[0, 0] = csub32(mul_mod_shoup_lazy32(out, sc_ref[lid, 0],
                                              scs_ref[lid, 0], q), q)


def _fwd_fused_kernel(n1, n2, num_l, x_ref, w_ref, ws_ref, q_ref, s_ref,
                      sc_ref, scs_ref, o_ref):
    """Forward NTT with the moddown/rescale epilogue fused:
    out = (sub_from - NTT(x)) * scale mod q, all in one VMEM pass
    (reference: nwt_2d_radix8_forward_inplace_fuse_moddown,
    ntt_moddown.cu:222).  Bit-identical to fNTT + sub_mod32 +
    mul_mod_shoup32."""
    n = n1 * n2
    lid = _mod(pl.program_id(0), num_l)
    q = q_ref[lid, 0]
    two_q = q * U32(2)
    x = x_ref[0, 0].reshape(n1, n2)

    m = 1
    while m < n1:
        h1 = n1 // (2 * m)
        xr = x.reshape(m, 2, h1, n2)
        w = w_ref[0, 0, m:2 * m].reshape(m, 1, 1)
        ws = ws_ref[0, 0, m:2 * m].reshape(m, 1, 1)
        u = xr[:, 0]
        v = xr[:, 1]
        u = csub32(u, two_q)
        wv = mul_mod_shoup_lazy32(v, w, ws, q)
        x = _stack2(u + wv, u - wv + two_q, (n1, n2))
        m <<= 1

    xt = _t32(x)

    while m < n:
        mr = m // n1
        t_len = n2 // (2 * mr)
        xr = xt.reshape(mr, 2, t_len, n1)
        w = w_ref[0, 0, m:2 * m].reshape(mr, 1, n1)
        ws = ws_ref[0, 0, m:2 * m].reshape(mr, 1, n1)
        u = xr[:, 0]
        v = xr[:, 1]
        u = csub32(u, two_q)
        wv = mul_mod_shoup_lazy32(v, w, ws, q)
        xt = _stack2(u + wv, u - wv + two_q, (n2, n1))
        m <<= 1

    ntt = csub32(csub32(_t32(xt).reshape(n), two_q), q)
    diff = s_ref[0, 0] - ntt + q  # sub_from in [0,q): diff in (0, 2q)
    o_ref[0, 0] = csub32(mul_mod_shoup_lazy32(diff, sc_ref[lid, 0],
                                              scs_ref[lid, 0], q), q)


def _row_call(kernel, nrows, num_l, n, extra_rows, interpret):
    """pallas_call gridded one (limb) row per program; table rows are
    reused across the leading batch via a modulo index map.  Per-limb
    scalars ride as FULL-array (L, 1) SMEM blocks indexed in-kernel by the
    limb id (Mosaic applies the block-shape rule to SMEM blocks; (1, 1)
    blocks of an (L, 1) array fail lowering — seen on hardware
    2026-08-19)."""
    data_spec = pl.BlockSpec((1, 1, n), lambda l: (l, _I0, _I0),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, 1, n), lambda l: (_mod(l, num_l), _I0, _I0),
                              memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((num_l, 1), lambda l: (_I0, _I0),
                               memory_space=pltpu.SMEM)
    in_specs = [data_spec, table_spec, table_spec, scalar_spec]
    in_specs += [scalar_spec] * extra_rows
    return pl.pallas_call(
        kernel,
        grid=(nrows,),
        in_specs=in_specs,
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, 1, n), jnp.uint32),
        interpret=interpret,
    )


def ntt_forward_pallas(x: jnp.ndarray, t: PallasNTTTables,
                       sub_from=None, epi_scale=None, epi_scale_shoup=None,
                       interpret=None) -> jnp.ndarray:
    """x: (..., L, N) uint32 in [0, q) -> NTT form in [0, q).

    With sub_from/epi_scale set, returns (sub_from - NTT(x)) * epi_scale
    instead — the fused moddown/rescale epilogue (one VMEM pass; reference:
    ntt_moddown.cu:222)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = t.n1 * t.n2
    lead = x.shape[:-1]
    num_l = x.shape[-2]
    nrows = int(np.prod(lead)) if lead else 1
    xf = x.reshape(nrows, 1, n)
    if sub_from is None:
        kern = functools.partial(_fwd_kernel, t.n1, t.n2, num_l)
        out = _row_call(kern, nrows, num_l, n, 0, interpret)(
            xf, t.fwd.reshape(-1, 1, n), t.fwd_shoup.reshape(-1, 1, n),
            t.q.reshape(-1, 1))
        return out.reshape(*lead, n)
    sf = jnp.asarray(sub_from, dtype=jnp.uint32).reshape(nrows, 1, n)
    sc = jnp.asarray(epi_scale, dtype=jnp.uint32).reshape(-1, 1)
    scs = jnp.asarray(epi_scale_shoup, dtype=jnp.uint32).reshape(-1, 1)
    data_spec = pl.BlockSpec((1, 1, n), lambda l: (l, _I0, _I0),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, 1, n), lambda l: (_mod(l, num_l), _I0, _I0),
                              memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((num_l, 1), lambda l: (_I0, _I0),
                               memory_space=pltpu.SMEM)
    kern = functools.partial(_fwd_fused_kernel, t.n1, t.n2, num_l)
    out = pl.pallas_call(
        kern,
        grid=(nrows,),
        in_specs=[data_spec, table_spec, table_spec, scalar_spec,
                  data_spec, scalar_spec, scalar_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, 1, n), jnp.uint32),
        interpret=interpret,
    )(xf, t.fwd.reshape(-1, 1, n), t.fwd_shoup.reshape(-1, 1, n),
      t.q.reshape(-1, 1), sf, sc, scs)
    return out.reshape(*lead, n)


def ntt_inverse_pallas(x: jnp.ndarray, t: PallasNTTTables,
                       scale=None, scale_shoup=None,
                       interpret=None) -> jnp.ndarray:
    """x: (..., L, N) uint32 in [0, 2q) -> coefficients in [0, q)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = t.n1 * t.n2
    lead = x.shape[:-1]
    num_l = x.shape[-2]
    nrows = int(np.prod(lead)) if lead else 1
    xf = x.reshape(nrows, 1, n)
    if scale is None:
        scale = t.inv_degree
        scale_shoup = t.inv_degree_shoup
    sc = jnp.asarray(scale, dtype=jnp.uint32)
    scs = jnp.asarray(scale_shoup, dtype=jnp.uint32)
    kern = functools.partial(_inv_kernel, t.n1, t.n2, num_l)
    out = _row_call(kern, nrows, num_l, n, 2, interpret)(
        xf, t.inv.reshape(-1, 1, n), t.inv_shoup.reshape(-1, 1, n),
        t.q.reshape(-1, 1), sc.reshape(-1, 1), scs.reshape(-1, 1))
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# keyswitch inner product kernel
# ---------------------------------------------------------------------------

def _ip_kernel(beta, t_ref, e_ref, q_ref, rh_ref, rl_ref, p32_ref, p64_ref,
               o_ref):
    """sum_d t[d] * evk[d] over digits with a (carry, hi, lo) u32 triple,
    reduced once (reference: key_switch_inner_prod_c2_and_evk,
    eval_key_switch.cu:14-69)."""
    from .modmath32 import (add_mod32, add_u32_carry, barrett_reduce_u32,
                            mul_mod32, mul_wide32)
    kid = jax.lax.convert_element_type(pl.program_id(1), jnp.int32)
    q = q_ref[kid, 0]
    rh = rh_ref[kid, 0]
    rl = rl_ref[kid, 0]
    c = jnp.zeros_like(t_ref[0, 0])
    hi = jnp.zeros_like(c)
    lo = jnp.zeros_like(c)
    for d in range(beta):
        h, l = mul_wide32(t_ref[d, 0], e_ref[d, 0, 0])
        lo, cr = add_u32_carry(lo, l)
        hi2, cr2 = add_u32_carry(hi, h + cr)
        hi = hi2
        c = c + cr2
    t_c = mul_mod32(barrett_reduce_u32(c, q, rh), p64_ref[kid, 0], q, rh, rl)
    t_h = mul_mod32(barrett_reduce_u32(hi, q, rh), p32_ref[kid, 0], q, rh, rl)
    t_l = barrett_reduce_u32(lo, q, rh)
    o_ref[0, 0] = add_mod32(add_mod32(t_c, t_h, q), t_l, q)


def keyswitch_inner_product_pallas(t_modup: jnp.ndarray, evk: jnp.ndarray,
                                   mv, interpret=None) -> jnp.ndarray:
    """t_modup: (beta, K, N) u32; evk: (beta, 2, K, N) u32; mv: ModulusVec32
    for the K rows.  Returns (2, K, N) u32 in [0, q)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    beta, kk, n = t_modup.shape
    t_spec = pl.BlockSpec((beta, 1, n), lambda j, k: (_I0, k, _I0),
                          memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((beta, 1, 1, n), lambda j, k: (_I0, j, k, _I0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((kk, 1), lambda j, k: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, 1, n), lambda j, k: (j, k, _I0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_ip_kernel, beta)
    col = lambda a: a.reshape(-1, 1)
    return pl.pallas_call(
        kern,
        grid=(2, kk),
        in_specs=[t_spec, e_spec, s_spec, s_spec, s_spec, s_spec, s_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, kk, n), jnp.uint32),
        interpret=interpret,
    )(t_modup, evk, col(mv.q), col(mv.ratio_hi), col(mv.ratio_lo),
      col(mv.pow32), col(mv.pow64))
