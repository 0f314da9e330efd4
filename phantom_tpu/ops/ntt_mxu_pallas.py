"""Fused Pallas kernel for the four-step MXU NTT ("mxu-pallas" engine).

Same math and tables as ops/ntt_mxu.py (digit-plane modular matmuls with
per-diagonal Shoup folds, reference counterpart fntt_2d.cu/intt_2d.cu),
but the whole per-limb transform runs inside ONE Pallas program: plane
extraction, the 2x ~16 int8 MXU dots, the paired-diagonal folds, the
twiddle product and the moddown/rescale epilogue never leave VMEM.  The
XLA formulation materializes every diagonal partial to HBM (~7 x 8 MB
per (32, N) matmul at N=65536 — the dominant cost of the headline step,
measured via benchmarks/profile_trace.py); here HBM sees one read of x,
one read of the limb's tables, one write of the result.

Mosaic-legality notes (hard-won, see ops/ntt_pallas.py which predates
them): data blocks are rank-3 (1, n1, n2) so the trailing two dims span
the array (the block-shape rule demands multiples of (8, 128) or full
dims); int8 table blocks (P, 1, m, k) satisfy the (32, 128) int8 tile;
per-limb fold constants ride SMEM rows (1, D); no in-kernel reshape,
stack or transpose anywhere.

Plane dots run as s8 x s8 -> s32 `dot_general` on the MXU by default;
set DOT_MODE = "bf16" if a Mosaic version rejects integer matmuls — the
bf16 x bf16 -> f32 form is exact while (2^bits - 1)^2 * contract < 2^24
(asserted) and converts back to i32 losslessly.

Bit-identical to ntt_mxu / ntt32 / the u64 engine on every path
(tests/test_ntt_mxu_pallas.py; interpret mode on CPU, Mosaic on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath32 import U32, csub32, mul_mod_shoup_lazy32
from .ntt_mxu import MXUNTTTables, _max_partial

# "int8": s8 dots with s32 accumulation (native MXU int8 mode).
# "bf16": bf16 dots with f32 accumulation (fallback; exact below 2^24).
DOT_MODE = "int8"


def _plane_list(x, bits: int, value_bits: int):
    nplanes = -(-value_bits // bits)
    mask = U32((1 << bits) - 1)
    if DOT_MODE == "bf16":
        dt = jnp.bfloat16
    else:
        dt = jnp.int8 if bits <= 7 else jnp.int32  # 2^8-1 overflows s8
    return [((x >> U32(bits * p)) & mask).astype(dt) for p in range(nplanes)]


def _dot(a, b, dn):
    if DOT_MODE == "int8":
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.int32)
    return jax.lax.dot_general(a, b, dimension_numbers=dn,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)


_DN = (((1,), (0,)), ((), ()))  # plain (m, k) @ (k, c)


def _mm_fold(aps, bps, q, pd_ref, pds_ref, bits, contract_len):
    """sum over planes of aps[a] @ bps[b] * 2^(bits*(a+b)) mod q, all in
    VMEM.  Adjacent diagonals are computed in pairs and merged into one
    u32 word before the Shoup fold when provably overflow-free (mirror of
    ntt_mxu._fold_diagonals), so peak live partials stay at two i32
    buffers and the fold count is ~halved."""
    nd = len(aps) + len(bps) - 1
    mp = _max_partial(bits, contract_len, len(aps), len(bps))
    pair = mp * ((1 << bits) + 1) <= 0xFFFFFFFF
    if DOT_MODE == "bf16":
        assert ((1 << bits) - 1) ** 2 * contract_len < (1 << 24), \
            "bf16 dot mode inexact at this plane radix / tile size"
    two_q = q * U32(2)

    def diag(d):
        p = None
        for a in range(max(0, d - len(bps) + 1), min(len(aps), d + 1)):
            t = _dot(aps[a], bps[d - a], _DN)
            p = t if p is None else p + t
        return p

    acc = None
    step = 2 if pair else 1
    for j in range(0, nd, step):
        w = diag(j).astype(jnp.uint32)
        if pair and j + 1 < nd:
            w = w + (diag(j + 1).astype(jnp.uint32) << U32(bits))
        term = mul_mod_shoup_lazy32(w, pd_ref[0, j], pds_ref[0, j], q)
        acc = term if acc is None else csub32(acc + term, two_q)
    return csub32(acc, q)


def _fwd_kernel(bits, q_bits, fused, x_ref, wa_ref, d_ref, ds_ref, wb_ref,
                q_ref, pd_ref, pds_ref, *rest):
    if fused:
        s_ref, sc_ref, scs_ref, o_ref = rest
    else:
        (o_ref,) = rest
    q = q_ref[0, 0]
    n1 = x_ref.shape[1]
    n2 = x_ref.shape[2]
    x = csub32(x_ref[0], q)                      # tolerate lazy [0, 2q)
    xps = _plane_list(x, bits, q_bits)
    waps = [wa_ref[p, 0] for p in range(wa_ref.shape[0])]
    z = _mm_fold(waps, xps, q, pd_ref, pds_ref, bits, n1)
    v = csub32(mul_mod_shoup_lazy32(z, d_ref[0], ds_ref[0], q), q)
    vps = _plane_list(v, bits, q_bits)
    wbps = [wb_ref[p, 0] for p in range(wb_ref.shape[0])]
    out = _mm_fold(vps, wbps, q, pd_ref, pds_ref, bits, n2)
    if fused:
        diff = s_ref[0] - out + q                # sub_from in [0, q)
        out = csub32(mul_mod_shoup_lazy32(diff, sc_ref[0, 0],
                                          scs_ref[0, 0], q), q)
    o_ref[0] = out


def _inv_kernel(bits, q_bits, x_ref, wbi_ref, di_ref, dis_ref, wai_ref,
                q_ref, pd_ref, pds_ref, sc_ref, scs_ref, o_ref):
    q = q_ref[0, 0]
    n1 = x_ref.shape[1]
    n2 = x_ref.shape[2]
    x = csub32(x_ref[0], q)
    xps = _plane_list(x, bits, q_bits)
    wbips = [wbi_ref[p, 0] for p in range(wbi_ref.shape[0])]
    s = _mm_fold(xps, wbips, q, pd_ref, pds_ref, bits, n2)
    v = mul_mod_shoup_lazy32(s, di_ref[0], dis_ref[0], q)
    v = csub32(mul_mod_shoup_lazy32(v, sc_ref[0, 0], scs_ref[0, 0], q), q)
    vps = _plane_list(v, bits, q_bits)
    waips = [wai_ref[p, 0] for p in range(wai_ref.shape[0])]
    o_ref[0] = _mm_fold(waips, vps, q, pd_ref, pds_ref, bits, n1)


def _specs(t: MXUNTTTables, num_l: int, fused: bool, inverse: bool):
    n1, n2 = t.n1, t.n2
    nplanes = t.wa.shape[0]
    n_diag = t.pow_diag.shape[1]
    data = pl.BlockSpec((1, n1, n2), lambda l: (l, 0, 0),
                        memory_space=pltpu.VMEM)
    left = pl.BlockSpec((nplanes, 1, n1, n1), lambda l: (0, l % num_l, 0, 0),
                        memory_space=pltpu.VMEM)
    right = pl.BlockSpec((nplanes, 1, n2, n2), lambda l: (0, l % num_l, 0, 0),
                         memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((1, n1, n2), lambda l: (l % num_l, 0, 0),
                      memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1), lambda l: (l % num_l, 0),
                          memory_space=pltpu.SMEM)
    diag = pl.BlockSpec((1, n_diag), lambda l: (l % num_l, 0),
                        memory_space=pltpu.SMEM)
    if inverse:
        return [data, right, tw, tw, left, scalar, diag, diag, scalar,
                scalar]
    specs = [data, left, tw, tw, right, scalar, diag, diag]
    if fused:
        specs += [data, scalar, scalar]
    return specs


def ntt_forward_mxu_pallas(x: jnp.ndarray, t: MXUNTTTables,
                           sub_from=None, epi_scale=None,
                           epi_scale_shoup=None,
                           interpret=None) -> jnp.ndarray:
    """x: (..., L, N) uint32 in [0, q) -> NTT form in [0, q); with
    sub_from/epi_scale: (sub_from - NTT(x)) * epi_scale, the fused
    moddown/rescale epilogue (reference: ntt_moddown.cu:222)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    lead = x.shape[:-1]
    num_l = x.shape[-2]
    nrows = int(np.prod(lead)) if lead else 1
    xm = x.reshape(nrows, n1, n2)
    fused = sub_from is not None
    kern = functools.partial(_fwd_kernel, t.plane_bits, t.q_bits, fused)
    args = [xm, t.wa, t.d.reshape(-1, n1, n2),
            t.d_shoup.reshape(-1, n1, n2), t.wb, t.q.reshape(-1, 1),
            t.pow_diag, t.pow_diag_shoup]
    if fused:
        args += [jnp.asarray(sub_from, jnp.uint32).reshape(nrows, n1, n2),
                 jnp.asarray(epi_scale, jnp.uint32).reshape(-1, 1),
                 jnp.asarray(epi_scale_shoup, jnp.uint32).reshape(-1, 1)]
    out = pl.pallas_call(
        kern,
        grid=(nrows,),
        in_specs=_specs(t, num_l, fused, inverse=False),
        out_specs=pl.BlockSpec((1, n1, n2), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, n1, n2), jnp.uint32),
        interpret=interpret,
    )(*args)
    return out.reshape(*lead, n1 * n2)


def ntt_inverse_mxu_pallas(x: jnp.ndarray, t: MXUNTTTables,
                           scale: Optional[jnp.ndarray] = None,
                           scale_shoup: Optional[jnp.ndarray] = None,
                           interpret=None) -> jnp.ndarray:
    """x: (..., L, N) uint32 in [0, 2q) -> coefficients in [0, q).
    `scale` (default inv_degree) REPLACES the 1/N normalization."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    lead = x.shape[:-1]
    num_l = x.shape[-2]
    nrows = int(np.prod(lead)) if lead else 1
    xm = x.reshape(nrows, n1, n2)
    if scale is None:
        scale = t.inv_degree
        scale_shoup = t.inv_degree_shoup
    kern = functools.partial(_inv_kernel, t.plane_bits, t.q_bits)
    out = pl.pallas_call(
        kern,
        grid=(nrows,),
        in_specs=_specs(t, num_l, fused=False, inverse=True),
        out_specs=pl.BlockSpec((1, n1, n2), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, n1, n2), jnp.uint32),
        interpret=interpret,
    )(xm, t.wbi, t.di.reshape(-1, n1, n2), t.di_shoup.reshape(-1, n1, n2),
      t.wai, t.q.reshape(-1, 1), t.pow_diag, t.pow_diag_shoup,
      jnp.asarray(scale, jnp.uint32).reshape(-1, 1),
      jnp.asarray(scale_shoup, jnp.uint32).reshape(-1, 1))
    return out.reshape(*lead, n1 * n2)
