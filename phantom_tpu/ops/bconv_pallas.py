"""Pallas fold-matmul: the base-conversion / scale-and-round modular
matmul in VMEM (reference: bconv_matmul_kernel, rns_bconv.cu:109).

One program per column block computes out[:, c] = sum_i y[i, c] * mat[:, i]
mod p via the digit-plane MXU dots + per-diagonal Shoup folds of
bconv32.accumulate_fold32 — but the int32 diagonal partials live only in
VMEM instead of materializing (k_out, N) arrays to HBM per diagonal (the
XLA formulation's dominant cost for this op).  Serves every
bconv32._accumulate_reduce32 call site: BEHZ/HPS base extensions, the
exact scale-and-round omega matmul, moddown deltas on non-fused engines.

Bit-identical to the XLA paths (tests/test_bconv_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath32 as m32
from .modmath32 import U32


def _kernel(bits, nplanes, pair, pdt, y_ref, matp_ref, q_ref, pd_ref, pds_ref,
            o_ref):
    mask = U32((1 << bits) - 1)
    # Mosaic has no i32 MXU matmul; the radix-2^8 mode runs bf16 planes
    # with f32 accumulation on hardware.  Each single dot is exact while
    # its k_in-term partial sums stay < 2^24 (plane values <= 255 are
    # bf16-exact integers); the CROSS-dot diagonal sums are accumulated as
    # i32 immediately after each dot, so nplanes does NOT tighten the f32
    # bound (round-2 advisor fix).
    acc_t = jnp.float32 if pdt == jnp.bfloat16 else jnp.int32
    # Mosaic can't lower uint32->bfloat16 directly; hop through int32
    def to_plane(x):
        return x.astype(jnp.int32).astype(pdt) if pdt == jnp.bfloat16 \
            else x.astype(pdt)
    yps = [to_plane((y_ref[...] >> U32(bits * b)) & mask)
           for b in range(nplanes)]
    mps = [matp_ref[a] for a in range(nplanes)]
    q = q_ref[...][:, :1]
    two_q = q * U32(2)
    dn = (((1,), (0,)), ((), ()))
    nd = 2 * nplanes - 1

    def diag(d):
        p_ = None
        for a in range(max(0, d - nplanes + 1), min(nplanes, d + 1)):
            t = jax.lax.dot_general(mps[a], yps[d - a], dimension_numbers=dn,
                                    preferred_element_type=acc_t)
            if t.dtype != jnp.int32:
                # f32 -> i32 right away: diagonal sums ride i32 (< 2^31 by
                # the caller's pair/overflow bound), not f32
                t = t.astype(jnp.int32)
            p_ = t if p_ is None else p_ + t
        return p_

    def to_u32(x):
        return x.astype(jnp.uint32)

    acc = None
    step = 2 if pair else 1
    for j in range(0, nd, step):
        w = to_u32(diag(j))
        if pair and j + 1 < nd:
            w = w + (to_u32(diag(j + 1)) << U32(bits))
        term = m32.mul_mod_shoup_lazy32(
            w, pd_ref[...][:, j][:, None], pds_ref[...][:, j][:, None], q)
        acc = term if acc is None else m32.csub32(acc + term, two_q)
    o_ref[...] = m32.csub32(acc, q)


# None = auto: on for TPU backends, off elsewhere (interpret-mode Pallas on
# CPU is far slower than the XLA triple path).  PHANTOM_PALLAS_BCONV=0
# forces it off (hardware-day bisection knob).
import os as _os
USE_PALLAS_BCONV = (False if _os.environ.get("PHANTOM_PALLAS_BCONV") == "0"
                    else None)

# column block: large enough to keep the MXU busy, small enough that
# double-buffered y/out blocks stay tiny next to the resident mat planes
BLOCK_N = 2048


def _enabled() -> bool:
    if USE_PALLAS_BCONV is not None:
        return USE_PALLAS_BCONV
    return jax.default_backend() == "tpu"


def fold_matmul_pallas(y: jnp.ndarray, mat: jnp.ndarray, obase,
                       pow2: jnp.ndarray, pow2_shoup: jnp.ndarray,
                       bits: int, interpret=None,
                       force_pdt=None) -> jnp.ndarray:
    """out[j, c] = sum_i y[i, c] * mat[j, i] mod obase.q[j], entries and
    y values < 2^30.  y: (k_in, N), mat: (k_out, k_in) u32.

    force_pdt overrides the plane dtype (tests pass jnp.bfloat16 under
    interpret mode to bit-match the hardware bf16 path — round-2 advisor
    knob)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k_in, n = y.shape
    k_out = mat.shape[0]
    nplanes = -(-30 // bits)
    mask = np.uint32((1 << bits) - 1)
    if force_pdt is not None:
        pdt = force_pdt
    elif bits <= 7:
        pdt = jnp.int8
    elif interpret:
        pdt = jnp.int32
    else:
        pdt = jnp.bfloat16  # hardware radix-2^8: f32-accumulated bf16 dots
    if pdt == jnp.bfloat16:
        # single-dot exactness only: diagonal sums accumulate as i32 in
        # the kernel, so nplanes no longer appears in this bound
        if ((1 << bits) - 1) ** 2 * k_in >= (1 << 24):
            raise ValueError("radix-2^8 bf16 fold-matmul exactness bound "
                             f"exceeded at k_in={k_in}; use bits=7 on TPU")
    matp = jnp.stack([((mat >> U32(bits * b)) & mask).astype(pdt)
                      for b in range(nplanes)])
    n_diag = 2 * nplanes - 1
    idx = np.arange(n_diag) * bits
    pd = pow2[:, idx]
    pds = pow2_shoup[:, idx]
    max_partial = ((1 << bits) - 1) ** 2 * k_in * nplanes
    assert max_partial < (1 << 31), \
        f"i32 diagonal accumulation overflows at k_in={k_in}, bits={bits}"
    pair = max_partial * ((1 << bits) + 1) <= 0xFFFFFFFF
    bn = min(BLOCK_N, n)

    kern = functools.partial(_kernel, bits, nplanes, pair, pdt)
    # index-map constants must be int32: under jax_enable_x64 a Python 0
    # traces as i64 and Mosaic fails to legalize the mixed (i64, i32)
    # index-map return (seen on hardware: "failed to legalize func.return")
    Z = np.int32(0)
    return pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((k_in, bn), lambda c: (Z, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nplanes, k_out, k_in), lambda c: (Z, Z, Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_out, 1), lambda c: (Z, Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_out, n_diag), lambda c: (Z, Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_out, n_diag), lambda c: (Z, Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_out, bn), lambda c: (Z, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_out, n), jnp.uint32),
        interpret=interpret,
    )(y, matp, obase.q.reshape(-1, 1), pd, pds)
