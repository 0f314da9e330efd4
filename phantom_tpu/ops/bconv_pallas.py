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


def _kernel(bits, nplanes, pair, y_ref, matp_ref, q_ref, pd_ref, pds_ref,
            o_ref):
    mask = U32((1 << bits) - 1)
    pdt = jnp.int8 if bits <= 7 else jnp.int32
    yps = [((y_ref[...] >> U32(bits * b)) & mask).astype(pdt)
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
                                    preferred_element_type=jnp.int32)
            p_ = t if p_ is None else p_ + t
        return p_

    acc = None
    step = 2 if pair else 1
    for j in range(0, nd, step):
        w = diag(j).astype(jnp.uint32)
        if pair and j + 1 < nd:
            w = w + (diag(j + 1).astype(jnp.uint32) << U32(bits))
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
                       bits: int, interpret=None) -> jnp.ndarray:
    """out[j, c] = sum_i y[i, c] * mat[j, i] mod obase.q[j], entries and
    y values < 2^30.  y: (k_in, N), mat: (k_out, k_in) u32."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k_in, n = y.shape
    k_out = mat.shape[0]
    nplanes = -(-30 // bits)
    mask = np.uint32((1 << bits) - 1)
    pdt = jnp.int8 if bits <= 7 else jnp.int32
    matp = jnp.stack([((mat >> U32(bits * b)) & mask).astype(pdt)
                      for b in range(nplanes)])
    n_diag = 2 * nplanes - 1
    idx = np.arange(n_diag) * bits
    pd = pow2[:, idx]
    pds = pow2_shoup[:, idx]
    max_partial = ((1 << bits) - 1) ** 2 * k_in * nplanes
    pair = max_partial * ((1 << bits) + 1) <= 0xFFFFFFFF
    bn = min(BLOCK_N, n)

    kern = functools.partial(_kernel, bits, nplanes, pair)
    return pl.pallas_call(
        kern,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((k_in, bn), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nplanes, k_out, k_in), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_out, 1), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_out, n_diag), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_out, n_diag), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_out, bn), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_out, n), jnp.uint32),
        interpret=interpret,
    )(y, matp, obase.q.reshape(-1, 1), pd, pds)
