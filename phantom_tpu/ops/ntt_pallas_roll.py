"""Roll/select Pallas NTT: the reshape-free VMEM butterfly engine.

Same math as ops/ntt_pallas.py (single-pass VMEM-resident negacyclic NTT,
one limb row per program), but the kernel body uses ONLY operations from
Mosaic's best-supported set: `pltpu.roll`, `pltpu.repeat`,
`broadcasted_iota` masks, static slices and elementwise VPU ops — no
in-kernel reshape, no jnp.stack, no transpose.  The (n1, n2) tile keeps
one layout for the whole transform:

  phase A (stage size m < n1): butterflies pair rows at distance
      h1 = n1/(2m) — `roll` along the sublane axis; the twiddle is a
      per-stage (n1, 1) column (host-precomputed) broadcast over lanes.
  phase B (m >= n1): butterflies pair columns at distance h = n/(2m) —
      `roll` along the lane axis; the twiddle at (i1, j2) is
      rp[m + i1*mr + j2//(2h)] (mr = m/n1), stored host-side as an
      (n1, mr) block and lane-`repeat`ed to (n1, n2) in-kernel.

Every position computes exactly one Shoup product (first half of a
block: w * partner, second half: w * self), then a masked add/sub —
~25 VPU ops per element per stage versus ~7 for the reshape engine's
pairwise form, traded for a kernel body with no layout-changing op at
all.  The GPU reference needs a shared-memory transpose between phases
(fntt_2d.cu:620-736); on the TPU VPU both axes are addressable, so the
transpose disappears entirely.

Bit-identical to ntt32/ntt_pallas/ntt_mxu on every path (interpret-mode
tested; Mosaic validation needs hardware, like ops/ntt_pallas.py).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath32 import U32, csub32, mul_mod_shoup_lazy32
from .ntt32 import NTTTables32
from .ntt_mxu import _split_n
from .ntt_mxu_pallas import _mod

# Mosaic requires i32 index-map returns; a Python 0 traces as weak i64 under
# jax_enable_x64 and fails to legalize (seen on hardware 2026-08-19)
_I0 = np.int32(0)


@flax.struct.dataclass
class RollNTTTables:
    """Per-base tables for the roll/select kernel.

    cols_a: (L, n1, logn1)  phase-A twiddle columns, stage s at [..., s]
    blk_b:  (L, n1, n2-1)   phase-B (n1, mr) stage blocks, concatenated
                            along lanes at offset mr-1 (mr = 1,2,..,n2/2)
    Inverse tables mirror them with GS ordering (stage m from n/2 down).
    """

    q: jnp.ndarray
    cols_a: jnp.ndarray
    cols_a_shoup: jnp.ndarray
    blk_b: jnp.ndarray
    blk_b_shoup: jnp.ndarray
    icols_a: jnp.ndarray
    icols_a_shoup: jnp.ndarray
    iblk_b: jnp.ndarray
    iblk_b_shoup: jnp.ndarray
    inv_degree: jnp.ndarray
    inv_degree_shoup: jnp.ndarray
    n1: int = flax.struct.field(pytree_node=False, default=0)
    n2: int = flax.struct.field(pytree_node=False, default=0)

    def limb_slice(self, idx) -> "RollNTTTables":
        ia = np.asarray(idx)
        return RollNTTTables(
            q=self.q[ia],
            cols_a=self.cols_a[ia], cols_a_shoup=self.cols_a_shoup[ia],
            blk_b=self.blk_b[ia], blk_b_shoup=self.blk_b_shoup[ia],
            icols_a=self.icols_a[ia], icols_a_shoup=self.icols_a_shoup[ia],
            iblk_b=self.iblk_b[ia], iblk_b_shoup=self.iblk_b_shoup[ia],
            inv_degree=self.inv_degree[ia],
            inv_degree_shoup=self.inv_degree_shoup[ia],
            n1=self.n1, n2=self.n2)


def _stage_tables(table: np.ndarray, n1: int, n2: int):
    """Build (L, n1, logn1) phase-A columns and (L, n1, n2-1) phase-B
    blocks from the (L, N) natural-order stage-region table."""
    L, n = table.shape
    logn1 = n1.bit_length() - 1
    i1 = np.arange(n1)
    cols = np.zeros((L, n1, max(logn1, 1)), dtype=table.dtype)
    m = 1
    for s in range(logn1):
        h1 = n1 // (2 * m)
        cols[:, :, s] = table[:, m + i1 // (2 * h1)]
        m <<= 1
    blk = np.zeros((L, n1, max(n2 - 1, 1)), dtype=table.dtype)
    while m < n:
        mr = m // n1
        # T[i1, k] = rp[m + i1*mr + k], laid at lane offset mr-1
        idx = m + i1[:, None] * mr + np.arange(mr)[None, :]
        blk[:, :, mr - 1:2 * mr - 1] = table[:, idx]
        m <<= 1
    return cols, blk


def prepare_roll_tables(t32: NTTTables32) -> RollNTTTables:
    n = t32.n
    n1, n2 = _split_n(n)
    ca, bb = _stage_tables(np.asarray(t32.root_powers), n1, n2)
    cas, bbs = _stage_tables(np.asarray(t32.root_powers_shoup), n1, n2)
    ia, ib = _stage_tables(np.asarray(t32.inv_root_powers), n1, n2)
    ias, ibs = _stage_tables(np.asarray(t32.inv_root_powers_shoup), n1, n2)
    j = jnp.asarray
    return RollNTTTables(
        q=t32.q, cols_a=j(ca), cols_a_shoup=j(cas),
        blk_b=j(bb), blk_b_shoup=j(bbs),
        icols_a=j(ia), icols_a_shoup=j(ias),
        iblk_b=j(ib), iblk_b_shoup=j(ibs),
        inv_degree=t32.inv_degree, inv_degree_shoup=t32.inv_degree_shoup,
        n1=n1, n2=n2)


def _iota_mask(shape, axis, half):
    """(idx // half) even along `axis` — first-half-of-block mask."""
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return ((idx >> int(half).bit_length() - 1) & 1) == 0


def _ct_stage(x, w, ws, q, two_q, dist, axis, shape):
    """Harvey CT butterfly via roll/select: one stage, values [0,4q) in,
    [0,4q) out.  w/ws are full (n1, n2) twiddle broadcasts."""
    xn = csub32(x, two_q)                             # [0, 2q)
    # pltpu.roll takes non-negative shifts: out[i] = x[i - shift].  Shifts
    # must be i32 scalars: a Python int traces as weak i64 under x64 and
    # tpu.dynamic_rotate rejects i64 (seen on hardware 2026-08-19)
    down = pltpu.roll(xn, np.int32(shape[axis] - dist), axis=axis)
    up = pltpu.roll(xn, np.int32(dist), axis=axis)        # x[i - dist]
    first = _iota_mask(shape, axis, dist)
    wv = mul_mod_shoup_lazy32(jnp.where(first, down, xn), w, ws, q)
    u = jnp.where(first, xn, up)
    return jnp.where(first, u + wv, u - wv + two_q)


def _gs_stage(x, w, ws, q, two_q, dist, axis, shape):
    """Harvey GS butterfly via roll/select: values [0,2q) in/out."""
    down = pltpu.roll(x, np.int32(shape[axis] - dist), axis=axis)
    up = pltpu.roll(x, np.int32(dist), axis=axis)         # x[i - dist]
    first = _iota_mask(shape, axis, dist)
    s = x + down
    s = csub32(s, two_q)
    d = mul_mod_shoup_lazy32(up - x + two_q, w, ws, q)
    return jnp.where(first, s, d)


def _bcast_b(blk_ref, scratch, mr, n1, n2):
    """Block-repeat the (n1, mr) stage slice at lane offset mr-1 into a
    (n1, n2) scratch: W[i1, j2] = T[i1, j2 // (n2/mr)].

    pltpu.repeat is tile-concat ([ab] -> [abab]), not element-repeat, so
    the block expansion is written column-block by column-block — each a
    lane-broadcast of a (n1, 1) static slice, still reshape-free."""
    if mr == 1:
        return blk_ref[0, :, 0:1]        # (n1, 1) broadcasts in arithmetic
    width = n2 // mr
    for br in range(mr):
        col = blk_ref[0, :, mr - 1 + br:mr + br]
        scratch[:, br * width:(br + 1) * width] = jnp.broadcast_to(
            col, (n1, width))
    return scratch[:, :]


def _fwd_body(n1, n2, x, ca, cas, bb, bbs, q, wsc, wssc):
    n = n1 * n2
    two_q = q * U32(2)
    shape = (n1, n2)
    m, s = 1, 0
    while m < n1:
        h1 = n1 // (2 * m)
        w = ca[0, :, s:s + 1]
        ws = cas[0, :, s:s + 1]
        x = _ct_stage(x, w, ws, q, two_q, h1, 0, shape)
        m <<= 1
        s += 1
    while m < n:
        mr = m // n1
        h = n2 // (2 * mr)
        w = _bcast_b(bb, wsc, mr, n1, n2)
        ws = _bcast_b(bbs, wssc, mr, n1, n2)
        x = _ct_stage(x, w, ws, q, two_q, h, 1, shape)
        m <<= 1
    return csub32(csub32(x, two_q), q)


def _fwd_kernel(n1, n2, num_l, x_ref, ca_ref, cas_ref, bb_ref, bbs_ref,
                q_ref, o_ref, wsc, wssc):
    lid = _mod(pl.program_id(0), num_l)
    q = q_ref[lid, 0]
    o_ref[0] = _fwd_body(n1, n2, x_ref[0], ca_ref, cas_ref, bb_ref, bbs_ref,
                         q, wsc, wssc)


def _fwd_fused_kernel(n1, n2, num_l, x_ref, ca_ref, cas_ref, bb_ref,
                      bbs_ref, q_ref, s_ref, sc_ref, scs_ref, o_ref,
                      wsc, wssc):
    """(sub_from - NTT(x)) * scale — the fused moddown/rescale epilogue
    (reference: ntt_moddown.cu:222)."""
    lid = _mod(pl.program_id(0), num_l)
    q = q_ref[lid, 0]
    ntt = _fwd_body(n1, n2, x_ref[0], ca_ref, cas_ref, bb_ref, bbs_ref, q,
                    wsc, wssc)
    diff = s_ref[0] - ntt + q
    o_ref[0] = csub32(
        mul_mod_shoup_lazy32(diff, sc_ref[lid, 0], scs_ref[lid, 0], q), q)


def _inv_kernel(n1, n2, num_l, x_ref, ia_ref, ias_ref, ib_ref, ibs_ref,
                q_ref, sc_ref, scs_ref, o_ref, wsc, wssc):
    lid = _mod(pl.program_id(0), num_l)
    q = q_ref[lid, 0]
    two_q = q * U32(2)
    n = n1 * n2
    shape = (n1, n2)
    x = x_ref[0]
    m = n // 2
    while m >= n1:
        mr = m // n1
        h = n2 // (2 * mr)
        w = _bcast_b(ib_ref, wsc, mr, n1, n2)
        ws = _bcast_b(ibs_ref, wssc, mr, n1, n2)
        x = _gs_stage(x, w, ws, q, two_q, h, 1, shape)
        m >>= 1
    s = int(n1).bit_length() - 2
    while m >= 1:
        h1 = n1 // (2 * m)
        w = ia_ref[0, :, s:s + 1]
        ws = ias_ref[0, :, s:s + 1]
        x = _gs_stage(x, w, ws, q, two_q, h1, 0, shape)
        m >>= 1
        s -= 1
    o_ref[0] = csub32(
        mul_mod_shoup_lazy32(x, sc_ref[lid, 0], scs_ref[lid, 0], q), q)


def _call(kernel, t: RollNTTTables, nrows, num_l, extra, interpret):
    n1, n2 = t.n1, t.n2
    data = pl.BlockSpec((1, n1, n2), lambda l: (l, _I0, _I0),
                        memory_space=pltpu.VMEM)
    cols = pl.BlockSpec((1, n1, t.cols_a.shape[-1]),
                        lambda l: (_mod(l, num_l), _I0, _I0),
                        memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, n1, t.blk_b.shape[-1]),
                       lambda l: (_mod(l, num_l), _I0, _I0),
                       memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((num_l, 1), lambda l: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    in_specs = [data, cols, cols, blk, blk, scalar] + list(extra)
    return pl.pallas_call(
        kernel,
        grid=(nrows,),
        in_specs=in_specs,
        out_specs=data,
        out_shape=jax.ShapeDtypeStruct((nrows, n1, n2), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((n1, n2), jnp.uint32),
                        pltpu.VMEM((n1, n2), jnp.uint32)],
        interpret=interpret,
    )


def ntt_forward_roll(x: jnp.ndarray, t: RollNTTTables,
                     sub_from=None, epi_scale=None, epi_scale_shoup=None,
                     interpret=None) -> jnp.ndarray:
    """x: (..., L, N) uint32 in [0, q) -> NTT form in [0, q); with
    sub_from/epi_scale: (sub_from - NTT(x)) * epi_scale (fused
    moddown/rescale epilogue)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2 = t.n1, t.n2
    lead = x.shape[:-1]
    num_l = x.shape[-2]
    nrows = int(np.prod(lead)) if lead else 1
    xm = x.reshape(nrows, n1, n2)
    qcol = t.q.reshape(-1, 1)
    if sub_from is None:
        kern = functools.partial(_fwd_kernel, n1, n2, num_l)
        out = _call(kern, t, nrows, num_l, [], interpret)(
            xm, t.cols_a, t.cols_a_shoup, t.blk_b, t.blk_b_shoup, qcol)
        return out.reshape(*lead, n1 * n2)
    data = pl.BlockSpec((1, n1, n2), lambda l: (l, _I0, _I0),
                        memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((num_l, 1), lambda l: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    kern = functools.partial(_fwd_fused_kernel, n1, n2, num_l)
    out = _call(kern, t, nrows, num_l, [data, scalar, scalar], interpret)(
        xm, t.cols_a, t.cols_a_shoup, t.blk_b, t.blk_b_shoup, qcol,
        jnp.asarray(sub_from, jnp.uint32).reshape(nrows, n1, n2),
        jnp.asarray(epi_scale, jnp.uint32).reshape(-1, 1),
        jnp.asarray(epi_scale_shoup, jnp.uint32).reshape(-1, 1))
    return out.reshape(*lead, n1 * n2)


def ntt_inverse_roll(x: jnp.ndarray, t: RollNTTTables,
                     scale=None, scale_shoup=None,
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
    scalar = pl.BlockSpec((num_l, 1), lambda l: (_I0, _I0),
                          memory_space=pltpu.SMEM)
    kern = functools.partial(_inv_kernel, n1, n2, num_l)
    out = _call(kern, t, nrows, num_l, [scalar, scalar], interpret)(
        xm, t.icols_a, t.icols_a_shoup, t.iblk_b, t.iblk_b_shoup,
        t.q.reshape(-1, 1),
        jnp.asarray(scale, jnp.uint32).reshape(-1, 1),
        jnp.asarray(scale_shoup, jnp.uint32).reshape(-1, 1))
    return out.reshape(*lead, n1 * n2)
