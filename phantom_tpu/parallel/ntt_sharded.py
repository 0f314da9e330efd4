"""Coefficient-sharded negacyclic NTT: butterfly stages exchanged
all-to-all over the mesh interconnect.

This is the distributed mapping SURVEY.md §5.7 / BASELINE call for: the
reference's two-phase shared-memory NTT (fntt_2d.cu) becomes
  phase A: stages local to each chip (the sharded axis is untouched),
  transpose under a sharding constraint -> GSPMD lowers it to an
           all-to-all over ICI (the inter-chip "shared-memory exchange"),
  phase B: stages local again in the transposed layout.
Twiddle tables ride replicated; phase-B regions are pre-transposed exactly
as in ops/ntt_pallas_roll.py.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ntt as ntt64
from ..ops.modmath import U64, csub, mul_mod_shoup_lazy
from ..ops.ntt_mxu import _split_n


def _transpose_regions(table: np.ndarray, n1: int) -> np.ndarray:
    """Transpose every stage region [m, 2m) for m >= n1, per limb row
    (phase-B twiddle layout for the two-phase butterfly engines; was
    ops/ntt_pallas.py before that engine's retirement — see
    docs/DESIGN.md)."""
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


@flax.struct.dataclass
class ShardedNTTTables:
    q: jnp.ndarray            # (L,)
    fwd: jnp.ndarray          # (L, N), phase-B regions transposed
    fwd_shoup: jnp.ndarray
    inv: jnp.ndarray
    inv_shoup: jnp.ndarray
    inv_degree: jnp.ndarray
    inv_degree_shoup: jnp.ndarray
    # static geometry: stage loops specialize the trace on these
    n1: int = flax.struct.field(pytree_node=False, default=0)
    n2: int = flax.struct.field(pytree_node=False, default=0)


def prepare_sharded_tables(t: ntt64.NTTTablesDevice) -> ShardedNTTTables:
    n = t.n
    n1, n2 = _split_n(n)
    return ShardedNTTTables(
        q=t.q,
        fwd=jnp.asarray(_transpose_regions(np.asarray(t.root_powers), n1)),
        fwd_shoup=jnp.asarray(
            _transpose_regions(np.asarray(t.root_powers_shoup), n1)),
        inv=jnp.asarray(
            _transpose_regions(np.asarray(t.inv_root_powers), n1)),
        inv_shoup=jnp.asarray(
            _transpose_regions(np.asarray(t.inv_root_powers_shoup), n1)),
        inv_degree=t.inv_degree,
        inv_degree_shoup=t.inv_degree_shoup,
        n1=n1, n2=n2)


def ntt_forward_sharded(x: jnp.ndarray, t: ShardedNTTTables, mesh: Mesh,
                        axis: str = "limb") -> jnp.ndarray:
    """Forward NTT with the coefficient axis sharded over `axis`.

    x: (L, N) uint64 in [0, q).  Inside jit, annotate shardings and let
    GSPMD place the phase-boundary all-to-all on the interconnect."""
    num_l, n = x.shape
    out = ntt_forward_sharded3(x.reshape(num_l, t.n1, t.n2), t, mesh, axis)
    return out.reshape(num_l, n)


def ntt_forward_sharded3(xm: jnp.ndarray, t: ShardedNTTTables, mesh: Mesh,
                         axis: str = "limb") -> jnp.ndarray:
    """3D variant: x (L, n1, n2) with n2 sharded over `axis`; the whole
    sharded pipeline (parallel/pipeline_sharded.py) keeps this layout so
    the only collectives are the NTT phase-boundary all-to-alls."""
    n1, n2 = t.n1, t.n2
    num_l = xm.shape[0]
    n = n1 * n2
    q = t.q.reshape(num_l, 1, 1)
    two_q = q * U64(2)

    # phase A works on the n1 axis; keep n2 (last axis) sharded -> local
    xm = jax.lax.with_sharding_constraint(
        xm, NamedSharding(mesh, P(None, None, axis)))

    m = 1
    while m < n1:
        h1 = n1 // (2 * m)
        xr = xm.reshape(num_l, m, 2, h1, n2)
        w = t.fwd[:, m:2 * m].reshape(num_l, m, 1, 1)
        ws = t.fwd_shoup[:, m:2 * m].reshape(num_l, m, 1, 1)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        qb = q.reshape(num_l, 1, 1, 1)
        u = u - jnp.where(u >= qb * U64(2), qb * U64(2), U64(0))
        wv = mul_mod_shoup_lazy(v, w, ws, qb)
        xm = jnp.stack([u + wv, u - wv + qb * U64(2)],
                       axis=2).reshape(num_l, n1, n2)
        # re-assert the layout every stage: GSPMD must not re-shard the
        # interior (the 5D stage stacks tempt it into split layouts)
        xm = jax.lax.with_sharding_constraint(
            xm, NamedSharding(mesh, P(None, None, axis)))
        m <<= 1

    # phase boundary: transpose + resharding constraint = all-to-all on ICI
    xt = jnp.swapaxes(xm, 1, 2)  # (L, n2, n1)
    xt = jax.lax.with_sharding_constraint(
        xt, NamedSharding(mesh, P(None, None, axis)))

    while m < n:
        mr = m // n1
        t_len = n2 // (2 * mr)
        xr = xt.reshape(num_l, mr, 2, t_len, n1)
        w = t.fwd[:, m:2 * m].reshape(num_l, mr, 1, n1)
        ws = t.fwd_shoup[:, m:2 * m].reshape(num_l, mr, 1, n1)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        qb = q.reshape(num_l, 1, 1, 1)
        u = u - jnp.where(u >= qb * U64(2), qb * U64(2), U64(0))
        wv = mul_mod_shoup_lazy(v, w, ws, qb)
        xt = jnp.stack([u + wv, u - wv + qb * U64(2)],
                       axis=2).reshape(num_l, n2, n1)
        xt = jax.lax.with_sharding_constraint(
            xt, NamedSharding(mesh, P(None, None, axis)))
        m <<= 1

    out = jnp.swapaxes(xt, 1, 2)
    # re-shard back to the canonical n2-sharded layout (all-to-all)
    out = jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P(None, None, axis)))
    qq = t.q.reshape(num_l, 1, 1)
    return csub(csub(out, qq * U64(2)), qq)


def ntt_inverse_sharded(x: jnp.ndarray, t: ShardedNTTTables, mesh: Mesh,
                        axis: str = "limb") -> jnp.ndarray:
    """Inverse NTT, mirrored phases (within-row GS stages first)."""
    num_l, n = x.shape
    out = ntt_inverse_sharded3(x.reshape(num_l, t.n1, t.n2), t, mesh, axis)
    return out.reshape(num_l, n)


def ntt_inverse_sharded3(xm3: jnp.ndarray, t: ShardedNTTTables, mesh: Mesh,
                         axis: str = "limb") -> jnp.ndarray:
    """3D variant of the inverse transform; see ntt_forward_sharded3."""
    n1, n2 = t.n1, t.n2
    num_l = xm3.shape[0]
    n = n1 * n2
    q = t.q.reshape(num_l, 1, 1, 1)

    xt = jnp.swapaxes(xm3, 1, 2)  # (L, n2, n1)
    xt = jax.lax.with_sharding_constraint(
        xt, NamedSharding(mesh, P(None, None, axis)))

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
        s = s - jnp.where(s >= q * U64(2), q * U64(2), U64(0))
        d = mul_mod_shoup_lazy(u - v + q * U64(2), w, ws, q)
        xt = jnp.stack([s, d], axis=2).reshape(num_l, n2, n1)
        xt = jax.lax.with_sharding_constraint(
            xt, NamedSharding(mesh, P(None, None, axis)))
        m >>= 1

    xm = jnp.swapaxes(xt, 1, 2)  # all-to-all back
    xm = jax.lax.with_sharding_constraint(
        xm, NamedSharding(mesh, P(None, None, axis)))

    while m >= 1:
        h1 = n1 // (2 * m)
        xr = xm.reshape(num_l, m, 2, h1, n2)
        w = t.inv[:, m:2 * m].reshape(num_l, m, 1, 1)
        ws = t.inv_shoup[:, m:2 * m].reshape(num_l, m, 1, 1)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        s = u + v
        s = s - jnp.where(s >= q * U64(2), q * U64(2), U64(0))
        d = mul_mod_shoup_lazy(u - v + q * U64(2), w, ws, q)
        xm = jnp.stack([s, d], axis=2).reshape(num_l, n1, n2)
        xm = jax.lax.with_sharding_constraint(
            xm, NamedSharding(mesh, P(None, None, axis)))
        m >>= 1

    xm = jax.lax.with_sharding_constraint(
        xm, NamedSharding(mesh, P(None, None, axis)))
    qq = t.q.reshape(num_l, 1, 1)
    sc = t.inv_degree.reshape(num_l, 1, 1)
    scs = t.inv_degree_shoup.reshape(num_l, 1, 1)
    return csub(mul_mod_shoup_lazy(xm, sc, scs, qq), qq)
