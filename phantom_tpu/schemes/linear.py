"""Encrypted linear transforms: Halevi-Shoup diagonal method with
baby-step/giant-step (BSGS) rotation scheduling.

The canonical CKKS serving primitive: y = M @ x on an encrypted, slot-
packed x.  The reference exposes only the raw building blocks (hoisting,
/root/reference/src/evaluate.cu:1670-1865 + multiply_plain); this module
packages them into a reusable layer with the standard O(sqrt(d)) rotation
schedule:

    M @ x = sum_j rot_{j*bs}( sum_i rot_{-j*bs}(diag_{j*bs+i}) * rot_i(x) )

- The inner (baby) sums run through the weighted-hoisting primitive
  (one evk inner product per step, one moddown per group), and all
  groups share ONE modup of c1.
- The outer (giant) rotations are ordinary keyswitched rotations:
  gs - 1 of them in total instead of d - 1 for the naive schedule.

Vectors must be packed d-periodically across the slots (d | slots), so
slot rotation coincides with the cyclic rotation the diagonal method
assumes; `LinearTransform.encode_input` does the tiling.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .ciphertext import Ciphertext
from .context import Context


def bsgs_split(d: int, bs: int | None = None) -> tuple[int, int]:
    """Pick (baby, giant) counts: bs*gs >= d with bs ~ sqrt(d)."""
    if bs is None:
        bs = max(1, int(round(math.sqrt(d))))
    gs = -(-d // bs)
    return bs, gs


class LinearTransform:
    """A plaintext d x d matrix applied to encrypted slot vectors.

    Host-side construction extracts and pre-rotates the generalized
    diagonals; `prepare` encodes them over the extended base QlP (for the
    hoisted inner loop) at a given level; `apply` / `apply_fast32` run the
    BSGS matvec on the u64 evaluator / the u32 fast path.

    All-zero diagonals (structured/sparse matrices) are skipped at
    construction, shrinking both the rotation-key set and the runtime.
    """

    def __init__(self, M, bs: int | None = None):
        M = np.asarray(M)
        if M.ndim != 2 or M.shape[0] != M.shape[1]:
            raise ValueError("LinearTransform expects a square matrix")
        self.d = int(M.shape[0])
        self.bs, self.gs = bsgs_split(self.d, bs)
        # groups[j] = (giant_step, [baby steps], [pre-rotated diagonals])
        self.groups: list[tuple[int, list[int], list[np.ndarray]]] = []
        idx = np.arange(self.d)
        for j in range(self.gs):
            gstep = j * self.bs
            steps: list[int] = []
            diags: list[np.ndarray] = []
            for i in range(self.bs):
                k = gstep + i
                if k >= self.d:
                    break
                diag = M[idx, (idx + k) % self.d]
                if not np.any(diag):
                    continue
                # rot_{-gstep}(diag): counteracts the trailing giant step
                steps.append(i)
                diags.append(np.roll(diag, gstep))
            if steps:
                self.groups.append((gstep, steps, diags))
        self._prepared: dict = {}    # chain_index -> list of pts lists
        self._prepared32: dict = {}  # chain_index -> u32 casts
        self.pts_scale: float | None = None

    def steps_required(self) -> list[int]:
        """Rotation steps needing Galois keys (for create_galois_keys)."""
        need = set()
        for gstep, steps, _ in self.groups:
            if gstep:
                need.add(gstep)
            need.update(s for s in steps if s)
        return sorted(need)

    def encode_input(self, enc, x, scale: float):
        """Tile x d-periodically across the slots and encode it."""
        x = np.asarray(x).ravel()
        if x.shape[0] != self.d:
            raise ValueError(f"expected a length-{self.d} vector")
        if enc.slots % self.d:
            raise ValueError("d must divide the slot count")
        return enc.encode(np.tile(x, enc.slots // self.d), scale)

    def prepare(self, enc, scale: float, chain_index: int = 1) -> None:
        """Encode the diagonals over QlP at `chain_index` (NTT form)."""
        from .ckks_encoder import encode_extended
        if enc.slots % self.d:
            raise ValueError("d must divide the slot count")
        reps = enc.slots // self.d
        pts = []
        for _, _, diags in self.groups:
            pts.append([encode_extended(enc, np.tile(dg, reps), scale,
                                        chain_index) for dg in diags])
        self._prepared[chain_index] = pts
        self._prepared32.pop(chain_index, None)
        if self.pts_scale is not None and self.pts_scale != scale:
            raise ValueError("prepare() must use one scale per transform")
        self.pts_scale = scale

    def _pts_at(self, chain_index: int):
        try:
            return self._prepared[chain_index]
        except KeyError:
            raise ValueError(f"prepare(enc, scale, chain_index="
                             f"{chain_index}) has not been called") from None

    def apply(self, ctx: Context, ct: Ciphertext, glk,
              rescale: bool = True) -> Ciphertext:
        """BSGS matvec on the u64 evaluator; input must be d-periodic."""
        from . import evaluate as ev
        from .keyswitch import modup_from_ntt
        pts = self._pts_at(ct.chain_index)
        cd = ev._cd(ctx, ct)
        t_modup = modup_from_ntt(ctx, cd, ct.data[1])
        acc = None
        for (gstep, steps, _), group_pts in zip(self.groups, pts):
            inner = ev.hoisted_linear_combo(ctx, ct, glk, steps, group_pts,
                                            self.pts_scale, t_modup=t_modup)
            if gstep:
                inner = ev.rotate_vector(ctx, inner, gstep, glk)
            acc = inner if acc is None else ev.add(ctx, acc, inner)
        return ev.rescale_to_next(ctx, acc) if rescale else acc

    def apply_fast32(self, fast, ct, rescale: bool = True):
        """BSGS matvec on the u32 fast path (`fast`: a Fast32 evaluator)."""
        from ..ops import pipeline32 as pp
        ci = ct.chain_index
        if ci not in self._prepared32:
            self._prepared32[ci] = [
                [jnp.asarray(np.asarray(p).astype(np.uint32)) for p in grp]
                for grp in self._pts_at(ci)]
        pts32 = self._prepared32[ci]
        ks = fast.keyswitch_at(ci)
        g = fast.galois_at(ci)
        t_up = pp.modup_from_ntt32(ks, ct.data[1])
        acc = None
        for (gstep, steps, _), group_pts in zip(self.groups, pts32):
            out = pp.hoisted_linear_combo32(ks, g, ct.data, steps,
                                            group_pts, t_up=t_up)
            inner = ct.replace(data=out,
                               scale=ct.scale * self.pts_scale)
            if gstep:
                inner = fast.rotate(inner, gstep)
            acc = inner if acc is None else fast.add(acc, inner)
        return fast.rescale_to_next(acc) if rescale else acc
