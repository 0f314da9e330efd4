"""Batch encoder for BFV/BGV: slot vector <-> plaintext polynomial mod t.

Equivalent of the reference's PhantomBatchEncoder (src/batchencoder.cu):
slots map to the negacyclic NTT evaluation domain mod t through the
generator-5 matrix-representation index map (two rows of N/2 slots), with a
mod-t inverse NTT on encode and forward NTT on decode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..host import numth
from ..ops import ntt as nttmod
from .ciphertext import Plaintext
from .context import Context


class BatchEncoder:
    def __init__(self, ctx: Context):
        if ctx.plain_ntt is None:
            raise ValueError("BatchEncoder requires BFV/BGV context")
        self.ctx = ctx
        n = ctx.params.n
        self.slots = n
        logn = n.bit_length() - 1
        # generator-5 index map (reference: populate_matrix_reps_index_map)
        m = 2 * n
        row_size = n >> 1
        idx = np.zeros(n, dtype=np.int64)
        pos = 1
        for i in range(row_size):
            idx[i] = numth.reverse_bits((pos - 1) >> 1, logn)
            idx[row_size + i] = numth.reverse_bits((m - pos - 1) >> 1, logn)
            pos = (pos * 5) & (m - 1)
        self.index_map = jnp.asarray(idx)
        self._index_np = idx

    def _tab32(self):
        """u32 engine tables for the plain-modulus NTT (t < 2^30 always
        holds for batching primes) — the single-row u64 transform runs
        eagerly through dozens of emulated stages otherwise (~0.3-3.5 s
        per encode on the tunnel; one fused u32 kernel is ~one RTT)."""
        if not hasattr(self, "_t32"):
            t = int(self.ctx.params.plain_modulus)
            if t < (1 << 30):
                from ..ops import pipeline32 as pp32
                self._t32 = pp32._conv_tables(self.ctx.plain_ntt,
                                              "mxu-pallas")
            else:
                self._t32 = None
        return self._t32

    def encode(self, values) -> Plaintext:
        """values: array-like of ints mod t, length <= N."""
        n = self.slots
        t = self.ctx.params.plain_modulus
        vals = np.zeros(n, dtype=np.uint64)
        v = np.asarray(values, dtype=np.uint64)
        vals[: v.shape[0]] = v % np.uint64(t)
        tab = self._tab32()
        if tab is not None:
            slots = np.zeros(n, dtype=np.uint32)
            slots[self._index_np] = vals.astype(np.uint32)
            from ..ops import pipeline32 as pp32
            coeffs = pp32._inv(None, jnp.asarray(slots)[None, :], tab
                               ).astype(jnp.uint64)
            return Plaintext(data=coeffs, chain_index=0)
        slots = jnp.zeros((n,), dtype=jnp.uint64)
        slots = slots.at[self.index_map].set(jnp.asarray(vals))
        coeffs = nttmod.ntt_inverse(slots[None, :], self.ctx.plain_ntt)
        return Plaintext(data=coeffs, chain_index=0)

    def encode_signed(self, values) -> Plaintext:
        """Signed ints: negatives map to t - |v|."""
        t = int(self.ctx.params.plain_modulus)
        vals = [int(v) % t for v in np.asarray(values, dtype=np.int64)]
        return self.encode(np.array(vals, dtype=np.uint64))

    def decode(self, plain: Plaintext) -> np.ndarray:
        tab = self._tab32()
        if tab is not None:
            from ..ops import pipeline32 as pp32
            evals = pp32._fwd(None, jnp.asarray(plain.data
                                                ).astype(jnp.uint32), tab)
            return np.asarray(evals)[0][self._index_np].astype(np.uint64)
        evals = nttmod.ntt_forward(plain.data, self.ctx.plain_ntt)
        return np.asarray(evals[0][self.index_map])

    def decode_signed(self, plain: Plaintext) -> np.ndarray:
        t = int(self.ctx.params.plain_modulus)
        vals = self.decode(plain).astype(np.int64)
        return np.where(vals > t // 2, vals - t, vals)
