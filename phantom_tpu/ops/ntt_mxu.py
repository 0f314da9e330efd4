"""MXU (matmul) formulation of the negacyclic NTT — the systolic-array path.

TPU-native alternative to the butterfly engines (ops/ntt32.py VPU stages,
ops/ntt_pallas_roll.py fused-VMEM stages): the four-step factorization turns
transform into two *shared* modular matmuls that ride the 128x128 MXU, with
one pointwise twiddle between them.  For N = n1 x n2 and the library's
evaluation order out[k] = p(psi^(2*rev(k)+1)) (host/ntt_tables.py), with
omega = psi^2, t1 = rev_l1(k1), t2 = rev_l2(k2):

    out[k1, k2] = sum_{j2} [ WB[j2, k2] * D[k1, j2] *
                             sum_{j1} WA[k1, j1] * x[j1, j2] ]

    WA[k1, j1] = psi^(n2*j1*(1 + 2*t1))        (n1 x n1, left matmul)
    D [k1, j2] = psi^(j2*(1 + 2*t1))           (pointwise, Shoup mul)
    WB[j2, k2] = psi^(2*n1*j2*t2)              (n2 x n2, right matmul)

(the psi^j pre-twist of the negacyclic transform is absorbed into WA and D;
the cross term omega^(t1*j2) is exactly D).  The inverse factorizes
symmetrically with negated exponents; 1/n is NOT folded in — the `scale`
argument (default inv_degree) replaces it, matching ntt_inverse32 semantics.

Modular matmuls are exact: operands split into radix-2^b digit planes
(b=8 -> int32 dots, b=7 -> int8 dots for the native int8 MXU mode), plane
pairs contracted on the MXU with int32 accumulation (max partial
(2^b-1)^2 * n2 * planes < 2^31 for n2 <= 512, i.e. N <= 131072 = the
reference's max degree), recombined into an exact (carry, hi, lo) u32
triple and Barrett-reduced — the same spill discipline as the base-
conversion MXU matmul (ops/bconv32.py; reference bconv_matmul_kernel,
rns_bconv.cu:109).

Plane counts track the actual value range, not the 32-bit word: tables
and strictly-reduced data need only ceil(q_bits / b) planes, so a 28-bit
prime chain at b=7 runs 4x4 = 16 plane dots per matmul instead of the
naive 5x5 = 25 — every lazy [0, 2q) intermediate is csub'd back to
[0, q) before entering a matmul (one VPU pass buys a whole row of MXU
passes).  Results are bit-identical either way (the matmul is exact).

Cost model vs butterflies at N=65536: 2 * n1*n1*n2 MACs/limb on the MXU
(~0.5 GMAC at L=28, int8) versus ~29M 15-op VPU butterflies — the MXU's
~100x MAC advantage makes this the intended production forward/inverse
path on TPU (reference counterpart: fntt_2d.cu/intt_2d.cu, which chose
shared-memory radix-8 because a GPU has no systolic array).

All outputs are canonical [0, q) residues, bit-identical to the u64 and
u32 butterfly engines (tested in tests/test_ntt_mxu.py).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from . import modmath32 as m32
from .bconv32 import ModulusVec32, modulus_vec32
from .modmath32 import U32
from .ntt32 import NTTTables32


# None = auto: 7-bit int8 planes on TPU (native int8 MXU), 8-bit int32
# planes elsewhere.  Both are exact and bit-identical.
PLANE_BITS = None


def _plane_bits() -> int:
    if PLANE_BITS is not None:
        return PLANE_BITS
    return 7 if jax.default_backend() == "tpu" else 8


@flax.struct.dataclass
class MXUNTTTables:
    """Per-base four-step tables; matmul operands are stored as
    pre-decomposed digit-plane stacks (P, L, m, k) so the hot path never
    re-extracts table planes (only the data operand is decomposed at run
    time).  All arrays lead with (planes,) limb axes."""

    mv: ModulusVec32 = None
    wa: jnp.ndarray = None         # (P, L, n1, n1) forward left planes
    d: jnp.ndarray = None          # (L, n1, n2) forward twiddle (u32)
    d_shoup: jnp.ndarray = None
    wb: jnp.ndarray = None         # (P, L, n2, n2) forward right planes
    wbi: jnp.ndarray = None        # (P, L, n2, n2) inverse right planes
    di: jnp.ndarray = None         # (L, n1, n2) inverse twiddle (u32)
    di_shoup: jnp.ndarray = None
    wai: jnp.ndarray = None        # (P, L, n1, n1) inverse left planes
    inv_degree: jnp.ndarray = None        # (L,)
    inv_degree_shoup: jnp.ndarray = None  # (L,)
    # per-diagonal fold constants 2^(plane_bits*d) mod q + Shoup companions,
    # (L, D): the diagonal partials fold straight into a lazy Shoup
    # accumulation instead of the (carry, hi, lo) triple + 96-bit Barrett
    pow_diag: jnp.ndarray = None
    pow_diag_shoup: jnp.ndarray = None
    n1: int = flax.struct.field(pytree_node=False, default=0)
    n2: int = flax.struct.field(pytree_node=False, default=0)
    plane_bits: int = flax.struct.field(pytree_node=False, default=8)
    # max bit length over the base's moduli: strictly-reduced values and
    # table entries decompose into ceil(q_bits / plane_bits) planes
    q_bits: int = flax.struct.field(pytree_node=False, default=32)
    # True: transforms run through the fused Pallas kernel
    # (ops/ntt_mxu_pallas.py) instead of the XLA einsum formulation
    fused_kernel: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def q(self):
        return self.mv.q

    def limb_slice(self, idx) -> "MXUNTTTables":
        ia = np.asarray(idx)
        tab = (lambda a: a[ia]) if self.wa.ndim == 3 else \
            (lambda a: a[:, ia])      # packed u32 (L,m,k) vs planes (P,L,m,k)
        return MXUNTTTables(
            mv=ModulusVec32(*(a[ia] for a in self.mv)),
            wa=tab(self.wa), d=self.d[ia], d_shoup=self.d_shoup[ia],
            wb=tab(self.wb), wbi=tab(self.wbi), di=self.di[ia],
            di_shoup=self.di_shoup[ia], wai=tab(self.wai),
            inv_degree=self.inv_degree[ia],
            inv_degree_shoup=self.inv_degree_shoup[ia],
            pow_diag=self.pow_diag[ia],
            pow_diag_shoup=self.pow_diag_shoup[ia],
            n1=self.n1, n2=self.n2, plane_bits=self.plane_bits,
            q_bits=self.q_bits, fused_kernel=self.fused_kernel)


def _split_n(n: int):
    logn = n.bit_length() - 1
    log1 = logn // 2
    return 1 << log1, 1 << (logn - log1)


def _bitrev_vec(k: int) -> np.ndarray:
    logk = k.bit_length() - 1
    out = np.zeros(k, dtype=np.int64)
    for i in range(k):
        r, v = 0, i
        for _ in range(logk):
            r = (r << 1) | (v & 1)
            v >>= 1
        out[i] = r
    return out


def _psi_power_table(psi: np.ndarray, q: np.ndarray, two_n: int) -> np.ndarray:
    """(L, 2n) uint64 table of psi^e mod q by doubling (q < 2^30)."""
    p = np.ones((psi.shape[0], 1), dtype=np.uint64)
    psi = psi.astype(np.uint64)
    q = q.astype(np.uint64)
    while p.shape[1] < two_n:
        step = (p[:, -1] * psi) % q  # psi^len
        p = np.concatenate([p, (p * step[:, None]) % q[:, None]], axis=1)
    return p[:, :two_n]


def prepare_mxu_tables(t32: NTTTables32,
                       fused_kernel: bool = False) -> MXUNTTTables:
    n = t32.n
    n1, n2 = _split_n(n)
    two_n = 2 * n
    q = np.asarray(t32.q).astype(np.uint64)
    # psi = root_powers[n/2]: bitrev(n/2) = 1 (host/ntt_tables.py layout)
    psi = np.asarray(t32.root_powers)[:, n // 2].astype(np.uint64)
    pt = _psi_power_table(psi, q, two_n)

    r1 = _bitrev_vec(n1)                      # t1 = rev_l1(k1)
    r2 = _bitrev_vec(n2)                      # t2 = rev_l2(k2)
    j1 = np.arange(n1, dtype=np.int64)
    j2 = np.arange(n2, dtype=np.int64)
    odd1 = 1 + 2 * r1                          # (n1,)

    ea = (odd1[:, None] * (n2 * j1)[None, :]) % two_n      # WA[k1, j1]
    ed = (odd1[:, None] * j2[None, :]) % two_n             # D [k1, j2]
    eb = (2 * n1 * j2[:, None] * r2[None, :]) % two_n      # WB[j2, k2]

    def gather(e):
        return pt[:, e]                        # (L,) x e.shape uint64

    def neg(e):
        return (two_n - e) % two_n

    wa = gather(ea)
    d = gather(ed)
    wb = gather(eb)
    wai = gather(neg(ea)).transpose(0, 2, 1)   # WAi[j1, k1] = psi^(-ea[k1,j1])
    di = gather(neg(ed))
    wbi = gather(neg(eb)).transpose(0, 2, 1)   # WBi[k2, j2] = psi^(-eb[j2,k2])

    def shoup(v):
        return ((v << np.uint64(32)) // q[:, None, None]).astype(np.uint32)

    bits = _plane_bits()
    q_bits = max(int(x).bit_length() for x in q)
    nplanes = -(-q_bits // bits)   # table values are < q
    pdt = np.int8 if bits <= 7 else np.int32
    mask = (1 << bits) - 1

    def planes(v):
        v = v.astype(np.uint32)
        return jnp.asarray(np.stack(
            [((v >> (bits * p)) & mask).astype(pdt)
             for p in range(nplanes)]))

    # fold constants for every diagonal any data operand can produce
    # (data planes <= ceil(32/bits) for raw u32 input)
    n_diag = nplanes + (-(-32 // bits)) - 1
    pd = np.stack([(np.uint64(1) << np.uint64(bits * d_)) % q
                   for d_ in range(n_diag)], axis=1)  # (L, D)
    pd_shoup = ((pd.astype(object) << 32) // q[:, None].astype(object)
                ).astype(np.uint64)

    u32c = lambda v: jnp.asarray(v.astype(np.uint32))
    # fused (Pallas) tables stay PACKED u32 (L, m, k); the kernel extracts
    # digit planes in VMEM.  Pre-decomposed int8/int32 plane stacks would
    # force a full-array layout conversion at the XLA->Mosaic custom-call
    # boundary on EVERY launch (~1.4 ms for a 7 MB table at L=28, N=2^16 —
    # measured on v5e 2026-08-19, the dominant fixed cost of every kernel
    # launch).  The XLA einsum engine keeps the plane stacks.
    mat = u32c if fused_kernel else planes
    return MXUNTTTables(
        mv=modulus_vec32([int(x) for x in q]),
        wa=mat(wa), d=u32c(d), d_shoup=jnp.asarray(shoup(d)),
        wb=mat(wb), wbi=mat(wbi), di=u32c(di),
        di_shoup=jnp.asarray(shoup(di)), wai=mat(wai),
        inv_degree=t32.inv_degree, inv_degree_shoup=t32.inv_degree_shoup,
        pow_diag=u32c(pd), pow_diag_shoup=u32c(pd_shoup),
        n1=n1, n2=n2, plane_bits=bits, q_bits=q_bits,
        fused_kernel=fused_kernel)


# ---------------------------------------------------------------------------
# exact modular matmul on digit planes
# ---------------------------------------------------------------------------

def _planes(x: jnp.ndarray, bits: int, value_bits: int = 32):
    nplanes = -(-value_bits // bits)
    mask = U32((1 << bits) - 1)
    dt = jnp.int8 if bits <= 7 else jnp.int32
    return [((x >> U32(bits * p)) & mask).astype(dt) for p in range(nplanes)]


def _combine_triple(partials, bits: int, shape):
    """sum_d partials[d] * 2^(bits*d) as an exact (carry, hi, lo) triple.

    partials[d] < 2^31 (int32 -> u32 cast), bits*d <= 56: same three-word
    spill discipline as bconv32.accumulate_matmul_96_mxu."""
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    c, hi, lo = zero, zero, zero
    for d_idx, p_ in enumerate(partials):
        p_ = p_.astype(jnp.uint32)
        shift = bits * d_idx
        if shift == 0:
            w0, w1, w2 = p_, zero, zero
        elif shift < 32:
            w0 = p_ << U32(shift)
            w1 = p_ >> U32(32 - shift)
            w2 = zero
        elif shift == 32:
            w0, w1, w2 = zero, p_, zero
        else:
            w0 = zero
            w1 = p_ << U32(shift - 32)
            w2 = p_ >> U32(64 - shift)
        lo, cr = m32.add_u32_carry(lo, w0)
        hi, cra = m32.add_u32_carry(hi, w1)
        hi, crb = m32.add_u32_carry(hi, cr)
        c = c + cra + crb + w2
    return c, hi, lo


def _max_partial(bits: int, contract_len: int, n_a: int, n_b: int) -> int:
    """Largest value any diagonal accumulator can reach: per-dot max
    (2^bits - 1)^2 * contract_len, times the deepest diagonal (the number
    of (a, b) plane pairs with a + b = d is at most min(n_a, n_b))."""
    return ((1 << bits) - 1) ** 2 * contract_len * min(n_a, n_b)


def _diag_dots(aps, xps, contract):
    """All plane-pair dots grouped by digit diagonal a+b (plane counts may
    differ between the two operands)."""
    partials = [None] * (len(aps) + len(xps) - 1)
    for a in range(len(aps)):
        for b in range(len(xps)):
            term = contract(aps[a], xps[b])
            d_idx = a + b
            partials[d_idx] = term if partials[d_idx] is None \
                else partials[d_idx] + term
    return partials


def _fold_diagonals(partials, pow_diag, pow_diag_shoup, mv: ModulusVec32,
                    bits: int = 0, max_partial: int = 0, q_bits: int = 32):
    """sum_d partials[d] * 2^(bits*d) mod q via per-diagonal Shoup folds.

    Each partial is an int32 accumulator (< 2^31, any u32 is valid Shoup
    input); each fold lands in [0, 2q), so everything stays in native u32
    — no 96-bit triple, no Barrett-u64.  Consts broadcast over (L, m, n).

    When the caller certifies max_partial (the largest any diagonal
    accumulator can be), adjacent diagonals whose combined word
    p_{2j} + (p_{2j+1} << bits) provably fits u32 are merged first, so
    the number of Shoup folds (the dominant VPU cost of the whole MXU
    engine, PERF_MODEL.md §2) drops from 2P-1 to ~P.

    When n_words * 2q provably fits int31 (28-bit chains: 4 words x 2^29
    = 2^31), the [0, 2q) fold terms accumulate with PLAIN adds and reduce
    once through a halving csub ladder — the Shoup folds become
    independent (no serializing csub between them, better VPU ILP) at the
    same op count.  Bit-identical either way."""
    q3 = mv.q[:, None, None]
    two_q = q3 * np.uint32(2)
    if max_partial and max_partial * ((1 << bits) + 1) <= 0xFFFFFFFF:
        words = []
        for j in range(0, len(partials), 2):
            w = partials[j].astype(jnp.uint32)
            if j + 1 < len(partials):
                w = w + (partials[j + 1].astype(jnp.uint32) << U32(bits))
            words.append((w, j))
    else:
        words = [(p_.astype(jnp.uint32), j) for j, p_ in enumerate(partials)]
    lazy = len(words) << (q_bits + 1) <= (1 << 31)
    acc = None
    for w, j in words:
        term = m32.mul_mod_shoup_lazy32(
            w, pow_diag[:, j][:, None, None],
            pow_diag_shoup[:, j][:, None, None], q3)
        if acc is None:
            acc = term
        elif lazy:
            acc = acc + term
        else:
            acc = m32.csub32(acc + term, two_q)
    if lazy:
        # acc < n_words*2q < 2^31: csub ladder n*2q -> ceil(n/2)*2q ... -> q
        k = len(words)
        while k > 1:
            k = (k + 1) // 2
            acc = m32.csub32_i31(acc, two_q * np.uint32(k))
        return m32.csub32_i31(acc, q3)
    return m32.csub32(acc, q3)


def _reduce_triple(c, hi, lo, mv: ModulusVec32):
    """(c*2^64 + hi*2^32 + lo) mod q, consts broadcast over (L, m, n)."""
    q = mv.q[:, None, None]
    rh = mv.ratio_hi[:, None, None]
    rl = mv.ratio_lo[:, None, None]
    t_c = m32.mul_mod32(m32.barrett_reduce_u32(c, q, rh),
                        mv.pow64[:, None, None], q, rh, rl)
    t_h = m32.mul_mod32(m32.barrett_reduce_u32(hi, q, rh),
                        mv.pow32[:, None, None], q, rh, rl)
    t_l = m32.barrett_reduce_u32(lo, q, rh)
    return m32.add_mod32(m32.add_mod32(t_c, t_h, q), t_l, q)


def mm_left_mod(table_planes: jnp.ndarray, x: jnp.ndarray,
                mv: ModulusVec32, bits: int,
                x_bits: int = 32, diag=None) -> jnp.ndarray:
    """out[..., l, i, k] = sum_j table[l, i, j] * x[..., l, j, k] mod q.

    table_planes: (P, L, m, k) pre-decomposed digit planes.  `x_bits`
    bounds the data values (pass q_bits for strictly-reduced input).
    `diag` = (pow_diag, pow_diag_shoup) enables the Shoup diagonal fold
    (bit-identical, ~2x fewer VPU ops than the triple + Barrett)."""
    tps = list(table_planes)
    xps = _planes(x, bits, x_bits)

    def contract(a, b):
        return jnp.einsum("lij,...ljk->...lik", a, b,
                          preferred_element_type=jnp.int32)

    partials = _diag_dots(tps, xps, contract)
    if diag is not None:
        mp = _max_partial(bits, x.shape[-2], len(tps), len(xps))
        return _fold_diagonals(partials, diag[0], diag[1], mv, bits, mp,
                               diag[2] if len(diag) > 2 else 32)
    shape = x.shape[:-2] + (table_planes.shape[-2], x.shape[-1])
    c, hi, lo = _combine_triple(partials, bits, shape)
    return _reduce_triple(c, hi, lo, mv)


def mm_right_mod(x: jnp.ndarray, table_planes: jnp.ndarray,
                 mv: ModulusVec32, bits: int,
                 x_bits: int = 32, diag=None) -> jnp.ndarray:
    """out[..., l, i, c] = sum_k x[..., l, i, k] * table[l, k, c] mod q."""
    xps = _planes(x, bits, x_bits)
    tps = list(table_planes)

    def contract(a, b):
        return jnp.einsum("...lik,lkc->...lic", a, b,
                          preferred_element_type=jnp.int32)

    partials = _diag_dots(xps, tps, contract)
    if diag is not None:
        mp = _max_partial(bits, x.shape[-1], len(tps), len(xps))
        return _fold_diagonals(partials, diag[0], diag[1], mv, bits, mp,
                               diag[2] if len(diag) > 2 else 32)
    shape = x.shape[:-1] + (table_planes.shape[-1],)
    c, hi, lo = _combine_triple(partials, bits, shape)
    return _reduce_triple(c, hi, lo, mv)


# ---------------------------------------------------------------------------
# forward / inverse transforms
# ---------------------------------------------------------------------------

# Diagonal-partial reduction strategy: True = per-diagonal Shoup folds
# (~2x fewer raw VPU ops), False = (carry,hi,lo) triple + 96-bit Barrett.
# Bit-identical; measured ~equal on CPU/LLVM — flip on hardware via
# benchmarks/ntt_bench.py to pick the TPU winner.
FOLD_DIAGONALS = True


def _diag_of(t: MXUNTTTables):
    if t.pow_diag is None or not FOLD_DIAGONALS:
        return None
    return (t.pow_diag, t.pow_diag_shoup, t.q_bits)

def ntt_forward_mxu(x: jnp.ndarray, t: MXUNTTTables,
                    sub_from=None, epi_scale=None,
                    epi_scale_shoup=None) -> jnp.ndarray:
    """x: (..., L, N) uint32 in [0, q) -> NTT form in [0, q).

    With sub_from/epi_scale set, returns (sub_from - NTT(x)) * epi_scale —
    the fused moddown/rescale epilogue (reference: ntt_moddown.cu:222);
    here the epilogue fuses into the final matmul's reduction under XLA."""
    n1, n2 = t.n1, t.n2
    lead = x.shape[:-1]
    # tolerate the lazy [0, 2q) bound: trimmed plane counts require
    # strictly reduced operands (values above 2^q_bits would drop bits)
    xm = m32.csub32(x.reshape(*lead, n1, n2), t.mv.q[:, None, None])
    q3 = t.mv.q[:, None, None]
    dg = _diag_of(t)
    z = mm_left_mod(t.wa, xm, t.mv, t.plane_bits, t.q_bits, dg)
    # strict twiddle product: the csub pays for itself by keeping the
    # phase-B operand at ceil(q_bits/b) planes instead of +1 for [0, 2q)
    v = m32.csub32(m32.mul_mod_shoup_lazy32(z, t.d, t.d_shoup, q3), q3)
    out = mm_right_mod(v, t.wb, t.mv, t.plane_bits,
                       t.q_bits, dg).reshape(*lead, n1 * n2)
    if sub_from is None:
        return out
    q = t.mv.q[:, None]
    diff = sub_from - out + q
    sc = jnp.asarray(epi_scale, dtype=jnp.uint32)[:, None]
    scs = jnp.asarray(epi_scale_shoup, dtype=jnp.uint32)[:, None]
    return m32.csub32(m32.mul_mod_shoup_lazy32(diff, sc, scs, q), q)


def scaled_diag(t: MXUNTTTables, scale, dg=None):
    """Fold constants pre-multiplied by a per-limb scalar: the epilogue
    scale of an inverse transform rides the FINAL matmul's diagonal fold
    for free instead of costing its own Shoup stage per element.  The
    Shoup companions of the scaled constants are recomputed exactly on
    device (barrett_div_mod: floor(pd2 * 2^32 / q)) — (L, D)-sized, so
    trace-time noise."""
    if dg is None:
        dg = _diag_of(t)
    if dg is None:
        return None
    pd, pds, qb = dg
    q = t.mv.q[:, None]
    rh = t.mv.ratio_hi[:, None]
    rl = t.mv.ratio_lo[:, None]
    sc = jnp.asarray(scale, jnp.uint32)[:, None]
    pd2 = m32.mul_mod32(pd, sc, q, rh, rl)
    pds2, _ = m32.barrett_div_mod_u64_32(pd2, jnp.zeros_like(pd2), q, rh, rl)
    return (pd2, pds2, qb)


def ntt_inverse_mxu(x: jnp.ndarray, t: MXUNTTTables,
                    scale: Optional[jnp.ndarray] = None,
                    scale_shoup: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (..., L, N) uint32 in [0, 2q) -> coefficients in [0, q).

    `scale` (default inv_degree = 1/N) REPLACES the 1/N normalization,
    matching ntt_inverse32 — fused scales must pre-multiply 1/N in."""
    n1, n2 = t.n1, t.n2
    lead = x.shape[:-1]
    xm = m32.csub32(x.reshape(*lead, n1, n2), t.mv.q[:, None, None])
    q3 = t.mv.q[:, None, None]
    dg = _diag_of(t)
    s = mm_right_mod(xm, t.wbi, t.mv, t.plane_bits, t.q_bits, dg)
    v = m32.mul_mod_shoup_lazy32(s, t.di, t.di_shoup, q3)
    if scale is None:
        scale = t.inv_degree
        scale_shoup = t.inv_degree_shoup
    if dg is not None:
        # scale-in-fold: one fewer Shoup stage per element
        v = m32.csub32(v, q3)
        dg2 = scaled_diag(t, scale, dg)
        return mm_left_mod(t.wai, v, t.mv, t.plane_bits,
                           t.q_bits, dg2).reshape(*lead, n1 * n2)
    sc = jnp.asarray(scale, dtype=jnp.uint32)[:, None, None]
    scs = jnp.asarray(scale_shoup, dtype=jnp.uint32)[:, None, None]
    v = m32.csub32(m32.mul_mod_shoup_lazy32(v, sc, scs, q3), q3)
    return mm_left_mod(t.wai, v, t.mv, t.plane_bits,
                       t.q_bits, dg).reshape(*lead, n1 * n2)
