"""Automatic CKKS polynomial evaluation: Paterson-Stockmeyer BSGS with
exact scale management.

p(ct) for a plaintext-coefficient polynomial, evaluated with the
baby-step/giant-step split

    p(x) = hi(x) * x^(bs*2^k) + lo(x)      (recursively on hi/lo)

so multiplicative depth is ~log2(deg) + 1 and ciphertext-ciphertext
multiplies are ~bs + gs instead of deg.  The scale bookkeeping that the
reference (and SEAL-style APIs) push onto the user — examples/8_poly_eval
does it by hand — is automated here: every addition's operands are
steered to the same (scale, level) by encoding each plaintext coefficient
at exactly the ratio scale its term needs, so no noise-adding "multiply
by encoded 1.0" corrections are ever inserted.

Results follow the *unrescaled* convention (scale ~ input_scale^2): the
caller spends the final rescale, mirroring multiply_and_relin.

Precision note: like all rescale-chain CKKS code, this assumes the
rescale primes are close to the working scale (the standard parameter
choice); the power ladder's scale then stays within a few bits of the
input scale at every rung.

Reference building blocks: multiply/relinearize/rescale
(/root/reference/src/evaluate.cu); the reference ships no polynomial
layer, so the schedule follows the Paterson-Stockmeyer literature.
"""

from __future__ import annotations

import numpy as np

__all__ = ["poly_eval", "poly_eval_fast32", "poly_eval_cheb",
           "poly_eval_cheb_fast32", "chebyshev_fit", "poly_depth",
           "bsgs_counts"]

_TOL = 1e-6   # matches evaluate._check_compatible's scale tolerance


def _pow2_ceil(v: int) -> int:
    return 1 << max(0, (v - 1).bit_length())


def bsgs_counts(degree: int, bs: int | None = None) -> tuple[int, int]:
    """(baby, giant) sizes for a given degree; bs is a power of two."""
    if bs is None:
        bs = _pow2_ceil(max(1, int(round(np.sqrt(degree + 1)))))
    else:
        bs = _pow2_ceil(bs)
    gs = -(-(degree + 1) // bs)
    return bs, gs


def poly_depth(degree: int, bs: int | None = None) -> int:
    """Multiplicative levels poly_eval consumes BEFORE the caller's final
    rescale (power ladder + giant multiplies)."""
    bs, gs = bsgs_counts(degree, bs)
    if degree < bs:
        return (degree - 1).bit_length()          # deepest baby power
    k_top = (degree // bs).bit_length() - 1
    return (bs.bit_length() - 1) + k_top + 1


# -- engine adapters ---------------------------------------------------------

class _U64Engine:
    """evaluate.* verbs on the u64 evaluator."""

    def __init__(self, ctx, rlk, enc):
        from . import evaluate as ev
        self.ctx, self.rlk, self.enc, self.ev = ctx, rlk, enc, ev

    def scale(self, c):
        return c.scale

    def chain(self, c):
        return c.chain_index

    def set_scale(self, c, s: float):
        assert abs(c.scale - s) <= _TOL * s, \
            f"internal scale drift: {c.scale} vs {s}"
        return c.replace(scale=s)

    def mult(self, a, b):
        if a.chain_index != b.chain_index:
            tgt = max(a.chain_index, b.chain_index)
            a = self.ev.mod_switch_to(self.ctx, a, tgt)
            b = self.ev.mod_switch_to(self.ctx, b, tgt)
        if a is b:
            return self.ev.relinearize(
                self.ctx, self.ev.square(self.ctx, a), self.rlk)
        return self.ev.multiply_and_relin(self.ctx, a, b, self.rlk)

    def rescale(self, c):
        return self.ev.rescale_to_next(self.ctx, c)

    def mod_switch_to(self, c, level: int):
        return self.ev.mod_switch_to(self.ctx, c, level)

    def _pt(self, value: float, s_pt: float, level: int):
        vec = np.full(self.enc.slots, value)
        return self.enc.encode(vec, s_pt, level)

    def mult_plain_const(self, c, value: float, s_pt: float):
        return self.ev.multiply_plain(
            self.ctx, c, self._pt(value, s_pt, c.chain_index))

    def add_const(self, c, value: float):
        return self.ev.add_plain(
            self.ctx, c, self._pt(value, c.scale, c.chain_index))

    def add(self, a, b):
        return self.ev.add(self.ctx, a, b)

    def sub(self, a, b):
        return self.ev.sub(self.ctx, a, b)

    def drop_prime(self, level: int) -> float:
        """The prime rescale removes when applied at `level`."""
        return float(self.ctx.get_context_data(level).moduli[-1])


class _Fast32Engine(_U64Engine):
    """Same verbs on a Fast32 evaluator (bit-identical to u64)."""

    def __init__(self, fast, enc):
        self.fast, self.enc = fast, enc
        self.ctx = fast.ctx

    def mult(self, a, b):
        while a.chain_index < b.chain_index:
            a = self.fast.mod_switch_to_next(a)
        while b.chain_index < a.chain_index:
            b = self.fast.mod_switch_to_next(b)
        if a is b:
            return self.fast.square_and_relin(a)
        return self.fast.multiply_and_relin(a, b)

    def rescale(self, c):
        return self.fast.rescale_to_next(c)

    def mod_switch_to(self, c, level: int):
        while c.chain_index < level:
            c = self.fast.mod_switch_to_next(c)
        return c

    def mult_plain_const(self, c, value: float, s_pt: float):
        return self.fast.multiply_plain(
            c, self._pt(value, s_pt, c.chain_index))

    def add_const(self, c, value: float):
        return self.fast.add_plain(
            c, self._pt(value, c.scale, c.chain_index))

    def add(self, a, b):
        return self.fast.add(a, b)

    def sub(self, a, b):
        return self.fast.sub(a, b)


# -- the evaluator -----------------------------------------------------------

class _PolyEvaluator:
    def __init__(self, E, ct, bs: int, basis: str = "monomial"):
        self.E = E
        self.bs = bs
        self.basis = basis
        self.pw = {1: ct}

    def power(self, i: int):
        """x^i (or T_i) via binary splitting, each built once, rescaled.

        Chebyshev splits use i = a + b with a - b in {0, 1}, so the
        linearization T_{a+b} = 2*T_a*T_b - T_{a-b} only ever corrects by
        the constant T_0 = 1 or by a plain-rescaled copy of T_1."""
        E = self.E
        if i not in self.pw:
            if self.basis == "chebyshev":
                a = -(-i // 2)
                b = i // 2
            else:
                a = 1 << (i.bit_length() - 1)
                b = i - a
                if b == 0:
                    a = b = i // 2
            x = self.power(a)
            y = x if b == a else self.power(b)
            prod = E.mult(x, y)
            if self.basis == "chebyshev":
                prod = E.add(prod, prod)           # 2*T_a*T_b
                if a == b:                         # - T_0 = -1
                    prod = E.add_const(prod, -1.0)
                else:                              # - T_1 (plain-rescaled)
                    t1 = self.pw[1]
                    adj = E.mult_plain_const(
                        t1, 1.0, E.scale(prod) / E.scale(t1))
                    adj = E.set_scale(
                        E.mod_switch_to(adj, E.chain(prod)), E.scale(prod))
                    prod = E.sub(prod, adj)
            self.pw[i] = E.rescale(prod)
        return self.pw[i]

    def _split(self, c, m: int):
        """(quotient, remainder) of p by the m-th basis polynomial.

        Monomial: p = hi * x^m + lo is just the coefficient split.
        Chebyshev: divide by T_m with T_i = 2*T_{i-m}*T_m - T_{2m-i}
        (valid for m <= i < 2m, which the giant-step choice guarantees)."""
        if self.basis != "chebyshev":
            return list(c[m:]), list(c[:m])
        c = list(c)
        deg = len(c) - 1
        quot = [0.0] * (deg - m + 1)
        for i in range(deg, m, -1):
            ci = c[i]
            if ci != 0.0:
                quot[i - m] += 2.0 * ci
                c[2 * m - i] -= ci
        quot[0] += c[m]
        return quot, c[:m]

    def chunk(self, c, s_target: float, level: int):
        """Degree-<bs tail: sum_i c[i]*x^i at exactly (s_target, level).
        Returns (ciphertext-or-None, unconsumed constant term)."""
        E = self.E
        acc = None
        for i in range(1, len(c)):
            if c[i] == 0.0:
                continue
            p = self.power(i)
            term = E.mult_plain_const(p, float(c[i]), s_target / E.scale(p))
            term = E.set_scale(E.mod_switch_to(term, level), s_target)
            acc = term if acc is None else E.add(acc, term)
        return acc, float(c[0])

    def eval_rec(self, c, s_target: float, level: int):
        """p(x) at exactly (s_target, level); returns (ct-or-None, c0)."""
        E, bs = self.E, self.bs
        c = list(c)
        while len(c) > 1 and c[-1] == 0.0:   # splits can leave zero tails
            c.pop()
        deg = len(c) - 1
        if deg < bs:
            return self.chunk(c, s_target, level)
        k = (deg // bs).bit_length() - 1
        g = self.giants[k]
        split = bs << k
        g_level = E.chain(g)
        s_hi = s_target * E.drop_prime(g_level) / E.scale(g)
        hi_c, lo_c = self._split(c, split)
        hi_ct, hi_c0 = self.eval_rec(hi_c, s_hi, g_level)
        if hi_ct is not None:
            if hi_c0 != 0.0:
                hi_ct = E.add_const(hi_ct, hi_c0)
            prod = E.rescale(E.mult(hi_ct, g))
        elif hi_c0 != 0.0:
            prod = E.mult_plain_const(g, hi_c0, s_target / E.scale(g))
        else:
            prod = None
        if prod is not None:
            prod = E.set_scale(E.mod_switch_to(prod, level), s_target)
        lo_ct, lo_c0 = self.eval_rec(lo_c, s_target, level)
        if prod is None:
            return lo_ct, lo_c0
        if lo_ct is None:
            return prod, lo_c0
        return E.add(prod, lo_ct), lo_c0

    def _check_headroom(self, level: int, s_target: float):
        """The remaining modulus at `level` must hold the unrescaled
        scale^2 result (plus value/noise headroom) or values wrap."""
        cd = self.E.ctx.get_context_data(level)
        bits = sum(int(q).bit_length() for q in cd.moduli)
        need = np.log2(s_target) + 16
        if bits < need:
            raise ValueError(
                f"chain too short for this polynomial: level {level} has "
                f"{bits} modulus bits, the unrescaled result needs "
                f"~{need:.0f}; add levels or lower the degree")

    def run(self, coeffs):
        E, bs = self.E, self.bs
        deg = len(coeffs) - 1
        ct = self.pw[1]
        if deg < bs:
            # no giants: a single chunk at the deepest power's level
            levels = [E.chain(self.power(i))
                      for i in range(1, deg + 1) if coeffs[i] != 0.0]
            level = max(levels)
            self._check_headroom(level, E.scale(ct) ** 2)
            out, c0 = self.chunk(coeffs, E.scale(ct) ** 2, level)
        else:
            k_top = (deg // bs).bit_length() - 1
            # power() memoizes, so the giant ladder is the doubling chain
            # (and in Chebyshev basis applies the 2*T^2 - 1 correction)
            self.giants = [self.power(bs << j) for j in range(k_top + 1)]
            level = E.chain(self.giants[k_top]) + 1
            self._check_headroom(level, E.scale(ct) ** 2)
            out, c0 = self.eval_rec(coeffs, E.scale(ct) ** 2, level)
        if out is None:
            raise ValueError("polynomial has no non-constant term at this "
                             "baby-step size; evaluate it as a plain add")
        return E.add_const(out, c0) if c0 != 0.0 else out


def _prep_coeffs(coeffs):
    c = [float(v) for v in np.asarray(coeffs, dtype=np.float64).ravel()]
    while len(c) > 1 and c[-1] == 0.0:
        c.pop()
    if len(c) < 2:
        raise ValueError("poly_eval needs degree >= 1 (constant "
                         "polynomials are a plain add)")
    return c


def poly_eval(ctx, ct, coeffs, rlk, enc, bs: int | None = None):
    """Evaluate sum_i coeffs[i] * ct^i on the u64 evaluator.

    coeffs: monomial-basis coefficients, low order first (for a Chebyshev
    series, convert with np.polynomial.chebyshev.cheb2poly).  Returns an
    UNRESCALED ciphertext (scale ~ ct.scale^2); rescale_to_next it."""
    c = _prep_coeffs(coeffs)
    bs, _ = bsgs_counts(len(c) - 1, bs)
    return _PolyEvaluator(_U64Engine(ctx, rlk, enc), ct, bs).run(c)


def poly_eval_fast32(fast, ct, coeffs, enc, bs: int | None = None):
    """Same schedule on a Fast32 evaluator — bit-identical to poly_eval."""
    c = _prep_coeffs(coeffs)
    bs, _ = bsgs_counts(len(c) - 1, bs)
    return _PolyEvaluator(_Fast32Engine(fast, enc), ct, bs).run(c)


# -- Chebyshev basis ----------------------------------------------------------

def chebyshev_fit(fn, degree: int, interval=(-1.0, 1.0)) -> np.ndarray:
    """Chebyshev-series coefficients of fn over [a, b] (for poly_eval_cheb).

    Interpolates at the Chebyshev nodes of the target interval — near-
    minimax, and the coefficients stay O(max|fn|), which is the whole
    point of evaluating in this basis (a monomial conversion of a
    degree-d series multiplies coefficients by ~2^d and destroys f64)."""
    a, b = float(interval[0]), float(interval[1])
    k = np.arange(degree + 1)
    t = np.cos(np.pi * (k + 0.5) / (degree + 1))      # nodes in [-1, 1]
    x = 0.5 * (b - a) * t + 0.5 * (a + b)
    return np.polynomial.chebyshev.chebfit(t, np.asarray(fn(x)), degree)


def _cheb_run(E, ct, c, bs, interval):
    if interval is not None:
        a, b = float(interval[0]), float(interval[1])
        if (a, b) != (-1.0, 1.0):
            # t = (2x - (a+b)) / (b-a), one level (plain mult + rescale)
            s_pt = E.drop_prime(E.chain(ct))
            t = E.mult_plain_const(ct, 2.0 / (b - a), s_pt)
            if a + b != 0.0:
                t = E.add_const(t, -(a + b) / (b - a))
            ct = E.rescale(t)
    bs, _ = bsgs_counts(len(c) - 1, bs)
    return _PolyEvaluator(E, ct, bs, basis="chebyshev").run(c)


def poly_eval_cheb(ctx, ct, cheb_coeffs, rlk, enc, bs: int | None = None,
                   interval=None):
    """Evaluate a Chebyshev series sum_i c_i * T_i(ct) on the u64
    evaluator (same PS schedule via T_i = 2*T_{i-m}*T_m - T_{2m-i}).

    `interval=(a, b)` first maps ct into T's native [-1, 1] domain
    (costs one level); omit it when ct is already there.  Returns an
    UNRESCALED ciphertext, like poly_eval."""
    c = _prep_coeffs(cheb_coeffs)
    return _cheb_run(_U64Engine(ctx, rlk, enc), ct, c, bs, interval)


def poly_eval_cheb_fast32(fast, ct, cheb_coeffs, enc,
                          bs: int | None = None, interval=None):
    """Same Chebyshev schedule on Fast32 — bit-identical to the u64 path."""
    c = _prep_coeffs(cheb_coeffs)
    return _cheb_run(_Fast32Engine(fast, enc), ct, c, bs, interval)
