"""Triple-f32 ("tf32") arithmetic: ~71-bit extended precision on TPU.

Why: docs/numerics.md §8 — the EGNO-class projected covariant Hesse carries
an intrinsic ~3e8 cancellation, so *any* ~48-bit format (df32, TPU emulated
f64) bottoms out at ~1e-6 relative, and even the reference's true-IEEE-f64
evaluation is ~5e-8 from the exact values.  A third f32 word pushes the
unit roundoff to ~2⁻⁷¹ ≈ 4e-22; through the 3e8 cancellation that leaves
~1e-13 — *more accurate than the reference's own C f64 path*.

Representation: ``TF(x0, x1, x2)`` with value = x0 + x1 + x2 and the words
roughly non-overlapping (renormalized).  Algorithms are the classical
triple-word forms built from the same FMA-free f32 error-free transforms as
:mod:`df32` (Knuth two-sum / Dekker two-prod); accuracy targets O(u³)
relative per operation and is validated empirically against 40-digit mpmath
in ``tests/test_tf32.py`` rather than proof-chased.

Intended use: the **model-evaluation stage only** (``engine="pallas_tf64"``
evaluates V/Hesse/|∇V|² in TF, demotes to DF, and runs the standard df32
analysis tail) — the tail's conditioning is mild once its inputs are
accurate.  Costs ~3-5× the df32 model eval; reserve it for
cancellation-heavy models.

Same namespace-compilation trick as df32: :func:`compile_tf32` re-executes
a lowered source against TF implementations of ``jax.numpy`` / ``_amath``.
Special functions are not provided (use df32/f64 engines for those models).
"""

from __future__ import annotations

import math
import types

import numpy as np

import jax
import jax.numpy as jnp

from .df32 import (
    DF,
    _c,
    _exp_round_f32,
    _pow2_f32,
    _quick_two_sum,
    _two_prod,
    _two_sum,
)

__all__ = ["TF", "compile_tf32"]


def _renorm(a, b, c):
    """Compress three f32 words into a renormalized triple (robust to
    disordered inputs — required after additive cancellation, where the
    error words can rival the head)."""
    b, c = _two_sum(b, c)
    a, b = _two_sum(a, b)
    b, c = _two_sum(b, c)
    a, b = _quick_two_sum(a, b)
    return a, b, c


def _renorm_ordered(a, b, c):
    """Renormalize a triple whose words are already magnitude-ordered
    (|a| ≳ |b| ≳ |c| up to rounding, e.g. a product head and its error
    terms — multiplication cannot reorder them).  A quick_two_sum ladder
    saves ~12 VPU slots per call vs :func:`_renorm`; NOT safe after
    additive cancellation."""
    b, c = _quick_two_sum(b, c)
    a, b = _quick_two_sum(a, b)
    b, c = _quick_two_sum(b, c)
    return a, b, c


class TF:
    """A triple-f32 number (elementwise over arrays)."""

    __slots__ = ("x0", "x1", "x2")

    def __init__(self, x0, x1=None, x2=None):
        self.x0 = jnp.asarray(x0, jnp.float32)
        z = jnp.zeros_like(self.x0)
        self.x1 = z if x1 is None else jnp.asarray(x1, jnp.float32)
        self.x2 = z if x2 is None else jnp.asarray(x2, jnp.float32)

    # ---- construction / conversion ---------------------------------- #

    @staticmethod
    def const(value: float) -> "TF":
        """Exact three-word split of a python float (f64 needs ≤ 53 bits —
        two words carry it exactly; the third is spare precision)."""
        x0 = np.float32(value)
        r = value - float(x0)
        x1 = np.float32(r)
        x2 = np.float32(r - float(x1))
        return TF(jnp.float32(x0), jnp.float32(x1), jnp.float32(x2))

    @staticmethod
    def of(x) -> "TF":
        if isinstance(x, TF):
            return x
        if isinstance(x, DF):
            return TF(x.hi, x.lo)
        if isinstance(x, (int, float)):
            return TF.const(float(x))
        arr = jnp.asarray(x)
        if arr.dtype == jnp.float64:
            hi = arr.astype(jnp.float32)
            rem = arr - hi.astype(jnp.float64)
            lo = rem.astype(jnp.float32)
            lo2 = (rem - lo.astype(jnp.float64)).astype(jnp.float32)
            return TF(hi, lo, lo2)
        return TF(arr.astype(jnp.float32))

    def to_df(self) -> DF:
        hi, lo = _two_sum(self.x0, self.x1)
        return DF(hi, lo + self.x2)

    def to_f64(self):
        return (
            self.x0.astype(jnp.float64)
            + self.x1.astype(jnp.float64)
            + self.x2.astype(jnp.float64)
        )

    def _cmp_val(self):
        return (self.x0 + self.x1) + self.x2

    # ---- ring ops ---------------------------------------------------- #

    def __neg__(self):
        return TF(-self.x0, -self.x1, -self.x2)

    def __abs__(self):
        # the triple's sign is the sign of the leading limb (the tail is
        # bounded by ½ulp at each level); flip every limb on negative
        neg = self.x0 < np.float32(0.0)
        return TF(jnp.where(neg, -self.x0, self.x0),
                  jnp.where(neg, -self.x1, self.x1),
                  jnp.where(neg, -self.x2, self.x2))

    def __add__(self, other):
        o = TF.of(other)
        s0, e0 = _two_sum(self.x0, o.x0)
        s1, e1 = _two_sum(self.x1, o.x1)
        t1, t2 = _two_sum(s1, e0)
        r0, w = _two_sum(s0, t1)
        a, b = _two_sum(w, t2)
        low = ((self.x2 + o.x2) + e1) + b
        return TF(*_renorm(r0, a, low))

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-TF.of(other))

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        o = TF.of(other)
        p00, e00 = _two_prod(self.x0, o.x0)
        p01, e01 = _two_prod(self.x0, o.x1)
        p10, e10 = _two_prod(self.x1, o.x0)
        # third-order terms in plain f32 (their rounding is O(u³) relative)
        low3 = (self.x0 * o.x2 + self.x2 * o.x0) + self.x1 * o.x1
        t1, t2 = _two_sum(p01, p10)
        t3, t4 = _two_sum(e00, t1)
        low = (low3 + (e01 + e10)) + (t2 + t4)
        # p00 ≥ t3 ≥ low structurally (t3 ≲ 4u·p00, low ≲ u²·p00):
        # products cannot cancel, so the ordered renorm is safe
        return TF(*_renorm_ordered(p00, t3, low))

    __rmul__ = __mul__

    def sq(self) -> "TF":
        return self * self

    def __truediv__(self, other):
        o = TF.of(other)
        # reciprocal by staged Newton: f32 seed → one df step → one TF step
        y0 = 1.0 / o.x0
        od = o.to_df()
        yd = DF(y0) * (DF.const(2.0) - od * y0)  # ~2^-45
        r = TF.of(yd)
        r = r * (TF.const(2.0) - o * r)  # ~few·u³ (capped by format)
        # q = a·r carries r's error plus one TF-mul rounding (~2e-21
        # relative, measured 1.4e-21 worst over 1e5 magnitude-spread
        # samples) — a residual correction step would cost two more TF
        # muls for accuracy below what the format resolves
        return TF.of(self) * r

    def __rtruediv__(self, other):
        return TF.of(other) / self

    def __pow__(self, n):
        if isinstance(n, int) or (isinstance(n, float) and n == int(n)):
            return _ipow(self, int(n))
        return pow(self, n)

    def __rpow__(self, base):
        return pow(TF.of(base), self)

    # comparisons (control flow only)
    def __lt__(self, other):
        return self._cmp_val() < TF.of(other)._cmp_val()

    def __le__(self, other):
        return self._cmp_val() <= TF.of(other)._cmp_val()

    def __gt__(self, other):
        return self._cmp_val() > TF.of(other)._cmp_val()

    def __ge__(self, other):
        return self._cmp_val() >= TF.of(other)._cmp_val()


NUM = TF


def _ipow(x: TF, n: int) -> TF:
    if n == 0:
        return TF.const(1.0) + (x * 0.0)
    invert = n < 0
    n = abs(n)
    result = None
    base = x
    while n:
        if n & 1:
            result = base if result is None else result * base
        n >>= 1
        if n:
            base = base * base
    if invert:
        return TF.const(1.0) / result
    return result


# ---------------------------------------------------------------------- #
# elementary functions (the set EGNO/D5-class models lower to)           #
# ---------------------------------------------------------------------- #


def sqrt(x) -> TF:
    """TF sqrt: f32 seed + df Newton + one TF Newton step."""
    x = TF.of(x)
    bad = x.x0 < 0
    zero = x.x0 == 0
    safe = jnp.where(x.x0 > 0, x.x0, _c(1.0))
    xs = TF(jnp.where(x.x0 > 0, x.x0, _c(1.0)),
            jnp.where(x.x0 > 0, x.x1, _c(0.0)),
            jnp.where(x.x0 > 0, x.x2, _c(0.0)))
    y = jax.lax.rsqrt(safe)  # ~1/sqrt seed
    xd = xs.to_df()
    yd = DF(y) * (DF.const(1.5) - xd * (DF(y * _c(0.5)) * y))  # df 1/sqrt
    s = xd * yd  # df sqrt ~2^-45
    st = TF.of(s)
    # TF Newton: s' = s + (x − s²)·(y/2)  with y/2 at df accuracy
    half_y = yd * 0.5
    corr = (xs + (-(st * st))) * TF.of(half_y)
    out = st + corr
    nan = _c(np.nan)
    x0 = jnp.where(zero, _c(0.0), jnp.where(bad, nan, out.x0))
    x1 = jnp.where(zero | bad, _c(0.0), out.x1)
    x2 = jnp.where(zero | bad, _c(0.0), out.x2)
    return TF(x0, x1, x2)


def abs_(x) -> TF:  # noqa: A001
    x = TF.of(x)
    neg = x._cmp_val() < 0
    return TF(jnp.where(neg, -x.x0, x.x0), jnp.where(neg, -x.x1, x.x1),
              jnp.where(neg, -x.x2, x.x2))


def where(cond, a, b) -> TF:
    a = TF.of(a)
    b = TF.of(b)
    return TF(jnp.where(cond, a.x0, b.x0), jnp.where(cond, a.x1, b.x1),
              jnp.where(cond, a.x2, b.x2))


def minimum(a, b) -> TF:
    a, b = TF.of(a), TF.of(b)
    return where(a._cmp_val() < b._cmp_val(), a, b)


def maximum(a, b) -> TF:
    a, b = TF.of(a), TF.of(b)
    return where(a._cmp_val() > b._cmp_val(), a, b)


_LN2 = 0.6931471805599453094172321214581765680755
#: ln2 to ~107 bits as a sum of two f64s (a single f64 constant caps exp/log
#: at ~1e-16 — measured; the residual beyond these two words is 5.7e-34)
_LN2_HI = 0.6931471805599453
_LN2_LO = 2.3190468138462996e-17


def _ln2_tf() -> "TF":
    return TF.const(_LN2_HI) + TF.const(_LN2_LO)


_LOG2E_F = np.float32(1.4426950408889634)
_EXP_TERMS = 18


def exp(x) -> TF:
    """TF e^x: k·ln2 reduction (three-word ln2) + Taylor (|r| ≤ ln2/2,
    terms to r¹⁸/18! ≈ 2⁻⁷⁶)."""
    x = TF.of(x)
    ln2 = _ln2_tf()
    k = jnp.round(x.x0 * _LOG2E_F)
    r = x + (-(ln2 * TF(k)))
    fix = jnp.round(r.x0 * _LOG2E_F)
    k = k + fix
    r = r + (-(ln2 * TF(fix)))
    acc = TF(jnp.zeros_like(x.x0))
    for n in range(_EXP_TERMS, 0, -1):
        acc = (acc + TF.const(1.0 / math.factorial(n))) * r
    er = acc + 1.0
    kc = jnp.clip(k, _c(-252.0), _c(254.0))
    k1 = jnp.floor(kc / 2.0)
    k2 = kc - k1
    s1 = _pow2_f32(k1)
    s2 = _pow2_f32(k2)
    out = TF(er.x0 * s1 * s2, er.x1 * s1 * s2, er.x2 * s1 * s2)
    big = x.x0 > 88.8
    small = x.x0 < -87.4
    x0 = jnp.where(big, _c(np.inf), jnp.where(small, _c(0.0), out.x0))
    x1 = jnp.where(big | small, _c(0.0), out.x1)
    x2 = jnp.where(big | small, _c(0.0), out.x2)
    return TF(x0, x1, x2)


_LOG_TERMS = 16  # odd powers through t³¹: t ≤ 0.1716 → t³¹ ≈ 2⁻⁷⁹


def log(x) -> TF:
    """TF log: exact pow2 exponent extraction + atanh series."""
    x = TF.of(x)
    safe = jnp.where(x.x0 > 0, x.x0, _c(1.0))
    e = _exp_round_f32(safe)
    scale = _pow2_f32(-e)
    m = TF(x.x0 * scale, x.x1 * scale, x.x2 * scale)  # m in ~[0.71, 1.42]
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    acc = TF(jnp.zeros_like(x.x0))
    for n in range(2 * _LOG_TERMS - 1, 0, -2):
        acc = acc * t2 + TF.const(1.0 / n)
    out = t * acc * 2.0 + _ln2_tf() * TF(e)
    bad = x.x0 <= 0.0
    special = jnp.where(x.x0 == 0.0, _c(-np.inf), _c(np.nan))
    return TF(jnp.where(bad, special, out.x0), jnp.where(bad, _c(0.0), out.x1),
              jnp.where(bad, _c(0.0), out.x2))


def pow(x, y) -> TF:  # noqa: A001
    """General power via exp(y·log x) with C pow edge cases."""
    if isinstance(y, int) or (isinstance(y, float) and y == int(y)):
        return _ipow(TF.of(x), int(y))
    x = TF.of(x)
    y = TF.of(y)
    out = exp(y * log(where(x.x0 > 0, x, TF.const(1.0))))
    x0 = jnp.where(x.x0 > 0, out.x0, _c(np.nan))
    x1 = jnp.where(x.x0 > 0, out.x1, _c(0.0))
    x2 = jnp.where(x.x0 > 0, out.x2, _c(0.0))
    yv = y._cmp_val()
    zero_case = jnp.where(yv > 0, _c(0.0), jnp.where(yv == 0, _c(1.0), _c(np.inf)))
    x0 = jnp.where(x.x0 == 0.0, zero_case, x0)
    x1 = jnp.where(x.x0 == 0.0, _c(0.0), x1)
    x2 = jnp.where(x.x0 == 0.0, _c(0.0), x2)
    return TF(x0, x1, x2)


# ---------------------------------------------------------------------- #
# namespace adapter                                                      #
# ---------------------------------------------------------------------- #


class _LazyConstNamespace(types.SimpleNamespace):
    _LAZY = {"pi": math.pi, "e": math.e, "nan": math.nan}

    def __getattr__(self, name):
        if name in self._LAZY:
            return TF.const(self._LAZY[name])
        raise AttributeError(name)


def _select(condlist, choicelist, default=None):
    out = TF.of(default) if default is not None else TF.const(math.nan)
    for cond, choice in zip(reversed(condlist), reversed(choicelist)):
        if cond is True:
            out = TF.of(choice)
        else:
            out = where(cond, TF.of(choice), out)
    return out


def _via_df(fn):
    """Lift a DF elementary function into TF by demoting the argument.

    The result carries df (~2⁻⁴⁷) accuracy rather than tf — acceptable for
    the bounded trig/inverse-trig phases models use them for (the tf engine
    exists for the *cancellation-prone polynomial/exp/log* structure of the
    Hesse; a phase's error does not amplify)."""

    def run(x):
        return TF.of(fn(TF.of(x).to_df()))

    return run


def _jnp_like() -> types.SimpleNamespace:
    from . import df32 as _dfm  # noqa: PLC0415

    return _LazyConstNamespace(
        sqrt=sqrt,
        exp=exp,
        log=log,
        sin=_via_df(_dfm.sin),
        cos=_via_df(_dfm.cos),
        tan=_via_df(_dfm.tan),
        arctan=_via_df(_dfm.atan),
        arctan2=lambda y, x: TF.of(
            _dfm.arctan2(TF.of(y).to_df(), TF.of(x).to_df())
        ),
        arcsin=_via_df(_dfm.arcsin),
        arcsinh=_via_df(_dfm.arcsinh),
        arccosh=_via_df(_dfm.arccosh),
        arctanh=_via_df(_dfm.arctanh),
        abs=abs_,
        absolute=abs_,
        minimum=minimum,
        maximum=maximum,
        where=where,
        select=_select,
        sign=lambda x: jnp.sign(TF.of(x)._cmp_val()),
        power=pow,
        greater=lambda a, b: TF.of(a) > TF.of(b),
        less=lambda a, b: TF.of(a) < TF.of(b),
        greater_equal=lambda a, b: TF.of(a) >= TF.of(b),
        less_equal=lambda a, b: TF.of(a) <= TF.of(b),
        logical_and=jnp.logical_and,
        logical_or=jnp.logical_or,
        logical_not=jnp.logical_not,
    )


def _amath_like() -> types.SimpleNamespace:
    from . import df32 as _dfm  # noqa: PLC0415

    return types.SimpleNamespace(
        exp=exp,
        pow=pow,
        atan=_via_df(_dfm.atan),
        acos=lambda x: _via_df(_dfm.atan)(
            sqrt((TF.const(1.0) - TF.of(x)) / (TF.const(1.0) + TF.of(x)))
        ) * 2.0,
        log2=lambda x: log(x) * (1.0 / _LN2),
        log10=lambda x: log(x) * (1.0 / math.log(10.0)),
        exp2=lambda x: exp(TF.of(x) * _LN2),
        sinh=lambda x: (exp(x) - exp(-TF.of(x))) * TF.const(0.5),
        cosh=lambda x: (exp(x) + exp(-TF.of(x))) * TF.const(0.5),
        tanh=lambda x: (lambda e2: (e2 - 1.0) / (e2 + 1.0))(exp(TF.of(x) * 2.0)),
    )


class _TFSeq:
    def __init__(self, items):
        self._items = [TF.of(v) for v in items]

    def __getitem__(self, i):
        return self._items[i]


class _TFSpecialStub:
    def __getattr__(self, name):
        raise NotImplementedError(
            f"special function {name!r} is not available in the tf32 "
            "extended-precision engine; use engine='pallas_df64' or 'xla'"
        )


def compile_tf32(lowered):
    """Compile a LoweredFunction's source against the tf32 namespace."""
    fake_jax = types.SimpleNamespace(numpy=_jnp_like())
    namespace = {
        "jax": fake_jax,
        "_amath": _amath_like(),
        "_special": _TFSpecialStub(),
    }
    exec(compile(lowered.source, f"<tf32:{lowered.name}>", "exec"), namespace)
    inner = namespace[lowered.name]

    def run(*seqs):
        import sys  # noqa: PLC0415

        limit = sys.getrecursionlimit()
        if limit < 100_000:
            sys.setrecursionlimit(100_000)
        try:
            return inner(*[_TFSeq(s) for s in seqs])
        finally:
            sys.setrecursionlimit(limit)

    return run
