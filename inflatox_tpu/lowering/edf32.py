"""Range-extended double-f32 ("EDF") arithmetic: full f64-and-beyond dynamic
range on TPU at ~48-bit precision.

Why this exists: TPU v5e has no wide-range float at all — both the df32
engine (lowering/df32.py) and XLA's own emulated f64 carry **f32 dynamic
range** (measured: ``jnp.float64(1e30)**2`` is NaN on TPU, exp(200) is NaN).
Models whose intermediate expression values leave [1e-38, 3e38] — the D5
brane model reaches ~1e35+ in |∇V|² — therefore cannot run on ANY shipped
TPU engine, only on CPU.  This module fixes that the TPU-native way: a
number is ``(hi + lo) · 2^e`` with an f32 double-word mantissa (the same
error-free transforms as df32) and a **per-element int32 exponent**.
Mantissas are renormalized into a narrow window after multiplicative ops, so
no intermediate ever approaches the f32 range limits; the exponent field
carries the magnitude, giving ~±2^30 binary-exponent range — far beyond
IEEE f64's ±1024.

Cost: mantissa ops are the df32 transforms plus exponent bookkeeping
(alignment selects on add, a log2/round/exact-2^k rescale after mul-class
ops) — measured ~2-3× the df32 kernel, which is itself ~5× faster than
XLA's emulated f64.  Precision is the df32 envelope (~1e-14 relative,
conditioning permitting) — see docs/numerics.md.

Mosaic notes: vector exponent extraction reads the IEEE exponent field via
bitcast (±1 window slack is fine — the window is only bookkeeping); scalar
(parameter-only) subexpressions use ``round(log2|hi|)`` instead because
``tpu.bitcast`` is vector-only.  All branch literals are
np.float32/np.int32 (weak Python scalars poison Mosaic — see df32.py).

``compile_edf32`` re-executes a LoweredFunction's source against an EDF
namespace, exactly like ``compile_df32``.
"""

from __future__ import annotations

import math
import types

import numpy as np

import jax
import jax.numpy as jnp

from . import df32 as _dfm
from .df32 import DF, _c, _pow2_f32

__all__ = ["EDF", "compile_edf32"]

_E_ZERO = np.int32(-(2**30))  # effective exponent of a zero mantissa
_F32_MAX = np.float32(3.4e38)


def _f32(v):
    return jnp.asarray(v, jnp.float32)


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _renorm(hi, lo, e):
    """Scale the mantissa back into a ~[0.5, 2) window, moving the magnitude
    into the exponent.  Exact: the scale is a power of two."""
    finite = (jnp.abs(hi) < _F32_MAX) & (hi == hi)
    ok = (hi != 0.0) & finite
    safe = jnp.where(ok, hi, _c(1.0))
    if jnp.ndim(safe) == 0:
        # scalar (parameter-only subexpression): tpu.bitcast is
        # vector-only, so read the exponent via log2 + round
        eh = jnp.round(jnp.log2(jnp.abs(safe)))
        s = _pow2_f32(-eh)
        return EDF(hi * s, lo * s, _i32(e) + eh.astype(jnp.int32),
                   _raw=True)
    # vector: exponent straight from the IEEE bit pattern —
    # floor(log2|hi|) for normals (subnormals under-shift, which only
    # lowers the mantissa; consumers tolerate that) — integer ops instead
    # of Mosaic's polynomial log2 on every mul-class op
    bits = jax.lax.bitcast_convert_type(safe, jnp.int32)
    eh = ((bits >> np.int32(23)) & np.int32(0xFF)) - np.int32(127)
    s = _pow2_f32(-eh)
    return EDF(hi * s, lo * s, _i32(e) + eh, _raw=True)


class EDF:
    """A range-extended double-f32 number (elementwise over arrays).

    value = (hi + lo) · 2^e, with hi/lo an error-free f32 pair and e int32.
    """

    __slots__ = ("hi", "lo", "e")

    def __init__(self, hi, lo=None, e=None, _raw=False):
        if _raw:
            self.hi, self.lo, self.e = hi, lo, e
            return
        self.hi = _f32(hi)
        self.lo = _f32(0.0) if lo is None else _f32(lo)
        self.e = _i32(0) if e is None else _i32(e)

    # ---- construction / conversion ----------------------------------- #

    @staticmethod
    def const(value: float) -> "EDF":
        """Exact EDF from a python float of ANY f64 magnitude (frexp first,
        so 1e±300 round-trips — np.float32(1e300) would overflow)."""
        value = float(value)
        if value != value or value in (math.inf, -math.inf):
            return EDF(jnp.float32(np.float32(value)), jnp.float32(0.0), _i32(0))
        m, ee = math.frexp(value)  # m in [0.5, 1)
        hi = np.float32(m)
        lo = np.float32(m - float(hi))
        return EDF(jnp.float32(hi), jnp.float32(lo), _i32(ee))

    @staticmethod
    def from_df(d: DF) -> "EDF":
        return _renorm(d.hi, d.lo, _i32(0))

    @staticmethod
    def of(x) -> "EDF":
        if isinstance(x, EDF):
            return x
        if isinstance(x, (int, float)):
            return EDF.const(float(x))
        if isinstance(x, DF):
            return EDF.from_df(x)
        arr = jnp.asarray(x)
        if arr.dtype == jnp.float64:
            # range-safe: frexp first — a straight f32 cast would overflow
            # beyond 3.4e38 (eager/CPU path; kernels feed f32/DF inputs)
            m, ee = jnp.frexp(arr)
            hi = m.astype(jnp.float32)
            lo = (m - hi.astype(jnp.float64)).astype(jnp.float32)
            return EDF(hi, lo, ee.astype(jnp.int32), _raw=True)
        return EDF.from_df(DF.of(x))

    def to_df(self) -> DF:
        """Materialize as a plain df32 pair (f32 dynamic range): values
        beyond 2^±126 become ±inf / 0 — honest f32-range semantics, used for
        final outputs (the analysis quantities are O(1) physics) and for
        trig/atan arguments."""
        ec = jnp.clip(self.e, np.int32(-126), np.int32(127))
        s = _pow2_f32(ec.astype(jnp.float32))
        hi = self.hi * s
        lo = self.lo * s
        # overflow above the clip: sign·inf; underflow below: ±0 (s already
        # flushed it)
        over = (self.e > np.int32(127)) & (self.hi != 0.0)
        hi = jnp.where(over, jnp.sign(self.hi) * _c(np.inf), hi)
        lo = jnp.where(over, _c(0.0), lo)
        under = self.e < np.int32(-126)
        hi = jnp.where(under, _c(0.0), hi)
        lo = jnp.where(under, _c(0.0), lo)
        return DF(hi, lo)

    def to_f64(self):
        """For eager/CPU use (true f64): (hi+lo)·2^e via exact ldexp."""
        v = self.hi.astype(jnp.float64) + self.lo.astype(jnp.float64)
        ec = jnp.clip(self.e, np.int32(-1100), np.int32(1100))
        half = ec // np.int32(2)
        rest = ec - half
        return v * (2.0 ** half.astype(jnp.float64)) * (
            2.0 ** rest.astype(jnp.float64)
        )

    # ---- ring ops ------------------------------------------------------ #

    def _mant(self) -> DF:
        return DF(self.hi, self.lo)

    def __add__(self, other):
        o = EDF.of(other)
        za = self.hi == 0.0
        zb = o.hi == 0.0
        ea = jnp.where(za, _E_ZERO, self.e)
        eb = jnp.where(zb, _E_ZERO, o.e)
        et = jnp.maximum(ea, eb)
        et = jnp.where(za & zb, np.int32(0), et)
        da = jnp.clip(self.e - et, np.int32(-127), np.int32(0))
        db = jnp.clip(o.e - et, np.int32(-127), np.int32(0))
        sa = _pow2_f32(da.astype(jnp.float32))
        sb = _pow2_f32(db.astype(jnp.float32))
        m = DF(self.hi * sa, self.lo * sa) + DF(o.hi * sb, o.lo * sb)
        # no renorm: window drift from adds is bounded and harmless; deep
        # cancellation only lowers the mantissa, which every consumer
        # (mul/div/sqrt/log renorm first or tolerate) handles
        return EDF(m.hi, m.lo, et, _raw=True)

    __radd__ = __add__

    def __neg__(self):
        return EDF(-self.hi, -self.lo, self.e, _raw=True)

    def __abs__(self):
        # sign = sign of hi (normalized pair); the exponent is unsigned
        neg = self.hi < np.float32(0.0)
        return EDF(jnp.where(neg, -self.hi, self.hi),
                   jnp.where(neg, -self.lo, self.lo),
                   self.e, _raw=True)

    def __sub__(self, other):
        return self + (-EDF.of(other))

    def __rsub__(self, other):
        return EDF.of(other) + (-self)

    def __mul__(self, other):
        o = EDF.of(other)
        m = self._mant() * o._mant()
        return _renorm(m.hi, m.lo, self.e + o.e)

    __rmul__ = __mul__

    def sq(self) -> "EDF":
        m = self._mant().sq()
        return _renorm(m.hi, m.lo, self.e + self.e)

    def __truediv__(self, other):
        o = EDF.of(other)
        m = self._mant() / o._mant()
        return _renorm(m.hi, m.lo, self.e - o.e)

    def __rtruediv__(self, other):
        return EDF.of(other) / self

    def __pow__(self, n):
        if isinstance(n, int) or (isinstance(n, float) and n == int(n)):
            return _ipow(self, int(n))
        return pow(self, n)

    def __rpow__(self, base):
        return pow(EDF.of(base), self)

    # comparisons (control flow only)
    def _cmp_key(self):
        """Monotone f32 surrogate of the value: sign·(window-safe magnitude).
        Mantissas sit in a narrow window, so sign + exponent + mantissa
        compare correctly via the difference's mantissa sign."""
        return self

    def __lt__(self, other):
        return (self - EDF.of(other)).hi < 0.0

    def __le__(self, other):
        d = self - EDF.of(other)
        return d.hi <= 0.0

    def __gt__(self, other):
        return (self - EDF.of(other)).hi > 0.0

    def __ge__(self, other):
        d = self - EDF.of(other)
        return d.hi >= 0.0


def _ipow(x: EDF, n: int) -> EDF:
    if n == 0:
        return EDF.const(1.0) + (x * 0.0)
    invert = n < 0
    n = abs(n)
    result = None
    base = x
    while n:
        if n & 1:
            result = base if result is None else result * base
        n >>= 1
        if n:
            base = base.sq()
    if invert:
        return EDF.const(1.0) / result
    return result


# ---------------------------------------------------------------------- #
# elementary functions                                                   #
# ---------------------------------------------------------------------- #


def sqrt(x) -> EDF:
    x = EDF.of(x)
    odd = (x.e & np.int32(1)) != 0
    m = DF(
        jnp.where(odd, x.hi * _c(2.0), x.hi),
        jnp.where(odd, x.lo * _c(2.0), x.lo),
    )
    eeven = x.e - jnp.where(odd, np.int32(1), np.int32(0))
    s = _dfm.sqrt(m)
    return _renorm(s.hi, s.lo, eeven >> np.int32(1))


def abs_(x) -> EDF:
    x = EDF.of(x)
    neg = x.hi < 0.0
    return EDF(
        jnp.where(neg, -x.hi, x.hi), jnp.where(neg, -x.lo, x.lo), x.e,
        _raw=True,
    )


def where(cond, a, b) -> EDF:
    a = EDF.of(a)
    b = EDF.of(b)
    return EDF(
        jnp.where(cond, a.hi, b.hi),
        jnp.where(cond, a.lo, b.lo),
        jnp.where(cond, a.e, b.e),
        _raw=True,
    )


def minimum(a, b) -> EDF:
    a, b = EDF.of(a), EDF.of(b)
    return where((a - b).hi < 0.0, a, b)


def maximum(a, b) -> EDF:
    a, b = EDF.of(a), EDF.of(b)
    return where((a - b).hi > 0.0, a, b)


_LN2 = 0.6931471805599453094172321214581766
_LOG2E_F = np.float32(1.4426950408889634)


def exp(x) -> EDF:
    """EDF e^x: df reduction with the quotient kept in the exponent field —
    no saturation until |x| leaves the f64-meaningful window (~±746·2^10)."""
    x = EDF.of(x)
    xd = x.to_df()
    k = jnp.round(xd.hi * _LOG2E_F)
    r = xd + (-(DF.const(_LN2) * DF(k)))
    fix = jnp.round(r.hi * _LOG2E_F)
    k = k + fix
    r = r + (-(DF.const(_LN2) * DF(fix)))
    acc = DF(jnp.zeros_like(xd.hi))
    for c in _dfm._EXP_COEFFS:
        acc = (acc + DF.const(c)) * r
    er = acc + 1.0
    # |k| ≤ ~2^24: exact in f32; beyond the f64 window saturate honestly
    big = xd.hi > _c(7.1e6)  # exp overflows even e's int32 range way earlier
    small = xd.hi < _c(-7.1e6)
    hi = jnp.where(big, _c(np.inf), jnp.where(small, _c(0.0), er.hi))
    lo = jnp.where(big | small, _c(0.0), er.lo)
    ke = jnp.where(big | small, _c(0.0), k).astype(jnp.int32)
    return _renorm(hi, lo, ke)


def log(x) -> EDF:
    """EDF ln: ln(m·2^e) = ln(m) + e·ln2 — the exponent enters linearly, so
    range-extended inputs cost one extra df multiply-add."""
    x = EDF.of(x)
    m = x._mant()
    lm = _dfm.log(m)  # handles m<=0 (nan/-inf) consistently with the sign
    ef = x.e.astype(jnp.float32)  # |e| ≤ 2^30 — not exact beyond 2^24, but
    # e beyond ±2^24 means |ln x| > 11 million: 1 ulp of ef is harmless
    out = lm + DF.const(_LN2) * DF(ef)
    bad = x.hi <= 0.0
    hi = jnp.where(bad, lm.hi, out.hi)  # keep df32.log's nan/-inf verdicts
    lo = jnp.where(bad, lm.lo, out.lo)
    return EDF.from_df(DF(hi, lo))


def pow(x, y) -> EDF:  # noqa: A001
    """General power via exp(y·ln x) with C pow edge cases (cf. df32.pow)."""
    if isinstance(y, (int,)) or (isinstance(y, float) and y == int(y)):
        return _ipow(EDF.of(x), int(y))
    x = EDF.of(x)
    y = EDF.of(y)
    safe = where(x.hi > 0.0, x, EDF.const(1.0))
    out = exp(y * log(safe))
    neg = x.hi < 0.0
    hi = jnp.where(neg, _c(np.nan), out.hi)
    lo = jnp.where(neg, _c(0.0), out.lo)
    e = jnp.where(neg, np.int32(0), out.e)
    yv = y.hi
    zero_case_hi = jnp.where(
        yv > 0.0, _c(0.0), jnp.where(yv == 0.0, _c(1.0), _c(np.inf))
    )
    zx = x.hi == 0.0
    hi = jnp.where(zx, zero_case_hi, hi)
    lo = jnp.where(zx, _c(0.0), lo)
    e = jnp.where(zx, np.int32(0), e)
    return EDF(hi, lo, e, _raw=True)


def _via_df(fn, tiny_identity=False, tiny_one=False):
    """Evaluate through the df32 implementation on the materialized value.
    Trig/atan arguments are O(1) physics; the exceptions are tiny arguments
    (|x| < 2^-22), where materialization would lose the low limb to f32
    subnormals — there sin/tan/atan(x) = x and cos(x) = 1 to ~2^-45
    relative, so short-circuit exactly."""

    def run(x):
        x = EDF.of(x)
        out = EDF.from_df(fn(x.to_df()))
        if tiny_identity or tiny_one:
            tiny = (x.e < np.int32(-22)) & (x.hi == x.hi)
            alt = x if tiny_identity else EDF.const(1.0) + (x * 0.0)
            out = where(tiny, alt, out)
        return out

    return run


sin = _via_df(_dfm.sin, tiny_identity=True)
cos = _via_df(_dfm.cos, tiny_one=True)
tan = _via_df(_dfm.tan, tiny_identity=True)
atan = _via_df(_dfm.atan, tiny_identity=True)
arcsin = _via_df(_dfm.arcsin, tiny_identity=True)  # domain |x| ≤ 1: O(1)


def arcsinh(x) -> EDF:
    """asinh on EDF ops end-to-end (sqrt/log are range-extended, so
    arguments beyond f32 range — where this engine lives — stay exact;
    a via-df materialization would overflow them to inf)."""
    x = EDF.of(x)
    s = sign(x)
    out = log(abs_(x) + sqrt(x * x + 1.0))
    return EDF(s * out.hi, s * out.lo, out.e, _raw=True)


def arccosh(x) -> EDF:
    """acosh(x) = log(x + √(x−1)·√(x+1)) on range-extended ops."""
    x = EDF.of(x)
    return log(x + sqrt(x - 1.0) * sqrt(x + 1.0))


def arctanh(x) -> EDF:
    """atanh(x) = ½·log((1+x)/(1−x)) (domain |x| < 1: O(1))."""
    x = EDF.of(x)
    return log((EDF.const(1.0) + x) / (EDF.const(1.0) - x)) * 0.5


def arctan2(y, x) -> EDF:
    """Quadrant-corrected atan2: the ratio divides in EDF (range-safe);
    the df atan saturates to π/2 beyond its 1e30 cap, as it should."""
    y, x = EDF.of(y), EDF.of(x)
    xs = sign(x)
    ys = sign(y)
    xsafe = where(xs == 0, EDF.const(1.0), x)
    base = atan(y / xsafe)
    pi = EDF.const(math.pi)
    half = EDF.const(math.pi / 2.0)
    out = where(xs < 0, base + where(ys < 0, -pi, pi), base)
    out = where((xs == 0) & (ys > 0), half, out)
    out = where((xs == 0) & (ys < 0), -half, out)
    return where((xs == 0) & (ys == 0), EDF.const(0.0), out)


def sign(x):
    x = EDF.of(x)
    return jnp.sign(x.hi)


# ---------------------------------------------------------------------- #
# namespace adapter: run lowered sources on EDF                          #
# ---------------------------------------------------------------------- #


def _select(condlist, choicelist, default=None):
    out = EDF.of(default) if default is not None else EDF.const(math.nan)
    for cond, choice in zip(reversed(condlist), reversed(choicelist)):
        if cond is True:
            out = EDF.of(choice)
        else:
            out = where(cond, EDF.of(choice), out)
    return out


class _LazyConstNamespace(types.SimpleNamespace):
    _LAZY = {"pi": math.pi, "e": math.e, "nan": math.nan}

    def __getattr__(self, name):
        if name in self._LAZY:
            return EDF.const(self._LAZY[name])
        raise AttributeError(name)


def _jnp_like() -> types.SimpleNamespace:
    return _LazyConstNamespace(
        sqrt=sqrt,
        sin=sin,
        cos=cos,
        tan=tan,
        exp=exp,
        log=log,
        abs=abs_,
        absolute=abs_,
        arctan=atan,
        arctan2=arctan2,
        arcsin=arcsin,
        arcsinh=arcsinh,
        arccosh=arccosh,
        arctanh=arctanh,
        minimum=minimum,
        maximum=maximum,
        where=where,
        select=_select,
        sign=sign,
        power=pow,
        greater=lambda a, b: EDF.of(a) > EDF.of(b),
        less=lambda a, b: EDF.of(a) < EDF.of(b),
        greater_equal=lambda a, b: EDF.of(a) >= EDF.of(b),
        less_equal=lambda a, b: EDF.of(a) <= EDF.of(b),
        logical_and=jnp.logical_and,
        logical_or=jnp.logical_or,
        logical_not=jnp.logical_not,
    )


def _df_bridge(name):
    """Demote-evaluate-promote wrapper onto a df32_special function, like
    :class:`_EDFSpecial` — erf/gamma arguments are physical scales that sit
    inside f32 range even when other intermediates do not.  Leading static
    args (polygamma's order) pass through untouched."""
    def run(*args):
        from . import df32_special as _ds  # noqa: PLC0415

        fn = getattr(_ds, name)
        x = args[-1]
        return EDF.from_df(
            fn(*args[:-1], x.to_df() if isinstance(x, EDF) else x)
        )

    return run


def _amath_like() -> types.SimpleNamespace:
    return types.SimpleNamespace(
        exp=exp,
        atan=atan,
        pow=pow,
        sinh=lambda x: (exp(x) - exp(-EDF.of(x))) * 0.5,
        cosh=lambda x: (exp(x) + exp(-EDF.of(x))) * 0.5,
        tanh=lambda x: (lambda e2: (e2 - 1.0) / (e2 + 1.0))(
            exp(EDF.of(x) * 2.0)
        ),
        acos=lambda x: atan(
            sqrt((EDF.const(1.0) - EDF.of(x)) / (EDF.const(1.0) + EDF.of(x)))
        ) * 2.0,
        log2=lambda x: log(x) * (1.0 / _LN2),
        log10=lambda x: log(x) * (1.0 / math.log(10.0)),
        exp2=lambda x: exp(EDF.of(x) * _LN2),
        erf=_df_bridge("erf"),
        erfc=_df_bridge("erfc"),
        gamma=_df_bridge("gamma"),
        lgamma=_df_bridge("lgamma"),
        polygamma=_df_bridge("polygamma"),
    )


class _EDFSeq:
    def __init__(self, items):
        self._items = [EDF.of(v) for v in items]

    def __getitem__(self, i):
        return self._items[i]


class _EDFSpecial:
    """Special functions for the range-extended engine.

    Arguments to the Bessel/0F1 family are physical scales (radii, masses)
    that sit inside f32 range even when a model's *other* intermediates do
    not — so each function demotes its EDF argument to DF (saturating like
    the trig demotions above), evaluates the df32 implementation
    (lowering/df32_special.py), and promotes the result back.  Functions
    the df32 engine lacks raise its informative error unchanged."""

    _DF32 = None

    def __getattr__(self, name):
        if _EDFSpecial._DF32 is None:
            from .df32_special import DF32Special  # noqa: PLC0415

            _EDFSpecial._DF32 = DF32Special()
        fn = getattr(_EDFSpecial._DF32, name)  # raises NotImplementedError

        def run(*args):
            conv = [
                a.to_df() if isinstance(a, EDF) else a for a in args
            ]
            return EDF.from_df(fn(*conv))

        return run


def compile_edf32(lowered):
    """Compile a LoweredFunction's source against the EDF namespace.  The
    returned callable takes the same positional sequences (entries may be
    arrays, DF or EDF) and returns EDF (or a tuple of EDF)."""
    fake_jax = types.SimpleNamespace(numpy=_jnp_like())
    namespace = {
        "jax": fake_jax,
        "_amath": _amath_like(),
        "_special": _EDFSpecial(),
    }
    exec(compile(lowered.source, f"<edf32:{lowered.name}>", "exec"), namespace)
    inner = namespace[lowered.name]

    def run(*seqs):
        import sys  # noqa: PLC0415

        limit = sys.getrecursionlimit()
        if limit < 100_000:
            sys.setrecursionlimit(100_000)
        try:
            return inner(*[_EDFSeq(s) for s in seqs])
        finally:
            sys.setrecursionlimit(limit)

    return run


#: Alias so generic numerics code can do ``nm.NUM.const(...)`` with either
#: module (df32 or edf32) — see ops/anguelova.py.
NUM = EDF


def normalize_homogeneous(v, v00, v10, v11, gs):
    """Identity hook (API parity with df32.normalize_homogeneous): EDF values
    carry a per-element exponent, so polynomial condition forms cannot leave
    range — no rescaling needed."""
    return v, v00, v10, v11, gs


def is_zero(x):
    """Exact-zero mask (mantissa hi + lo == 0)."""
    return (x.hi + x.lo) == 0


def nan_like(x) -> "EDF":
    return EDF(
        jnp.full_like(x.hi, np.float32(np.nan)),
        jnp.zeros_like(x.lo),
        jnp.zeros_like(x.e),
        _raw=True,
    )
