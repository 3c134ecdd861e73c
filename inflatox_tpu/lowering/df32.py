"""Double-f32 ("float-float") arithmetic for fast high-precision TPU kernels.

Why this exists: TPU v5e has no f64 hardware.  XLA's emulated f64 runs the
4096² complete-analysis scan in ~5 s; the f32 Pallas kernel runs it in
~2.5 ms but carries only 24-bit precision — short of the ≤1e-10
reference-parity target.  This module implements compensated ("double-word")
arithmetic over pairs of f32s: ~48-bit effective mantissa (unit roundoff
≈ 3.6e-15) using only f32 add/mul/div/sqrt — exactly the primitive set the
VPU executes at full rate and Mosaic can lower.  A df32 op costs 5-25 f32
flops, so the df32 kernel lands within ~10-20× of the raw f32 kernel — three
orders of magnitude faster than emulated f64, at accuracy comfortably inside
the parity budget.

Number representation: ``DF(hi, lo)`` with value = hi + lo, |lo| ≤ ulp(hi)/2.
Error-free transforms are the classical FMA-free forms (Knuth two-sum,
Dekker split/two-prod — see Hida/Li/Bailey's double-double arithmetic and
the "two-float" literature).  Requires correctly-rounded f32 add/mul, which
TPU VPU provides.

The same class runs under plain jnp (f32 arrays) outside Pallas, inside the
Pallas kernel on tiles, and under numpy for tests.

``compile_df32`` re-executes a :class:`LoweredFunction`'s generated source
with a namespace that maps ``jax.numpy`` / ``_amath`` / ``_special`` onto
df32 implementations — one lowering, many numeric engines (f64 XLA, f32,
df32, and the edf32/tf32 variants built on the same machinery).
"""

from __future__ import annotations

import math
import types

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["DF", "compile_df32", "from_float", "to_f64"]

_SPLITTER = np.float32(4097.0)  # 2^12 + 1 for 24-bit Dekker splitting

# f32 scalar literal: under jax_enable_x64, a bare Python float reaches
# where/select/clip as a weak-f64 operand, forcing an f64→f32
# convert_element_type inside the kernel — which Mosaic's lowering cannot
# handle (it recurses to death).  Route every branch literal through this.
def _c(v):
    return np.float32(v)


def _f32(v):
    return jnp.asarray(v, jnp.float32)


def _two_sum(a, b):
    """Knuth: s + err == a + b exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Fast renormalization; requires |a| >= |b| (guaranteed post-op)."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    """Dekker split into 12+12-bit halves (FMA-free)."""
    c = _SPLITTER * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    """p + err == a*b exactly (Dekker)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _split_const(v: float):
    """Dekker split of an exactly-f32-representable constant, done at trace
    time in numpy f32 arithmetic (bit-identical to the in-kernel split, but
    free at runtime)."""
    a = np.float32(v)
    c = np.float32(_SPLITTER * a)
    hi = np.float32(c - np.float32(c - a))
    lo = np.float32(a - hi)
    return hi, lo


def _is_pow2(v: float) -> bool:
    """True for ±2^k exactly representable (and exactly scalable) in f32."""
    if v == 0.0 or not math.isfinite(v):
        return False
    m, e = math.frexp(abs(v))
    return m == 0.5 and -120 <= e <= 121


def _two_sq(a):
    """p + err == a*a exactly — one Dekker split instead of two."""
    p = a * a
    ah, al = _split(a)
    err = ((ah * ah - p) + 2.0 * (ah * al)) + al * al
    return p, err


class DF:
    """A double-f32 number (elementwise over arrays)."""

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo=None):
        self.hi = _f32(hi)
        self.lo = _f32(0.0) if lo is None else _f32(lo)

    # ---- construction / conversion ---------------------------------- #

    @staticmethod
    def const(value: float) -> "DF":
        """Split a python float into an exact two-f32 representation."""
        hi = np.float32(value)
        lo = np.float32(value - float(hi))
        return DF(jnp.float32(hi), jnp.float32(lo))

    @staticmethod
    def of(x) -> "DF":
        if isinstance(x, DF):
            return x
        if isinstance(x, (int, float)):
            return DF.const(float(x))
        arr = jnp.asarray(x)
        if arr.dtype == jnp.float64:
            hi = arr.astype(jnp.float32)
            lo = (arr - hi.astype(jnp.float64)).astype(jnp.float32)
            return DF(hi, lo)
        return DF(arr.astype(jnp.float32))

    def to_f64(self):
        return self.hi.astype(jnp.float64) + self.lo.astype(jnp.float64)

    # ---- ring ops ---------------------------------------------------- #

    def __add__(self, other):
        if isinstance(other, (int, float)):
            # trace-time constant: its (hi, lo) decomposition is free, and a
            # zero lo saves one runtime add
            v = float(other)
            chi = np.float32(v)
            clo = np.float32(v - float(chi))
            s, e = _two_sum(self.hi, chi)
            e = (e + self.lo) if clo == 0 else (e + (self.lo + clo))
            hi, lo = _quick_two_sum(s, e)
            return DF(hi, lo)
        o = DF.of(other)
        s, e = _two_sum(self.hi, o.hi)
        e = e + (self.lo + o.lo)
        hi, lo = _quick_two_sum(s, e)
        return DF(hi, lo)

    __radd__ = __add__

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __abs__(self):
        # a normalized pair's sign is the sign of hi (|lo| ≤ ½ulp(hi));
        # flip BOTH limbs on negative so |x| stays an exact pair.  sympy
        # emits Abs differentiating sqrt/powers, printed as python abs()
        neg = self.hi < np.float32(0.0)
        return DF(jnp.where(neg, -self.hi, self.hi),
                  jnp.where(neg, -self.lo, self.lo))

    def __sub__(self, other):
        if isinstance(other, (int, float)):
            return self + (-float(other))
        return self + (-DF.of(other))

    def __rsub__(self, other):
        if isinstance(other, (int, float)):
            return (-self) + float(other)
        return DF.of(other) + (-self)

    def __mul__(self, other):
        if isinstance(other, (int, float)):
            return self._mul_const(float(other))
        o = DF.of(other)
        p, e = _two_prod(self.hi, o.hi)
        e = e + (self.hi * o.lo + self.lo * o.hi)
        hi, lo = _quick_two_sum(p, e)
        return DF(hi, lo)

    __rmul__ = __mul__

    def _mul_const(self, v: float) -> "DF":
        """Multiply by a trace-time Python constant.

        * ±2^k: exact two-flop scaling (no Dekker machinery at all);
        * exactly-f32 constants: the constant's Dekker split is precomputed
          at trace time and its lo word is zero — ~25% fewer runtime flops;
        * general f64 constants: precomputed split plus the lo cross term.
        """
        if _is_pow2(v):
            c = np.float32(v)
            return DF(self.hi * c, self.lo * c)
        chi = np.float32(v)
        clo = np.float32(v - float(chi))
        chih, chil = _split_const(chi)
        ah, al = _split(self.hi)
        p = self.hi * chi
        e = ((chih * ah - p) + chih * al + chil * ah) + chil * al
        if clo == 0:
            e = e + self.lo * chi
        else:
            e = e + (self.hi * clo + self.lo * chi)
        hi, lo = _quick_two_sum(p, e)
        return DF(hi, lo)

    def sq(self) -> "DF":
        """self*self with one Dekker split instead of two."""
        p, e = _two_sq(self.hi)
        e = e + 2.0 * (self.hi * self.lo)
        hi, lo = _quick_two_sum(p, e)
        return DF(hi, lo)

    def __truediv__(self, other):
        # Karp-Markstein style: ONE f32 divide (y = 1/b.hi), residual in df,
        # correction by multiply.  f32 divides are the VPU's slowest ops —
        # the classical two-divide form costs measurably more for the same
        # ~2^-47 relative error (residual r is exact to df, y's 2^-24 error
        # only scales the already-2^-23-small correction).
        #
        # Residual without a full df mul/add: p + e == o.hi*q1 exactly
        # (Dekker), and since q1 ≈ self.hi/o.hi, p agrees with self.hi to
        # ~2^-23 relative, so self.hi - p is exact (Sterbenz).  The remaining
        # terms are all O(2^-23·self) — plain f32 accumulation of them lands
        # at ~2^-46 relative, inside the df envelope.
        o = DF.of(other)
        y = 1.0 / o.hi
        q1 = self.hi * y
        p, e = _two_prod(o.hi, q1)
        r = ((self.hi - p) - e) + self.lo - o.lo * q1
        q2 = r * y
        hi, lo = _quick_two_sum(q1, q2)
        return DF(hi, lo)

    def __rtruediv__(self, other):
        return DF.of(other) / self

    def __pow__(self, n):
        if isinstance(n, int) or (isinstance(n, float) and n == int(n)):
            return _ipow(self, int(n))
        return pow(self, n)

    def __rpow__(self, base):
        return pow(DF.of(base), self)

    # comparisons (control flow only — compare the f32 sum)
    def _cmp_val(self):
        return self.hi + self.lo

    def __lt__(self, other):
        return self._cmp_val() < DF.of(other)._cmp_val()

    def __le__(self, other):
        return self._cmp_val() <= DF.of(other)._cmp_val()

    def __gt__(self, other):
        return self._cmp_val() > DF.of(other)._cmp_val()

    def __ge__(self, other):
        return self._cmp_val() >= DF.of(other)._cmp_val()


#: Generic-numerics alias (shared with edf32.NUM): condition-math ops take a
#: numerics module and use ``nm.NUM.const(...)``.
NUM = DF


def normalize_homogeneous(v, v00, v10, v11, gs):
    """Common power-of-two rescaling for the scale-invariant condition forms.

    The restructured analysis tail (ops/anguelova.py) evaluates the ratio
    metrics on *polynomial* L/R pairs (quartic in the model quantities)
    instead of ratio chains — fewer divides, but quartics of ~1e-13-scale
    Hesse entries (angular-model class) would underflow f32.  All the
    quantities the tail derives are invariant under (v, v00, v10, v11) → s·(…)
    with gs → s²·gs, so scale by the exact power of two that brings
    max|…| to [1, 2).  s-scaling is error-free (pow2), so parity is
    untouched.  EDF (edf32) carries per-element exponents and needs no
    rescaling — its module exposes an identity hook of the same name."""
    m = jnp.maximum(
        jnp.maximum(jnp.abs(v.hi), jnp.abs(v00.hi)),
        jnp.maximum(jnp.abs(v10.hi), jnp.abs(v11.hi)),
    )
    if jnp.ndim(m) == 0:
        # scalar grids (fully-constant models): Mosaic bitcast is
        # vector-only, and there is nothing to gain — skip
        return v, v00, v10, v11, gs
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    e = (bits >> np.int32(23)) & np.int32(0xFF)
    f = jnp.clip(np.int32(254) - e, np.int32(1), np.int32(253))
    s = jax.lax.bitcast_convert_type(f << np.int32(23), jnp.float32)

    def sc(x):
        return DF(x.hi * s, x.lo * s)

    g1 = DF(gs.hi * s, gs.lo * s)
    return sc(v), sc(v00), sc(v10), sc(v11), DF(g1.hi * s, g1.lo * s)


def is_zero(x) -> "jnp.ndarray":
    """Exact-zero mask (hi + lo == 0) — used to reproduce the reference's
    division-by-zero NaN semantics in division-free condition forms."""
    return (x.hi + x.lo) == 0


def nan_like(x) -> "DF":
    return DF(jnp.full_like(x.hi, _c(np.nan)), jnp.zeros_like(x.lo))


def from_float(value) -> DF:
    return DF.of(value)


def to_f64(x):
    return x.to_f64() if isinstance(x, DF) else jnp.asarray(x, jnp.float64)


def _ipow(x: DF, n: int) -> DF:
    if n == 0:
        return DF.const(1.0) + (x * 0.0)  # broadcast ones
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
        return DF.const(1.0) / result
    return result


# ---------------------------------------------------------------------- #
# elementary functions                                                   #
# ---------------------------------------------------------------------- #


def sqrt(x) -> DF:
    """df sqrt via one Newton step from the f32 seed (quadratic: 24→48 bit).

    Divide-free: the correction uses rsqrt (0.5/s = 0.5·rsqrt) — the seed's
    ~1-ulp error is squared away by the Newton step."""
    x = DF.of(x)
    s = jnp.sqrt(x.hi)
    # guard s == 0 / nan domains
    s_safe = jnp.where(s > 0, s, _c(1.0))
    x_safe = jnp.where(s > 0, x.hi, _c(1.0))
    sd = DF(s_safe)
    diff = x + (-(sd.sq()))
    corr = (diff.hi + diff.lo) * (0.5 * jax.lax.rsqrt(x_safe))
    hi, lo = _quick_two_sum(s_safe, corr)
    out = DF(hi, lo)
    zero = x.hi == 0.0
    bad = x.hi < 0.0
    hi = jnp.where(zero, _c(0.0), jnp.where(bad, _c(np.nan), out.hi))
    lo = jnp.where(zero | bad, _c(0.0), out.lo)
    return DF(hi, lo)


def abs_(x) -> DF:  # noqa: A001
    x = DF.of(x)
    neg = (x.hi + x.lo) < 0
    return DF(jnp.where(neg, -x.hi, x.hi), jnp.where(neg, -x.lo, x.lo))


def where(cond, a, b) -> DF:
    a = DF.of(a)
    b = DF.of(b)
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def minimum(a, b) -> DF:
    a, b = DF.of(a), DF.of(b)
    return where(a._cmp_val() < b._cmp_val(), a, b)


def maximum(a, b) -> DF:
    a, b = DF.of(a), DF.of(b)
    return where(a._cmp_val() > b._cmp_val(), a, b)


_LN2 = 0.6931471805599453094172321214581766


def _pow2_f32(k):
    """Exact 2^k as f32 for integer-valued k in [-126, 127], via exponent-
    field bit construction (jnp.exp2 is polynomial-based and NOT exact).

    Clip bounds must be np.int32: weak Python ints become i64 operands under
    x64, and Mosaic's i64→i32 conversion recurses fatally."""
    ki = jnp.clip(k.astype(jnp.int32), np.int32(-126), np.int32(127))
    if jnp.ndim(ki) == 0:
        # Mosaic's tpu.bitcast is vector-only: scalar case (parameter-only
        # subexpressions) uses the exact power-of-two select-product instead
        ka = jnp.abs(ki)
        out = jnp.float32(1.0)
        for i in range(7):
            bit = ((ka >> np.int32(i)) & np.int32(1)) == 1
            out = out * jnp.where(bit, _c(2.0 ** (2**i)), _c(1.0))
        return jnp.where(ki < 0, 1.0 / out, out)
    bits = (ki + np.int32(127)) << np.int32(23)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


#: mantissa bits of √2 (1.41421356·2²³ fraction field) — the round(log2)
#: threshold: mantissa ≥ √2 rounds the exponent up
_SQRT2_MANT = np.int32(0x3504F3)


def _exp_round_f32(safe):
    """``round(log2(safe))`` for positive finite ``safe``, as f32.

    Vector case reads the IEEE exponent field and rounds up when the
    mantissa ≥ √2 — integer ops instead of Mosaic's polynomial log2
    (within 1 ulp of the threshold, which only shifts the ~[0.71, 1.42]
    reduction window negligibly).  Scalars (parameter-only subexpressions)
    keep the log2 path: tpu.bitcast is vector-only.  Subnormal inputs
    saturate the same way as the log2 path (the consumer's _pow2_f32 clips
    to 2^±126 either way)."""
    if jnp.ndim(safe) == 0:
        return jnp.round(jnp.log2(safe))
    bits = jax.lax.bitcast_convert_type(safe, jnp.int32)
    e0 = ((bits >> np.int32(23)) & np.int32(0xFF)) - np.int32(127)
    up = (bits & np.int32(0x007FFFFF)) >= _SQRT2_MANT
    e = e0 + jnp.where(up, np.int32(1), np.int32(0))
    return e.astype(jnp.float32)


_LOG2E_F = np.float32(1.4426950408889634)
_EXP_COEFFS = [1.0 / math.factorial(n) for n in range(13, 0, -1)]


def exp(x) -> DF:
    """df e^x: k·ln2 reduction + Taylor (13 terms, |r| ≤ ln2/2)."""
    x = DF.of(x)
    k = jnp.round(x.hi * _LOG2E_F)
    r = x + (-(DF.const(_LN2) * DF(k)))
    # the f32-computed k can misround for large |x|, leaving |r| > ln2/2 and
    # blowing the Taylor budget — one exact correction pass fixes it
    fix = jnp.round(r.hi * _LOG2E_F)
    k = k + fix
    r = r + (-(DF.const(_LN2) * DF(fix)))
    acc = DF(jnp.zeros_like(x.hi))
    for c in _EXP_COEFFS:
        acc = (acc + DF.const(c)) * r
    er = acc + 1.0
    # scale by 2^k: exact in f32 for |k| ≤ 126; saturate beyond (f32 range —
    # same envelope as TPU's emulated f64, docs/numerics.md §3)
    kc = jnp.clip(k, _c(-252.0), _c(254.0))
    k1 = jnp.floor(kc / 2.0)
    k2 = kc - k1
    s1 = _pow2_f32(k1)
    s2 = _pow2_f32(k2)
    hi = er.hi * s1 * s2
    lo = er.lo * s1 * s2
    big = x.hi > 88.8
    small = x.hi < -87.4
    hi = jnp.where(big, _c(np.inf), jnp.where(small, _c(0.0), hi))
    lo = jnp.where(big | small, _c(0.0), lo)
    return DF(hi, lo)


def log(x) -> DF:
    """df log via exponent extraction + atanh series."""
    x = DF.of(x)
    safe_hi = jnp.where(x.hi > 0, x.hi, _c(1.0))
    e = _exp_round_f32(safe_hi)
    scale = _pow2_f32(-e)  # exact power of two
    m = DF(x.hi * scale, x.lo * scale)  # m in ~[0.71, 1.42]
    t = (m - 1.0) / (m + 1.0)  # |t| ≤ 0.18
    t2 = t * t
    acc = DF(jnp.zeros_like(x.hi))
    for n in range(21, 0, -2):  # 1/21 ... 1/1, odd
        acc = acc * t2 + DF.const(1.0 / n)
    out = t * acc * 2.0 + DF.const(_LN2) * DF(e)
    bad = x.hi <= 0.0
    # NB: keep branch constants f32 — a nested where over two Python floats
    # would promote to f64 under x64 and poison the Mosaic kernel
    special = jnp.where(x.hi == 0.0, _c(-np.inf), _c(np.nan))
    hi = jnp.where(bad, special, out.hi)
    lo = jnp.where(bad, _c(0.0), out.lo)
    return DF(hi, lo)


def pow(x, y) -> DF:  # noqa: A001
    """General power via exp(y·log x) with C pow edge cases."""
    if isinstance(y, (int,)) or (isinstance(y, float) and y == int(y)):
        return _ipow(DF.of(x), int(y))
    x = DF.of(x)
    y = DF.of(y)
    out = exp(y * log(where(x.hi > 0, x, DF.const(1.0))))
    hi = jnp.where(x.hi > 0, out.hi, _c(np.nan))
    lo = jnp.where(x.hi > 0, out.lo, _c(0.0))
    yv = y._cmp_val()
    zero_case = jnp.where(
        yv > 0, _c(0.0), jnp.where(yv == 0, _c(1.0), _c(np.inf))
    )
    hi = jnp.where(x.hi == 0.0, zero_case, hi)
    lo = jnp.where(x.hi == 0.0, _c(0.0), lo)
    return DF(hi, lo)


_PI_2 = 1.5707963267948966192313216916397514
_SIN_COEFFS = [  # odd Taylor 1/(2n+1)!, n = 10..0
    (-1.0) ** n / math.factorial(2 * n + 1) for n in range(10, -1, -1)
]
_COS_COEFFS = [(-1.0) ** n / math.factorial(2 * n) for n in range(10, -1, -1)]


def _sincos_reduced(r: DF):
    r2 = r * r
    sa = DF(jnp.zeros_like(r.hi))
    for c in _SIN_COEFFS:
        sa = sa * r2 + DF.const(c)
    sinr = sa * r
    ca = DF(jnp.zeros_like(r.hi))
    for c in _COS_COEFFS:
        ca = ca * r2 + DF.const(c)
    return sinr, ca


def _reduce_pi2(x: DF):
    k = jnp.round(x.hi * np.float32(1.0 / _PI_2))
    r = x + (-(DF.const(_PI_2) * DF(k)))
    quad = k.astype(jnp.int32) & np.int32(3)
    return r, quad


def sin(x) -> DF:
    x = DF.of(x)
    r, quad = _reduce_pi2(x)
    s, c = _sincos_reduced(r)
    out = where(quad == 0, s, where(quad == 1, c, where(quad == 2, -s, -c)))
    return out


def cos(x) -> DF:
    x = DF.of(x)
    r, quad = _reduce_pi2(x)
    s, c = _sincos_reduced(r)
    out = where(quad == 0, c, where(quad == 1, -s, where(quad == 2, -c, s)))
    return out


def tan(x) -> DF:
    x = DF.of(x)
    r, quad = _reduce_pi2(x)
    s, c = _sincos_reduced(r)
    even = (quad == 0) | (quad == 2)
    return where(even, s / c, -(c / s))


_ATAN_TABLE = [math.atan(k / 16.0) for k in range(17)]


def atan(x) -> DF:
    """df arctan via table reduction: atan(t) = atan(c) + atan(u) with
    c = round(16t)/16 (exact in f32) and u = (t−c)/(1+tc), so |u| ≤ 1/32 and
    a 5-term odd series reaches ~2^-50 — no halving chain (each halving cost
    a df sqrt *and* a df divide; this form costs one divide total)."""
    x = DF.of(x)
    sign = jnp.sign(x.hi + x.lo)
    ax = abs_(x)
    big = ax.hi > 1.0
    # cap before the reciprocal: 1/inf in df arithmetic yields inf·0 = NaN,
    # and the Dekker split overflows above ~8e34 — cap at 1e30 (atan(1e30)
    # is π/2 to 30 digits, so the cap is invisible)
    ax = DF(
        jnp.minimum(ax.hi, _c(1.0e30)),
        jnp.where(ax.hi > _c(1.0e30), _c(0.0), ax.lo),
    )
    t = where(big, DF.const(1.0) / maximum(ax, DF.const(1.0)), minimum(ax, DF.const(1.0)))
    k = jnp.round(t.hi * _c(16.0))  # 0..16, exact small integers
    c_hi = k * _c(0.0625)  # exact: k/16 is a 5-bit value
    # table lookup of atan(k/16) as a select tree over the 17 entries
    ahj = jnp.full_like(t.hi, _c(_ATAN_TABLE[0]))
    alj = jnp.zeros_like(t.hi)
    for kk in range(1, 17):
        cst = DF.const(_ATAN_TABLE[kk])
        m = k == _c(float(kk))
        ahj = jnp.where(m, cst.hi, ahj)
        alj = jnp.where(m, cst.lo, alj)
    atan_c = DF(ahj, alj)
    tc = t * c_hi
    u = (t - c_hi) / (tc + 1.0)
    # odd series: tail terms (u^5/5 - u^7/7 + u^9/9) in plain f32 — they are
    # ≤ 2^-20 relative, so f32 rounding lands ~2^-44, inside the df envelope
    w = u.hi * u.hi
    tail = (w * _c(1.0 / 9.0) - _c(1.0 / 7.0)) * w + _c(1.0 / 5.0)
    u2 = u.sq()
    acc = (u2 * DF(tail * w)) + (u2 * DF.const(-1.0 / 3.0)) + 1.0
    reduced = atan_c + u * acc
    out = where(big, DF.const(_PI_2) - reduced, reduced)
    return DF(sign * out.hi, sign * out.lo)


def arctan2(y, x) -> DF:
    """Quadrant-corrected atan(y/x) with the C atan2 conventions
    (atan2(0, −1) = π, atan2(±y, 0) = ±π/2, atan2(0, 0) = 0)."""
    y, x = DF.of(y), DF.of(x)
    ys = y._cmp_val()
    xs = x._cmp_val()
    xsafe = where(xs == 0, DF.const(1.0), x)
    base = atan(y / xsafe)
    pi = DF.const(math.pi)
    out = where(xs < 0, base + where(ys < 0, -pi, pi), base)
    half = DF.const(_PI_2)
    out = where((xs == 0) & (ys > 0), half, out)
    out = where((xs == 0) & (ys < 0), -half, out)
    return where((xs == 0) & (ys == 0), DF.const(0.0), out)


def arcsin(x) -> DF:
    """asin(x) = atan2(x, √(1−x²)) — exact ±π/2 endpoints; NaN outside."""
    x = DF.of(x)
    inner = DF.const(1.0) - x * x
    out = arctan2(x, sqrt(inner))
    bad = jnp.abs(x._cmp_val()) > np.float32(1.0)
    return DF(jnp.where(bad, _c(np.nan), out.hi),
              jnp.where(bad, _c(0.0), out.lo))


def arcsinh(x) -> DF:
    """asinh(x) = sign(x)·log(|x| + √(x²+1)) (the sign trick keeps the
    log argument ≥ 1, away from the cancellation at x → −∞)."""
    x = DF.of(x)
    s = jnp.sign(x._cmp_val())
    ax = abs_(x)
    out = log(ax + sqrt(x * x + 1.0))
    return DF(s * out.hi, s * out.lo)


def arccosh(x) -> DF:
    """acosh(x) = log(x + √(x−1)·√(x+1)) (x ≥ 1; the factored roots keep
    accuracy near the endpoint)."""
    x = DF.of(x)
    return log(x + sqrt(x - 1.0) * sqrt(x + 1.0))


def arctanh(x) -> DF:
    """atanh(x) = ½·log((1+x)/(1−x)) (|x| < 1)."""
    x = DF.of(x)
    return log((DF.const(1.0) + x) / (DF.const(1.0) - x)) * 0.5


# ---------------------------------------------------------------------- #
# namespace adapter: run lowered sources on df32                         #
# ---------------------------------------------------------------------- #


class _LazyConstNamespace(types.SimpleNamespace):
    """Namespace whose ``pi``/``e``/``nan`` build a fresh DF constant at
    *access* time.  Eager DF attributes would be jnp arrays created outside
    any Pallas trace — captured constants, which ``pallas_call`` rejects
    ("You should pass them as inputs", seen with the D5 model whose lowered
    source references ``jax.numpy.pi``)."""

    _LAZY = {"pi": math.pi, "e": math.e, "nan": math.nan}

    def __getattr__(self, name):
        if name in self._LAZY:
            return DF.const(self._LAZY[name])
        raise AttributeError(name)


def _jnp_like() -> types.SimpleNamespace:
    """A jax.numpy lookalike over DF (only what lowered sources use)."""
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
        sign=lambda x: jnp.sign(DF.of(x)._cmp_val()),
        power=pow,
        greater=lambda a, b: DF.of(a) > DF.of(b),
        less=lambda a, b: DF.of(a) < DF.of(b),
        greater_equal=lambda a, b: DF.of(a) >= DF.of(b),
        less_equal=lambda a, b: DF.of(a) <= DF.of(b),
        logical_and=jnp.logical_and,
        logical_or=jnp.logical_or,
        logical_not=jnp.logical_not,
    )


def _select(condlist, choicelist, default=None):
    out = DF.of(default) if default is not None else DF.const(math.nan)
    for cond, choice in zip(reversed(condlist), reversed(choicelist)):
        if cond is True:
            out = DF.of(choice)
        else:
            out = where(cond, DF.of(choice), out)
    return out


def _amath_like() -> types.SimpleNamespace:
    # erf/erfc/gamma/lgamma live in df32_special (they share the Chebyshev/
    # series machinery); imported lazily — df32_special imports this module
    from . import df32_special as _ds  # noqa: PLC0415

    return types.SimpleNamespace(
        exp=exp,
        atan=atan,
        pow=pow,
        sinh=lambda x: (exp(x) - exp(-DF.of(x))) * 0.5,
        cosh=lambda x: (exp(x) + exp(-DF.of(x))) * 0.5,
        tanh=lambda x: (lambda e2: (e2 - 1.0) / (e2 + 1.0))(exp(DF.of(x) * 2.0)),
        acos=lambda x: atan(sqrt((DF.const(1.0) - DF.of(x)) / (DF.const(1.0) + DF.of(x)))) * 2.0,
        log2=lambda x: log(x) * (1.0 / _LN2),
        log10=lambda x: log(x) * (1.0 / math.log(10.0)),
        exp2=lambda x: exp(DF.of(x) * _LN2),
        erf=_ds.erf,
        erfc=_ds.erfc,
        gamma=_ds.gamma,
        lgamma=_ds.lgamma,
        polygamma=_ds.polygamma,
    )


class _DFSeq:
    """Wraps a sequence so integer indexing yields DF values."""

    def __init__(self, items):
        self._items = [DF.of(v) for v in items]

    def __getitem__(self, i):
        return self._items[i]


def compile_df32(lowered):
    """Compile a :class:`LoweredFunction`'s source against the df32
    namespace.  The returned callable takes the same (x[, xdot], args)
    positional sequences — entries may be f32/f64 arrays or DF — and returns
    DF (or a tuple of DF)."""
    from .df32_special import DF32Special  # noqa: PLC0415

    fake_jax = types.SimpleNamespace(numpy=_jnp_like())
    namespace = {
        "jax": fake_jax,
        "_amath": _amath_like(),
        "_special": DF32Special(),
    }
    exec(compile(lowered.source, f"<df32:{lowered.name}>", "exec"), namespace)
    inner = namespace[lowered.name]

    def run(*seqs):
        # deeply-nested generated expressions (EGNO/D5-class models) exceed
        # the default Python recursion limit under jax tracing
        import sys  # noqa: PLC0415

        limit = sys.getrecursionlimit()
        if limit < 100_000:
            sys.setrecursionlimit(100_000)
        try:
            return inner(*[_DFSeq(s) for s in seqs])
        finally:
            sys.setrecursionlimit(limit)

    return run


