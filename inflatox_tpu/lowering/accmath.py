"""Accurate f64 elementary functions for XLA backends with weak libm.

Measured on both XLA:TPU (f64 emulated as an f32 double-word) and XLA:CPU,
several f64 transcendentals are only ~1e-8 accurate — ``exp``, ``arctan``,
non-integer ``pow``, ``sinh``/``cosh``/``tanh``, ``arccos``, and (on TPU,
for x ≈ 0.5–2.5 only) ``expm1`` — while the building blocks are good:
mul/add ≈ 1e-14, ``log``/``sqrt``/``sin``/``cos``/``tan``/``log1p``/
``arcsin``/``arctan2`` ≈ 1e-15.  A 1e-8 ``exp``
breaks the ≤1e-10 reference-parity budget (BASELINE.json) for any
exponential-family potential (EGNO, D5), so the lowering routes the weak
functions through the implementations here, built from the strong primitives:

* :func:`exp` — Cody-Waite range reduction (x = k·ln2 + r) + degree-15
  Taylor + exact ``ldexp`` scaling.  Accuracy ~|x|·1e-14 relative.
* :func:`atan` — three argument-halvings (x → x/(1+√(1+x²))) into |x| < 0.1,
  then a 9-term odd Taylor polynomial; reciprocal identity for |x| > 1.
* :func:`pow` — exp(y·log x) on the accurate exp (plus C pow edge cases for
  zero/negative bases).  Integer exponents never reach here — the lowering
  emits native integer powers.
* :func:`sinh`/:func:`cosh`/:func:`tanh` — from the accurate exp, with an
  odd Taylor series for small sinh arguments (never ``jnp.expm1``: see
  :func:`sinh`).
* :func:`acos` — 2·atan(√((1−x)/(1+x))), accurate through x → ±1.

When running under f32 (fast mode) these still work — they are dtype-generic
— they just cost a few extra ops; the scans' fp32 fast path bypasses them.
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

__all__ = ["exp", "atan", "pow", "sinh", "cosh", "tanh", "acos", "exp2",
           "log2", "log10", "erf", "erfc", "lgamma", "gamma", "polygamma"]

_LN2_HI = 6.93147180369123816490e-01  # 2^-28-split high part of ln 2
_LN2_LO = 1.90821492927058770002e-10
_LOG2E = 1.4426950408889634074

# Taylor coefficients 1/n! for e^r, r in [-ln2/2, ln2/2]
_EXP_COEFFS = [1.0 / float(math.factorial(n)) for n in range(15, 0, -1)]


def exp(x):
    """Accurate e^x (relative error ≲ |x|·1e-14 on weak-libm backends)."""
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.exp(x)
    k = jnp.round(x * _LOG2E)
    # r = x - k*ln2, with ln2 split so the products are exact-ish
    r = (x - k * _LN2_HI) - k * _LN2_LO
    # e^r by Horner — r is small so the series is benign
    acc = jnp.zeros_like(r)
    for c in _EXP_COEFFS:
        acc = (acc + c) * r
    er = 1.0 + acc
    # scale by 2^k exactly (ldexp/frexp are unsupported by TPU's X64
    # rewriting, so build 2^k by exact power-of-two products); split k in two
    # halves so neither factor overflows
    k = jnp.clip(k, -1072.0, 1024.0)
    k1 = jnp.floor(k / 2.0)
    k2 = k - k1
    out = er * _exp2_int(k1) * _exp2_int(k2)
    # restore IEEE edge behavior.  TPU's emulated-f64 multiply returns NaN
    # (not inf) when the product leaves its f32-limited dynamic range — map
    # such NaNs back to the honest saturation value
    overflowed = jnp.logical_and(jnp.isnan(out), jnp.logical_not(jnp.isnan(x)))
    out = jnp.where(overflowed, jnp.where(x > 0, jnp.inf, 0.0), out)
    out = jnp.where(x > 710.0, jnp.inf, out)
    out = jnp.where(x < -745.0, 0.0, out)
    return jnp.where(jnp.isnan(x), x, out)


def _exp2_int(k):
    """2^k for integer-valued float k, |k| ≤ 1100.

    Built from power-of-two factors no larger than 2^127: TPU's emulated f64
    carries only f32 *dynamic range* (≈3.4e38), so constants like 2^512 are
    not representable there — but every factor ≤ 2^127 is exact on both TPU
    and CPU, and products accumulate monotonically, so intermediates never
    overflow artificially (a TPU inf/0 result means the true value is outside
    the platform's representable range — the honest answer)."""
    ka = jnp.abs(k).astype(jnp.int32)
    low = ka % 127  # 7-bit part
    q = ka // 127  # number of 2^127 factors (≤ 9)
    out = jnp.ones_like(k)
    for i in range(7):  # bits 1..64 of the low part
        factor = float(2.0 ** (2**i))
        bit = ((low >> i) & 1) == 1
        out = out * jnp.where(bit, factor, 1.0)
    big = float(2.0**127)
    for step in range(1, 10):
        out = out * jnp.where(q >= step, big, 1.0)
    return jnp.where(k < 0, 1.0 / out, out)


# odd Taylor coefficients of atan: (-1)^n / (2n+1), n = 8..1
_ATAN_COEFFS = [((-1.0) ** n) / (2.0 * n + 1.0) for n in range(8, 0, -1)]


def atan(x):
    """Accurate arctan (≈1e-14; native f64 arctan is ~2e-8 on these
    backends).  Used for every dtype: the polynomial builds only on
    mul/add/div/sqrt, which also makes it lowerable by Pallas/Mosaic
    (which has no atan primitive)."""
    x = jnp.asarray(x)
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    big = ax > 1.0
    # reciprocal identity keeps the reduction argument ≤ 1
    base = jnp.where(big, 1.0 / jnp.maximum(ax, 1.0), jnp.minimum(ax, 1.0))
    # three halvings: t -> t / (1 + sqrt(1 + t²)); |t| ends below 0.099
    t = base
    for _ in range(3):
        t = t / (1.0 + jnp.sqrt(1.0 + t * t))
    t2 = t * t
    acc = jnp.zeros_like(t)
    for c in _ATAN_COEFFS:
        acc = (acc + c) * t2
    small_atan = t * (1.0 + acc)
    reduced = 8.0 * small_atan
    half_pi = jnp.asarray(np.pi / 2.0, x.dtype)
    out = jnp.where(big, half_pi - reduced, reduced)
    out = jnp.where(jnp.isinf(ax), half_pi, out)
    return jnp.where(jnp.isnan(x), x, sign * out)


def pow(x, y):  # noqa: A001 — matches libm naming on purpose
    """C pow() semantics for non-integer exponents via exp(y·log x).

    Negative bases → NaN (as C pow for non-integral y); 0^y → 0 for y>0,
    inf for y<0, 1 for y=0."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if jnp.result_type(x, y) != jnp.float64:
        return jnp.power(x, y)
    safe_x = jnp.where(x > 0.0, x, 1.0)
    out = exp(y * jnp.log(safe_x))
    out = jnp.where(x > 0.0, out, jnp.nan)
    out = jnp.where(
        x == 0.0,
        jnp.where(y > 0.0, 0.0, jnp.where(y == 0.0, 1.0, jnp.inf)),
        out,
    )
    return out


#: odd Taylor coefficients 1/(2n+1)! for sinh on |x| < 0.35 (truncation
#: ≤ ~2e-16 relative at the switch point)
_SINH_COEFFS = [1.0 / float(math.factorial(2 * n + 1)) for n in (5, 4, 3, 2, 1)]


def sinh(x):
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.sinh(x)
    # NOT built on jnp.expm1: TPU's emulated-f64 expm1 is only ~2e-8 for
    # x ≈ 0.5–2.5 (accurate outside that window, which is how the original
    # sparse probe missed it — measured round 3, this machine).  Odd Taylor
    # series below 0.35; (e^x − e^-x)/2 on the accurate exp above, where
    # the cancellation amplification coth(0.35) ≈ 2.9 keeps ~1e-15.
    small = jnp.abs(x) < 0.35
    x2 = jnp.where(small, x * x, 0.0)
    acc = jnp.zeros_like(x)
    for c in _SINH_COEFFS:
        acc = (acc + c) * x2
    small_val = x * (1.0 + acc)
    ex = exp(jnp.where(small, 1.0, x))
    large_val = 0.5 * (ex - 1.0 / ex)
    return jnp.where(small, small_val, large_val)


def cosh(x):
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.cosh(x)
    ex = exp(jnp.abs(x))
    return 0.5 * (ex + 1.0 / ex)


def tanh(x):
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.tanh(x)
    # sinh/cosh on the accurate exp (see sinh for why not jnp.expm1);
    # clamp so e^|2x| stays modest — tanh saturates at ±1 well before
    xc = jnp.clip(x, -20.0, 20.0)
    out = sinh(xc) / cosh(xc)
    return jnp.where(jnp.isnan(x), x, out)


def acos(x):
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.arccos(x)
    # 2·atan(sqrt((1-x)/(1+x))): stable at both endpoints
    ratio = jnp.where(x > -1.0, (1.0 - x) / (1.0 + jnp.where(x > -1.0, x, 0.0)), jnp.inf)
    out = 2.0 * atan(jnp.sqrt(jnp.maximum(ratio, 0.0)))
    out = jnp.where(x == -1.0, jnp.asarray(np.pi, x.dtype), out)
    return jnp.where(jnp.abs(x) > 1.0, jnp.nan, out)


def exp2(x):
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.exp2(x)
    return exp(x * float(np.log(2.0)))


def log2(x):
    return jnp.log(x) * _LOG2E


def log10(x):
    return jnp.log(x) * (1.0 / float(np.log(10.0)))


def erf(x):
    """XLA's erf measured strong on TPU emulated f64 (max rel 2.7e-14 over
    [-5.5, 5.5]) — passthrough, routed here so the printer has a single
    array-correct target (the sympy base printer emits scalar math.erf)."""
    import jax.scipy.special as jsp  # noqa: PLC0415

    return jsp.erf(x)


def erfc(x):
    """Measured max rel 3.5e-13 on TPU emulated f64 — passthrough."""
    import jax.scipy.special as jsp  # noqa: PLC0415

    return jsp.erfc(x)


def lgamma(x):
    """gammaln: measured max rel 3.1e-11 on TPU emulated f64 (x ≤ 30) —
    inside the ≤1e-10 parity budget; passthrough."""
    import jax.scipy.special as jsp  # noqa: PLC0415

    return jsp.gammaln(x)


def polygamma(n, x):
    """ψ⁽ⁿ⁾: measured on TPU emulated f64 — digamma max rel 5.5e-11,
    n = 1, 2 ≤ 2.3e-14 (x ≤ 25); passthrough.  Needed because gamma's
    field derivatives pull ψ/ψ' into the Hesse."""
    import jax.scipy.special as jsp  # noqa: PLC0415

    if n == 0:
        return jsp.digamma(x)
    return jsp.polygamma(n, x)


def gamma(x):
    """Γ(x) as sign·exp(gammaln): jax.scipy.special.gamma lowers through a
    gammasgn s64 signbit bitcast TPU's x64 rewriter rejects (CLAUDE.md), so
    the sign is rebuilt by floor parity — Γ is negative exactly on
    (−(2k+1), −2k).  Accuracy follows gammaln (~3e-11) through the
    accurate exp."""
    x = jnp.asarray(x)
    import jax.scipy.special as jsp  # noqa: PLC0415

    mag = exp(jsp.gammaln(x))
    neg = jnp.logical_and(x < 0.0, jnp.mod(jnp.floor(x), 2.0) != 0.0)
    return jnp.where(neg, -mag, mag)
