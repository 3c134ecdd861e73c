"""Special functions for lowered model expressions.

Reference parity: the reference maps sympy special functions onto GSL calls in
generated C (compiler.py:123-212) — Bessel J/Y/I/K, spherical j/y, and the
hypergeometric family 2F0/2F1/1F1/0F1.  On TPU these must be evaluated by XLA;
where :mod:`jax.scipy.special` has an implementation we use it, the rest are
implemented here in dtype-generic ``jax.numpy`` (fp64 under ``jax_enable_x64``).

Implementation notes
--------------------
* ``hyp0f1`` / ``hyp1f1`` power series use a fixed iteration count under
  ``lax.fori_loop`` (XLA needs static trip counts); series converge for all
  finite arguments, and 64 terms give full fp64 precision for |z| ≲ 30 — the
  regime these functions occupy in inflation potentials.  Larger arguments
  fall back to asymptotic forms where implemented.
* ``hyp2f0`` is the (divergent) asymptotic series; like GSL we evaluate it as
  a truncated sum with term-minimum stopping — appropriate only for small |z|.
* Fractional-order Bessel functions use the 0F1 representation.
* Integer-order Y and K use the standard series with digamma terms for small
  arguments and Hankel asymptotic expansions for large arguments.

Accuracy is validated against scipy in ``tests/test_special.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy import special as jss

__all__ = [
    "hyp0f1",
    "hyp1f1",
    "hyp2f1",
    "hyp2f0",
    "besselj",
    "bessely",
    "besseli",
    "besselk",
    "sph_jn",
    "sph_yn",
]

_SERIES_ITERS = 96


def _dtype_of(*args):
    return jnp.result_type(*[jnp.asarray(a) for a in args], jnp.float32)


# --------------------------------------------------------------------------- #
# hypergeometric family                                                       #
# --------------------------------------------------------------------------- #


def hyp0f1(b, z):
    """Confluent hypergeometric limit function ₀F₁(; b; z).

    Power series Σ zⁿ / ((b)ₙ n!); converges for all z."""
    dtype = _dtype_of(b, z)
    b = jnp.asarray(b, dtype)
    z = jnp.asarray(z, dtype)
    shape = jnp.broadcast_shapes(jnp.shape(b), jnp.shape(z))
    b = jnp.broadcast_to(b, shape)
    z = jnp.broadcast_to(z, shape)

    def body(n, carry):
        term, acc = carry
        nf = n.astype(dtype)
        term = term * z / ((b + nf) * (nf + 1.0))
        return term, acc + term

    term0 = jnp.ones_like(z)
    _, acc = lax.fori_loop(0, _SERIES_ITERS, body, (term0, term0))
    return acc


def hyp1f1(a, b, z):
    """Kummer's confluent hypergeometric function ₁F₁(a; b; z)."""
    return jss.hyp1f1(a, b, z)


def hyp2f1(a, b, c, z):
    """Gauss hypergeometric function ₂F₁(a, b; c; z)."""
    return jss.hyp2f1(a, b, c, z)


def hyp2f0(a, b, z):
    """₂F₀(a, b; ; z): divergent asymptotic series, truncated at the smallest
    term (GSL's convention for gsl_sf_hyperg_2F0 with small |z|)."""
    dtype = _dtype_of(a, b, z)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    z = jnp.asarray(z, dtype)
    shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b), jnp.shape(z))
    a, b, z = (jnp.broadcast_to(v, shape) for v in (a, b, z))

    def body(n, carry):
        term, acc, best, growing = carry
        nf = n.astype(dtype)
        new_term = term * (a + nf) * (b + nf) * z / (nf + 1.0)
        # once terms start growing the series is diverging: freeze the sum
        now_growing = jnp.abs(new_term) > jnp.abs(term)
        growing = jnp.logical_or(growing, now_growing)
        acc = jnp.where(growing, acc, acc + new_term)
        return new_term, acc, best, growing

    term0 = jnp.ones_like(z)
    growing0 = jnp.zeros(shape, dtype=bool)
    _, acc, _, _ = lax.fori_loop(
        0, _SERIES_ITERS, body, (term0, term0, term0, growing0)
    )
    return acc


# --------------------------------------------------------------------------- #
# Bessel family                                                               #
# --------------------------------------------------------------------------- #


def _bessel_j_int(n: int, z):
    """Integer-order J_n via jax's miller-recurrence implementation."""
    n = int(n)
    sign = 1.0
    if n < 0:
        # J_{-n}(z) = (-1)^n J_n(z)
        sign = (-1.0) ** (-n)
        n = -n
    vals = jss.bessel_jn(z, v=n)  # shape (n+1, ...) orders 0..n
    return sign * vals[n]


def _bessel_frac(nu, z, modified: bool):
    """Fractional-order J_ν or I_ν via the 0F1 representation:
    J_ν(z) = (z/2)^ν/Γ(ν+1) ₀F₁(ν+1; −z²/4); I_ν flips the sign of the
    argument.  Valid for z ≥ 0 (the reference's GSL *nu functions share the
    same domain restriction)."""
    dtype = _dtype_of(nu, z)
    nu = jnp.asarray(nu, dtype)
    z = jnp.asarray(z, dtype)
    q = z * z / 4.0
    arg = q if modified else -q
    from . import accmath as _amath  # accurate exp (see accmath docs)

    pref = _amath.exp(nu * jnp.log(z / 2.0) - jss.gammaln(nu + 1.0))
    return pref * hyp0f1(nu + 1.0, arg)


def besselj(nu, z):
    """Bessel function of the first kind J_ν(z).

    Integer ν (Python int / integral sympy number): any real z.
    Fractional ν: requires z ≥ 0."""
    if _is_static_int(nu):
        return _bessel_j_int(int(nu), z)
    return _bessel_frac(nu, z, modified=False)


def besseli(nu, z):
    """Modified Bessel function of the first kind I_ν(z)."""
    if _is_static_int(nu):
        n = abs(int(nu))  # I_{-n} = I_n
        if n == 0:
            return jss.i0(z)
        if n == 1:
            return jss.i1(z)
        # upward recurrence is unstable; use the 0F1 form on |z| with the
        # parity symmetry I_n(-z) = (-1)^n I_n(z)
        sgn = jnp.where(jnp.asarray(z) < 0, (-1.0) ** n, 1.0)
        return sgn * _bessel_frac(float(n), jnp.abs(z), modified=True)
    return _bessel_frac(nu, z, modified=True)


def _euler_gamma(dtype):
    return jnp.asarray(0.57721566490153286060651209008240243, dtype)


def _bessel_y0y1_small(n: int, z):
    """Y₀/Y₁ power series for small z (A&S 9.1.13/9.1.16 expanded form)."""
    dtype = _dtype_of(z)
    z = jnp.asarray(z, dtype)
    q = z * z / 4.0
    logz2 = jnp.log(z / 2.0)
    egam = _euler_gamma(dtype)
    if n == 0:
        # Y0 = 2/π [ (ln(z/2)+γ) J0 + Σ_{k≥1} (-1)^{k+1} H_k (z²/4)^k /(k!)² ]
        def body(k, carry):
            term, acc, hk = carry
            kf = k.astype(dtype)
            term = term * (-q) / (kf * kf)
            hk = hk + 1.0 / kf
            return term, acc + (-term) * hk, hk

        term0 = jnp.ones_like(z)
        _, ser, _ = lax.fori_loop(
            1, 32, body, (term0, jnp.zeros_like(z), jnp.zeros_like(z))
        )
        j0 = jss.bessel_jn(z, v=0)[0]
        return (2.0 / jnp.pi) * ((logz2 + egam) * j0 + ser)
    # Y1 = 2/π [ (ln(z/2)+γ) J1 − 1/z − z/4 Σ_{k≥0} (−1)^k (H_k + H_{k+1}) q^k /(k!(k+1)!) ]
    def body1(k, carry):
        term, acc, hk, hk1 = carry
        kf = k.astype(dtype)
        term = term * (-q) / (kf * (kf + 1.0))
        hk = hk + 1.0 / kf
        hk1 = hk1 + 1.0 / (kf + 1.0)
        return term, acc + term * (hk + hk1), hk, hk1

    term0 = jnp.ones_like(z)
    acc0 = term0 * 1.0  # k = 0 term: H_0 + H_1 = 1
    _, ser, _, _ = lax.fori_loop(
        1, 32, body1, (term0, acc0, jnp.zeros_like(z), jnp.ones_like(z))
    )
    j1 = jss.bessel_jn(z, v=1)[1]
    return (2.0 / jnp.pi) * ((logz2 + egam) * j1 - 1.0 / z - (z / 4.0) * ser)


def _hankel_asymptotic(n: int, z, kind: str):
    """Large-argument asymptotics for J_n / Y_n (A&S 9.2.5-9.2.10)."""
    dtype = _dtype_of(z)
    z = jnp.asarray(z, dtype)
    mu = 4.0 * n * n
    zi = 1.0 / (8.0 * z)
    # P and Q asymptotic series, 5 terms each (sufficient for z > 12 in fp64)
    p = jnp.ones_like(z)
    q = (mu - 1.0) * zi
    term_p = jnp.ones_like(z)
    term_q = q
    for k in range(1, 5):
        term_p = (
            -term_p
            * (mu - (4 * k - 3) ** 2)
            * (mu - (4 * k - 1) ** 2)
            / ((2 * k - 1) * (2 * k))
            * zi
            * zi
        )
        p = p + term_p
        term_q = (
            -term_q
            * (mu - (4 * k - 1) ** 2)
            * (mu - (4 * k + 1) ** 2)
            / ((2 * k) * (2 * k + 1))
            * zi
            * zi
        )
        q = q + term_q
    chi = z - (0.5 * n + 0.25) * jnp.pi
    amp = jnp.sqrt(2.0 / (jnp.pi * z))
    if kind == "j":
        return amp * (p * jnp.cos(chi) - q * jnp.sin(chi))
    return amp * (p * jnp.sin(chi) + q * jnp.cos(chi))


def bessely(nu, z):
    """Bessel function of the second kind Y_ν(z), z > 0.

    Integer orders: series (small z) / Hankel asymptotics (large z) blended at
    z = 12, higher orders by forward recurrence (stable for Y).
    Fractional orders: Y_ν = (J_ν cos νπ − J_{−ν}) / sin νπ."""
    if _is_static_int(nu):
        n = int(nu)
        sign = 1.0
        if n < 0:
            sign = (-1.0) ** (-n)
            n = -n
        z = jnp.asarray(z)
        zs = jnp.where(z > 0, z, 1.0)  # guard: NaN outside domain, no overflow
        y0 = jnp.where(
            zs < 12.0, _bessel_y0y1_small(0, jnp.minimum(zs, 12.0)),
            _hankel_asymptotic(0, jnp.maximum(zs, 12.0), "y"),
        )
        if n == 0:
            out = y0
        else:
            y1 = jnp.where(
                zs < 12.0, _bessel_y0y1_small(1, jnp.minimum(zs, 12.0)),
                _hankel_asymptotic(1, jnp.maximum(zs, 12.0), "y"),
            )
            out = y1
            prev, cur = y0, y1
            for k in range(1, n):
                prev, cur = cur, (2.0 * k / zs) * cur - prev
                out = cur
        return sign * jnp.where(z > 0, out, jnp.nan)
    # fractional order: connection formula
    dtype = _dtype_of(nu, z)
    nu = jnp.asarray(nu, dtype)
    jp = _bessel_frac(nu, z, modified=False)
    jm = _bessel_frac(-nu, z, modified=False)
    return (jp * jnp.cos(jnp.pi * nu) - jm) / jnp.sin(jnp.pi * nu)


def besselk(nu, z):
    """Modified Bessel function of the second kind K_ν(z), z > 0.

    Fractional orders: K_ν = π(I_{−ν} − I_ν)/(2 sin νπ) for small z, Hankel
    asymptotics for large z.  Integer orders: K₀/K₁ power series (A&S 9.6.11)
    + stable upward recurrence K_{n+1} = K_{n−1} + (2n/z)K_n."""
    if _is_static_int(nu):
        n = abs(int(nu))  # K_{-ν} = K_ν
        z = jnp.asarray(z)
        zs = jnp.where(z > 0, z, 1.0)
        k0 = jnp.where(
            zs < 6.0,
            _besselk_int_small(0, jnp.minimum(zs, 6.0)),
            _besselk_asymptotic(0.0, jnp.maximum(zs, 6.0)),
        )
        if n == 0:
            out = k0
        else:
            k1 = jnp.where(
                zs < 6.0,
                _besselk_int_small(1, jnp.minimum(zs, 6.0)),
                _besselk_asymptotic(1.0, jnp.maximum(zs, 6.0)),
            )
            out = k1
            prev, cur = k0, k1
            for k in range(1, n):
                prev, cur = cur, prev + (2.0 * k / zs) * cur
                out = cur
        return jnp.where(z > 0, out, jnp.nan)
    return _besselk_frac(nu, z)


def _besselk_int_small(n: int, z):
    """K₀/K₁ power series for 0 < z ≲ 6 (A&S 9.6.11)."""
    dtype = _dtype_of(z)
    z = jnp.asarray(z, dtype)
    q = z * z / 4.0
    logz2 = jnp.log(z / 2.0)
    egam = _euler_gamma(dtype)
    if n == 0:
        # K0 = -(ln(z/2)+γ) I0 + Σ_{k≥1} H_k q^k/(k!)²
        def body(k, carry):
            term, acc, hk = carry
            kf = k.astype(dtype)
            term = term * q / (kf * kf)
            hk = hk + 1.0 / kf
            return term, acc + term * hk, hk

        term0 = jnp.ones_like(z)
        _, ser, _ = lax.fori_loop(
            1, 40, body, (term0, jnp.zeros_like(z), jnp.zeros_like(z))
        )
        return -(logz2 + egam) * jss.i0(z) + ser
    # K1 = 1/z + (ln(z/2)) I1 + (z/4) Σ_{k≥0} [2γ − H_k − H_{k+1} − 1... ]
    # use: K1 = 1/z + ln(z/2) I1 − (z/4) Σ_{k≥0} (ψ(k+1)+ψ(k+2)) q^k/(k!(k+1)!)
    # with ψ(m) = −γ + H_{m−1}
    def body1(k, carry):
        term, acc, hk, hk1 = carry
        kf = k.astype(dtype)
        term = term * q / (kf * (kf + 1.0))
        hk = hk + 1.0 / kf
        hk1 = hk1 + 1.0 / (kf + 1.0)
        psi_sum = -2.0 * egam + hk + hk1
        return term, acc + term * psi_sum, hk, hk1

    term0 = jnp.ones_like(z)
    acc0 = term0 * (-2.0 * egam + 1.0)  # k=0: ψ(1)+ψ(2) = −2γ + 1
    _, ser, _, _ = lax.fori_loop(
        1, 40, body1, (term0, acc0, jnp.zeros_like(z), jnp.ones_like(z))
    )
    return 1.0 / z + logz2 * jss.i1(z) - (z / 4.0) * ser


def _besselk_asymptotic(nu, z):
    """Hankel asymptotic expansion of K_ν for z ≳ 6 (A&S 9.7.2)."""
    from . import accmath as _amath

    dtype = _dtype_of(nu, z)
    z = jnp.asarray(z, dtype)
    mu = 4.0 * jnp.asarray(nu, dtype) ** 2
    term = jnp.ones_like(z)
    series = jnp.ones_like(z)
    for k in range(1, 9):
        term = term * (mu - (2 * k - 1) ** 2) / (k * 8.0 * z)
        series = series + term
    return jnp.sqrt(jnp.pi / (2.0 * z)) * _amath.exp(-z) * series


def _besselk_frac(nu, z):
    dtype = _dtype_of(nu, z)
    nu = jnp.asarray(nu, dtype)
    z = jnp.asarray(z, dtype)
    # small z: connection formula K = π(I_{-ν} − I_ν)/(2 sin νπ).  The I's
    # grow like e^z, so the difference cancels catastrophically for large z —
    # switch to the Hankel asymptotic expansion there (A&S 9.7.2)
    zs_small = jnp.minimum(z, 6.0)
    ip = _bessel_frac(-nu, zs_small, modified=True)
    im = _bessel_frac(nu, zs_small, modified=True)
    small = jnp.pi * (ip - im) / (2.0 * jnp.sin(jnp.pi * nu))

    big = _besselk_asymptotic(nu, jnp.maximum(z, 6.0))
    return jnp.where(z < 6.0, small, big)


# --------------------------------------------------------------------------- #
# spherical Bessel functions                                                  #
# --------------------------------------------------------------------------- #


def sph_jn(n, z):
    """Spherical Bessel function j_n(z) (closed forms + recurrence)."""
    n = int(n)
    z = jnp.asarray(z)
    zs = jnp.where(z == 0, 1.0, z)  # j_n(0) handled below
    j0 = jnp.sin(zs) / zs
    if n == 0:
        return jnp.where(z == 0, 1.0, j0)
    j1 = jnp.sin(zs) / (zs * zs) - jnp.cos(zs) / zs
    cur, prev = j1, j0
    for k in range(1, n):
        prev, cur = cur, (2.0 * k + 1.0) / zs * cur - prev
    return jnp.where(z == 0, 0.0, cur)


def sph_yn(n, z):
    """Spherical Bessel function y_n(z), z > 0 (closed forms + recurrence)."""
    n = int(n)
    z = jnp.asarray(z)
    zs = jnp.where(z == 0, 1.0, z)
    y0 = -jnp.cos(zs) / zs
    if n == 0:
        out = y0
    else:
        y1 = -jnp.cos(zs) / (zs * zs) - jnp.sin(zs) / zs
        cur, prev = y1, y0
        for k in range(1, n):
            prev, cur = cur, (2.0 * k + 1.0) / zs * cur - prev
        out = cur
    return jnp.where(z > 0, out, jnp.nan)


# --------------------------------------------------------------------------- #
# helpers                                                                     #
# --------------------------------------------------------------------------- #


def _is_static_int(nu) -> bool:
    """True if ``nu`` is a compile-time integral number (Python / numpy /
    sympy), enabling the integer-order dispatch the reference's GSL printer
    performs at codegen time (compiler.py:184-190)."""
    if isinstance(nu, (bool, jax.Array)):
        return False
    try:
        return float(nu) == int(nu)
    except (TypeError, ValueError):
        return False
