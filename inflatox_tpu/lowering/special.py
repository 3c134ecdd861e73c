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

import contextlib
import contextvars

import numpy as np

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
    "suppress_domain_warnings",
]

_SERIES_ITERS = 96


# --------------------------------------------------------------------------- #
# out-of-domain ergonomics (round 4, VERDICT r3 item 8)
#
# GSL raises through the installed error handler on a domain error
# (err.rs:83-103 registers rust_panic_handler); our functions return NaN
# instead, which the SCAN paths surface via the post-scan finite-fraction
# guard — but a *point-API* call (eager CompiledModel evaluation) used to
# fail silently.  ``_warn_once_out_of_domain`` restores the loud failure at
# the point surface: when evaluation is eager (not under jit — scans are
# always jitted and carry their own guard) and any input sits outside the
# documented envelope, emit ONE ``[Inflatox Warning]`` per function per
# process.
# --------------------------------------------------------------------------- #

_DOMAIN_WARNED: set = set()
_WARN_SUPPRESS: contextvars.ContextVar = contextvars.ContextVar(
    "special_domain_warn_suppress", default=False
)


@contextlib.contextmanager
def suppress_domain_warnings():
    """Silence the one-time out-of-domain warnings (used by the engine
    range probe, which evaluates out-of-envelope points on purpose)."""
    tok = _WARN_SUPPRESS.set(True)
    try:
        yield
    finally:
        _WARN_SUPPRESS.reset(tok)


def _warn_once_out_of_domain(name: str, bad, detail: str) -> None:
    if name in _DOMAIN_WARNED or _WARN_SUPPRESS.get():
        return
    if isinstance(bad, jax.core.Tracer):
        return  # jitted (scan) context: the finite-fraction guard reports
    try:
        hit = bool(jnp.any(bad))
    except Exception:
        return
    if hit:
        _DOMAIN_WARNED.add(name)
        from ..utils.logging import log_warn  # noqa: PLC0415

        log_warn(
            f"{name}: {detail} — returning NaN.  (The reference's GSL "
            "aborts through its error handler here, err.rs:83-103; this "
            "warning is emitted once per process.)"
        )


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


_HYP1F1_ZMAX = 300.0  # series term peak sits at n ≈ z; the static budget
# covers |z| ≤ ~300 at full precision — outside, return NaN (loud) rather
# than a silently truncated sum


def _hyp1f1_series(a, b, z, iters=420):
    dtype = _dtype_of(a, b, z)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    z = jnp.asarray(z, dtype)
    shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b), jnp.shape(z))
    a, b, z = (jnp.broadcast_to(v, shape) for v in (a, b, z))

    def body(n, carry):
        term, acc = carry
        nf = n.astype(dtype)
        term = term * (a + nf) * z / ((b + nf) * (nf + 1.0))
        return term, acc + term

    term0 = jnp.ones_like(z)
    _, acc = lax.fori_loop(0, iters, body, (term0, term0))
    return acc


def hyp1f1(a, b, z):
    """Kummer's confluent hypergeometric function ₁F₁(a; b; z).

    Own series (jax.scipy's hyp1f1 measured errors up to ~1e284 on this
    version for a=3.5, b=2.5, z<0 — certified in tests/test_special.py):
    direct power series for z ≥ 0 (all-positive terms for a, b > 0), and the
    Kummer transformation ₁F₁(a;b;z) = e^z ₁F₁(b−a; b; −z) for z < 0 so the
    series argument is always non-negative (no alternating-series
    cancellation)."""
    from . import accmath as _amath

    dtype = _dtype_of(a, b, z)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    z = jnp.asarray(z, dtype)
    zp = jnp.abs(z)
    direct = _hyp1f1_series(a, b, jnp.minimum(zp, _HYP1F1_ZMAX))
    kummer = _amath.exp(z) * _hyp1f1_series(b - a, b, jnp.minimum(zp, _HYP1F1_ZMAX))
    out = jnp.where(z >= 0, direct, kummer)
    bad = zp > _HYP1F1_ZMAX
    _warn_once_out_of_domain(
        "hyp1f1", bad,
        f"|z| > {_HYP1F1_ZMAX:g} exceeds the static series budget",
    )
    return jnp.where(bad, jnp.nan, out)


def hyp2f1(a, b, c, z):
    """Gauss hypergeometric function ₂F₁(a, b; c; z), |z| < 1.

    Plain power series with a 700-term static loop: terms decay like
    |z|^k·k^{a+b−c−1}, so even at |z| = 0.95 the truncation error is
    ≤ ~1e-13 (certified in tests/test_special.py; jax.scipy's hyp2f1
    measured ~6e-9 near |z| = 0.95).  Arguments with |z| ≥ 1 are outside
    the series' domain — like GSL's gsl_sf_hyperg_2F1, callers must map
    them in via the standard transformations."""
    dtype = _dtype_of(a, b, c, z)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    c = jnp.asarray(c, dtype)
    z = jnp.asarray(z, dtype)
    shape = jnp.broadcast_shapes(*(jnp.shape(v) for v in (a, b, c, z)))
    a, b, c, z = (jnp.broadcast_to(v, shape) for v in (a, b, c, z))

    def body(n, carry):
        term, acc = carry
        nf = n.astype(dtype)
        term = term * (a + nf) * (b + nf) * z / ((c + nf) * (nf + 1.0))
        return term, acc + term

    term0 = jnp.ones_like(z)
    _, acc = lax.fori_loop(0, 700, body, (term0, term0))
    bad = jnp.abs(z) >= 1.0
    _warn_once_out_of_domain(
        "hyp2f1", bad,
        "|z| >= 1 is outside the series' convergence domain (map the "
        "argument in via the standard transformations, like GSL's "
        "gsl_sf_hyperg_2F1 callers must)",
    )
    return jnp.where(bad, jnp.nan, acc)


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

    # gammaln is ln|Γ|: Γ(ν+1) < 0 for some negative ν (e.g. ν = −1.75) —
    # restore the sign (round-2 fix: the K_ν connection formula was wrong
    # for ν with Γ(ν+1) < 0).  Computed from floor parity rather than
    # jss.gammasgn: that one lowers through an s64 signbit bitcast that
    # TPU's x64 rewriter rejects (round-3 hardware finding) — Γ(x) is
    # positive for x > 0 and alternates sign per unit interval below zero
    # (negative on (−1,0), positive on (−2,−1), ...).
    x1 = nu + 1.0
    sgn = jnp.where(
        x1 > 0,
        1.0,
        jnp.where(jnp.floor(x1) % 2.0 == 0.0, 1.0, -1.0),
    )
    pref = sgn * _amath.exp(
        nu * jnp.log(z / 2.0) - jss.gammaln(nu + 1.0)
    )
    return pref * hyp0f1(nu + 1.0, arg)


# --------------------------------------------------------------------------- #
# Fractional-order J/Y: Steed's method (CF1 + complex CF2) with Temme's
# series for small arguments — the standard full-accuracy algorithm
# (Numerical Recipes bessjy / Barnett).  Replaces the round-1 0F1-connection
# route whose alternating series lost digits beyond z ≈ 10.  Validated
# ≤1e-12 (amplitude-floored) vs 40-digit mpmath for ν ∈ [0.1, 4.6],
# z ∈ [0.05, 40] (tests/test_special.py).  Orders are capped at ν < 30
# (larger orders should be integers, which take the Chebyshev paths).
# --------------------------------------------------------------------------- #

_TEMME_G1 = np.array([
    -0.5710113401855841, -1.97551434264295e-17, 0.00651651126707368,
    -1.9461688077422866e-17, 0.0003087090173085056, -1.9637573943002206e-17,
    -3.4706269649151143e-06, -1.39082417974295e-17, 6.943766421246031e-09,
    -1.621927686259548e-17, 3.677951441937119e-11, -1.1051165107663382e-17,
    -1.356340297563193e-13, -7.138982946540495e-18, -3.5327647554267563e-17
])
_TEMME_G2 = np.array([
    0.921870293650453, 3.523462454814079e-17, -0.0768528408447866,
    5.2912295582844394e-17, 0.0012719271366546513, 5.4734676185828735e-17,
    -4.9717367041385e-06, 2.377817426824363e-17, -3.312611969802513e-08,
    9.312654661450359e-17, 2.4230963292765556e-10, 2.9257568727534474e-17,
    -1.701486781673822e-13, 4.44840869628458e-17, -1.4628228722797227e-15
])


_STEED_ITERS = 100
_STEED_MAX_NL = 30
_STEED_XMIN = 2.0


def _bessjy_steed(nu, x):
    """(J_ν(x), Y_ν(x)) for real ν ≥ 0, x > 0, elementwise."""
    dtype = _dtype_of(nu, x)
    nu = jnp.asarray(nu, dtype)
    x = jnp.asarray(x, dtype)
    shape = jnp.broadcast_shapes(jnp.shape(nu), jnp.shape(x))
    nu = jnp.broadcast_to(nu, shape)
    xs = jnp.broadcast_to(jnp.where(x > 0, x, 1.0), shape)

    nl = jnp.where(
        xs < _STEED_XMIN,
        jnp.floor(nu + 0.5),
        jnp.maximum(0.0, jnp.floor(nu - xs + 1.5)),
    )
    nl = jnp.clip(nl, 0.0, float(_STEED_MAX_NL))
    xmu = nu - nl
    xmu2 = xmu * xmu
    xi = 1.0 / xs
    xi2 = 2.0 * xi
    w = xi2 / jnp.pi

    # ---- CF1: h = J'_ν/J_ν, sign of J_ν tracked in isign --------------- #
    tiny = 1e-30
    h0 = jnp.maximum(nu * xi, tiny)

    def cf1_body(i, carry):
        b, c, d, h, isign, done = carry
        fi = i.astype(dtype)
        b2 = b + xi2
        d2 = b2 - d
        d2 = jnp.where(jnp.abs(d2) < tiny, tiny, d2)
        c2 = b2 - 1.0 / c
        c2 = jnp.where(jnp.abs(c2) < tiny, tiny, c2)
        d2 = 1.0 / d2
        dl = c2 * d2
        h2 = h * dl
        flip = d2 < 0
        isign2 = jnp.where(flip & ~done, -isign, isign)
        conv = jnp.abs(dl - 1.0) < 1e-16
        keep = done
        return (
            jnp.where(keep, b, b2), jnp.where(keep, c, c2),
            jnp.where(keep, d, d2), jnp.where(keep, h, h2),
            isign2, done | conv,
        )

    b0 = xi2 * nu
    init = (b0, h0, jnp.zeros(shape, dtype), h0,
            jnp.ones(shape, dtype), jnp.zeros(shape, bool))
    _, _, _, h, isign, _ = lax.fori_loop(1, _STEED_ITERS, cf1_body, init)

    # ---- downward recurrence nl steps (masked fixed-trip) --------------- #
    rjl = isign * tiny
    rjpl = h * rjl
    rjl1 = rjl
    fact = nu * xi

    def down_body(i, carry):
        rjl, rjpl, fact = carry
        step = i.astype(dtype) < nl
        rjtemp = fact * rjl + rjpl
        fact2 = fact - xi
        rjpl2 = fact2 * rjtemp - rjl
        return (
            jnp.where(step, rjtemp, rjl),
            jnp.where(step, rjpl2, rjpl),
            jnp.where(step, fact2, fact),
        )

    rjl, rjpl, _ = lax.fori_loop(0, _STEED_MAX_NL, down_body,
                                 (rjl, rjpl, fact))
    rjl = jnp.where(rjl == 0.0, tiny, rjl)
    f = rjpl / rjl

    # ---- small-x: Temme's series ---------------------------------------- #
    xc = jnp.minimum(xs, _STEED_XMIN)
    x2 = 0.5 * xc
    pimu = jnp.pi * xmu
    fact_t = jnp.where(jnp.abs(pimu) < 1e-15, 1.0, pimu / jnp.sin(pimu))
    dd = -jnp.log(x2)
    e = xmu * dd
    fact2_t = jnp.where(jnp.abs(e) < 1e-15, 1.0, jnp.sinh(e) / e)
    tg = 2.0 * xmu  # Chebyshev argument for the ±½ window
    gam1 = _cheb_eval(_TEMME_G1, tg)
    gam2 = _cheb_eval(_TEMME_G2, tg)
    ff = 2.0 / jnp.pi * fact_t * (gam1 * jnp.cosh(e) + gam2 * fact2_t * dd)
    ee = jnp.exp(e)
    gampl = gam2 - xmu * gam1
    gammi = gam2 + xmu * gam1
    pt = ee / (gampl * jnp.pi)
    qt = 1.0 / (ee * jnp.pi * gammi)
    pimu2 = 0.5 * pimu
    fact3 = jnp.where(jnp.abs(pimu2) < 1e-15, 1.0, jnp.sin(pimu2) / pimu2)
    rr = jnp.pi * pimu2 * fact3 * fact3
    dd2 = -x2 * x2

    def temme_body(i, carry):
        ff, cc, pt, qt, ssum, ssum1, done = carry
        fi = i.astype(dtype)
        ff2 = (fi * ff + pt + qt) / (fi * fi - xmu2)
        cc2 = cc * dd2 / fi
        pt2 = pt / (fi - xmu)
        qt2 = qt / (fi + xmu)
        dl = cc2 * (ff2 + rr * qt2)
        ssum2 = ssum + dl
        dl1 = cc2 * pt2 - fi * dl
        ssum12 = ssum1 + dl1
        conv = jnp.abs(dl) < (1.0 + jnp.abs(ssum2)) * 1e-17
        keep = done
        return (
            jnp.where(keep, ff, ff2), jnp.where(keep, cc, cc2),
            jnp.where(keep, pt, pt2), jnp.where(keep, qt, qt2),
            jnp.where(keep, ssum, ssum2), jnp.where(keep, ssum1, ssum12),
            done | conv,
        )

    init_t = (ff, jnp.ones(shape, dtype), pt, qt, ff + rr * qt, pt,
              jnp.zeros(shape, bool))
    _, _, _, _, ssum, ssum1, _ = lax.fori_loop(
        1, _STEED_ITERS, temme_body, init_t
    )
    rymu_s = -ssum
    ry1_s = -ssum1 * (2.0 / xc)
    rymup_s = xmu / xc * rymu_s - ry1_s
    w_small = 2.0 / (jnp.pi * xc)
    rjmu_s = w_small / (rymup_s - f * rymu_s)

    # ---- large-x: complex CF2 ------------------------------------------- #
    xb = jnp.maximum(xs, _STEED_XMIN)
    xib = 1.0 / xb
    a0 = 0.25 - xmu2
    pc = -0.5 * xib
    qc = jnp.ones(shape, dtype)
    br = 2.0 * xb
    bi = jnp.full(shape, 2.0, dtype)
    fact_c = a0 * xib / (pc * pc + qc * qc)
    cr = br + qc * fact_c
    ci = bi + pc * fact_c
    den0 = br * br + bi * bi
    dr = br / den0
    di = -bi / den0
    dlr = cr * dr - ci * di
    dli = cr * di + ci * dr
    temp = pc * dlr - qc * dli
    qc = pc * dli + qc * dlr
    pc = temp

    def cf2_body(i, carry):
        a, br, bi, cr, ci, dr, di, pc, qc, done = carry
        fi = i.astype(dtype)
        a2 = a + 2.0 * (fi - 1.0)
        bi2 = bi + 2.0
        dr2 = a2 * dr + br
        di2 = a2 * di + bi2
        small = (jnp.abs(dr2) + jnp.abs(di2)) < tiny
        dr2 = jnp.where(small, tiny, dr2)
        fact = a2 / (cr * cr + ci * ci)
        cr2 = br + cr * fact
        ci2 = bi2 - ci * fact
        smallc = (jnp.abs(cr2) + jnp.abs(ci2)) < tiny
        cr2 = jnp.where(smallc, tiny, cr2)
        den = dr2 * dr2 + di2 * di2
        dr3 = dr2 / den
        di3 = -di2 / den
        dlr = cr2 * dr3 - ci2 * di3
        dli = cr2 * di3 + ci2 * dr3
        temp = pc * dlr - qc * dli
        qc2 = pc * dli + qc * dlr
        pc2 = temp
        conv = (jnp.abs(dlr - 1.0) + jnp.abs(dli)) < 1e-16
        keep = done
        return (
            jnp.where(keep, a, a2), br, jnp.where(keep, bi, bi2),
            jnp.where(keep, cr, cr2), jnp.where(keep, ci, ci2),
            jnp.where(keep, dr, dr3), jnp.where(keep, di, di3),
            jnp.where(keep, pc, pc2), jnp.where(keep, qc, qc2),
            done | conv,
        )

    init_c = (a0, br, bi, cr, ci, dr, di, pc, qc, jnp.zeros(shape, bool))
    _, _, _, _, _, _, _, pc, qc, _ = lax.fori_loop(
        2, _STEED_ITERS, cf2_body, init_c
    )
    gam = (pc - f) / qc
    w_big = 2.0 / (jnp.pi * xb)
    rjmu_b = jnp.sqrt(jnp.abs(w_big / ((pc - f) * gam + qc)))
    rjmu_b = jnp.where(rjl >= 0, rjmu_b, -rjmu_b)
    rymu_b = rjmu_b * gam
    rymup_b = rymu_b * (pc + qc / gam)
    ry1_b = xmu * xib * rymu_b - rymup_b

    small_mask = xs < _STEED_XMIN
    rjmu = jnp.where(small_mask, rjmu_s, rjmu_b)
    rymu = jnp.where(small_mask, rymu_s, rymu_b)
    ry1 = jnp.where(small_mask, ry1_s, ry1_b)

    rj = rjl1 * (rjmu / rjl)

    def up_body(i, carry):
        rymu, ry1 = carry
        step = i.astype(dtype) < nl
        rytemp = (xmu + i.astype(dtype) + 1.0) * xi2 * ry1 - rymu
        return (jnp.where(step, ry1, rymu), jnp.where(step, rytemp, ry1))

    rymu, ry1 = lax.fori_loop(0, _STEED_MAX_NL, up_body, (rymu, ry1))
    ry = rymu
    bad = x <= 0
    return jnp.where(bad, jnp.nan, rj), jnp.where(bad, jnp.nan, ry)



_STEED_ZMAX = 40.0  # beyond this the CF1 iteration budget starts to bind;
# the Hankel asymptotic P/Q series (term-minimum stopped) is ≤1e-20 there


def _jy_asymptotic(nu, z, kind):
    """J_ν/Y_ν for large z via the Hankel modulus/phase expansion
    (A&S 9.2.5-9.2.10) with adaptive term-minimum stopping — used for
    z > _STEED_ZMAX where it is fully converged (first omitted term
    ≤1e-13 for ν ≤ 30 at z = 80, shrinking rapidly with z)."""
    dtype = _dtype_of(nu, z)
    nu = jnp.asarray(nu, dtype)
    z = jnp.asarray(z, dtype)
    mu = 4.0 * nu * nu
    zi = 1.0 / (8.0 * z)
    p = jnp.ones_like(z)
    q = (mu - 1.0) * zi
    term_p = jnp.ones_like(z)
    term_q = q
    stop_p = jnp.zeros(jnp.shape(z), bool)
    stop_q = jnp.zeros(jnp.shape(z), bool)
    for k in range(1, 16):
        new_p = (
            -term_p
            * (mu - (4 * k - 3) ** 2)
            * (mu - (4 * k - 1) ** 2)
            / ((2 * k - 1) * (2 * k))
            * zi * zi
        )
        stop_p = jnp.logical_or(stop_p, jnp.abs(new_p) >= jnp.abs(term_p))
        p = jnp.where(stop_p, p, p + new_p)
        term_p = new_p
        new_q = (
            -term_q
            * (mu - (4 * k - 1) ** 2)
            * (mu - (4 * k + 1) ** 2)
            / ((2 * k) * (2 * k + 1))
            * zi * zi
        )
        stop_q = jnp.logical_or(stop_q, jnp.abs(new_q) >= jnp.abs(term_q))
        q = jnp.where(stop_q, q, q + new_q)
        term_q = new_q
    chi = z - (0.5 * nu + 0.25) * jnp.pi
    amp = jnp.sqrt(2.0 / (jnp.pi * z))
    if kind == "j":
        return amp * (p * jnp.cos(chi) - q * jnp.sin(chi))
    return amp * (p * jnp.sin(chi) + q * jnp.cos(chi))


def _sincospi(r):
    """(sin πr, cos πr) with exact values at half-integer r (a naive
    jnp.cos(jnp.pi * r) gives ~1e-16 instead of 0 there, which the
    negative-order reflection formulas amplify through huge Y values)."""
    dtype = _dtype_of(r)
    r = jnp.asarray(r, dtype)
    q = jnp.round(2.0 * r) * 0.5  # nearest half-integer
    u = (r - q) * jnp.pi  # |u| ≤ π/4
    su, cu = jnp.sin(u), jnp.cos(u)
    # sin/cos at the half-integer anchor are exactly 0/±1
    k = jnp.round(2.0 * q).astype(jnp.int32) & 3  # 2q mod 4
    sq = jnp.where(k == 0, 0.0, jnp.where(k == 1, 1.0,
                   jnp.where(k == 2, 0.0, -1.0)))
    cq = jnp.where(k == 0, 1.0, jnp.where(k == 1, 0.0,
                   jnp.where(k == 2, -1.0, 0.0)))
    return sq * cu + cq * su, cq * cu - sq * su



def _bessjy_frac(nu, z):
    """(J_ν, Y_ν) for real ν (any sign, |ν| ≤ 30.5), x > 0: Steed for
    x ≤ _STEED_ZMAX, Hankel asymptotics beyond, negative orders by the
    reflection formulas J_{−ν} = J_ν cos νπ − Y_ν sin νπ,
    Y_{−ν} = J_ν sin νπ + Y_ν cos νπ.

    Round 5: beyond _STEED_ZMAX, orders > 8 use REDUCED-order asymptotics
    (|μ| ≤ ½) plus masked upward recurrence — the full-order Hankel
    expansion needs z ≫ ν²/8 and silently degraded for 8 < ν ≤ 30 at
    moderate z (upward is stable there: z > 40 > ν).  Orders beyond the
    Steed clip (|ν| > 30.5) would be silently wrong and are NaN-poisoned
    loudly instead."""
    dtype = _dtype_of(nu, z)
    nu = jnp.asarray(nu, dtype)
    z = jnp.asarray(z, dtype)
    anu = jnp.abs(nu)
    js, ys = _bessjy_steed(anu, jnp.minimum(z, _STEED_ZMAX))
    zb = jnp.maximum(z, _STEED_ZMAX)
    ja = _jy_asymptotic(anu, zb, "j")
    ya = _jy_asymptotic(anu, zb, "y")
    nl = jnp.floor(anu + 0.5)
    mu = anu - nl  # in [−½, ½]
    jmu = _jy_asymptotic(mu, zb, "j")
    jmu1 = _jy_asymptotic(mu + 1.0, zb, "j")
    ymu = _jy_asymptotic(mu, zb, "y")
    ymu1 = _jy_asymptotic(mu + 1.0, zb, "y")
    xi2 = 2.0 / zb

    def up_body(i, carry):
        jk, jk1, yk, yk1 = carry
        fi = i.astype(dtype)
        step = fi < nl
        fac = (mu + fi + 1.0) * xi2
        jn = fac * jk1 - jk
        yn = fac * yk1 - yk
        return (jnp.where(step, jk1, jk), jnp.where(step, jn, jk1),
                jnp.where(step, yk1, yk), jnp.where(step, yn, yk1))

    jred, _, yred, _ = lax.fori_loop(0, _STEED_MAX_NL, up_body,
                                     (jmu, jmu1, ymu, ymu1))
    hi_order = anu > 8.0
    ja = jnp.where(hi_order, jred, ja)
    ya = jnp.where(hi_order, yred, ya)
    big = z > _STEED_ZMAX
    j = jnp.where(big, ja, js)
    y = jnp.where(big, ya, ys)
    sn, c = _sincospi(anu)
    j_neg = j * c - y * sn
    y_neg = j * sn + y * c
    neg = nu < 0
    j = jnp.where(neg, j_neg, j)
    y = jnp.where(neg, y_neg, y)
    bad_nu = anu > float(_STEED_MAX_NL) + 0.5
    _warn_once_out_of_domain(
        "fractional Bessel order", bad_nu,
        "J_ν/Y_ν fractional orders are supported for |ν| ≤ 30.5 (the Steed "
        "order-reduction budget); larger fractional orders have no "
        "full-accuracy path on any engine here",
    )
    return (jnp.where(bad_nu, jnp.nan, j),
            jnp.where(bad_nu, jnp.nan, y))



def besselj(nu, z):
    """Bessel function of the first kind J_ν(z).

    Integer ν (Python int / integral sympy number): any real z.
    Fractional ν: requires z ≥ 0."""
    if _is_static_int(nu):
        return _bessel_j_int(int(nu), z)
    return _bessjy_frac(nu, z)[0]


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


# --------------------------------------------------------------------------- #
# Chebyshev tables for the Bessel Y/K mid/large-z ranges (SLATEC approach).
#
# Round 1 blended log-series against Hankel asymptotics at a seam (z = 12 for
# Y, z = 6 for K); measured accuracy collapsed to ~1e-5..1e-6 there (ADVICE.md
# round 1): the K log-series cancels like e^z beyond z ~ 6 and the Hankel
# series bottoms out at ~1e-6 near the seam — no seam position fixes the pair.
# These tables fit SMOOTH scaled functions instead (coefficients generated to
# 40 digits by scripts/gen_cheb.py with mpmath; fit residual <= 4e-15):
#
#   K_n(z) = cheb(u)·e^{-z}/sqrt(z),   u = 1/z     (ranges [1.5,8] / [8,inf))
#   Y_n(z) = sqrt(2/(pi z))·(P_n sin chi + Q_n cos chi),  chi = z-(n/2+1/4)pi,
#            P_n = cheb_P(v), Q_n = cheb_Q(v)/(8z),  v = (8/z)^2,  z >= 4.5
# --------------------------------------------------------------------------- #

_K0_MID = np.array([
    1.2028286465790197, -0.030591787719553676, 0.0014210722375637287,
    -0.00010388158100365775, 9.762067788423225e-06, -1.082086296879005e-06,
    1.351201646484709e-07, -1.8482595638611766e-08, 2.7186252388337763e-09,
    -4.2445766658763436e-10, 6.967483660813012e-11, -1.1937916743473208e-11,
    2.122964169369167e-12, -3.900234424279417e-13, 7.379256178071285e-14,
    -1.4358723953495275e-14, 2.906948152039217e-15, -5.661300575341757e-16,
    1.4790247649295895e-16, -3.7292984407056944e-17, 4.079690562390755e-17,
    -3.755188669435943e-17, 5.87983431477737e-17
])
_K0_BIG = np.array([
    1.243990650868462, -0.009174852691025803, 0.0001444550931774185,
    -4.013614175529894e-06, 1.5678318100587383e-07, -7.770110513915755e-09,
    4.6111815781408603e-10, -3.158599198997939e-11, 2.4349281259007275e-12,
    -2.0746853963234516e-13, 1.9171836557903002e-14, -2.0445114343506195e-15,
    1.5179938710645071e-16, -6.182631040969e-17, -4.816035433020208e-17,
    -1.0835900161805395e-17, -3.281931876688869e-17, -1.2518526181642369e-17,
    -1.3017455987150712e-17
])
_K1_MID = np.array([
    1.4189885893618182, 0.10612301366130722, -0.002702099638238477,
    0.0001642748476195546, -1.4066859038775309e-05, 1.4728630269748668e-06,
    -1.7689408145186164e-07, 2.3517081640480202e-08, -3.3843113374756892e-09,
    5.192772802632103e-10, -8.403627294281494e-11, 1.422843705030357e-11,
    -2.505033636540474e-12, 4.561081594257689e-13, -8.583800390419009e-14,
    1.6395736411563473e-14, -3.560270024145593e-15, 6.186397753261234e-16,
    -3.2426039306575127e-16, -4.652819950330459e-17, -1.6261072401069936e-16,
    -2.6902548683153138e-17, -2.0969558484027402e-16
])
_K1_BIG = np.array([
    1.2818965417186945, 0.028328878130496924, -0.0002475370673908294,
    5.771972451393736e-06, -2.0689392218267664e-07, 9.7399832458936e-09,
    -5.585338401432265e-10, 3.732975526333097e-11, -2.8252565097005837e-12,
    2.3701095737069585e-13, -2.1914146235882745e-14, 1.9954495011791e-15,
    -3.436372385782436e-16, -8.202562152366134e-17, -9.82720080779848e-17,
    -6.961783446547556e-17, -4.983764228948445e-17, -3.7631602816937714e-17,
    -3.798734762107494e-17
])
_P0_CHEB = np.array([
    0.9983508529003942, -0.001622326525375695, 2.5659898108143426e-05,
    -1.074733530416572e-06, 7.695166556043232e-08, -7.791256341956166e-09,
    1.0076739103231815e-09, -1.5658349022456687e-10, 2.8088380309445716e-11,
    -5.658276572807053e-12, 1.2545846649486519e-12, -3.018157851826075e-13,
    7.770335308276474e-14, -2.1400656843957792e-14, 6.0866911665685924e-15,
    -1.9175618638796704e-15, 5.223191128158126e-16, -2.582061101890892e-16,
    3.812008134199594e-18, -7.203990078083427e-17, -4.557691178921068e-17,
    -7.223706440208404e-17, -2.4180592802364897e-17, -3.5987873804036357e-17,
    -2.354118526106635e-17, -3.087215181110812e-18, 3.0030154289718896e-19
])
_Q0_CHEB = np.array([
    -0.9868477858880368, 0.012759549508489528, -0.0003688766783741065,
    2.158470606690122e-05, -1.9316120103761817e-06, 2.304153571648965e-07,
    -3.3875070735292195e-08, 5.843684649743781e-09, -1.1445219177974879e-09,
    2.4865775839813145e-10, -5.891333657551081e-11, 1.5026430945397446e-11,
    -4.084478611649733e-12, 1.1740431677796777e-12, -3.543196004136144e-13,
    1.1190546422688331e-13, -3.6596652104615294e-14, 1.2563723156020945e-14,
    -4.314441346685688e-15, 1.6441712130040167e-15, -5.2741677897999485e-16,
    2.921798175429053e-16, -3.892383191730539e-17, 6.579633017216143e-17,
    2.2880739233840472e-17, 2.3189038055029087e-18, 1.2657498054430783e-17
])
_P1_CHEB = np.array([
    1.0027803045717265, 0.0027451765837570277, -3.37240456836456e-05,
    1.3039465877996387e-06, -8.977362126121733e-08, 8.879041215404142e-09,
    -1.1304764437260006e-09, 1.7368451938885874e-10, -3.088836293566369e-11,
    6.179620070343051e-12, -1.3628285303321794e-12, 3.260649624431963e-13,
    -8.390493153679579e-14, 2.2715949868341296e-14, -6.649476182587768e-15,
    1.905978001484501e-15, -6.998943698090866e-16, 1.1415812995042947e-16,
    -1.394877549346043e-16, -5.089708752991405e-17, -6.315774200223593e-17,
    -3.747835943704532e-17, -6.557383948286377e-17, -5.336819161384358e-17,
    -1.4614448608232376e-17, -7.277419269263228e-17, -4.1262536705884326e-18
])
_Q1_CHEB = np.array([
    2.981372314582739, -0.018139154448572267, 0.0004604727250432597,
    -2.5533947079856635e-05, 2.2187784778197517e-06, -2.5977194735365343e-07,
    3.769713746371197e-08, -6.440505408154428e-09, 1.251985974947473e-09,
    -2.7037085655414845e-10, 6.37399269324142e-11, -1.618963561913587e-11,
    4.384894552402446e-12, -1.2564827497987848e-12, 3.7812825146302015e-13,
    -1.1914928855413263e-13, 3.8782919129101206e-14, -1.3391579376625813e-14,
    4.495570412283071e-15, -1.7262176941126247e-15, 5.114991046295202e-16,
    -2.684317911813195e-16, 2.385651056346922e-17, -1.0554732655592933e-16,
    2.0011870922808886e-17, -1.0545496332212484e-18, -1.5345237860883502e-17
])


def _cheb_eval(c, t):
    """Clenshaw evaluation of a Chebyshev series (coefficients low->high)."""
    d = jnp.zeros_like(t)
    dd = jnp.zeros_like(t)
    for ck in c[:0:-1]:
        d, dd = 2.0 * t * d - dd + ck, d
    return t * d - dd + c[0]


_K_MID_LO, _K_MID_HI = 1.0 / 8.0, 1.0 / 1.5
_PQ_V_HI = (8.0 / 4.5) ** 2


def _besselk01_cheb(n: int, z):
    """K_0/K_1 for z >= 1.5 via the scaled Chebyshev fits (<=3e-15)."""
    from . import accmath as _amath

    u = 1.0 / z
    t_mid = (2.0 * jnp.clip(u, _K_MID_LO, _K_MID_HI) - (_K_MID_LO + _K_MID_HI)) / (
        _K_MID_HI - _K_MID_LO
    )
    t_big = 16.0 * jnp.clip(u, 0.0, _K_MID_LO) - 1.0
    mid = _cheb_eval(_K0_MID if n == 0 else _K1_MID, t_mid)
    big = _cheb_eval(_K0_BIG if n == 0 else _K1_BIG, t_big)
    scaled = jnp.where(z > 8.0, big, mid)
    return scaled * _amath.exp(-z) / jnp.sqrt(z)


def _bessely01_cheb(n: int, z):
    """Y_0/Y_1 for z >= 4.5 via the modulus/phase Chebyshev fits (<=4e-15)."""
    v = jnp.clip((8.0 / z) ** 2, 0.0, _PQ_V_HI)
    t = (2.0 * v - _PQ_V_HI) / _PQ_V_HI
    p = _cheb_eval(_P0_CHEB if n == 0 else _P1_CHEB, t)
    q = _cheb_eval(_Q0_CHEB if n == 0 else _Q1_CHEB, t) / (8.0 * z)
    chi = z - (0.5 * n + 0.25) * jnp.pi
    amp = jnp.sqrt(2.0 / (jnp.pi * z))
    return amp * (p * jnp.sin(chi) + q * jnp.cos(chi))


def bessely(nu, z):
    """Bessel function of the second kind Y_ν(z), z > 0.

    Integer orders: log-series for z < 4.5, SLATEC-style modulus/phase
    Chebyshev fits beyond (≤4e-15 fit residual — no asymptotic-seam accuracy
    cliff; see the table block above), higher orders by forward recurrence
    (stable for Y).
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
            zs < 4.5, _bessel_y0y1_small(0, jnp.minimum(zs, 4.5)),
            _bessely01_cheb(0, jnp.maximum(zs, 4.5)),
        )
        if n == 0:
            out = y0
        else:
            y1 = jnp.where(
                zs < 4.5, _bessel_y0y1_small(1, jnp.minimum(zs, 4.5)),
                _bessely01_cheb(1, jnp.maximum(zs, 4.5)),
            )
            out = y1
            prev, cur = y0, y1
            for k in range(1, n):
                prev, cur = cur, (2.0 * k / zs) * cur - prev
                out = cur
        return sign * jnp.where(z > 0, out, jnp.nan)
    # fractional order: Steed's method + large-z asymptotics + reflection
    return _bessjy_frac(nu, z)[1]


def besselk(nu, z):
    """Modified Bessel function of the second kind K_ν(z), z > 0.

    Fractional orders: K_ν = π(I_{−ν} − I_ν)/(2 sin νπ) for small z, Hankel
    asymptotics (adaptive, term-minimum stopped) for large z.  Integer
    orders: K₀/K₁ power series for z < 1.5 (A&S 9.6.11), scaled Chebyshev
    fits beyond (≤3e-15), + stable upward recurrence
    K_{n+1} = K_{n−1} + (2n/z)K_n."""
    if _is_static_int(nu):
        n = abs(int(nu))  # K_{-ν} = K_ν
        z = jnp.asarray(z)
        zs = jnp.where(z > 0, z, 1.0)
        k0 = jnp.where(
            zs < 1.5,
            _besselk_int_small(0, jnp.minimum(zs, 1.5)),
            _besselk01_cheb(0, jnp.maximum(zs, 1.5)),
        )
        if n == 0:
            out = k0
        else:
            k1 = jnp.where(
                zs < 1.5,
                _besselk_int_small(1, jnp.minimum(zs, 1.5)),
                _besselk01_cheb(1, jnp.maximum(zs, 1.5)),
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
    """Hankel asymptotic expansion of K_ν (A&S 9.7.2), adaptive: terms are
    accumulated until they stop shrinking (the series is divergent; stopping
    at the minimum term gives the best achievable accuracy — ~e^{-2z})."""
    from . import accmath as _amath

    dtype = _dtype_of(nu, z)
    z = jnp.asarray(z, dtype)
    mu = 4.0 * jnp.asarray(nu, dtype) ** 2
    term = jnp.ones_like(z)
    series = jnp.ones_like(z)
    stopped = jnp.zeros(jnp.shape(z), dtype=bool)
    for k in range(1, 30):
        new_term = term * (mu - (2 * k - 1) ** 2) / (k * 8.0 * z)
        stopped = jnp.logical_or(stopped, jnp.abs(new_term) >= jnp.abs(term))
        series = jnp.where(stopped, series, series + new_term)
        term = new_term
    return jnp.sqrt(jnp.pi / (2.0 * z)) * _amath.exp(-z) * series


def _besselk_frac(nu, z):
    """Fractional-order K_ν: connection formula K = π(I_{−ν} − I_ν)/(2 sin νπ)
    for z < 2 (its e^{2z} cancellation costs <2 digits there), Steed's CF2
    continued fraction for z ≥ 2 (Numerical Recipes bessik; validated ≤6e-14
    vs mpmath for ν ∈ [0.1, 5.5], z ∈ [2, 40] — round 1's series/asymptotic
    seam at z=6 measured ~1e-5 and is gone)."""
    dtype = _dtype_of(nu, z)
    nu = jnp.abs(jnp.asarray(nu, dtype))  # K_{-ν} = K_ν
    z = jnp.asarray(z, dtype)
    zs_small = jnp.minimum(z, 2.0)
    ip = _bessel_frac(-nu, zs_small, modified=True)
    im = _bessel_frac(nu, zs_small, modified=True)
    small = jnp.pi * (ip - im) / (2.0 * jnp.sin(jnp.pi * nu))

    big = _besselk_frac_cf2(nu, jnp.maximum(z, 2.0))
    return jnp.where(z < 2.0, small, big)


_CF2_ITERS = 60
_CF2_MAX_NL = 30


def _besselk_frac_cf2(nu, x):
    """Steed/Thompson-Barnett CF2 evaluation of K_ν(x) for x ≥ 2.

    Computes K_μ, K_{μ+1} for the reduced order μ = ν − round(ν) ∈ [−½, ½]
    and recurs upward (stable for K).  ``nu`` may be a traced array; the
    upward recurrence runs a masked fixed-trip loop (ν < 30 covers every
    physical use; larger orders should be integers, which take the Chebyshev
    path)."""
    from . import accmath as _amath

    dtype = _dtype_of(nu, x)
    nu = jnp.asarray(nu, dtype)
    x = jnp.asarray(x, dtype)
    shape = jnp.broadcast_shapes(jnp.shape(nu), jnp.shape(x))
    nu = jnp.broadcast_to(nu, shape)
    x = jnp.broadcast_to(x, shape)
    nl = jnp.floor(nu + 0.5)
    xmu = nu - nl
    a1 = 0.25 - xmu * xmu
    xi = 1.0 / x
    b0 = 2.0 * (1.0 + x)
    d0 = 1.0 / b0
    h0 = d0

    def cf_body(i, carry):
        a, b, c, d, h, delh, q, q1, q2, ss = carry
        fi = i.astype(dtype)
        a = a - 2.0 * (fi - 1.0)
        c = -a * c / fi
        qnew = (q1 - b * q2) / a
        q1, q2 = q2, qnew
        q = q + c * qnew
        b = b + 2.0
        d = 1.0 / (b + a * d)
        delh = (b * d - 1.0) * delh
        h = h + delh
        ss = ss + q * delh
        return (a, b, c, d, h, delh, q, q1, q2, ss)

    init = (
        -a1, b0, a1, d0, h0, d0, a1,
        jnp.zeros(shape, dtype), jnp.ones(shape, dtype),
        1.0 + a1 * d0,
    )
    a, b, c, d, h, delh, q, q1, q2, ss = lax.fori_loop(
        2, _CF2_ITERS + 1, cf_body, init
    )
    h = a1 * h
    rkmu = jnp.sqrt(jnp.pi / (2.0 * x)) * _amath.exp(-x) / ss
    rk1 = rkmu * (xmu + x + 0.5 - h) * xi

    def rec_body(i, carry):
        kmu, k1 = carry
        fi = i.astype(dtype)
        step = fi < nl
        ktemp = (xmu + fi + 1.0) * 2.0 * xi * k1 + kmu
        kmu = jnp.where(step, k1, kmu)
        k1 = jnp.where(step, ktemp, k1)
        return (kmu, k1)

    rkmu, _ = lax.fori_loop(0, _CF2_MAX_NL, rec_body, (rkmu, rk1))
    return rkmu


# --------------------------------------------------------------------------- #
# spherical Bessel functions                                                  #
# --------------------------------------------------------------------------- #


def sph_jn(n, z):
    """Spherical Bessel function j_n(z).

    Downward (Miller) recurrence: upward recurrence amplifies the dominant
    y_n solution whenever n > z and loses ~(y_n j_n)⁻¹ digits (ADVICE.md
    round 1: j_4(0.2) was only ~1e-5 relative).  Starting from a zero tail
    at order n+28 and normalizing against (j₀, j₁) keeps every order at
    ~1e-15 for the z ≲ 50 regime these models use.

    Fractional orders (round 5) go through the half-integer connection
    j_ν(z) = √(π/2z)·J_{ν+½}(z) — ``int(n)`` previously truncated them
    silently (j_2.3 evaluated as j_2)."""
    if not _is_static_int(n):
        nu = float(n)
        z = jnp.asarray(z)
        zs = jnp.where(z == 0, jnp.asarray(1.0, z.dtype), z)
        out = jnp.sqrt(jnp.pi / (2.0 * zs)) * besselj(nu + 0.5, zs)
        out = jnp.where(z < 0, jnp.nan, out)
        return jnp.where(z == 0, 0.0 if nu > 0 else jnp.nan, out)
    n = int(n)
    z = jnp.asarray(z)
    zs = jnp.where(z == 0, 1.0, z)  # j_n(0) handled below
    j0 = jnp.sin(zs) / zs
    if n == 0:
        return jnp.where(z == 0, 1.0, j0)
    j1 = jnp.sin(zs) / (zs * zs) - jnp.cos(zs) / zs
    if n == 1:
        return jnp.where(z == 0, 0.0, j1)
    # Miller is only valid when the start order sits above the turning
    # point (m ≳ z); in the oscillatory region z > n the upward recurrence
    # is stable — use it there and Miller below (elementwise select).
    up_prev, up_cur = j0, j1
    for k in range(1, n):
        up_prev, up_cur = up_cur, (2.0 * k + 1.0) / zs * up_cur - up_prev
    m = n + 28
    fp = jnp.zeros_like(zs)  # f_{m+1}
    fc = jnp.full_like(zs, 1e-30)  # f_m (arbitrary tiny seed)
    f_n = jnp.zeros_like(zs)
    f0 = jnp.zeros_like(zs)
    f1 = jnp.zeros_like(zs)
    zm = jnp.minimum(zs, float(n))  # clamp: Miller branch only used z ≤ n
    j0m = jnp.sin(zm) / zm
    j1m = jnp.sin(zm) / (zm * zm) - jnp.cos(zm) / zm
    for k in range(m, 0, -1):
        fp, fc = fc, (2.0 * k + 1.0) / zm * fc - fp
        if k - 1 == n:
            f_n = fc
        if k - 1 == 1:
            f1 = fc
        if k - 1 == 0:
            f0 = fc
    # cross-normalization against both closed forms (robust near sin/cos
    # zeros): scale = (j0 f0 + j1 f1)/(f0² + f1²)
    scale = (j0m * f0 + j1m * f1) / (f0 * f0 + f1 * f1)
    down = f_n * scale
    out = jnp.where(zs > float(n), up_cur, down)
    return jnp.where(z == 0, 0.0, out)


def sph_yn(n, z):
    """Spherical Bessel function y_n(z), z > 0 (closed forms + recurrence;
    fractional orders via y_ν = √(π/2z)·Y_{ν+½}, round 5)."""
    if not _is_static_int(n):
        nu = float(n)
        z = jnp.asarray(z)
        zs = jnp.where(z <= 0, jnp.asarray(1.0, z.dtype), z)
        out = jnp.sqrt(jnp.pi / (2.0 * zs)) * bessely(nu + 0.5, zs)
        return jnp.where(z > 0, out, jnp.nan)
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
