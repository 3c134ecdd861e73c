"""Generate the round-4 Chebyshev tables for the df32 engine's erf/erfc.

Approach (SLATEC-style, like scripts/gen_cheb.py for Bessel Y/K): fit the
SMOOTH scaled function

    g(u) = sqrt(pi) * x * erfcx(x),   x = 1/u,   erfcx = e^{x^2} erfc

on two u-ranges (x in [1, 8] and [8, inf)); then

    erfc(x) = g(1/x) * e^{-x^2} / (sqrt(pi) * x)      for x >= 1
    erf(x)  = series (A&S 7.1.6, all-positive terms)  for x < 1

Measured fit residuals: mid (deg 26) ~3e-15, big (deg 16) ~2e-15 — inside
the df32 engine's ~3.6e-15 unit roundoff.  Paste the output into
inflatox_tpu/lowering/df32_special.py.
"""

import mpmath as mp
import numpy as np

mp.mp.dps = 40


def chebfit_fn(f, lo, hi, deg):
    k = np.arange(deg + 1)
    t = np.cos(np.pi * (k + 0.5) / (deg + 1))
    x = 0.5 * (hi + lo) + 0.5 * (hi - lo) * t
    y = np.array([float(f(mp.mpf(xi))) for xi in x])
    return np.polynomial.chebyshev.chebfit(t, y, deg)


def report(name, c, f, lo, hi):
    xs = np.linspace(lo, hi, 797)
    t = (2 * xs - (hi + lo)) / (hi - lo)
    approx = np.polynomial.chebyshev.chebval(t, c)
    exact = np.array([float(f(mp.mpf(x))) for x in xs])
    rel = np.max(np.abs(approx - exact) / np.maximum(np.abs(exact), 1e-300))
    print(f"# {name}: deg {len(c) - 1}, maxrel {rel:.2e} on u in [{lo}, {hi}]")
    vals = ", ".join(f"{v!r}" for v in c)
    print(f"{name} = np.array([{vals}])")


def g(u):
    x = 1 / u
    return mp.sqrt(mp.pi) * x * mp.erfc(x) * mp.exp(x * x)


# NB: fit ranges must match the runtime t-mappings EXACTLY (mid:
# (2u−9/8)/(7/8), big: 16u−1) — an off-by-1e-9 range shift costs ~3e-11
# through dg/dt (measured, round 4).  lo = 0 is safe: Chebyshev sample
# points are interior, so g is never evaluated at u = 0.
report("_ERFCX_MID", chebfit_fn(g, 1.0 / 8.0, 1.0, 26), g, 1.0 / 8.0, 1.0)
report("_ERFCX_BIG", chebfit_fn(g, 0.0, 1.0 / 8.0, 16), g, 1e-9, 1.0 / 8.0)
