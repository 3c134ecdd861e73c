"""Generate Chebyshev coefficient tables for the Bessel Y/K mid/large-z
ranges (SLATEC-style), using mpmath as the high-precision oracle.

The small-z log-series for K0/K1 cancels catastrophically beyond z ~ 6
(factor e^z), and the Hankel asymptotic series bottoms out at ~1e-6 near
z = 6-12 — no seam position makes the pair meet at 1e-13.  The standard fix
(SLATEC besk0/besy0) is Chebyshev fits of smooth scaled functions:

* K_n:  e^z sqrt(z) K_n(z)   as a function of u = 1/z, two ranges
        z in [1.5, 8] and [8, inf)
* Y_n:  modulus/phase form  Y_n = sqrt(2/(pi z)) (P sin chi + Q cos chi),
        chi = z - (n/2 + 1/4) pi: fit P_n(u) and Q_n(u)*8z... we fit
        p_n(u) = P_n(z) and q_n(u) = 8 z Q_n(z) on z in [4.5, inf),
        u = (8/z)^2 mapped to [-1, 1]  (P, Q are even/odd series in 1/z).

Writes the tables as a Python module fragment on stdout; paste into
inflatox_tpu/lowering/special.py (they are static data).
"""

import mpmath as mp
import numpy as np

mp.mp.dps = 40


def chebfit_fn(f, lo, hi, deg):
    """Chebyshev fit of f on [lo, hi] (maps to t in [-1, 1])."""
    # sample at Chebyshev points of the first kind
    k = np.arange(deg + 1)
    t = np.cos(np.pi * (k + 0.5) / (deg + 1))
    x = 0.5 * (hi + lo) + 0.5 * (hi - lo) * t
    y = np.array([float(f(mp.mpf(xi))) for xi in x])
    c = np.polynomial.chebyshev.chebfit(t, y, deg)
    return c


def report(name, c, f, lo, hi):
    xs = np.linspace(lo, hi, 997)
    t = (2 * xs - (hi + lo)) / (hi - lo)
    approx = np.polynomial.chebyshev.chebval(t, c)
    exact = np.array([float(f(mp.mpf(x))) for x in xs])
    rel = np.max(np.abs(approx - exact) / np.maximum(np.abs(exact), 1e-300))
    print(f"# {name}: deg {len(c)-1}, maxrel {rel:.2e} on [{lo}, {hi}]")
    vals = ", ".join(f"{v!r}" for v in c)
    print(f"{name} = np.array([{vals}])")


# ---- K0/K1 scaled: e^z sqrt(z) K_n(z), u = 1/z ----------------------- #
for n in (0, 1):
    f = lambda u, _n=n: mp.exp(1 / u) * mp.sqrt(1 / u) * mp.besselk(_n, 1 / u)
    # range A: z in [1.5, 8]  -> u in [0.125, 2/3]
    c = chebfit_fn(f, 1.0 / 8.0, 1.0 / 1.5, 22)
    report(f"_K{n}_MID", c, f, 1.0 / 8.0, 1.0 / 1.5)
    # range B: z in [8, inf) -> u in (0, 0.125]
    c = chebfit_fn(f, 1e-8, 1.0 / 8.0, 18)
    report(f"_K{n}_BIG", c, f, 1e-8, 1.0 / 8.0)

# ---- Y/J modulus-phase: P_n, Q_n with v = (8/z)^2 -------------------- #
# J_n = sqrt(2/(pi z)) (P cos chi - Q sin chi); Y_n = ... (P sin + Q cos)
# P_n(z) = sqrt(pi z / 2) (Y_n sin chi + J_n cos chi)
# Q_n(z) = sqrt(pi z / 2) (Y_n cos chi - J_n sin chi)
for n in (0, 1):
    def P(v, _n=n):
        z = 8 / mp.sqrt(v)
        chi = z - (mp.mpf(_n) / 2 + mp.mpf(1) / 4) * mp.pi
        amp = mp.sqrt(mp.pi * z / 2)
        return amp * (mp.bessely(_n, z) * mp.sin(chi) + mp.besselj(_n, z) * mp.cos(chi))

    def Q8z(v, _n=n):
        z = 8 / mp.sqrt(v)
        chi = z - (mp.mpf(_n) / 2 + mp.mpf(1) / 4) * mp.pi
        amp = mp.sqrt(mp.pi * z / 2)
        return 8 * z * amp * (mp.bessely(_n, z) * mp.cos(chi) - mp.besselj(_n, z) * mp.sin(chi))

    # z in [4.5, inf) -> v = (8/z)^2 in (0, 3.1605]
    hi = (8.0 / 4.5) ** 2
    c = chebfit_fn(P, 1e-12, hi, 26)
    report(f"_P{n}_CHEB", c, P, 1e-12, hi)
    c = chebfit_fn(Q8z, 1e-12, hi, 26)
    report(f"_Q{n}_CHEB", c, Q8z, 1e-12, hi)
