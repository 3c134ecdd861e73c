"""Dev probe: fractional-order Bessel J/Y/I/K in DF arithmetic.

Validates the round-3 algorithm choices against scipy before integration
into df32_special:

* J_nu (z <= 40): Miller downward recurrence from nu+M with Neumann-sum
  normalization  sum_k c_k J_{nu+2k} = (z/2)^nu / Gamma(nu+1) — verify the
  identity numerically, then scan M for <=1e-12 (amplitude-floored).
* Y_nu: reflection (J cos - J_neg) / sin with static angles.
* K_nu: reflection pi/2 (I_-nu - I_nu)/sin for z <= 3.5; CF2 (NR bessik
  structure, static-order constants) beyond — scan iteration budget.
"""
import math
import sys

import numpy as np
import scipy.special as sps

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from inflatox_tpu.lowering import df32 as dfm  # noqa: E402
from inflatox_tpu.lowering.df32 import DF  # noqa: E402


def _rel(a, b, floor):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), floor))


# --- step 0: verify the normalization identity with scipy ----------------- #
def neumann_check():
    nu, z = 0.37, 9.0
    s = 0.0
    for k in range(0, 120):
        if k == 0:
            c = 1.0
        else:
            c = (nu + 2 * k) * math.gamma(nu + k) / (
                math.factorial(k) * math.gamma(nu + 1)
            )
        s += c * sps.jv(nu + 2 * k, z)
    rhs = (z / 2.0) ** nu / math.gamma(nu + 1)
    print("neumann identity: sum =", s, " rhs =", rhs, " rel:",
          abs(s - rhs) / rhs)


# --- J via Miller + Neumann normalization in DF --------------------------- #
def besselj_miller_df(nu: float, z: DF, M: int, want_shift: int = 0):
    """J_{nu+want_shift}(z) for z in (0, zmax]; M downward steps from
    nu+M."""
    zi = 1.0 / z
    tiny = 2.0**-60
    jp = DF(jnp.zeros_like(z.hi))          # j_{mu+1}
    j = DF(jnp.full_like(z.hi, tiny))      # j_mu at mu = nu + M
    ssum = DF(jnp.zeros_like(z.hi))
    out = DF(jnp.zeros_like(z.hi))
    gnu1 = math.gamma(nu + 1.0)
    for k in range(M, -1, -1):
        # accumulate normalization term at even offsets
        if k % 2 == 0:
            kk = k // 2
            if kk == 0:
                c = 1.0
            else:
                c = (nu + 2 * kk) * math.gamma(nu + kk) / (
                    math.factorial(kk) * gnu1
                )
            ssum = ssum + j * c
        if k == want_shift:
            out = j
        if k == 0:
            break
        jm = zi * j * (2.0 * (nu + k)) - jp
        jp, j = j, jm
        # rescale every 4 steps (power of two, exact)
        if k % 4 == 0:
            big = jnp.abs(j.hi) > 2.0**40
            sc = jnp.where(big, jnp.float32(2.0**-64), jnp.float32(1.0))
            jp = DF(jp.hi * sc, jp.lo * sc)
            j = DF(j.hi * sc, j.lo * sc)
            ssum = DF(ssum.hi * sc, ssum.lo * sc)
            out = DF(out.hi * sc, out.lo * sc)
    rhs = dfm.pow(z * 0.5, nu) * (1.0 / gnu1)
    return out * (rhs / ssum)


def scan_j():
    rng = np.random.default_rng(0)
    print("--- J Miller scan ---")
    for zmax, Ms in [(13.0, (24, 32, 40)), (40.0, (48, 56, 64, 72))]:
        z = np.concatenate([
            rng.uniform(0.05, zmax, 400),
            rng.uniform(max(0.05, zmax - 3), zmax, 200),
        ])
        amp = np.sqrt(2.0 / (np.pi * np.maximum(z, 0.5)))
        for nu in (0.1, 0.37, 1.3, 2.7, 4.6):
            want = sps.jv(nu, z)
            for M in Ms:
                got = besselj_miller_df(
                    nu, DF.of(jnp.asarray(z)), M
                ).to_f64()
                e = _rel(got, want, amp)
                print(f"zmax={zmax} nu={nu} M={M}: {e:.2e}")


# --- K via CF2 in DF ------------------------------------------------------- #
def besselk_cf2_df(nu: float, x: DF, iters: int):
    nl = int(math.floor(nu + 0.5))
    xmu = nu - nl
    a1 = 0.25 - xmu * xmu
    xi = 1.0 / x
    b = x * 2.0 + 2.0
    d = 1.0 / b
    h = d
    delh = d
    a = -a1
    c = a1
    q1, q2 = 0.0, 1.0  # python floats? no — q recurrence needs runtime b!
    # q recurrence involves b (runtime) — keep as DF
    q1 = DF(jnp.zeros_like(x.hi))
    q2 = DF(jnp.ones_like(x.hi))
    q = DF(jnp.full_like(x.hi, np.float32(a1)))
    ssum = q * d + 1.0
    for i in range(2, iters + 1):
        a = a - 2.0 * (i - 1)
        c = -a * c / i
        qnew = (q1 - b * q2) * (1.0 / a)
        q1, q2 = q2, qnew
        q = q + qnew * c
        b = b + 2.0
        d = 1.0 / (b + d * a)
        delh = (b * d - 1.0) * delh
        h = h + delh
        ssum = ssum + q * delh
    h = h * a1
    rkmu = dfm.sqrt(DF.const(np.pi) / (x * 2.0)) * dfm.exp(-x) / ssum
    rk1 = rkmu * (x + (xmu + 0.5) - h) * xi
    for k in range(nl):
        rkmu, rk1 = rk1, (rk1 * ((xmu + k + 1.0) * 2.0)) * xi + rkmu
    return rkmu


def scan_k():
    rng = np.random.default_rng(1)
    print("--- K CF2 scan ---")
    for lo in (2.0, 3.5):
        z = rng.uniform(lo, 40.0, 500)
        for nu in (0.1, 0.37, 1.3, 2.7, 4.6, 5.5):
            want = sps.kv(nu, z)
            for iters in (20, 30, 40, 60):
                got = besselk_cf2_df(
                    nu, DF.of(jnp.asarray(z)), iters
                ).to_f64()
                e = _rel(got, want, 1e-300)
                print(f"lo={lo} nu={nu} iters={iters}: {e:.2e}")
        print()


# --- K reflection small-z -------------------------------------------------- #
def _i_series_nu(nu: float, z: DF, iters=40):
    q = z.sq() * 0.25
    acc = DF.const(1.0) + (q * 0.0)
    term = acc
    for k in range(iters):
        term = term * q * (1.0 / ((k + 1.0) * (k + 1.0 + nu)))
        acc = acc + term
    pref = dfm.pow(z * 0.5, nu) * (1.0 / math.gamma(nu + 1.0))
    return acc * pref


def scan_k_small():
    rng = np.random.default_rng(2)
    print("--- K reflection small-z ---")
    z = rng.uniform(0.05, 3.5, 400)
    for nu in (0.1, 0.37, 1.3, 2.7, 4.6):
        want = sps.kv(nu, z)
        Z = DF.of(jnp.asarray(z))
        ip = _i_series_nu(-nu, Z)
        im = _i_series_nu(nu, Z)
        got = ((ip - im) * (np.pi / (2.0 * math.sin(np.pi * nu)))).to_f64()
        print(f"nu={nu}: {_rel(got, want, 1e-300):.2e}")


# --- Y via reflection ------------------------------------------------------ #
def scan_y():
    rng = np.random.default_rng(3)
    print("--- Y reflection (Miller J, z<=40) ---")
    z = rng.uniform(0.05, 40.0, 600)
    amp = np.sqrt(2.0 / (np.pi * np.maximum(z, 0.5)))
    Z = DF.of(jnp.asarray(z))
    for nu in (0.1, 0.37, 1.3, 2.7, 4.6):
        want = sps.yv(nu, z)
        M = 72
        jp_ = besselj_miller_df(nu, Z, M)
        jn_ = besselj_miller_df(-nu, Z, M)
        got = ((jp_ * math.cos(math.pi * nu) - jn_)
               * (1.0 / math.sin(math.pi * nu))).to_f64()
        # Y blows up at small z: relative with amplitude floor scaled by |Y|
        e = _rel(got, want, amp)
        print(f"nu={nu}: {e:.2e}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "neumann"):
        neumann_check()
    if which in ("all", "j"):
        scan_j()
    if which in ("all", "y"):
        scan_y()
    if which in ("all", "ksmall"):
        scan_k_small()
    if which in ("all", "k"):
        scan_k()


# --- round 2 of dev: fixes ------------------------------------------------- #
def besselk_cf2_df_v2(nu: float, x: DF, iters: int):
    """CF2 with the c-folded (static-coefficient) q-recurrence: the raw NR
    form keeps c_i ~ i!4^i (f32 overflow at i~30) and q_i ~ 1/c_i (f32
    underflow); with Q_i = c_i q_i both stay O(1) and the static
    coefficients are exact Python floats."""
    nl = int(math.floor(nu + 0.5))
    xmu = nu - nl
    a1 = 0.25 - xmu * xmu
    xi = 1.0 / x
    b = x * 2.0 + 2.0
    d = 1.0 / b
    h = d
    delh = d
    tiny = np.float32(1e-30)

    def safe_recip(den):
        bad = jnp.abs(den.hi) < tiny
        den = DF(jnp.where(bad, tiny, den.hi), jnp.where(bad, 0.0, den.lo))
        return 1.0 / den

    if a1 == 0.0:
        # half-integer order: the CF terminates; ssum = 1, h*a1 = 0
        rkmu = dfm.sqrt(DF.const(np.pi) / (x * 2.0)) * dfm.exp(-x)
        rk1 = rkmu * (x + (xmu + 0.5)) * xi
        for k in range(nl):
            rkmu, rk1 = rk1, (rk1 * ((xmu + k + 1.0) * 2.0)) * xi + rkmu
        return rkmu
    a_val = -a1
    c_vals = {0: 1.0, 1: a1}
    for i in range(2, iters + 1):
        a_val = a_val - 2.0 * (i - 1)
        c_vals[i] = -a_val * c_vals[i - 1] / i
    Q1 = DF(jnp.zeros_like(x.hi))            # Q_0
    Q2 = DF(jnp.full_like(x.hi, np.float32(c_vals[1])))  # Q_1
    q = Q2 * 1.0
    ssum = q * d + 1.0
    a_val = -a1
    done = jnp.zeros_like(x.hi, dtype=bool)

    def frz(old, new):
        return DF(jnp.where(done, old.hi, new.hi),
                  jnp.where(done, old.lo, new.lo))

    for i in range(2, iters + 1):
        a_val = a_val - 2.0 * (i - 1)
        alpha = c_vals[i] / (a_val * c_vals[i - 2])
        beta = c_vals[i] / (a_val * c_vals[i - 1])
        Qnew = frz(Q2, Q1 * alpha - (b * Q2) * beta)
        Q1, Q2 = frz(Q1, Q2), Qnew
        q = frz(q, q + Qnew)
        b = b + 2.0
        d = frz(d, safe_recip(b + d * a_val))
        delh = frz(delh, (b * d - 1.0) * delh)
        h = frz(h, h + delh)
        inc = q * delh
        ssum = frz(ssum, ssum + inc)
        done = done | (jnp.abs(inc.hi) <= np.float32(2.0**-52) * jnp.abs(ssum.hi))
    h = h * a1
    rkmu = dfm.sqrt(DF.const(np.pi) / (x * 2.0)) * dfm.exp(-x) / ssum
    rk1 = rkmu * (x + (xmu + 0.5) - h) * xi
    for k in range(nl):
        rkmu, rk1 = rk1, (rk1 * ((xmu + k + 1.0) * 2.0)) * xi + rkmu
    return rkmu


def scan_k2():
    rng = np.random.default_rng(1)
    print("--- K CF2 v2 scan ---")
    for lo in (2.0,):
        z = rng.uniform(lo, 40.0, 500)
        for nu in (0.1, 0.37, 1.3, 2.7, 4.6, 5.5):
            want = sps.kv(nu, z)
            for iters in (40, 60, 80):
                got = besselk_cf2_df_v2(
                    nu, DF.of(jnp.asarray(z)), iters
                ).to_f64()
                e = _rel(got, want, 1e-300)
                print(f"lo={lo} nu={nu} iters={iters}: {e:.2e}")
        print()


def bessely_upward_df(nu: float, z: DF, M: int):
    """Y_nu via double reflection at reduced orders mu, mu+1 in (0,2) and
    stable upward recurrence."""
    nl = int(math.floor(nu))
    mu = nu - nl  # in [0, 1)
    def refl(m):
        jp_ = besselj_miller_df(m, z, M)
        jn_ = besselj_miller_df(-m, z, M)
        return (jp_ * math.cos(math.pi * m) - jn_) * (
            1.0 / math.sin(math.pi * m)
        )
    ymu = refl(mu)
    ymu1 = refl(mu + 1.0)
    zi2 = 2.0 / z
    for k in range(nl):
        # wait: careful — upward from (mu, mu+1): Y_{m+1} = (2m/z) Y_m - Y_{m-1}
        ymu, ymu1 = ymu1, (zi2 * ((mu + k + 1.0) * 0.5 * 2.0)) * ymu1 - ymu
    return ymu if nl == 0 else ymu  # after loop ymu holds Y_{mu+nl}
    # NOTE loop result: after nl steps ymu = Y_{mu+nl} = Y_nu


def scan_y2():
    rng = np.random.default_rng(3)
    print("--- Y double-reflection + upward ---")
    z = rng.uniform(0.05, 40.0, 600)
    amp = np.sqrt(2.0 / (np.pi * np.maximum(z, 0.5)))
    Z = DF.of(jnp.asarray(z))
    for nu in (0.1, 0.37, 1.3, 2.7, 4.6, 7.3):
        want = sps.yv(nu, z)
        got = bessely_upward_df(nu, Z, 80).to_f64()
        print(f"nu={nu}: {_rel(got, want, amp):.2e}")


def besselk_cf2_df_v3(nu: float, x: DF, iters: int):
    """Original NR recurrence (stable: divides by a_i each step) with a
    static schedule of exact power-of-two joint rescalings of (c, q1, q2):
    c_i ~ i!4^i overflows the f32 constant split and q_i ~ 1/c_i underflows
    f32; scaling c by 2^-64 and q by 2^64 at trace-time-known crossings
    keeps both in range while preserving every product exactly."""
    nl = int(math.floor(nu + 0.5))
    xmu = nu - nl
    a1 = 0.25 - xmu * xmu
    xi = 1.0 / x
    b = x * 2.0 + 2.0
    d = 1.0 / b
    h = d
    delh = d
    tiny = np.float32(1e-30)

    def safe_recip(den):
        bad = jnp.abs(den.hi) < tiny
        den = DF(jnp.where(bad, tiny, den.hi), jnp.where(bad, 0.0, den.lo))
        return 1.0 / den

    if a1 == 0.0:
        rkmu = dfm.sqrt(DF.const(np.pi) / (x * 2.0)) * dfm.exp(-x)
        rk1 = rkmu * (x + (xmu + 0.5)) * xi
        for k in range(nl):
            rkmu, rk1 = rk1, (rk1 * ((xmu + k + 1.0) * 2.0)) * xi + rkmu
        return rkmu

    a_val = -a1
    c_m = a1  # mantissa of c; true c = c_m * 2^(64*n_rescales)
    q1 = DF(jnp.zeros_like(x.hi))
    q2 = DF(jnp.ones_like(x.hi))
    q = DF.const(a1) + DF(jnp.zeros_like(x.hi))  # exact (hi, lo) split
    ssum = q * d + 1.0
    done = jnp.zeros_like(x.hi, dtype=bool)

    def frz(old, new):
        return DF(jnp.where(done, old.hi, new.hi),
                  jnp.where(done, old.lo, new.lo))

    for i in range(2, iters + 1):
        a_val = a_val - 2.0 * (i - 1)
        c_m = -a_val * c_m / i
        qnew = frz(q2, (q1 - b * q2) * (1.0 / a_val))
        q1, q2 = frz(q1, q2), qnew
        q = frz(q, q + qnew * c_m)
        if abs(c_m) > 2.0**32:
            c_m *= 2.0**-64
            q1 = q1 * (2.0**64)
            q2 = q2 * (2.0**64)
        b = b + 2.0
        d = frz(d, safe_recip(b + d * a_val))
        delh = frz(delh, (b * d - 1.0) * delh)
        h = frz(h, h + delh)
        inc = q * delh
        ssum = frz(ssum, ssum + inc)
        done = done | (
            jnp.abs(inc.hi) <= np.float32(2.0**-52) * jnp.abs(ssum.hi)
        )
    h = h * a1
    rkmu = dfm.sqrt(DF.const(np.pi) / (x * 2.0)) * dfm.exp(-x) / ssum
    rk1 = rkmu * (x + (xmu + 0.5) - h) * xi
    for k in range(nl):
        rkmu, rk1 = rk1, (rk1 * ((xmu + k + 1.0) * 2.0)) * xi + rkmu
    return rkmu


def scan_k3():
    rng = np.random.default_rng(1)
    print("--- K CF2 v3 scan ---")
    z = rng.uniform(2.0, 40.0, 500)
    for nu in (0.1, 0.37, 1.3, 2.7, 4.6, 5.5):
        want = sps.kv(nu, z)
        for iters in (40, 60, 80):
            got = besselk_cf2_df_v3(nu, DF.of(jnp.asarray(z)), iters).to_f64()
            print(f"nu={nu} iters={iters}: {_rel(got, want, 1e-300):.2e}")
    print()
