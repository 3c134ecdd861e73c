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
    z = _z(0.1, 12.0)
    got = np.asarray(sp.besselj(0.5, z))
    np.testing.assert_allclose(got, sps.jv(0.5, z), rtol=1e-9, atol=1e-12)


def test_besseli():
    z = _z(0.1, 15.0)
    for n in (0, 1, 3):
        got = np.asarray(sp.besseli(n, z))
        np.testing.assert_allclose(got, sps.iv(n, z), rtol=1e-7, atol=1e-12)
    got = np.asarray(sp.besseli(0.5, z))
    np.testing.assert_allclose(got, sps.iv(0.5, z), rtol=1e-9, atol=1e-12)


def test_bessely():
    z = _z(0.2, 30.0, 40)
    for n in (0, 1, 3):
        got = np.asarray(sp.bessely(n, z))
        np.testing.assert_allclose(got, sps.yv(n, z), rtol=2e-6, atol=1e-9)
    # fractional order
    got = np.asarray(sp.bessely(0.5, _z(0.2, 10.0)))
    np.testing.assert_allclose(got, sps.yv(0.5, _z(0.2, 10.0)), rtol=1e-8, atol=1e-10)


def test_bessely_domain():
    assert np.isnan(float(sp.bessely(0, -1.0)))


def test_besselk():
    z = _z(0.2, 10.0)
    got = np.asarray(sp.besselk(0.5, z))
    np.testing.assert_allclose(got, sps.kv(0.5, z), rtol=1e-8, atol=1e-12)
    for n in (0, 1, 2):
        got = np.asarray(sp.besselk(n, z))
        np.testing.assert_allclose(got, sps.kv(n, z), rtol=1e-5, atol=1e-12)


def test_spherical():
    z = _z(0.2, 20.0)
    for n in (0, 1, 2, 4):
        np.testing.assert_allclose(
            np.asarray(sp.sph_jn(n, z)), sps.spherical_jn(n, z), rtol=1e-7, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(sp.sph_yn(n, z)), sps.spherical_yn(n, z), rtol=1e-7, atol=1e-9
        )
    assert float(sp.sph_jn(0, 0.0)) == 1.0
    assert float(sp.sph_jn(2, 0.0)) == 0.0


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
