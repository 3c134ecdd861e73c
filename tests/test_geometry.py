"""Field-space geometry surfaces (inflatox_tpu.geometry): Christoffels,
Riemann, Ricci scalar, coordinate covariant Hesse — validated against
textbook analytics on flat, polar-flat, spherical and hyperbolic metrics,
and cross-checked against the projected Hesse the scan engines use."""

import numpy as np
import pytest
import sympy

import inflatox_tpu as inflatox

X = np.array([1.2, -0.8])
ARGS = np.array([1.0, 0.7])


def _compile(metric, potential, fields):
    model = inflatox.InflationModelBuilder.new(
        fields, metric, potential, silent=True
    ).build()
    return inflatox.Compiler(model, silent=True).compile()


@pytest.fixture(scope="module")
def polar_artifact():
    """Flat plane in polar coordinates: g = diag(1, r²) — nonzero
    Christoffels, identically zero curvature."""
    r, th, m = sympy.symbols("r theta m", positive=True)
    return _compile(
        [[sympy.Integer(1), 0], [0, r**2]],
        sympy.Rational(1, 2) * m**2 * (r**2 + th**2),
        [r, th],
    )


@pytest.fixture(scope="module")
def sphere_artifact():
    """Unit 2-sphere: g = diag(1, sin²θ) — Ricci scalar +2 (pins the sign
    convention)."""
    th, ph, m = sympy.symbols("theta phi m", positive=True)
    return _compile(
        [[sympy.Integer(1), 0], [0, sympy.sin(th) ** 2]],
        sympy.Rational(1, 2) * m**2 * (th**2 + ph**2),
        [th, ph],
    )


@pytest.fixture(scope="module")
def hyperbolic_artifact():
    """Hyperbolic plane: g = diag(1, sinh²x) — Ricci scalar −2."""
    x, y, m = sympy.symbols("x y m", positive=True)
    return _compile(
        [[sympy.Integer(1), 0], [0, sympy.sinh(x) ** 2]],
        sympy.Rational(1, 2) * m**2 * (x**2 + y**2),
        [x, y],
    )


def test_flat_metric_geometry(trivial_artifact):
    geo = trivial_artifact.geometry
    np.testing.assert_array_equal(np.asarray(geo.christoffels(X, ARGS)), 0.0)
    np.testing.assert_array_equal(np.asarray(geo.riemann(X, ARGS)), 0.0)
    assert float(geo.ricci_scalar(X, ARGS)) == 0.0
    # coordinate covariant Hesse == plain Hessian of V = (m1 x1)² + (m2 x2)²
    h = np.asarray(geo.hesse(X, ARGS))
    np.testing.assert_allclose(
        h, np.diag([2 * ARGS[0] ** 2, 2 * ARGS[1] ** 2]), rtol=1e-13
    )


def test_flat_metric_geometry_grid_shape_contract(trivial_artifact):
    """A flat metric lowers every component to a literal constant — the
    result must STILL carry the documented trailing grid axes and a float
    dtype (a caller indexing gamma[..., iy, ix] would otherwise crash)."""
    geo = trivial_artifact.geometry
    xg = [np.linspace(1.0, 2.0, 6), np.linspace(0.5, 1.5, 6)]
    gam = np.asarray(geo.christoffels(xg, ARGS))
    assert gam.shape == (2, 2, 2, 6) and np.issubdtype(gam.dtype, np.floating)
    riem = np.asarray(geo.riemann(xg, ARGS))
    assert riem.shape == (2, 2, 2, 2, 6)
    # a fully-constant metric honors the same contract
    gm = np.asarray(trivial_artifact.metric(xg, ARGS))
    assert gm.shape == (2, 2, 6) and np.issubdtype(gm.dtype, np.floating)


def test_polar_christoffels_and_flatness(polar_artifact):
    geo = polar_artifact.geometry
    r = 1.7
    x = np.array([r, 0.6])
    gamma = np.asarray(geo.christoffels(x, np.array([1.0])))
    expect = np.zeros((2, 2, 2))
    expect[0, 1, 1] = -r          # Γ^r_θθ = −r
    expect[1, 0, 1] = expect[1, 1, 0] = 1.0 / r  # Γ^θ_rθ = 1/r
    np.testing.assert_allclose(gamma, expect, rtol=1e-13, atol=1e-15)
    # polar coordinates on the flat plane: curvature vanishes identically
    np.testing.assert_allclose(
        np.asarray(geo.riemann(x, np.array([1.0]))), 0.0, atol=1e-13
    )
    assert abs(float(geo.ricci_scalar(x, np.array([1.0])))) < 1e-13


@pytest.mark.parametrize("point", [(0.7, 0.3), (1.2, 2.0), (2.4, 0.1)])
def test_sphere_ricci_scalar(sphere_artifact, point):
    geo = sphere_artifact.geometry
    val = float(geo.ricci_scalar(np.array(point), np.array([1.0])))
    np.testing.assert_allclose(val, 2.0, rtol=1e-12)


def test_hyperbolic_ricci_scalar_and_riemann(hyperbolic_artifact):
    geo = hyperbolic_artifact.geometry
    x = np.array([0.9, 1.4])
    np.testing.assert_allclose(
        float(geo.ricci_scalar(x, np.array([1.0]))), -2.0, rtol=1e-12
    )
    # constant-curvature identity: R^a_{bcd} = K (δ^a_c g_{db} − δ^a_d g_{cb})
    riem = np.asarray(geo.riemann(x, np.array([1.0])))
    g = np.diag([1.0, np.sinh(x[0]) ** 2])
    K = -1.0
    expect = np.zeros((2, 2, 2, 2))
    for a in range(2):
        for b in range(2):
            for c in range(2):
                for d in range(2):
                    expect[a, b, c, d] = K * (
                        (a == c) * g[d, b] - (a == d) * g[c, b]
                    )
    np.testing.assert_allclose(riem, expect, rtol=1e-12, atol=1e-14)


def test_coordinate_hesse_matches_projected(doc_model_artifact):
    """Contracting the coordinate covariant Hesse with the vielbein must
    reproduce the projected Hesse the scan engines evaluate."""
    art = doc_model_artifact
    x, args = np.array([2.0, -2.0]), np.array([1.0])
    h_coord = np.asarray(art.geometry.hesse(x, args))
    basis = np.asarray(art.basis(x, args))  # basis[i]^a, contravariant
    proj = np.einsum("ia,jb,ab->ij", basis, basis, h_coord)
    np.testing.assert_allclose(
        proj, np.asarray(art.hesse(x, args)), rtol=1e-12
    )


def test_geometry_broadcasts_over_grids(hyperbolic_artifact):
    geo = hyperbolic_artifact.geometry
    xs = np.linspace(0.5, 2.0, 7)
    ys = np.zeros(7)
    # constant-curvature space: sympy collapses R to the literal −2, so the
    # lowered callable returns a scalar (like any constant model expression)
    ric = np.asarray(geo.ricci_scalar([xs, ys], np.array([1.0])))
    np.testing.assert_allclose(ric, -2.0, rtol=1e-12)
    gam = np.asarray(geo.christoffels([xs, ys], np.array([1.0])))
    assert gam.shape == (2, 2, 2, 7)
    np.testing.assert_allclose(gam[1, 0, 1], np.cosh(xs) / np.sinh(xs),
                               rtol=1e-12)
    # position-dependent curvature broadcasts over the grid: g = diag(1, x⁴)
    # has R = −4/x² (K = −(√g₂₂)''/√g₂₂ = −2/x²)
    x, y, m = sympy.symbols("xx yy m", positive=True)
    art = _compile([[sympy.Integer(1), 0], [0, x**4]],
                   sympy.Rational(1, 2) * m**2 * (x**2 + y**2), [x, y])
    ric = np.asarray(art.geometry.ricci_scalar([xs, ys], np.array([1.0])))
    assert ric.shape == (7,)
    np.testing.assert_allclose(ric, -4.0 / xs**2, rtol=1e-12)


def test_geometry_on_loaded_bundle(tmp_path, trivial_artifact):
    """Geometry lowers lazily from the model, so loaded bundles get the
    surfaces without any schema change."""
    path = str(tmp_path / "bundle.json")
    trivial_artifact.save(path)
    art = inflatox.CompiledModel.load(path)
    assert float(art.geometry.ricci_scalar(X, ARGS)) == 0.0
