"""Native CPU backend: compiles, and agrees with the JAX path to fp64
tolerance (the cross-backend parity check of SURVEY.md §7 — the native
backend plays the role of the reference's compiled-C/rayon evaluator)."""

import numpy as np
import pytest

from inflatox_tpu.consistency_conditions import GeneralisedAL
from inflatox_tpu.native import NativeModel, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C compiler available"
)

PARAMS = np.array([1.0])
EXTENT = (0.5, 2.5, 0.25, 3.0)


@pytest.fixture(scope="module")
def native(doc_model_artifact):
    return NativeModel(doc_model_artifact.model)


def test_symbol_dictionary_matches(doc_model_artifact, native):
    assert native.symbol_dictionary == doc_model_artifact.symbol_dictionary


def test_point_eval_matches_jax(doc_model_artifact, native):
    al = GeneralisedAL(doc_model_artifact, validate_basis=False)
    x = np.array([2.0, -2.0])
    v, h00, h01, h10, h11, gsq = native.point_eval(x, PARAMS)
    assert np.isclose(v, al.calc_V(x, PARAMS), rtol=1e-12)
    h = al.calc_H(x, PARAMS)
    np.testing.assert_allclose([[h00, h01], [h10, h11]], h, rtol=1e-12)


def test_complete_analysis_matches_jax(doc_model_artifact, native):
    al = GeneralisedAL(doc_model_artifact, validate_basis=False)
    n = (32, 16)
    jax_maps = al.complete_analysis(PARAMS, *EXTENT, *n, progress=False)
    nat_maps = native.complete_analysis(PARAMS, *EXTENT, *n)
    # derived quantities (ε_H, η_∥) amplify rounding through near-
    # cancellations; XLA's faithfully-rounded division leaves isolated
    # elements marginally above 1e-10 — 5e-10 still certifies parity
    for k in range(6):
        np.testing.assert_allclose(
            nat_maps[k], jax_maps[k], rtol=5e-10, equal_nan=True
        )


def test_trajectory_matches_grid(native):
    xs = np.column_stack(
        [np.linspace(0.6, 2.4, 50), np.linspace(0.3, 2.9, 50)]
    )
    ot = native.complete_analysis_ot(PARAMS, xs)
    for i in (0, 17, 49):
        p6 = native.point_eval(xs[i], PARAMS)
        v, v00, _, v10, v11, gsq = p6
        lhs = v11 / v
        rhs = 3 + 3 * (v00 / v10) ** 2 + (v00 / v) * (v10 / v00) ** 2
        cons = min(abs(lhs - rhs) / (abs(lhs) + abs(rhs)), 1.0)
        assert np.isclose(ot[i, 0], cons, rtol=1e-12)


def test_potential_grid(native, doc_model_artifact):
    al = GeneralisedAL(doc_model_artifact, validate_basis=False)
    nat = native.calc_V_grid(PARAMS, *EXTENT, 16, 8)
    jx = al.calc_V_array(PARAMS, EXTENT[::2], EXTENT[1::2], [16, 8])
    np.testing.assert_allclose(nat, jx, rtol=1e-12)


def test_eom_eval(native, doc_model_artifact):
    m = doc_model_artifact
    x = np.array([2.0, 1.5])
    xd = np.array([0.1, -0.2])
    out = native.eom_eval(x, xd, PARAMS)
    want_eom = [float(v) for v in m.eom(x, xd, PARAMS)]
    np.testing.assert_allclose(out[:2], want_eom, rtol=1e-10)
    assert np.isclose(out[2], float(m.eom_h(x, xd, PARAMS)), rtol=1e-10)
    assert np.isclose(out[3], float(m.eom_hdot(x, xd, PARAMS)), rtol=1e-10)


def test_rapidturn_refstyle_matches_jax(native, doc_model_artifact):
    """New in round 3 (BASELINE cfg3 measurement engine)."""
    al = GeneralisedAL(doc_model_artifact, validate_basis=False)
    want = al.consistency_rapidturn(PARAMS, *EXTENT, 24, 24, progress=False)
    got = native.consistency_rapidturn_refstyle(PARAMS, *EXTENT, 24, 24)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_native_solver_matches_jax(native, doc_model_artifact):
    """The C RKF45 solver (BASELINE cfg5b measurement engine) reproduces
    background.solve_eom — same tableau, same step control — to fp64
    round-off over a short trajectory."""
    from inflatox_tpu.background import solve_eom

    steps = 200
    x0 = np.array([2.0, 2.0])
    chi0 = np.array([0.0, 0.0])
    want, t_want = solve_eom(doc_model_artifact, PARAMS, steps, x0, chi0,
                             solver="rkf", return_time=True)
    got = native.solve_eom_rkf(PARAMS, np.array([[2.0, 2.0, 0.0, 0.0]]),
                               steps)
    # adaptive dt makes round-off compound multiplicatively over the
    # trajectory: agreement is same-algorithm-grade, not bit-exact
    np.testing.assert_allclose(got[0, :, :5], want, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(got[0, :, 5], t_want, rtol=1e-6, atol=1e-12)
    # time increases, H decreases on an inflating background
    assert np.all(np.diff(got[0, :, 5]) > 0)
    assert got[0, -1, 4] < got[0, 0, 4]


def test_native_oracle_covers_extended_function_family():
    """The C oracle and the XLA engine agree on a model using the round-3
    function-coverage additions (erf + asinh) — C99 libm provides them
    natively, the JAX path through the accmath/printer additions."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    x, y, m = sympy.symbols("x y m", real=True)
    g = [[sympy.Integer(1), 0], [0, sympy.Integer(1)]]
    V = (m * x) ** 2 * (1 + sympy.erf(y)) + sympy.asinh(y) ** 2
    model = inflatox.InflationModelBuilder.new([x, y], g, V, silent=True).build()
    art = inflatox.Compiler(model, silent=True).compile()
    nm = NativeModel(model)
    args = np.array([1.0])
    nat = np.asarray(nm.complete_analysis(args, 0.5, 2.0, 0.3, 1.5, 16, 16))
    alx = np.asarray(
        GeneralisedAL(art, validate_basis=False).complete_analysis(
            args, 0.5, 2.0, 0.3, 1.5, 16, 16, engine="xla"
        )
    )
    np.testing.assert_array_equal(np.isfinite(nat), np.isfinite(alx))
    both = np.isfinite(nat)
    np.testing.assert_allclose(nat[both], alx[both], rtol=1e-11)


def test_native_oracle_covers_gsl_hyp_gamma_family():
    """Round 4: the C oracle grows the reference's full GSL printer family
    (hyp0f1/1f1/2f1/2f0 series helpers + digamma/trigamma for the gamma
    derivatives; libm erf/tgamma) so hyp/erf/gamma models have the same
    ref-style 32-core baseline every other model class has."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    x, y, a = sympy.symbols("x y a", real=True)
    half, threehalf, fivehalf = (sympy.Rational(1, 2),
                                 sympy.Rational(3, 2), sympy.Rational(5, 2))
    V = (a * sympy.hyper((half,), (threehalf,), -(x**2))
         + sympy.hyper((half, threehalf), (fivehalf,), y**2 / 4) / 10
         + sympy.erf(x) * sympy.gamma(y + 2) / 50 + 2)
    model = inflatox.InflationModelBuilder.new(
        [x, y], [[1, 0], [0, 1]], V, silent=True, simplify=False,
        assertions=False,
    ).build()
    art = inflatox.Compiler(model, silent=True).compile()
    nm = NativeModel(model)
    args = np.array([2.0])
    nat = np.asarray(nm.complete_analysis(args, 0.3, 2.0, 0.2, 1.2, 12, 12))
    alx = np.asarray(
        GeneralisedAL(art, validate_basis=False).complete_analysis(
            args, 0.3, 2.0, 0.2, 1.2, 12, 12, engine="xla"
        )
    )
    np.testing.assert_array_equal(np.isfinite(nat), np.isfinite(alx))
    both = np.isfinite(nat)
    rel = np.abs(nat[both] - alx[both]) / np.maximum(np.abs(alx[both]), 1e-300)
    # same conditioning caveat as the df64 parity test: the consistency
    # ratio passes through 1 in this window
    assert np.quantile(rel, 0.95) < 1e-11
    assert rel.max() < 1e-7
