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
