"""Behavioral tests for the conditions API: grid conventions, scan parity
between grid and trajectory paths, input validation, and the coverage the
reference lacks (flag_quantum_dif, epsilon_v, consistency, hesse_array,
validate_basis_on_domain — SURVEY.md §4)."""

import numpy as np
import pytest

from inflatox_tpu.consistency_conditions import GeneralisedAL, InflationCondition
from inflatox_tpu.utils.errors import ShapeError


@pytest.fixture(scope="module")
def al(doc_model_artifact):
    return GeneralisedAL(doc_model_artifact, validate_basis=False)


PARAMS = np.array([1.0])
EXTENT = (0.5, 2.5, 0.25, 3.0)


def _grid_points(extent, n0, n1):
    """Endpoint-exclusive grid convention (anguelova.rs:84-94)."""
    x0a, x0b, x1a, x1b = extent
    xs = x0a + np.arange(n0) * (x0b - x0a) / n0
    ys = x1a + np.arange(n1) * (x1b - x1a) / n1
    return np.meshgrid(xs, ys, indexing="ij")


def test_calc_v_array_grid_convention(al):
    n = [7, 9]
    got = al.calc_V_array(PARAMS, [0.5, 0.25], [2.5, 3.0], n)
    assert got.shape == (7, 9)
    xg, yg = _grid_points(EXTENT, *n)
    want = 0.5 * (yg**2 - 2.0 / (3.0 * xg**2))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_calc_h_array_matches_pointwise(al):
    n = [5, 4]
    arr = al.calc_H_array(PARAMS, *EXTENT, N=n)
    assert arr.shape == (2, 2, 5, 4)
    xg, yg = _grid_points(EXTENT, *n)
    h_point = al.calc_H(np.array([xg[2, 3], yg[2, 3]]), PARAMS)
    np.testing.assert_allclose(arr[:, :, 2, 3], h_point, rtol=1e-12)


def test_complete_analysis_matches_trajectory_variant(al):
    """Grid scan and on-trajectory scan must produce identical values at
    identical points (they share the point ops, anguelova.rs:99-171)."""
    n = (6, 5)
    grids = al.complete_analysis(PARAMS, *EXTENT, *n, progress=False)
    xg, yg = _grid_points(EXTENT, *n)
    traj = np.column_stack([xg.ravel(), yg.ravel()])
    ot = al.complete_analysis_ot(PARAMS, traj, progress=False)
    for k in range(6):
        np.testing.assert_allclose(
            ot[k].ravel(), grids[k].ravel(), rtol=1e-12, equal_nan=True
        )


def test_consistency_variants_against_formulas(al):
    """Check every scan against straight-line numpy evaluation of the
    reference formulas on a small grid."""
    n = (4, 3)
    xg, yg = _grid_points(EXTENT, *n)
    pts = np.column_stack([xg.ravel(), yg.ravel()])
    v = np.array([al.calc_V(p, PARAMS) for p in pts]).reshape(n)
    h = np.array([al.calc_H(p, PARAMS) for p in pts]).reshape(n + (2, 2))
    v00, v10, v11 = h[..., 0, 0], h[..., 1, 0], h[..., 1, 1]

    lhs = v11 / v - 3.0
    rhs = 3.0 * (v00 / v10) ** 2 + (v00 / v) * (v10 / v00) ** 2
    want = np.abs(np.abs(lhs) - np.abs(rhs)) / (np.abs(lhs) + np.abs(rhs))
    got = al.consistency(PARAMS, *EXTENT, *n, progress=False)
    np.testing.assert_allclose(got, want, rtol=1e-10)

    lhs_rt = v11 / v
    rhs_rt = 3.0 * (v10 / v00) ** 2
    want_rt = np.abs(np.abs(lhs_rt) - np.abs(rhs_rt)) / (
        np.abs(lhs_rt) + np.abs(rhs_rt)
    )
    got_rt = al.consistency_rapidturn(PARAMS, *EXTENT, *n, progress=False)
    np.testing.assert_allclose(got_rt, want_rt, rtol=1e-10)


def test_epsilon_v_has_half_factor(al):
    """epsilon_v (standalone) includes the ½; the complete_analysis ε_V does
    not — the reference's shipped discrepancy (anguelova.rs:119 vs 138-140)."""
    n = (4, 4)
    eps_alone = al.epsilon_v(PARAMS, *EXTENT, *n, progress=False)
    maps = al.complete_analysis(PARAMS, *EXTENT, *n, progress=False)
    eps_in_complete = maps[1]
    np.testing.assert_allclose(eps_alone * 2.0, eps_in_complete, rtol=1e-12)


def test_flag_quantum_dif(trivial_artifact):
    """∇V = (2m₁²φ₁, 2m₂²φ₂) vanishes only at the origin."""
    al = GeneralisedAL(trivial_artifact, validate_basis=False)
    args = np.array([1.0, 1.0])
    # grid includes the origin exactly: start=-1, 4 points, spacing 0.5
    mask = al.flag_quantum_dif(
        args, -1.0, 1.0, -1.0, 1.0, 4, 4, progress=False, accuracy=1e-3
    )
    assert mask.dtype == bool
    assert mask.sum() == 1
    assert mask[2, 2]  # the origin


def test_flag_quantum_dif_engine_parity(trivial_artifact):
    """flag_quantum_dif honors engine= like its four grid siblings (round 4,
    VERDICT r3 item 7): the compensated engines threshold the Pallas
    "gradient" maps and must reproduce the XLA mask exactly."""
    al = GeneralisedAL(trivial_artifact, validate_basis=False)
    args = np.array([1.0, 1.0])
    ref = al.flag_quantum_dif(
        args, -1.0, 1.0, -1.0, 1.0, 4, 4, progress=False, accuracy=1e-3,
        engine="xla",
    )
    got = al.flag_quantum_dif(
        args, -1.0, 1.0, -1.0, 1.0, 4, 4, progress=False, accuracy=1e-3,
        engine="pallas_df64",
    )
    assert got.dtype == bool
    np.testing.assert_array_equal(got, ref)
    with pytest.raises(ValueError, match="unknown engine"):
        al.flag_quantum_dif(
            args, -1.0, 1.0, -1.0, 1.0, 4, 4, progress=False,
            engine="nope",
        )


def test_engine_probe_cache_coarsened(al, monkeypatch):
    """A windowed-scan loop stepping the extent triggers ONE range probe
    (round 4, VERDICT r3 weak #8): the probe cache keys on the quantized
    magnitude envelope, not exact extent bytes."""
    import inflatox_tpu.ops.pallas_kernels as pk

    calls = []
    real = pk.eager_engine_probe

    def counting(*a, **k):
        calls.append(a[1])
        return real(*a, **k)

    monkeypatch.setattr(pk, "eager_engine_probe", counting)
    al._engine_probe_cache = {}
    args = np.array([1.0])
    choice = al._auto_compensated_engine(
        "complete_analysis", args, extent=(0.5, 2.5, 0.25, 3.0)
    )
    assert choice == "pallas_df64"
    first_miss = len(calls)  # one miss = 1-2 probe evals (df + maybe edf)
    for shift in np.linspace(0.05, 0.2, 4):
        choice = al._auto_compensated_engine(
            "complete_analysis", args,
            extent=(0.5 + shift, 2.5 + shift, 0.25, 3.0),
        )
        assert choice == "pallas_df64"
    assert len(calls) == first_miss  # windowed loop: zero extra probes
    # a genuinely different magnitude envelope re-probes
    al._auto_compensated_engine(
        "complete_analysis", args, extent=(50.0, 250.0, 0.25, 3.0)
    )
    assert len(calls) > first_miss


def test_wrong_param_count_raises(al):
    with pytest.raises(ShapeError):
        al.complete_analysis(np.array([1.0, 2.0]), *EXTENT, 4, 4, progress=False)
    with pytest.raises(ShapeError):
        al.calc_V(np.array([1.0, 1.0]), np.array([]))


def test_wrong_x_shape_raises(al):
    with pytest.raises(ShapeError):
        al.calc_V(np.array([1.0, 1.0, 1.0]), PARAMS)


def test_trajectory_shape_validation(al):
    with pytest.raises(ShapeError):
        al.consistency_ot(PARAMS, np.zeros((5, 3)), progress=False)


def test_validate_basis_on_domain(al):
    # hyperinflation basis is orthonormal wherever r != 0
    al.validate_basis_on_domain(PARAMS, [0.5, 0.25], [2.5, 3.0], N=5)


def test_validate_basis_detects_broken_model(doc_model_artifact):
    """A model constructed with a non-orthonormal basis must be rejected at
    load time (lib.rs:142-203 semantics)."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.utils.errors import BasisNormError

    model = doc_model_artifact.model
    broken = inflatox.InflationModel(
        model_name="broken",
        coordinates=model.coordinates,
        tangents=model.coordinate_tangents,
        basis=[[sympy.Integer(2), sympy.Integer(0)], [sympy.Integer(0), sympy.Integer(1)]],
        eom_fields=model.eom_fields,
        eom_h=model.eom_h,
        eom_hdot=model.eom_hdot,
        potential=model.potential,
        metric=model.metric,
        gradient_square=model.gradient_square,
        hesse_cmp=model.hesse_cmp,
    )
    artifact = inflatox.Compiler(broken, silent=True).compile()
    with pytest.raises(BasisNormError):
        InflationCondition(artifact, validate_basis=True)


def test_two_field_requirement(doc_model_artifact):
    """Single-field models must be rejected by AL scans (the intended check
    of anguelova.rs:55-65, inert in the reference due to a `!x == 2` bug)."""
    import sympy

    import inflatox_tpu as inflatox

    phi, m = sympy.symbols("phi m")
    model = inflatox.InflationModelBuilder.new(
        [phi], [[sympy.Integer(1)]], m**2 * phi**2, silent=True
    ).build(guesses=[])
    art = inflatox.Compiler(model, silent=True).compile()
    al1 = GeneralisedAL(art, validate_basis=False)
    with pytest.raises(ShapeError):
        al1.complete_analysis(np.array([1.0]), 0, 1, 0, 1, 4, 4, progress=False)


def test_compiled_model_save_load(doc_model_artifact, tmp_path):
    """Compile-once / scan-many across processes (SURVEY.md §5 checkpoint)."""
    from inflatox_tpu.compiler import CompiledModel

    p = tmp_path / "bundle.json"
    doc_model_artifact.save(str(p))
    restored = CompiledModel.load(str(p))
    assert restored.symbol_dictionary == doc_model_artifact.symbol_dictionary
    al2 = GeneralisedAL(restored, validate_basis=False)
    v = al2.calc_V(np.array([2.0, -2.0]), PARAMS)
    assert np.isclose(v, 1.9166666666666667, rtol=1e-12)


def test_schema_version_guard(doc_model_artifact, tmp_path):
    import json

    from inflatox_tpu.compiler import CompiledModel
    from inflatox_tpu.utils.errors import SchemaVersionError

    p = tmp_path / "bundle.json"
    doc_model_artifact.save(str(p))
    bundle = json.loads(p.read_text())
    bundle["schema_version"] = "99.0.0"
    p.write_text(json.dumps(bundle))
    with pytest.raises(SchemaVersionError):
        CompiledModel.load(str(p))


def test_calc_H_array_nd_three_fields():
    """n-field Hesse grid evaluation (hesse_bindings.rs:113-193 capability;
    VERDICT round-1 missing item 4)."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.consistency_conditions import InflationCondition

    a, b, c, m = sympy.symbols("a b c m")
    V = sympy.Rational(1, 2) * m**2 * (a**2 + 2 * b**2 + 3 * c**2)
    g = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    model = inflatox.InflationModelBuilder.new(
        [a, b, c], g, V, silent=True
    ).build(guesses=[[0, 1, 0], [0, 0, 1]])
    art = inflatox.Compiler(model, silent=True).compile()
    cond = InflationCondition(art, validate_basis=False)
    H = cond.calc_H_array_nd(
        np.array([1.0]), [0.5, 0.5, 0.5], [1.5, 1.5, 1.5], [4, 5, 6]
    )
    assert H.shape == (3, 3, 4, 5, 6)
    assert np.isfinite(H).all()
    # cross-check one point against the point evaluator
    pt = np.array([0.5, 0.5, 0.5])
    np.testing.assert_allclose(H[:, :, 0, 0, 0], cond.calc_H(pt, np.array([1.0])),
                               rtol=1e-12)
    # the 2-field signature keeps rejecting n-field models
    with pytest.raises(Exception):
        cond.calc_H_array(np.array([1.0]), 0.0, 1.0, 0.0, 1.0, [4, 4])


def test_v_h_array_pallas_engines(al):
    """calc_V_array / calc_H_array honor engine= (round 2: raw V/H grid
    surfaces gained the compensated Pallas engines; reference default
    sampling is 8000²/axis where emulated f64 is ~7× slower)."""
    args = np.array([1.0])
    ref_v = al.calc_V_array(args, [0.5, 0.25], [2.5, 3.0], N=[16, 16],
                                engine="xla")
    got_v = al.calc_V_array(args, [0.5, 0.25], [2.5, 3.0], N=[16, 16],
                                engine="pallas_df64")
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-12)
    ref_h = al.calc_H_array(args, 0.5, 2.5, 0.25, 3.0, N=[16, 16])
    got_h = al.calc_H_array_nd(args, [0.5, 0.25], [2.5, 3.0], N=[16, 16],
                                   engine="pallas_df64")
    assert got_h.shape == (2, 2, 16, 16)
    np.testing.assert_allclose(got_h, ref_h, rtol=1e-11)


def test_basis_triage_warn_respects_scan_order(al, monkeypatch, capsys):
    """NaN warnings past the first violation (in the reference's point-major
    scan order) must be suppressed even when the violation lives in a later
    (i, j) pair than the NaN (two-pass triage, round-2 review fix)."""
    import jax.numpy as jnp

    from inflatox_tpu.utils.errors import BasisNormError

    n = 12
    ip00 = np.ones(n)
    ip01 = np.zeros(n)
    ip11 = np.ones(n)
    ip00[10] = np.nan  # NaN at point 10 in the FIRST pair scanned...
    ip11[5] = 7.0      # ...but the violation is at point 5 in a LATER pair

    def fake_ips(xs, p):
        return {
            (0, 0): jnp.asarray(ip00),
            (0, 1): jnp.asarray(ip01),
            (1, 1): jnp.asarray(ip11),
        }

    monkeypatch.setattr(al, "_basis_inner_products", fake_ips)
    xs = (np.linspace(0, 1, n), np.linspace(0, 1, n))
    with pytest.raises(BasisNormError):
        al._check_basis_points(xs, np.array([1.0]), accuracy=1e-3)
    err = capsys.readouterr().err
    # the reference's scan raises at point 5 and never reaches point 10:
    # no NaN warning may be emitted for it
    assert "Norm of basisvector" not in err


def test_scan_output_formats(al):
    """output= on the user-facing scans: "pair" and "f64_device" are the
    compensated engines' device-resident formats; every other engine only
    produces plain f64 (off-TPU the df64 engine runs its eager fallback,
    same contract)."""
    n = (16, 16)
    ref = al.complete_analysis(PARAMS, *EXTENT, *n, progress=False,
                               engine="pallas_df64")
    pair = al.complete_analysis(PARAMS, *EXTENT, *n, progress=False,
                                engine="pallas_df64", output="pair")
    dev = al.complete_analysis(PARAMS, *EXTENT, *n, progress=False,
                               engine="pallas_df64", output="f64_device")
    assert len(ref) == len(pair) == len(dev) == 6
    for k in range(6):
        hi, lo = pair[k]
        assert hi.dtype == np.float32 and lo.dtype == np.float32
        rec = np.add(np.asarray(hi), np.asarray(lo), dtype=np.float64)
        np.testing.assert_allclose(rec, ref[k], rtol=1e-13, atol=1e-300)
        np.testing.assert_allclose(np.asarray(dev[k]), ref[k],
                                   rtol=1e-13, atol=1e-300)

    # single-output scans return the bare format
    eps_ref = al.epsilon_v(PARAMS, *EXTENT, *n, progress=False,
                           engine="pallas_df64")
    hi, lo = al.epsilon_v(PARAMS, *EXTENT, *n, progress=False,
                          engine="pallas_df64", output="pair")
    np.testing.assert_allclose(
        np.add(np.asarray(hi), np.asarray(lo), dtype=np.float64),
        eps_ref, rtol=1e-13,
    )

    # non-compensated engines reject device-resident formats
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compensated"):
        al.complete_analysis(PARAMS, *EXTENT, *n, progress=False,
                             engine="xla", output="pair")
    with _pytest.raises(ValueError, match="compensated"):
        al.consistency(PARAMS, *EXTENT, *n, progress=False,
                       engine="pallas", output="f64_device")
