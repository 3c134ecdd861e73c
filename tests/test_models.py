"""Integration tests on the three physics model families of the reference
suite (tests/test_angular.py, test_egno.py, test_d5.py): angular inflation
(JCAP11(2019)002), EGNO supergravity (JCAP08(2014)044), and the D5-brane
model (JCAP02(2015)127 / JCAP01(2020)020).

Each runs the full pipeline — symbolic build, lowering, potential grid,
complete analysis, on-trajectory analysis on the shipped trajectory data,
and the original rapid-turn condition — at the reference's CI grid scales.
The trajectory files under tests/trajectories/ are the reference's data
fixtures (numerical data, reused verbatim).

Beyond the reference's smoke-level assertions, each model checks lowering
parity against 50-digit sympy evaluation at sample points (≤1e-10 relative,
the BASELINE.json target).
"""

import os

import numpy as np
import pytest
import sympy

import inflatox_tpu as inflatox
from inflatox_tpu.consistency_conditions import GeneralisedAL

TRAJ = os.path.join(os.path.dirname(os.path.abspath(__file__)), "trajectories")


def _check_lowering_parity(artifact, args, points, rtol=1e-10):
    """Compare V and the projected Hesse against high-precision sympy."""
    model = artifact.model
    syms = list(model.coordinates)
    param_syms = {}
    for name, slot in artifact.symbol_dictionary.items():
        if slot.startswith("args["):
            idx = int(slot[5:-1])
            param_syms[sympy.Symbol(name)] = float(args[idx])
    al = GeneralisedAL(artifact, validate_basis=False)
    for pt in points:
        subs = dict(zip(syms, [float(v) for v in pt]))
        subs.update(param_syms)
        v_ref = float(model.potential.evalf(50, subs=subs))
        v_got = al.calc_V(np.asarray(pt, dtype=float), np.asarray(args))
        assert abs(v_got - v_ref) <= rtol * max(abs(v_ref), 1e-290), (
            f"V parity failed at {pt}: {v_got} vs {v_ref}"
        )
        h_got = al.calc_H(np.asarray(pt, dtype=float), np.asarray(args))
        for a in range(2):
            for b in range(2):
                h_ref = float(model.hesse_cmp[a][b].evalf(50, subs=subs))
                assert abs(h_got[a, b] - h_ref) <= rtol * max(abs(h_ref), 1e-290), (
                    f"H[{a}{b}] parity failed at {pt}: {h_got[a, b]} vs {h_ref}"
                )


def _check_parity_vs_native(artifact, args, points, rtol=1e-10, hesse_atol=0.0):
    """Cross-backend parity: JAX lowering vs the native C backend — both
    evaluate the identical expressions in f64, which is exactly the
    reference-parity contract (compiled-C/rayon path, BASELINE.json).

    ``hesse_atol``: absolute floor for Hesse entries whose unsimplified
    expressions cancel large terms down to tiny values — there the two f64
    evaluations (different but both correct summation orders) can only agree
    to ~1e-13 × term magnitude, regardless of implementation."""
    from inflatox_tpu.native import NativeModel, native_available

    if not native_available():
        pytest.skip("no C compiler for the native-backend oracle")
    # -O1: same IEEE results, far faster gcc on the giant D5 sources
    native = NativeModel(artifact.model, silent=True, opt="-O1")
    al = GeneralisedAL(artifact, validate_basis=False)
    for pt in points:
        x = np.asarray(pt, dtype=float)
        v, h00, h01, h10, h11, gsq = native.point_eval(x, np.asarray(args))
        v_j = al.calc_V(x, np.asarray(args))
        assert abs(v_j - v) <= rtol * max(abs(v), 1e-290), (pt, v_j, v)
        h_j = al.calc_H(x, np.asarray(args))
        np.testing.assert_allclose(
            h_j,
            [[h00, h01], [h10, h11]],
            rtol=rtol,
            atol=hesse_atol,
            err_msg=str(pt),
        )


@pytest.fixture(scope="module")
def angular_artifact():
    from inflatox_tpu.models import angular

    model, _ = angular()
    return inflatox.Compiler(model, cleanup=False, cse=True, silent=True).compile()


def test_angular(angular_artifact):
    """Reference parity: tests/test_angular.py:35-87.

    Basis validation runs on a deterministic safe domain instead of the
    constructor's 100 random points: the angular metric is singular on the
    unit circle, and a random point near it makes the norm check flaky —
    the reference suite has exactly this latent flake (its random points
    also hit |φ|² → 1)."""
    al = GeneralisedAL(angular_artifact, validate_basis=False)
    a = 1 / 600
    m_phi = 2e-5
    m_chi = m_phi * np.sqrt(9)
    args = np.array([a, m_chi, m_phi])
    # the reference passes args as [alpha, m_chi, m_phi]: check our symbol
    # registration produced the same ordering
    sd = angular_artifact.symbol_dictionary
    assert sd["alpha"] == "args[0]" and sd["m_chi"] == "args[1]", sd

    al.validate_basis_on_domain(args, [-0.6, -0.6], [0.6, 0.6], N=7)

    extent = (-1.05, 1.05, -1.05, 1.05)
    N = 64

    v_grid = al.calc_V_array(args, [-15.0, -5.0], [15.0, 5.0], [N, N])
    assert v_grid.shape == (N, N)
    assert np.all(np.isfinite(v_grid))

    maps = al.complete_analysis(args, *extent, N, N, progress=False)
    assert np.nanmax(maps[0]) <= 1.0

    tx = np.load(f"{TRAJ}/angular_phix.npy")
    ty = np.load(f"{TRAJ}/angular_phiy.npy")
    trajectory = np.column_stack((tx, ty))
    ot = al.complete_analysis_ot(args, trajectory, progress=False)
    assert ot[0].shape == (len(trajectory), 1)
    assert np.isfinite(ot[0]).all()

    rt = al.consistency_rapidturn(args, *extent, N, N, progress=False)
    assert rt.shape == (N, N)


def test_angular_lowering_parity(angular_artifact):
    args = np.array([1 / 600, 6e-5, 2e-5])
    pts = [(0.3, 0.4), (-0.7, 0.2), (0.05, -0.9), (0.5, 0.5)]
    _check_lowering_parity(angular_artifact, args, pts)


@pytest.fixture(scope="module")
def egno_artifact():
    """EGNO supergravity (reference tests/test_egno.py:39-75).  Loads the
    committed serialized bundle when present (tests the load path and skips
    the multi-minute sympy build); regenerate via inflatox_tpu.models.egno()
    + artifact.save()."""
    bundle = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixtures", "egno_bundle.json")
    if os.path.exists(bundle):
        from inflatox_tpu.compiler import CompiledModel

        return CompiledModel.load(bundle)
    from inflatox_tpu.models import egno

    model, _ = egno()
    return inflatox.Compiler(model, silent=True, cse=True).compile()


def test_egno(egno_artifact):
    """Reference parity: tests/test_egno.py:77-105."""
    al = GeneralisedAL(egno_artifact)
    args_by_name = {"m": 1e-3, "a": 0.5, "c": 1000.0, "alpha": 1.0}
    args = np.zeros(egno_artifact.n_parameters)
    for name, slot in egno_artifact.symbol_dictionary.items():
        if slot.startswith("args["):
            args[int(slot[5:-1])] = args_by_name[name]

    th_start, th_stop = 0.0, np.pi
    extent = (0.46, 0.50, th_start, th_stop)
    n_r, n_th = 100, 50

    v_grid = al.calc_V_array(args, [0.45, th_start], [0.55, th_stop], [n_r, n_th])
    assert np.all(np.isfinite(v_grid))
    assert np.all(v_grid >= 0)

    maps = al.complete_analysis(args, *extent, n_r, n_th, progress=False)
    assert np.nanmax(maps[0]) <= 1.0

    tr = np.load(f"{TRAJ}/egno_r.npy")
    tth = np.load(f"{TRAJ}/egno_theta.npy")
    trajectory = np.column_stack((tr, tth))
    ot = al.complete_analysis_ot(args, trajectory, progress=False)
    assert np.isfinite(ot[0]).all()

    al.consistency_rapidturn(args, *extent, n_r, n_th, progress=False)


def test_egno_lowering_parity(egno_artifact):
    """Parity vs the native C backend (true IEEE f64 on the same
    expressions — the BASELINE.json oracle).  A 50-digit-sympy comparison is
    the wrong test here: the unsimplified Kähler-metric Hesse components are
    ill-conditioned, so *any* f64 evaluation (the reference's compiled C
    included) deviates from infinite precision by more than 1e-10."""
    args = np.zeros(egno_artifact.n_parameters)
    by_name = {"m": 1e-3, "a": 0.5, "c": 1000.0, "alpha": 1.0}
    for name, slot in egno_artifact.symbol_dictionary.items():
        if slot.startswith("args["):
            args[int(slot[5:-1])] = by_name[name]
    pts = [(0.47, 0.5), (0.49, 2.0), (0.46, 3.0)]
    # EGNO Hesse entries (~1e-6) are differences of O(0.1) terms: f64
    # summation-order noise is ~1e-14 absolute
    _check_parity_vs_native(egno_artifact, args, pts, hesse_atol=1e-12)


@pytest.fixture(scope="module")
def d5_artifact():
    """D5-brane model (reference tests/test_d5.py:36-141).  Loads the
    committed bundle when present (see egno_artifact)."""
    bundle = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixtures", "d5_bundle.json")
    if os.path.exists(bundle):
        from inflatox_tpu.compiler import CompiledModel

        return CompiledModel.load(bundle)
    from inflatox_tpu.models import d5

    model, _ = d5()
    return inflatox.Compiler(model, silent=True, cse=True).compile()


def _d5_args(artifact):
    from inflatox_tpu.models import _args_by_symbol

    return _args_by_symbol(
        artifact.model,
        {
            "V0": -1.17e-8, "N": 1000.0, "g_s": 0.01, "l_s": 501.961,
            "u": 50 * 501.961, "q": 1.0, "p": 5.0,
            "a0": 0.001, "a1": 0.0005, "b1": 0.001,
        },
    )


def test_d5(d5_artifact):
    """Reference parity: tests/test_d5.py:141-173."""
    assert d5_artifact.n_parameters == 10
    al = GeneralisedAL(d5_artifact)
    args = _d5_args(d5_artifact)

    r_start, r_stop = 0.0, 36.0
    th_start, th_stop = 0.0, 4 * np.pi
    extent = (r_start, r_stop, th_start, th_stop)
    N = 32

    v_grid = al.calc_V_array(args, [r_start, th_start], [r_stop, th_stop], [N, N])
    assert v_grid.shape == (N, N)

    maps = al.complete_analysis(args, *extent, N, N, progress=False)
    assert np.nanmax(maps[0]) <= 1.0

    trajectory = np.loadtxt(f"{TRAJ}/d5_trajectory.dat")
    ot = al.complete_analysis_ot(args, trajectory, progress=False)
    assert ot[0].shape == (len(trajectory), 1)

    # rapid-turn scan coverage for giant models lives in test_egno (tracing
    # another full D5 graph costs minutes and adds nothing)


def test_d5_lowering_parity(d5_artifact):
    """Parity vs the native C backend (see test_egno_lowering_parity)."""
    args = _d5_args(d5_artifact)
    pts = [(10.0, 1.0), (25.0, 6.0), (5.0, 11.0)]
    # D5 magnitudes span ~20 decades; scale the cancellation floor by |V|
    v_scale = abs(
        GeneralisedAL(d5_artifact, validate_basis=False).calc_V(
            np.array([10.0, 1.0]), args
        )
    )
    _check_parity_vs_native(
        d5_artifact, args, pts, hesse_atol=1e-12 * max(v_scale, 1.0)
    )


def test_model_zoo_hyperinflation(doc_model_artifact):
    """The model zoo's flagship matches the conftest fixture."""
    import inflatox_tpu as inflatox
    from inflatox_tpu.models import hyperinflation

    model, args = hyperinflation()
    art = inflatox.Compiler(model, silent=True).compile()
    assert art.symbol_dictionary == doc_model_artifact.symbol_dictionary
    al = GeneralisedAL(art, validate_basis=False)
    assert np.isclose(
        al.calc_V(np.array([2.0, -2.0]), args), 1.9166666666666667, rtol=1e-12
    )


def test_model_zoo_natural():
    """Natural-inflation zoo model: concave hilltop region with η_V < 0
    (what makes Planck-like (n_s, r) reachable — examples/fit_observables.py)
    and correct analytic slow-roll on the axion axis."""
    import inflatox_tpu as inflatox
    from inflatox_tpu.models import natural
    from inflatox_tpu import observables

    model, args = natural()
    art = inflatox.Compiler(model, silent=True).compile()
    slot = art.lookup_symbol(sympy.Symbol("f_a"))
    fa = float(args[int(slot[slot.index("[") + 1 : -1])])
    assert fa == 5.73
    # on the phi_2 = 0 axis: eps_V = (1-c)/(2 fa^2 (1+c)), eta_V = -c/(fa^2 (1+c))
    # with c = cos(phi_1/fa) -- concave (eta < 0) for c > 0
    phi1 = 0.8 * fa
    c = np.cos(phi1 / fa)
    sr = observables.slow_roll(art)(np.array([phi1, 0.0]), args)
    np.testing.assert_allclose(
        float(sr["epsilon_v"]), (1 - c) / (2 * fa**2 * (1 + c)), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(sr["eta_v"]), -c / (fa**2 * (1 + c)), rtol=1e-12
    )
    assert float(sr["eta_v"]) < 0


def test_model_zoo_alpha_attractor():
    """α-attractor T-model zoo entry: constant hyperbolic curvature
    R = −4/(3α) through the geometry layer, and the universal large-N
    predictions n_s ≈ 1 − 2/N, r ≈ 12α/N² at the horizon-exit point
    (Kallosh–Linde) from a full background solve."""
    import inflatox_tpu as inflatox
    from inflatox_tpu.models import alpha_attractor
    from inflatox_tpu import background, observables

    model, args = alpha_attractor()
    art = inflatox.Compiler(model, silent=True).compile()
    np.testing.assert_allclose(
        float(art.geometry.ricci_scalar([0.3, 0.7], args)), -4.0 / 3.0,
        rtol=1e-12,
    )
    rows, times = background.solve_eom(
        art, args, 3000, [0.99, 0.5], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    info = observables.horizon_exit(art, rows, times, args, N_before_end=55.0)
    assert info["N_end"] > 60.0
    np.testing.assert_allclose(info["n_s"], 1.0 - 2.0 / 55.0, atol=0.002)
    np.testing.assert_allclose(info["r"], 12.0 / 55.0**2, rtol=0.05)


def test_model_zoo_double_quadratic():
    """Double-inflation zoo entry: two-stage background and genuine
    super-horizon feeding of ζ — scales crossing during the heavy stage
    gain power as the light field takes over.  The transport and δN
    routes (independent formalisms) must agree through the feeding
    region, the feeding must be substantial for early pivots and absent
    for late ones, and the entropic mode must be dead at the end
    (T_SS ≈ 0 — the growth-based T_RS fallback path)."""
    import inflatox_tpu as inflatox
    from inflatox_tpu import background, perturbations
    from inflatox_tpu.models import double_quadratic

    model, args = double_quadratic()
    art = inflatox.Compiler(model, silent=True).compile()
    rows, times = background.solve_eom(
        art, args, 4000, [12.0, 12.0], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    kw = dict(pivots=5, N_margin_start=6.0, N_margin_end=8.0)
    tr = perturbations.transport_spectrum(
        art, args, rows, times, dense_steps=1200, tail_steps=500, **kw
    )
    dn = perturbations.delta_n_spectrum(art, args, rows, times,
                                        steps=4000, **kw)
    np.testing.assert_allclose(tr["P_zeta"], dn["P_zeta"], rtol=0.08)
    feeding = tr["P_zeta"] / tr["P_zeta_star"]
    assert np.all(feeding[:3] > 1.8), feeding       # heavy-stage pivots fed
    np.testing.assert_allclose(feeding[-1], 1.0, atol=0.05)  # light stage
    np.testing.assert_allclose(tr["T_SS"], 0.0, atol=1e-3)   # S decayed
    assert np.all(np.isfinite(tr["T_RS"]))
    assert np.all(tr["T_RS"][:3] > 0.5)             # growth-based transfer
    np.testing.assert_allclose(tr["T_RS"][-1], 0.0, atol=0.2)
