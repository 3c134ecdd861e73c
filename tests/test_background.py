"""Background-solver correctness (coverage the reference lacks entirely —
its solve_eom entry point is broken as shipped, SURVEY.md §2.1/§4).

Validation strategy per SURVEY.md §7.2 item 5: compare against scipy's
reference integrator on the same ODE system, and check the Friedmann
constraint is preserved along the trajectory."""

import numpy as np
import pytest

from inflatox_tpu import background


@pytest.fixture(scope="module")
def trivial(trivial_artifact):
    return trivial_artifact


ARGS = np.array([1.0, 1.0])  # m_1, m_2
X0 = [1.0, 0.5]
CHI0 = [0.0, 0.0]


def _scipy_reference(artifact, pars, t_eval_max, x0, chi0):
    from scipy.integrate import solve_ivp

    d = artifact.n_fields

    def rhs(_t, y):
        x, chi, hub = y[:d], y[d : 2 * d], y[2 * d]
        eom = [float(v) for v in artifact.eom(x, chi, pars)]
        acc = [-eom[a] - 3.0 * hub * chi[a] for a in range(d)]
        hdot = float(artifact.eom_hdot(x, chi, pars))
        return np.concatenate([chi, acc, [hdot]])

    h0 = float(artifact.eom_h(np.array(x0), np.array(chi0), pars))
    y0 = np.concatenate([x0, chi0, [h0]])
    sol = solve_ivp(rhs, (0.0, t_eval_max), y0, rtol=1e-10, atol=1e-12, dense_output=True)
    return sol


@pytest.mark.parametrize("solver", ["rk4", "rkf"])
def test_against_scipy(trivial, solver):
    steps = 200
    out, times = background.solve_eom(
        trivial, ARGS, steps, X0, CHI0, max_err=1e-8, solver=solver, return_time=True
    )
    assert out.shape == (steps, 2 * 2 + 1)
    assert np.all(np.diff(times) > 0)
    sol = _scipy_reference(trivial, ARGS, float(times[-1]), X0, CHI0)
    ref = sol.sol(times).T  # (steps, 5)
    # per-step tolerance 1e-8 over `steps` accepted steps bounds the global
    # drift to ~steps·max_err
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-7)


def test_row0_is_initial_state(trivial):
    out = background.solve_eom(trivial, ARGS, 10, X0, CHI0)
    np.testing.assert_allclose(out[0, :2], X0)
    np.testing.assert_allclose(out[0, 2:4], CHI0)
    h0 = float(trivial.eom_h(np.array(X0), np.array(CHI0), ARGS))
    assert np.isclose(out[0, 4], h0, rtol=1e-12)


def test_friedmann_constraint_preserved(trivial):
    out = background.solve_eom(trivial, ARGS, 300, X0, CHI0, max_err=1e-8, solver="rkf")
    x, chi, hub = out[:, :2], out[:, 2:4], out[:, 4]
    # flat metric: 3H² = V + ½|χ|²
    v = (ARGS[0] * x[:, 0]) ** 2 + (ARGS[1] * x[:, 1]) ** 2
    constraint = np.sqrt((v + 0.5 * np.sum(chi**2, axis=1)) / 3.0)
    np.testing.assert_allclose(hub, constraint, rtol=1e-4)


def test_hubble_decreases(trivial):
    """H is monotonically non-increasing (Ḣ = −½|χ|² ≤ 0)."""
    out = background.solve_eom(trivial, ARGS, 300, X0, CHI0, solver="rkf")
    assert np.all(np.diff(out[:, 4]) <= 1e-12)


def test_batched_matches_single(trivial):
    inits = np.array([[1.0, 0.5], [0.8, -0.3], [1.2, 0.1]])
    chis = np.zeros_like(inits)
    batch = background.solve_eom_batch(trivial, ARGS, 50, inits, chis, solver="rkf")
    assert batch.shape == (3, 50, 5)
    single = background.solve_eom(trivial, ARGS, 50, inits[1], chis[1], solver="rkf")
    # batched reductions may differ by an ulp, which can flip an accept/
    # reject decision and perturb the adaptive dt path: compare to the
    # solver tolerance, not bitwise
    np.testing.assert_allclose(batch[1], single, rtol=1e-4, atol=1e-6)


def test_batched_per_trajectory_params(trivial):
    inits = np.tile(np.array(X0), (2, 1))
    chis = np.zeros_like(inits)
    pars = np.array([[1.0, 1.0], [2.0, 0.5]])
    batch = background.solve_eom_batch(trivial, pars, 50, inits, chis, solver="rkf")
    single = background.solve_eom(trivial, pars[1], 50, inits[1], chis[1], solver="rkf")
    np.testing.assert_allclose(batch[1], single, rtol=1e-4, atol=1e-6)


def test_shape_validation(trivial):
    from inflatox_tpu.utils.errors import ShapeError

    with pytest.raises(ShapeError):
        background.solve_eom(trivial, ARGS, 10, [1.0], [0.0, 0.0])
    with pytest.raises(ShapeError):
        background.solve_eom(trivial, np.array([1.0]), 10, X0, CHI0)
    with pytest.raises(ValueError):
        background.solve_eom(trivial, ARGS, 10, X0, CHI0, solver="euler")


def test_pallas_solver_fallback_and_contract(doc_model_artifact):
    """solver="rkf_pallas": off-TPU it falls back to the while-loop RKF45
    (bit-identical there); contract checks are its own."""
    import pytest

    from inflatox_tpu import background
    from inflatox_tpu.ops.pallas_solver import solve_eom_batch_pallas
    from inflatox_tpu.utils.errors import ShapeError

    f0 = np.array([[2.0, 2.0], [1.9, 2.1]])
    d0 = np.zeros((2, 2))
    got, tg = background.solve_eom_batch(
        doc_model_artifact, np.array([1.0]), 50, f0, d0,
        solver="rkf_pallas", return_time=True,
    )
    want, tw = background.solve_eom_batch(
        doc_model_artifact, np.array([1.0]), 50, f0, d0,
        solver="rkf", return_time=True,
    )
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(tg, tw)
    # per-trajectory (B, k) parameters take the same fallback off-TPU
    got_pt = background.solve_eom_batch(
        doc_model_artifact, np.array([[1.0], [1.3]]), 50, f0, d0,
        solver="rkf_pallas",
    )
    want_pt = background.solve_eom_batch(
        doc_model_artifact, np.array([[1.0], [1.3]]), 50, f0, d0,
        solver="rkf",
    )
    np.testing.assert_array_equal(got_pt, want_pt)
    with pytest.raises(ShapeError, match="per-trajectory"):
        solve_eom_batch_pallas(
            doc_model_artifact, np.ones((3, 1)), 10, f0, d0
        )
    with pytest.raises(ShapeError, match="shared parameters"):
        solve_eom_batch_pallas(
            doc_model_artifact, np.ones(2), 10, f0, d0
        )
    with pytest.raises(ShapeError, match="\\(B, n_fields\\)"):
        solve_eom_batch_pallas(
            doc_model_artifact, np.array([1.0]), 10, f0[:, :1], d0
        )
    with pytest.raises(ShapeError, match="derivatives_init"):
        solve_eom_batch_pallas(
            doc_model_artifact, np.array([1.0]), 10, f0, d0[:, :1]
        )


def test_pallas_solver_interpret_plumbing(doc_model_artifact, monkeypatch):
    """Explicit interpret=True drives the real kernel through the Pallas
    interpreter: compensated arithmetic degrades there (documented), so
    this asserts plumbing-level sanity — shapes, row 0, monotone time,
    early-row agreement while dt is tiny.  The interpreter executes the
    emulated row loop op-by-op, so the sequential chunk is shrunk to 10
    rows here (layout and indexing are chunk-length-invariant)."""
    from inflatox_tpu import background
    from inflatox_tpu.ops import pallas_solver
    from inflatox_tpu.ops.pallas_solver import solve_eom_batch_pallas

    monkeypatch.setattr(pallas_solver, "_ROW_CHUNK", 10)
    f0 = np.array([[2.0, 2.0]])
    d0 = np.zeros((1, 2))
    got, tg = solve_eom_batch_pallas(
        doc_model_artifact, np.array([1.0]), 10, f0, d0,
        return_time=True, interpret=True,
    )
    want, tw = background.solve_eom_batch(
        doc_model_artifact, np.array([1.0]), 10, f0, d0,
        solver="rkf", return_time=True,
    )
    assert got.shape == (1, 10, 5) and tg.shape == (1, 10)
    # fields/derivatives of row 0 are the exact inits; H comes through the
    # interpreter-degraded DF constraint evaluation (~f32)
    np.testing.assert_array_equal(got[:, 0, :4], want[:, 0, :4])
    np.testing.assert_allclose(got[:, 0, 4], want[:, 0, 4], rtol=1e-5)
    assert np.all(np.diff(tg[0]) > 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-12)
    # per-trajectory parameter planes: identical values must reproduce the
    # shared-scalar run bit-for-bit (same arithmetic, different plumbing)
    got_pt = solve_eom_batch_pallas(
        doc_model_artifact, np.array([[1.0]]), 10, f0, d0, interpret=True,
    )
    np.testing.assert_array_equal(got_pt, got)


@pytest.fixture(scope="module")
def three_field_artifact():
    import sympy

    import inflatox_tpu as inflatox

    a, b, c, m = sympy.symbols("a3 b3 c3 m3")
    V = sympy.Rational(1, 2) * m**2 * (a**2 + 2 * b**2 + 3 * c**2)
    g = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    model = inflatox.InflationModelBuilder.new(
        [a, b, c], g, V, silent=True
    ).build(guesses=[[0, 1, 0], [0, 0, 1]])
    return inflatox.Compiler(model, silent=True).compile()


def test_pallas_solver_three_field_stage_math(three_field_artifact):
    """The Pallas solver generalizes over the field count: at nf=3 the
    state [φ_a, χ_a, H] is 7 components riding 2n+1 DF pairs.  This
    validates the generalized internals — the DF RHS (`_deriv`) and the
    unrolled embedded-RKF45 stage chain (`_rkf_attempt`) — against an f64
    reference evaluation of the same tableau, in eager DF execution
    (EFT-safe off-TPU).  The full nf=3 kernel is driven on real TPU by the
    verify recipe; its interpret-mode XLA:CPU compile is pathological
    (>30 min on this host), so the CPU suite checks the generalized stage
    math here and the end-to-end kernel plumbing at nf=2 above."""
    import jax.numpy as jnp

    from inflatox_tpu.lowering.df32 import DF
    from inflatox_tpu.ops.pallas_solver import (
        _RKF_A, _RKF_B4, _RKF_B5, _deriv, _rkf_attempt,
    )

    art = three_field_artifact
    nf = art.n_fields
    assert nf == 3
    fns = art.solver_df32_fns()
    pars = np.array([1.3])
    x0 = np.array([1.5, 1.2, 0.8])
    chi0 = np.array([0.05, -0.02, 0.01])
    h0 = float(art.eom_h(x0, chi0, pars))
    y64 = np.concatenate([x0, chi0, [h0]])

    def rhs64(y):
        x, chi, hub = y[:nf], y[nf:2 * nf], y[2 * nf]
        eom = np.array([float(v) for v in art.eom(x, chi, pars)])
        return np.concatenate(
            [chi, -eom - 3.0 * hub * chi,
             [float(art.eom_hdot(x, chi, pars))]]
        )

    y_df = [DF.of(jnp.float64(v)) for v in y64]
    args_df = (DF.const(float(pars[0])),)

    # RHS: every generalized index (χ block, acceleration block, Ḣ row)
    got_rhs = np.array([d.to_f64() for d in _deriv(fns, y_df, args_df, nf)])
    np.testing.assert_allclose(got_rhs, rhs64(y64), rtol=1e-12, atol=1e-14)

    # one embedded RKF45 attempt vs the textbook tableau in f64; the
    # kernel carries dt as f32, so the reference must use the same
    # (rounded) value — comparing against an exact-1e-3 f64 dt would
    # just measure the f32 rounding of dt (~3e-8), not the stage math
    dt = float(np.float32(1e-3))
    y5_df, err = _rkf_attempt(fns, y_df, jnp.float32(dt), args_df, nf)
    ks = []
    for n in range(6):
        yn = y64.copy()
        for mm in range(n):
            yn = yn + dt * float(_RKF_A[n, mm]) * ks[mm]
        ks.append(rhs64(yn))
    y5_ref = y64 + dt * sum(float(_RKF_B5[n]) * ks[n] for n in range(6))
    got_y5 = np.array([d.to_f64() for d in y5_df])
    np.testing.assert_allclose(got_y5, y5_ref, rtol=1e-11, atol=1e-13)
    # error estimate ~ the embedded-order defect, must be finite and tiny
    defect = abs(dt) * np.linalg.norm(
        sum(float(_RKF_B5[n] - _RKF_B4[n]) * ks[n] for n in range(6)),
        np.inf,
    )
    assert float(err) <= 10.0 * defect + 1e-12


def test_three_field_while_loop_solver_vs_scipy(three_field_artifact):
    """nf=3 end-to-end on the while-loop f64 path (the Pallas fallback):
    the batched solver must track scipy on a 3-field quadratic model, and
    `solver="rkf_pallas"` must take the while-loop fallback off-TPU."""
    art = three_field_artifact
    pars = np.array([1.0])
    x0 = np.array([1.5, 1.2, 0.8])
    chi0 = np.zeros(3)
    out, times = background.solve_eom_batch(
        art, pars, 60, x0[None], chi0[None], solver="rkf",
        max_err=1e-8, return_time=True,
    )
    assert out.shape == (1, 60, 7)
    sol = _scipy_reference(art, pars, float(times[0, -1]), x0, chi0)
    ref = sol.sol(times[0]).T
    np.testing.assert_allclose(out[0], ref, rtol=1e-4, atol=5e-7)
    # off-TPU default (interpret=None) falls back to the while-loop path;
    # same max_err → identical step sequence → bit-identical rows
    fb = background.solve_eom_batch(art, pars, 60, x0[None], chi0[None],
                                    solver="rkf_pallas", max_err=1e-8)
    np.testing.assert_array_equal(fb, out)


def test_pallas_solver_on_loaded_bundle(doc_model_artifact, tmp_path,
                                        monkeypatch):
    """Compile-once / solve-many: a bundle restored with CompiledModel.load
    must drive the Pallas solver path (solver_df32_fns rebuilt from the
    serialized expressions) identically to the original artifact."""
    from inflatox_tpu.compiler import CompiledModel
    from inflatox_tpu.ops import pallas_solver

    p = tmp_path / "bundle.json"
    doc_model_artifact.save(str(p))
    restored = CompiledModel.load(str(p))

    monkeypatch.setattr(pallas_solver, "_ROW_CHUNK", 6)
    f0 = np.array([[2.0, 2.0]])
    d0 = np.zeros((1, 2))
    got = pallas_solver.solve_eom_batch_pallas(
        restored, np.array([1.0]), 6, f0, d0, interpret=True,
    )
    want = pallas_solver.solve_eom_batch_pallas(
        doc_model_artifact, np.array([1.0]), 6, f0, d0, interpret=True,
    )
    np.testing.assert_array_equal(got, want)


def test_efolds_cumulative_integral(doc_model_artifact):
    """N(t) = ∫H dt: exact on synthetic constant-H rows (de Sitter: N = Ht),
    and consistent with a dense-sampled numeric integral on a real solve."""
    from inflatox_tpu.background import efolds

    # constant H = 2.0 over arbitrary (monotone) times: N = 2 t exactly
    t = np.array([[0.0, 0.1, 0.4, 1.0], [0.0, 0.2, 0.3, 0.9]])
    rows = np.zeros((2, 4, 5))
    rows[..., 4] = 2.0
    np.testing.assert_allclose(efolds(rows, t), 2.0 * t, rtol=1e-15)

    # real background: trapezoid over the adaptive rows is a 2nd-order
    # approximation of the dense integral
    out, times = background.solve_eom_batch(
        doc_model_artifact, np.array([1.0]), 40, np.array([[2.0, 2.0]]),
        np.zeros((1, 2)), solver="rkf", max_err=1e-9, return_time=True,
    )
    n = efolds(out, times)
    assert n.shape == times.shape and n[0, 0] == 0.0
    assert np.all(np.diff(n[0][out[0, :, 4] > 0]) > 0)  # monotone while H>0
    dense = np.trapezoid(out[0, :, 4], times[0])
    np.testing.assert_allclose(n[0, -1], dense, rtol=1e-12)

    from inflatox_tpu.utils.errors import ShapeError

    with pytest.raises(ShapeError):
        efolds(out, times[:, :-1])


def test_solver_parameterless_model(monkeypatch):
    """Models with zero parameters run on both solver paths (the scalar
    prefetch buffer pads to one element; args tuple is empty)."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.ops import pallas_solver

    a, b = sympy.symbols("pa pb")
    V = sympy.Rational(1, 2) * (a**2 + b**2) + sympy.Rational(1, 10)
    model = inflatox.InflationModelBuilder.new(
        [a, b], [[1, 0], [0, 1]], V, silent=True
    ).build()
    art = inflatox.Compiler(model, silent=True).compile()
    assert art.n_parameters == 0

    monkeypatch.setattr(pallas_solver, "_ROW_CHUNK", 5)
    f0 = np.array([[1.0, 1.0]])
    d0 = np.zeros((1, 2))
    out = pallas_solver.solve_eom_batch_pallas(
        art, np.array([]), 5, f0, d0, interpret=True
    )
    ref = background.solve_eom_batch(art, np.array([]), 5, f0, d0,
                                     solver="rkf")
    assert out.shape == ref.shape == (1, 5, 5)
    np.testing.assert_array_equal(out[:, 0, :4], ref[:, 0, :4])


def test_solve_eom_batch_validates_derivatives_every_path(doc_model_artifact):
    """derivatives_init shape mismatches must raise the typed ShapeError on
    every dispatch branch (plain, rkf_pallas, mesh) — not a cryptic
    trace-time broadcast error."""
    import pytest

    from inflatox_tpu import background
    from inflatox_tpu.utils.errors import ShapeError

    f0 = np.array([[2.0, 2.0], [1.9, 2.1]])
    bad = np.zeros((2, 1))
    for kw in ({}, {"solver": "rkf_pallas"}):
        with pytest.raises(ShapeError, match="derivatives_init"):
            background.solve_eom_batch(
                doc_model_artifact, np.array([1.0]), 10, f0, bad, **kw
            )


def test_solve_eom_batch_reuses_compiled_wrapper(doc_model_artifact):
    """Back-to-back batched solves with the same shapes must hit the cached
    jitted wrapper (a fresh jax.jit(jax.vmap(...)) per call re-compiled the
    whole integrator every time)."""
    from inflatox_tpu import background

    f0 = np.array([[2.0, 2.0], [1.9, 2.1]])
    d0 = np.zeros((2, 2))
    background.solve_eom_batch(doc_model_artifact, np.array([1.0]), 11, f0, d0)
    cache = doc_model_artifact.__dict__["_solver_cache"]
    key = ("batch", "rk4", 11, 1e-6, "shared")
    fn_before = cache[key]
    background.solve_eom_batch(doc_model_artifact, np.array([1.0]), 11, f0, d0)
    assert cache[key] is fn_before


def test_survey_initial_conditions_matches_sequential(trivial):
    """The on-device survey reduction must reproduce the sequential
    solve + _eps1_crossing analysis per initial condition, stay invariant
    under chunking, and classify never-ending / never-inflating ICs."""
    from inflatox_tpu import observables

    m = np.array([1.0, 0.7])
    gx, gy = np.meshgrid(np.linspace(3.0, 12.0, 4), np.linspace(0.0, 6.0, 3))
    f0 = np.stack([gx.ravel(), gy.ravel()], axis=1)
    out = background.survey_initial_conditions(
        trivial, m, 1500, f0, [0.0, 0.0], max_err=1e-8
    )
    assert out["ended"].all()
    for idx in [0, 5, 11]:
        rows, times = background.solve_eom(
            trivial, m, 1500, f0[idx], [0.0, 0.0],
            max_err=1e-8, solver="rkf", return_time=True,
        )
        _, _, hub, eps_h, n_ax = observables._trajectory_eps_h(
            trivial, rows, times, m
        )
        i, frac = observables._eps1_crossing(eps_h)
        n_end = n_ax[i - 1] + frac * (n_ax[i] - n_ax[i - 1])
        n_start = n_ax[np.nonzero(eps_h < 1.0)[0][0]]
        np.testing.assert_allclose(
            out["N_inflation"][idx], n_end - n_start, atol=1e-8
        )
        h_end = hub[i - 1] + frac * (hub[i] - hub[i - 1])
        np.testing.assert_allclose(out["H_end"][idx], h_end, rtol=1e-8)
    # chunking must not change anything
    out2 = background.survey_initial_conditions(
        trivial, m, 1500, f0, [0.0, 0.0], max_err=1e-8, chunk=5
    )
    np.testing.assert_allclose(
        out2["N_inflation"], out["N_inflation"], equal_nan=True
    )
    # a too-short integration span → ended False, NaN e-folds; an at-rest
    # IC at the minimum starts with ε_H = 0 (χ = 0), so by the ε_H
    # convention it "inflates" for a fraction of an e-fold and ends — the
    # same classification _eps1_crossing gives it
    short = background.survey_initial_conditions(
        trivial, m, 60, np.array([[25.0, 0.0], [0.05, 0.0]]), [0.0, 0.0],
        max_err=1e-6,
    )
    assert not short["ended"][0]
    assert np.isnan(short["N_inflation"][0])
    assert short["ended"][1] and short["N_inflation"][1] < 1.0
    assert np.isfinite(short["N_span"]).all()


def test_survey_initial_conditions_per_traj_and_mesh(trivial):
    """Global m-rescaling leaves e-fold dynamics invariant (per-trajectory
    parameter plumbing), and the mesh path matches the single-device one."""
    from inflatox_tpu.parallel import make_mesh

    f0 = np.broadcast_to(np.array([9.0, 2.0]), (16, 2)).copy()
    pars = np.stack([np.array([1.0, 0.7]) * (1.0 + 0.02 * i)
                     for i in range(16)])
    out = background.survey_initial_conditions(
        trivial, pars, 1200, f0, [0.0, 0.0], max_err=1e-8
    )
    assert out["ended"].all()
    # invariance holds to the solver's discretization: each m draws its
    # own adaptive step sequence in physical time (~5e-5 at these settings)
    np.testing.assert_allclose(
        out["N_inflation"], out["N_inflation"][0], rtol=2e-4
    )
    mesh = make_mesh(axis_names=("solve",))
    out_m = background.survey_initial_conditions(
        trivial, pars, 1200, f0, [0.0, 0.0], max_err=1e-8, mesh=mesh
    )
    np.testing.assert_allclose(
        out_m["N_inflation"], out["N_inflation"], rtol=1e-10
    )
    from inflatox_tpu.utils.errors import ShapeError

    with pytest.raises(ShapeError, match="initial conditions"):
        background.survey_initial_conditions(
            trivial, pars[0], 100, np.zeros((4, 3)), [0.0, 0.0]
        )
