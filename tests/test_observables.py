"""Differentiable observables & fitting (inflatox_tpu.observables).

Coverage the reference cannot have: its model functions live behind a C ABI
(dylib.rs:44-48 raw function pointers), so nothing downstream of them is
differentiable.  Here the slow-roll observables, the fixed-step background
integrator, and the optax fitting loop are validated against analytic
values, finite differences, and scipy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inflatox_tpu import background, observables

ARGS = np.array([1.0, 0.7])  # m_1, m_2 of the trivial quadratic model
X = np.array([1.2, -0.8])


def _analytic_slow_roll(x, m):
    """Textbook values for V = (m1 x1)² + (m2 x2)² on a flat metric."""
    v = (m[0] * x[0]) ** 2 + (m[1] * x[1]) ** 2
    grad = np.array([2 * m[0] ** 2 * x[0], 2 * m[1] ** 2 * x[1]])
    eps = 0.5 * np.dot(grad, grad) / v**2
    hesse = np.diag([2 * m[0] ** 2, 2 * m[1] ** 2])
    sigma = grad / np.linalg.norm(grad)
    eta = sigma @ hesse @ sigma / v
    return eps, eta


def test_observables_match_analytic(trivial_artifact):
    sr = observables.slow_roll(trivial_artifact)(X, ARGS)
    eps_ref, eta_ref = _analytic_slow_roll(X, ARGS)
    np.testing.assert_allclose(float(sr["epsilon_v"]), eps_ref, rtol=1e-13)
    np.testing.assert_allclose(float(sr["eta_v"]), eta_ref, rtol=1e-13)
    np.testing.assert_allclose(
        float(sr["n_s"]), 1 - 6 * eps_ref + 2 * eta_ref, rtol=1e-13
    )
    np.testing.assert_allclose(float(sr["r"]), 16 * eps_ref, rtol=1e-13)
    # the standalone factories agree with the fused dict
    np.testing.assert_allclose(
        float(observables.epsilon_v(trivial_artifact)(X, ARGS)),
        float(sr["epsilon_v"]),
    )
    np.testing.assert_allclose(
        float(observables.spectral_index(trivial_artifact)(X, ARGS)),
        float(sr["n_s"]),
    )
    np.testing.assert_allclose(
        float(observables.tensor_to_scalar(trivial_artifact)(X, ARGS)),
        float(sr["r"]),
    )


def test_observable_gradients_vs_finite_differences(trivial_artifact):
    ns = observables.spectral_index(trivial_artifact)
    g = jax.grad(lambda a: ns(X, a))(jnp.asarray(ARGS))
    h = 1e-6
    for i in range(2):
        dp = ARGS.copy()
        dm = ARGS.copy()
        dp[i] += h
        dm[i] -= h
        fd = (float(ns(X, dp)) - float(ns(X, dm))) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-6)


def test_observables_broadcast_over_grids(trivial_artifact):
    xs = [np.linspace(0.5, 2.0, 7), np.full(7, -0.8)]
    eps = observables.epsilon_v(trivial_artifact)(xs, ARGS)
    assert np.shape(eps) == (7,)
    for j in range(7):
        ref, _ = _analytic_slow_roll([xs[0][j], xs[1][j]], ARGS)
        np.testing.assert_allclose(float(eps[j]), ref, rtol=1e-13)


def test_observable_jacobian_vs_finite_differences(trivial_artifact):
    jac = observables.observable_jacobian(trivial_artifact, keys=("n_s", "r"))
    J = np.asarray(jac(X, ARGS))
    assert J.shape == (2, 2)
    ns = observables.spectral_index(trivial_artifact)
    r_fn = observables.tensor_to_scalar(trivial_artifact)
    h = 1e-6
    for col in range(2):
        dp, dm = ARGS.copy(), ARGS.copy()
        dp[col] += h
        dm[col] -= h
        np.testing.assert_allclose(
            J[0, col], (float(ns(X, dp)) - float(ns(X, dm))) / (2 * h),
            rtol=1e-5, atol=1e-10,
        )
        np.testing.assert_allclose(
            J[1, col], (float(r_fn(X, dp)) - float(r_fn(X, dm))) / (2 * h),
            rtol=1e-5, atol=1e-10,
        )
    with pytest.raises(ValueError, match="unknown observable"):
        observables.observable_jacobian(trivial_artifact, keys=("n_s", "bogus"))


def test_fisher_matrix_properties(trivial_artifact):
    sigma = np.array([0.004, 0.01])  # Planck-ish 1-sigma on (n_s, r)
    F = observables.fisher_matrix(trivial_artifact, X, ARGS, sigma)
    assert F.shape == (2, 2)
    np.testing.assert_allclose(F, F.T)  # symmetric
    evals = np.linalg.eigvalsh(F)
    assert evals.min() >= -1e-6 * abs(evals.max())  # PSD
    # slow-roll observables are invariant under V -> lambda*V, i.e. under
    # scaling both masses together: that direction must be unconstrained
    direction = ARGS / np.linalg.norm(ARGS)  # d/dlam of (lam^.5 scaling)...
    # V scales as (m -> s*m) => lambda = s^2; tangent is ARGS itself
    quad = direction @ F @ direction
    assert abs(quad) < 1e-6 * abs(evals.max())
    # diagonal-sigma and explicit-covariance forms agree
    F2 = observables.fisher_matrix(trivial_artifact, X, ARGS, np.diag(sigma**2))
    np.testing.assert_allclose(F, F2, rtol=1e-12)
    with pytest.raises(Exception):
        observables.fisher_matrix(trivial_artifact, X, ARGS, np.ones(3))


def test_along_trajectory_and_horizon_exit(trivial_artifact):
    # single-field setup on the phi_1 axis: V = (m phi_1)^2 with m1=m2=1,
    # phi_2 = chi = 0 stays exactly on the axis.  Textbook large-field
    # analytics: eps_V = 2/phi^2, N(phi -> phi_end) = (phi^2 - phi_end^2)/4
    # with slow-roll phi_end = sqrt(2); n_s = 1 - 8/phi^2, r = 32/phi^2.
    m = np.array([1.0, 1.0])
    phi0 = 16.0
    rows, times = background.solve_eom(
        trivial_artifact, m, 3000, [phi0, 0.0], [0.0, 0.0],
        max_err=1e-8, solver="rkf", return_time=True,
    )
    along = observables.along_trajectory(trivial_artifact, rows, m)
    assert set(along) == {"epsilon_v", "eta_v", "n_s", "r", "epsilon_h"}
    # early rows: deep slow roll, eps_H tracks eps_V = 2/phi^2 closely
    np.testing.assert_allclose(
        along["epsilon_v"][0], 2.0 / phi0**2, rtol=1e-12
    )
    assert along["epsilon_h"].max() >= 1.0, "inflation must end in the span"
    # chi starts at 0, so eps_H ramps from 0 onto the slow-roll attractor
    # over ~a Hubble time; once there it must track eps_V = 2/phi^2
    from inflatox_tpu.background import efolds

    n_of_t = efolds(rows, times)
    attractor = (n_of_t > 5.0) & (n_of_t < 50.0)
    assert attractor.sum() > 10
    np.testing.assert_allclose(
        along["epsilon_h"][attractor], along["epsilon_v"][attractor], rtol=0.05
    )

    exit_info = observables.horizon_exit(
        trivial_artifact, rows, times, m, N_before_end=55.0
    )
    phi_star = np.sqrt(4 * 55.0 + 2.0)  # slow-roll prediction
    np.testing.assert_allclose(exit_info["x"][0], phi_star, rtol=0.02)
    np.testing.assert_allclose(exit_info["x"][1], 0.0, atol=1e-10)
    np.testing.assert_allclose(exit_info["N_end"], phi0**2 / 4 - 0.5, rtol=0.03)
    np.testing.assert_allclose(exit_info["n_s"], 1 - 8 / phi_star**2, atol=2e-3)
    np.testing.assert_allclose(exit_info["r"], 32 / phi_star**2, rtol=0.05)
    assert exit_info["N_exit"] == pytest.approx(exit_info["N_end"] - 55.0)


def test_horizon_exit_error_paths(trivial_artifact):
    m = np.array([1.0, 1.0])
    # short integration deep in slow roll: inflation never ends
    rows, times = background.solve_eom(
        trivial_artifact, m, 50, [16.0, 0.0], [0.0, 0.0],
        max_err=1e-8, solver="rkf", return_time=True,
    )
    with pytest.raises(ValueError, match="does not end"):
        observables.horizon_exit(trivial_artifact, rows, times, m)
    # full trajectory but absurd rewind depth
    rows, times = background.solve_eom(
        trivial_artifact, m, 3000, [16.0, 0.0], [0.0, 0.0],
        max_err=1e-8, solver="rkf", return_time=True,
    )
    with pytest.raises(ValueError, match="cannot rewind"):
        observables.horizon_exit(
            trivial_artifact, rows, times, m, N_before_end=1000.0
        )


def test_horizon_exit_velocity_overshoot_start(trivial_artifact):
    """A large initial χ puts ε_H ≥ 1 on the first rows before Hubble
    friction damps onto the attractor — the crossing search must skip the
    overshoot and find the genuine end of inflation, not reject the
    trajectory as 'not inflating'."""
    m = np.array([1.0, 1.0])
    rows, times = background.solve_eom(
        trivial_artifact, m, 3000, [16.0, 0.0], [-40.0, 0.0],
        max_err=1e-8, solver="rkf", return_time=True,
    )
    x, chi, hub = rows[0, :2], rows[0, 2:4], rows[0, 4]
    eps0 = 0.5 * float(chi @ chi) / hub**2
    assert eps0 >= 1.0, "fixture must actually start with an overshoot"
    info = observables.horizon_exit(
        trivial_artifact, rows, times, m, N_before_end=40.0
    )
    assert np.isfinite(info["N_end"]) and info["N_end"] > 40.0


def test_solve_eom_fixed_matches_adaptive(trivial_artifact):
    # run the production adaptive solver, then re-integrate on a uniform
    # grid covering the same span: final states must agree to RK4 accuracy
    rows, times = background.solve_eom(
        trivial_artifact, ARGS, 400, [1.0, 0.5], [0.0, 0.0],
        max_err=1e-10, solver="rkf", return_time=True,
    )
    grid = np.linspace(0.0, float(times[-1]), 4001)
    fixed = observables.solve_eom_fixed(
        trivial_artifact, ARGS, grid, [1.0, 0.5], [0.0, 0.0]
    )
    np.testing.assert_allclose(np.asarray(fixed[-1]), rows[-1], rtol=2e-6, atol=1e-9)
    # row 0 is the initial state with H from the constraint
    np.testing.assert_allclose(np.asarray(fixed[0]), rows[0], rtol=1e-14)


def test_solve_eom_fixed_gradient_vs_finite_differences(trivial_artifact):
    grid = jnp.linspace(0.0, 1.5, 301)

    def final_field(a):
        rows = observables.solve_eom_fixed(
            trivial_artifact, a, grid, jnp.array([1.0, 0.5]), jnp.array([0.0, 0.0])
        )
        return rows[-1, 0]

    g = jax.grad(final_field)(jnp.asarray(ARGS))
    h = 1e-5
    for i in range(2):
        dp = ARGS.copy()
        dm = ARGS.copy()
        dp[i] += h
        dm[i] -= h
        fd = (float(final_field(jnp.asarray(dp))) - float(final_field(jnp.asarray(dm)))) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-4, atol=1e-8)


def test_solve_eom_fixed_shape_validation(trivial_artifact):
    from inflatox_tpu.utils.errors import ShapeError

    grid = np.linspace(0.0, 1.0, 10)
    with pytest.raises(ShapeError):
        observables.solve_eom_fixed(trivial_artifact, ARGS, grid, [1.0], [0.0, 0.0])
    with pytest.raises(ShapeError):
        observables.solve_eom_fixed(
            trivial_artifact, np.ones(3), grid, [1.0, 0.5], [0.0, 0.0]
        )
    with pytest.raises(ShapeError):
        observables.solve_eom_fixed(
            trivial_artifact, ARGS, np.zeros((2, 5)), [1.0, 0.5], [0.0, 0.0]
        )


def test_fit_parameters_recovers_target_observables(trivial_artifact):
    pytest.importorskip("optax")
    # choose target observables produced by known masses, start elsewhere,
    # and require the fit to reproduce them
    m_true = np.array([0.9, 0.6])
    sr = observables.slow_roll(trivial_artifact)
    target = {k: float(v) for k, v in sr(X, m_true).items()}

    def loss(a):
        got = sr(X, a)
        return (got["n_s"] - target["n_s"]) ** 2 + (got["r"] - target["r"]) ** 2

    res = observables.fit_parameters(loss, np.array([1.3, 0.4]), steps=600,
                                     learning_rate=0.03)
    assert isinstance(res, observables.FitResult)
    assert res.loss_history.shape == (600,)
    assert float(loss(jnp.asarray(res.params))) < 1e-10
    got = sr(X, res.params)
    np.testing.assert_allclose(float(got["n_s"]), target["n_s"], atol=1e-5)
    np.testing.assert_allclose(float(got["r"]), target["r"], atol=1e-5)


def test_fit_parameters_multistart_and_cache(trivial_artifact):
    pytest.importorskip("optax")
    sr = observables.slow_roll(trivial_artifact)
    target = float(sr(X, np.array([0.9, 0.6]))["n_s"])

    def loss(a):
        return (sr(X, a)["n_s"] - target) ** 2

    starts = np.array([[1.3, 0.4], [0.6, 1.2], [1.0, 1.0]])
    n_cached = len(observables._fit_cache)
    res = observables.fit_parameters(loss, starts, steps=300, learning_rate=0.05)
    assert res.params.shape == (3, 2)
    assert res.loss_history.shape == (3, 300)
    # every start's history begins at its own initial loss
    for s in range(3):
        np.testing.assert_allclose(
            res.loss_history[s, 0], float(loss(jnp.asarray(starts[s]))),
            rtol=1e-12,
        )
    best = res.loss_history[:, -1].argmin()
    assert float(loss(jnp.asarray(res.params[best]))) < 1e-9
    # the compiled runner is cached per (loss_fn, optimizer, steps): a
    # second call with the same loss reuses the entry
    assert len(observables._fit_cache) == n_cached + 1
    observables.fit_parameters(loss, starts[0], steps=300, learning_rate=0.05)
    assert len(observables._fit_cache) == n_cached + 1
    from inflatox_tpu.utils.errors import ShapeError

    with pytest.raises(ShapeError):
        observables.fit_parameters(loss, np.zeros((2, 2, 2)), steps=10)


def test_fit_parameters_custom_optimizer(trivial_artifact):
    optax = pytest.importorskip("optax")

    eps = observables.epsilon_v(trivial_artifact)
    target = float(eps(X, np.array([0.8, 0.8])))

    def loss(a):
        return (eps(X, a) - target) ** 2

    res = observables.fit_parameters(
        loss, np.array([1.1, 1.1]), steps=300, optimizer=optax.sgd(0.1)
    )
    assert float(loss(jnp.asarray(res.params))) < 1e-9
    # history is the pre-update loss: it must start at the initial loss
    np.testing.assert_allclose(
        res.loss_history[0], float(loss(jnp.asarray([1.1, 1.1]))), rtol=1e-12
    )


def test_power_spectrum_single_field(trivial_artifact):
    """Spectrum-from-background on the φ² large-field model.  Slow-roll
    analytics (M_Pl = 1, m = 1): ε = 2/φ², H² = V/3, so at crossing
    P_ζ = H²/(8π²ε) = φ⁴/(48π²), n_s − 1 = −8/φ², r = 32/φ², and the
    running α_s = dn_s/dlnk = −(1 − n_s)²/2."""
    m = np.array([1.0, 1.0])
    rows, times = background.solve_eom(
        trivial_artifact, m, 3000, [16.0, 0.0], [0.0, 0.0],
        max_err=1e-8, solver="rkf", return_time=True,
    )
    spec = observables.power_spectrum(trivial_artifact, rows, times, m)
    assert set(spec) == {"ln_k", "N", "P_zeta", "P_tensor", "n_s",
                         "alpha_s", "r", "epsilon_h"}
    sizes = {v.shape for v in spec.values()}
    assert len(sizes) == 1
    # crossing wavenumbers strictly ordered (d ln k/dN = 1 − ε_H > 0)
    assert np.all(np.diff(spec["ln_k"]) > 0)
    # r = P_T/P_ζ = 16 ε_H is an identity of the construction
    np.testing.assert_allclose(
        spec["P_tensor"] / spec["P_zeta"], spec["r"], rtol=1e-12
    )

    att = (spec["N"] > 5.0) & (spec["N"] < 50.0)  # on the attractor
    assert att.sum() > 10
    phi_sq = 2.0 / spec["epsilon_h"]  # slow roll: ε = 2/φ²
    np.testing.assert_allclose(
        spec["P_zeta"][att], (phi_sq[att] ** 2) / (48.0 * np.pi**2),
        rtol=0.05,
    )
    ns_pred = 1.0 - 8.0 / phi_sq
    ok = att & np.isfinite(spec["n_s"])
    np.testing.assert_allclose(spec["n_s"][ok], ns_pred[ok], atol=5e-3)
    np.testing.assert_allclose(spec["r"][att], 32.0 / phi_sq[att], rtol=0.05)
    oka = att & np.isfinite(spec["alpha_s"])
    alpha_pred = -((1.0 - ns_pred[oka]) ** 2) / 2.0
    np.testing.assert_allclose(spec["alpha_s"][oka], alpha_pred, rtol=0.15)


def test_power_spectrum_error_paths(trivial_artifact):
    m = np.array([1.0, 1.0])
    # no inflating rows: H = 0 everywhere
    dead = np.zeros((10, 5))
    with pytest.raises(ValueError, match="no inflating rows"):
        observables.power_spectrum(
            trivial_artifact, dead, np.linspace(0, 1, 10), m
        )
    rows, times = background.solve_eom(
        trivial_artifact, m, 100, [16.0, 0.0], [0.0, 0.0],
        max_err=1e-8, solver="rkf", return_time=True,
    )
    from inflatox_tpu.utils.errors import ShapeError

    with pytest.raises(ShapeError):
        observables.power_spectrum(trivial_artifact, rows, times[:-1], m)


def test_cobe_normalize_round_trip():
    """Scaling the potential's linear normalization by the returned factor
    and re-solving must land P_ζ(k_*) on A_s (V → λV ⇒ H² → λH² at fixed
    field-space path ⇒ P_ζ linear in λ)."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.models import alpha_attractor

    model, args = alpha_attractor()
    art = inflatox.Compiler(model, silent=True).compile()
    rows, times = background.solve_eom(
        art, args, 3000, [0.99, 0.5], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    res = observables.cobe_normalize(art, rows, times, args)
    slot = art.lookup_symbol(sympy.Symbol("M4"))
    i = int(slot[slot.index("[") + 1 : -1])
    args2 = args.copy()
    args2[i] *= res["scale"]
    rows2, times2 = background.solve_eom(
        art, args2, 3000, [0.99, 0.5], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    res2 = observables.cobe_normalize(art, rows2, times2, args2)
    np.testing.assert_allclose(res2["P_zeta"], 2.1e-9, rtol=1e-4)
    np.testing.assert_allclose(res2["scale"], 1.0, rtol=1e-4)


@pytest.fixture(scope="module")
def long_quadratic(trivial_artifact):
    """φ² axis trajectory long enough (~64 e-folds) for CMB-scale N_*."""
    m = np.array([1.0, 1.0])
    rows, times = background.solve_eom(
        trivial_artifact, m, 3000, [16.0, 0.0], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    return trivial_artifact, m, rows, times


def test_n_star_matching_textbook_value(long_quadratic):
    """COBE-normalized m²φ² with instant reheating at k = 0.05/Mpc is the
    textbook N_* ≈ 57.5; the fixed point must close to ~1e-12 and the
    internal A_s normalization must agree with normalizing externally."""
    art, m, rows, times = long_quadratic
    out = observables.n_star_matching(art, m, rows, times, A_s=2.1e-9)
    assert 56.5 < out["N_star"] < 58.5
    assert out["residual"] < 1e-10
    # GUT-scale instant reheating for a COBE-normalized large-field model
    assert 1e15 < out["T_reh_gev"] < 1e16
    # external normalization: V = (mφ)² is linear in m², so m √scale
    mn = m * np.sqrt(out["scale"])
    rows2, times2 = background.solve_eom(
        art, mn, 3000, [16.0, 0.0], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    o2 = observables.n_star_matching(art, mn, rows2, times2)
    np.testing.assert_allclose(o2["N_star"], out["N_star"], atol=1e-3)


def test_n_star_matching_reheating_physics(long_quadratic):
    """w_reh = 1/3 must make N_* exactly independent of T_reh (a
    radiation-like reheating epoch is indistinguishable from the radiation
    era); for w_reh < 1/3 lower reheating temperatures shift N_* down."""
    art, m, rows, times = long_quadratic
    kw = dict(A_s=2.1e-9)
    o1 = observables.n_star_matching(
        art, m, rows, times, w_reh=1 / 3, T_reh_gev=1e10, **kw)
    o2 = observables.n_star_matching(
        art, m, rows, times, w_reh=1 / 3, T_reh_gev=1e4, **kw)
    np.testing.assert_allclose(o1["N_star"], o2["N_star"], atol=1e-9)
    o3 = observables.n_star_matching(
        art, m, rows, times, w_reh=0.0, T_reh_gev=1e10, **kw)
    o4 = observables.n_star_matching(
        art, m, rows, times, w_reh=0.0, T_reh_gev=1e4, **kw)
    assert o1["N_star"] > o3["N_star"] > o4["N_star"]


def test_pivots_for_k_compose_with_spectra(long_quadratic):
    """pivots_for_k turns physical scales into pivot placements: a decade
    of k must span ln(10) e-folds (d ln k/dN = 1 − ε ≈ 1), and the
    resulting pivots must feed the spectrum routes directly."""
    from inflatox_tpu import perturbations

    art, m, rows, times = long_quadratic
    ns = observables.pivots_for_k(
        art, m, rows, times, [0.05, 0.5], A_s=2.1e-9
    )
    assert ns.shape == (2,) and ns[0] > ns[1]
    # Δ ln k = ΔN (1 − ε); ε ≈ 1/(2N) ≈ 0.009 here
    np.testing.assert_allclose(ns[0] - ns[1], np.log(10.0), rtol=0.02)
    spec = perturbations.delta_n_spectrum(
        art, m, rows, times, pivot_N_before_end=ns, steps=3000,
    )
    assert np.isfinite(spec["P_zeta"]).all()
    np.testing.assert_allclose(
        spec["ln_k"][1] - spec["ln_k"][0], np.log(10.0), rtol=1e-3
    )


def test_n_star_matching_fixed_scale(long_quadratic):
    """scale= applies a previously solved normalization without the per-k
    A_s refit: re-running at another k with the frozen scale must place
    the pivots exactly one decade (in k = a_* H_*) apart, and A_s+scale
    together must raise."""
    art, m, rows, times = long_quadratic
    ref = observables.n_star_matching(art, m, rows, times,
                                      k_mpc=0.05, A_s=2.1e-9)
    other = observables.n_star_matching(art, m, rows, times,
                                        k_mpc=0.5, scale=ref["scale"])
    assert other["scale"] == ref["scale"]
    # ln k is exactly consistent under one normalization
    np.testing.assert_allclose(
        other["ln_k"] - ref["ln_k"], np.log(10.0), rtol=1e-9)
    with pytest.raises(ValueError, match="mutually exclusive"):
        observables.n_star_matching(art, m, rows, times,
                                    A_s=2.1e-9, scale=1.0)


def test_n_star_matching_error_paths(long_quadratic):
    art, m, rows, times = long_quadratic
    with pytest.raises(ValueError, match="outheat"):
        observables.n_star_matching(
            art, m, rows, times, T_reh_gev=1e19, A_s=2.1e-9)
    with pytest.raises(ValueError, match="w_reh"):
        observables.n_star_matching(art, m, rows, times, w_reh=-1.0)
    # a 36-e-fold trajectory cannot hold a CMB-scale pivot
    rows_s, times_s = background.solve_eom(
        art, m, 2000, [12.0, 0.0], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    with pytest.raises(ValueError, match="start deeper"):
        observables.n_star_matching(art, m, rows_s, times_s, A_s=2.1e-9)
