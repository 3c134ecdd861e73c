"""First-principles perturbation spectra (inflatox_tpu.perturbations).

Validation strategy: the δN route is checked against the φ² large-field
slow-roll analytics; the Mukhanov-Sasaki route is cross-validated against
δN — two independent formalisms (nonlinear separate-universe solves vs
linear mode integration) must give the same spectrum — on BOTH a flat and
a curved field space; and the mass matrix's Riemann term is pinned by the
constant-curvature identity (it must reproduce the textbook entropic-mass
curvature correction ε R_fs H², with no correction along the adiabatic
direction)."""

import numpy as np
import pytest
import sympy

import jax

import inflatox_tpu as inflatox
from inflatox_tpu import background, perturbations
from inflatox_tpu.models import _args_by_symbol


@pytest.fixture(scope="module")
def quadratic(trivial_artifact):
    """Base solve on the φ² single-field axis (m1 = m2 = 1, φ₀ = 12)."""
    m = np.array([1.0, 1.0])
    rows, times = background.solve_eom(
        trivial_artifact, m, 2000, [12.0, 0.0], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    return trivial_artifact, m, rows, times


@pytest.fixture(scope="module")
def curved():
    """Two-field model on a curved (hyperbolic-like) field space with a
    displaced second field — a genuinely multi-field, turning background."""
    p1, p2, m1, m2, b = sympy.symbols("p1 p2 m1 m2 b", real=True)
    V = sympy.Rational(1, 2) * (m1 * p1) ** 2 + sympy.Rational(1, 2) * (m2 * p2) ** 2
    g = [[sympy.Integer(1), 0], [0, sympy.exp(2 * b * p1)]]
    model = inflatox.InflationModelBuilder.new([p1, p2], g, V, silent=True).build()
    art = inflatox.Compiler(model, silent=True).compile()
    args = _args_by_symbol(art.model, {"m1": 1.0, "m2": 0.8, "b": 0.25})
    rows, times = background.solve_eom(
        art, args, 3000, [10.0, 1.5], [0.0, 0.0],
        max_err=1e-9, solver="rkf", return_time=True,
    )
    return art, args, rows, times


def test_delta_n_matches_slow_roll_analytics(quadratic):
    art, m, rows, times = quadratic
    spec = perturbations.delta_n_spectrum(
        art, m, rows, times, pivots=5, N_margin_start=5.0,
        N_margin_end=10.0, steps=2000,
    )
    # ε = 2/φ² from the δN gradients themselves: N(φ) = φ²/4 → N' = φ/2
    phi = 2.0 * spec["N_grad"][:, 0]
    np.testing.assert_allclose(
        spec["P_zeta"], phi**4 / (48 * np.pi**2), rtol=0.08
    )
    ns_pred = 1.0 - 8.0 / phi**2
    ok = np.isfinite(spec["n_s"])
    # 5 pivots span ~45 e-folds, so the centered n_s difference is a secant
    # over ~20 e-folds of running — compare to the local slope at ~0.02
    np.testing.assert_allclose(spec["n_s"][ok], ns_pred[ok], atol=0.02)
    np.testing.assert_allclose(spec["r"], 32.0 / phi**2, rtol=0.08)
    # the spectator direction contributes nothing on the single-field axis
    np.testing.assert_allclose(spec["N_grad"][:, 1], 0.0, atol=1e-6)


def test_mode_spectrum_cross_validates_delta_n_flat(quadratic):
    """Two independent formalisms, one answer (flat field space)."""
    art, m, rows, times = quadratic
    kw = dict(pivots=5, N_margin_start=5.0, N_margin_end=8.0)
    dn = perturbations.delta_n_spectrum(art, m, rows, times, steps=2000, **kw)
    ms = perturbations.mode_spectrum(art, m, rows, times, **kw)
    np.testing.assert_allclose(ms["ln_k"], dn["ln_k"], rtol=1e-12)
    np.testing.assert_allclose(ms["P_zeta"], dn["P_zeta"], rtol=0.08)
    ok = np.isfinite(ms["n_s"])
    np.testing.assert_allclose(ms["n_s"][ok], dn["n_s"][ok], atol=0.012)


def test_mode_spectrum_cross_validates_delta_n_curved(curved):
    """Same cross-validation on a curved field space with a turning
    two-field background — exercises the Christoffel transport and the
    Riemann term of the mass matrix through the geometry layer."""
    art, args, rows, times = curved
    kw = dict(pivots=4, N_margin_start=5.0, N_margin_end=8.0)
    dn = perturbations.delta_n_spectrum(art, args, rows, times, steps=3000, **kw)
    ms = perturbations.mode_spectrum(art, args, rows, times, **kw)
    np.testing.assert_allclose(ms["P_zeta"], dn["P_zeta"], rtol=0.08)


def test_mass_matrix_riemann_term_constant_curvature():
    """The Riemann contraction must reproduce the textbook entropic-mass
    curvature correction: on a 2-D constant-curvature field space
    (R^a_{bcd} = K(δ^a_c g_{db} − δ^a_d g_{cb}), Gaussian curvature K) the
    term contributes −K(χ^aχ_b − δ^a_b|χ|²), i.e. +K|χ|² = ε R_fs H²
    projected on the entropic direction (geometrical destabilization for
    K < 0) and exactly zero along the adiabatic direction."""
    x0, y0, mm, = sympy.symbols("x0 y0 mm", real=True)
    V = sympy.Rational(1, 2) * mm**2 * (x0**2 + y0**2)
    g = [[sympy.Integer(1), 0], [0, sympy.sinh(x0) ** 2]]  # K = −1
    model = inflatox.InflationModelBuilder.new([x0, y0], g, V, silent=True).build()
    art = inflatox.Compiler(model, silent=True).compile()
    args = np.array([1.0])
    K = -1.0

    pt = np.array([[1.1], [0.7]])
    hub = np.array([2.0])
    eps = np.array([0.02])
    u = np.array([[0.3], [0.15]])          # e-fold velocity χ/H
    chi = u * hub

    m_full = perturbations._mass_matrix_over_h2(art, args, pt, u, hub, eps)[0]

    # independent analytic build of every term for this metric
    x, y = pt[0, 0], pt[1, 0]
    g_m = np.diag([1.0, np.sinh(x) ** 2])
    ginv = np.linalg.inv(g_m)
    grad = np.array([x, y])  # V = ½(x² + y²): ∂V = (x, y); plain Hessian = I
    gam = np.zeros((2, 2, 2))
    gam[0, 1, 1] = -np.sinh(x) * np.cosh(x)
    gam[1, 0, 1] = gam[1, 1, 0] = np.cosh(x) / np.sinh(x)
    hesse = np.eye(2) - np.einsum("cab,c->ab", gam, grad)
    chi_v = chi[:, 0]
    chi_lo = g_m @ chi_v
    grad_up = ginv @ grad
    m_ref = ginv @ hesse
    m_ref = m_ref - K * (np.outer(chi_v, chi_lo) - np.eye(2) * (chi_lo @ chi_v))
    m_ref = m_ref + (3.0 - eps[0]) * np.outer(chi_v, chi_lo)
    m_ref = m_ref + (np.outer(grad_up, chi_lo) + np.outer(chi_v, grad)) / hub[0]
    np.testing.assert_allclose(m_full, m_ref / hub[0] ** 2, rtol=1e-10)

    # projections: adiabatic direction sees no curvature term, entropic
    # direction sees exactly K|χ|² (= ε R_fs H² with R_fs = 2K)
    riem_term = -K * (np.outer(chi_v, chi_lo) - np.eye(2) * (chi_lo @ chi_v))
    sig = chi_v / np.sqrt(chi_lo @ chi_v)            # σ^a
    sig_lo = g_m @ sig
    assert abs(sig_lo @ riem_term @ sig) < 1e-12
    w = np.array([-chi_v[1], chi_v[0]])              # s_a with s_a χ^a = 0
    s_up = ginv @ w / np.sqrt(w @ ginv @ w)
    s_lo = g_m @ s_up
    np.testing.assert_allclose(
        s_lo @ riem_term @ s_up, K * (chi_lo @ chi_v), rtol=1e-10
    )


def test_delta_n_fnl_matches_lyth_rodriguez(quadratic):
    """Second-order δN on the φ² axis: N = φ²/4 ⇒ N' = φ/2, N'' = ½, so
    f_NL = (5/6)·N''/N'² = 5/(3φ²) exactly (Lyth–Rodríguez, super-horizon
    part).  Also pins the covariant-Hessian values themselves."""
    art, m, rows, times = quadratic
    spec = perturbations.delta_n_spectrum(
        art, m, rows, times, pivots=4, N_margin_start=5.0,
        N_margin_end=10.0, steps=2000, order=2, max_err=1e-10,
    )
    phi = 2.0 * spec["N_grad"][:, 0]
    np.testing.assert_allclose(spec["f_NL"], 5.0 / (3.0 * phi**2), rtol=0.1)
    np.testing.assert_allclose(spec["N_hess"][:, 0, 0], 0.5, rtol=0.02)
    # the spectator axis is flat in N to stencil noise
    np.testing.assert_allclose(spec["N_hess"][:, 0, 1], 0.0, atol=5e-3)


def test_delta_n_order_validation(quadratic):
    art, m, rows, times = quadratic
    with pytest.raises(ValueError, match="order"):
        perturbations.delta_n_spectrum(art, m, rows, times, order=3)


def test_mode_spectrum_exact_tensor_and_iso_flat(quadratic):
    """On the single-field φ² axis: exact P_T matches the slow-roll
    2H²/π² to O(ε), the entropy mode decays (massless spectator still
    contributes Q_s, but S = (H/|χ|)Q_s is uncorrelated with ζ), and
    n_t ≈ −r/8 (consistency relation) at the resolved pivots."""
    art, m, rows, times = quadratic
    ms = perturbations.mode_spectrum(
        art, m, rows, times, pivots=5, N_margin_start=5.0, N_margin_end=8.0
    )
    sr = 2.0 * ms["H"] ** 2 / np.pi**2
    np.testing.assert_allclose(ms["P_tensor"], sr, rtol=0.15)
    assert np.all(ms["P_iso"] >= 0.0)
    ok = np.isfinite(ms["n_t"])
    np.testing.assert_allclose(
        ms["n_t"][ok], -ms["r"][ok] / 8.0, atol=0.02
    )
    # ζ and S are built from orthogonal mode sums on the decoupled axis
    assert np.all(np.abs(ms["cos_delta"][np.isfinite(ms["cos_delta"])]) < 0.2)


def test_mode_spectrum_iso_curved_finite(curved):
    """Turning two-field background: isocurvature outputs are finite and
    the correlation cosine is a valid cosine."""
    art, args, rows, times = curved
    ms = perturbations.mode_spectrum(
        art, args, rows, times, pivots=3, N_margin_start=5.0, N_margin_end=8.0
    )
    assert np.all(np.isfinite(ms["P_iso"])) and np.all(ms["P_iso"] >= 0)
    ok = np.isfinite(ms["cos_delta"])
    assert np.all(np.abs(ms["cos_delta"][ok]) <= 1.0 + 1e-9)


def test_spectra_sharded_match_single_device(quadratic):
    """Both routes on an 8-device CPU mesh must match the single-device
    results: δN shards the perturbed-trajectory batch (solver precision,
    ~1e-11 N differences → ~1e-7 on N_grad at h=1e-4), mode_spectrum
    shards the pivot axis (identical math, GSPMD partitioning only)."""
    import jax

    from inflatox_tpu.parallel import make_mesh

    art, m, rows, times = quadratic
    mesh = make_mesh(axis_names=("solve",), devices=jax.devices())
    kw = dict(pivots=4, N_margin_start=5.0, N_margin_end=8.0)
    dn0 = perturbations.delta_n_spectrum(art, m, rows, times, steps=2000, **kw)
    dn1 = perturbations.delta_n_spectrum(
        art, m, rows, times, steps=2000, mesh=mesh, **kw
    )
    np.testing.assert_allclose(dn1["P_zeta"], dn0["P_zeta"], rtol=1e-6)
    ms0 = perturbations.mode_spectrum(art, m, rows, times, **kw)
    ms1 = perturbations.mode_spectrum(art, m, rows, times, mesh=mesh, **kw)
    np.testing.assert_allclose(ms1["P_zeta"], ms0["P_zeta"], rtol=1e-10)
    np.testing.assert_allclose(ms1["P_tensor"], ms0["P_tensor"], rtol=1e-10)
    np.testing.assert_allclose(ms1["P_iso"], ms0["P_iso"], rtol=1e-8, atol=1e-25)


def test_delta_n_sweep_batches_parameter_sets(quadratic):
    """delta_n_sweep must reproduce delta_n_spectrum per set, and the φ²
    scaling law pins the per-set parameter routing: along the φ₁ axis the
    e-fold background is independent of m₁ (m only sets the time scale),
    so N_grad is identical across sets and P_ζ scales exactly as m₁²."""
    art, m, rows, times = quadratic
    pars = np.array([[1.0, 1.0], [1.05, 1.0], [0.95, 1.2]])
    kw = dict(pivots=4, N_margin_start=5.0, N_margin_end=8.0, steps=2000,
              max_err=1e-9)
    sw = perturbations.delta_n_sweep(art, pars, [12.0, 0.0], [0.0, 0.0], **kw)
    assert sw["P_zeta"].shape == (3, 4)
    assert sw["ok"].all() and sw["failures"] == [None] * 3
    # set 0 equals the single-spectrum route on the same model/settings
    # (base launch shapes differ → solver noise at controller precision)
    one = perturbations.delta_n_spectrum(art, m, rows, times, **kw)
    np.testing.assert_allclose(sw["ln_k"][0], one["ln_k"], atol=1e-6)
    np.testing.assert_allclose(sw["P_zeta"][0], one["P_zeta"], rtol=1e-3)
    np.testing.assert_allclose(sw["N_grad"][0], one["N_grad"], atol=1e-4)
    # parameter routing: m-scaling law across sets
    np.testing.assert_allclose(sw["N_grad"][1, :, 0], sw["N_grad"][0, :, 0],
                               rtol=1e-4)
    np.testing.assert_allclose(sw["P_zeta"][1] / sw["P_zeta"][0],
                               1.05**2, rtol=1e-3)
    np.testing.assert_allclose(sw["P_zeta"][2] / sw["P_zeta"][0],
                               0.95**2, rtol=1e-3)
    np.testing.assert_allclose(sw["ln_k"][1] - sw["ln_k"][0],
                               np.log(1.05), atol=1e-3)


def test_delta_n_sweep_failure_isolation(quadratic):
    """One pathological parameter set must not kill the sweep: a start at
    φ = 1 leaves slow roll within a fraction of an e-fold (too short for
    any pivot margin), so with on_failure='nan' its outputs NaN-fill while
    the healthy set stays finite; the default raises with the set index."""
    art, m, rows, times = quadratic
    pars = np.array([[1.0, 1.0], [1.0, 1.0]])
    f0 = np.array([[12.0, 0.0], [1.0, 0.0]])
    kw = dict(pivots=3, N_margin_start=5.0, N_margin_end=8.0, steps=2000)
    sw = perturbations.delta_n_sweep(
        art, pars, f0, [0.0, 0.0], order=2, on_failure="nan", **kw
    )
    np.testing.assert_array_equal(sw["ok"], [True, False])
    assert np.isfinite(sw["P_zeta"][0]).all()
    assert np.isfinite(sw["f_NL"][0]).all()
    assert np.isnan(sw["P_zeta"][1]).all()
    assert np.isnan(sw["N_hess"][1]).all()
    assert "too short" in sw["failures"][1]
    with pytest.raises(ValueError, match="parameter set 1"):
        perturbations.delta_n_sweep(art, pars, f0, [0.0, 0.0], **kw)


def test_delta_n_sweep_sharded_matches_single_device(quadratic):
    """The sweep's two batched launches shard over the mesh with zero
    collectives; results must match the unsharded sweep to solver
    precision (launch shapes differ per device count)."""
    import jax

    from inflatox_tpu.parallel import make_mesh

    art, m, rows, times = quadratic
    mesh = make_mesh(axis_names=("solve",), devices=jax.devices())
    pars = np.array([[1.0, 1.0], [1.05, 1.0]])
    kw = dict(pivots=4, N_margin_start=5.0, N_margin_end=8.0, steps=2000)
    sw0 = perturbations.delta_n_sweep(art, pars, [12.0, 0.0], [0.0, 0.0], **kw)
    sw1 = perturbations.delta_n_sweep(
        art, pars, [12.0, 0.0], [0.0, 0.0], mesh=mesh, **kw
    )
    assert sw1["ok"].all()
    np.testing.assert_allclose(sw1["P_zeta"], sw0["P_zeta"], rtol=1e-6)
    np.testing.assert_allclose(sw1["N_grad"], sw0["N_grad"], atol=1e-5)


def test_mode_sweep_batches_parameter_sets(quadratic):
    """mode_sweep must reproduce mode_spectrum per set; the φ² m-scaling
    law (coefficient streams m-independent, norm ∝ H_*² ∝ m²) pins the
    per-set routing on the exact linear-theory spectra too."""
    art, m, rows, times = quadratic
    pars = np.array([[1.0, 1.0], [1.05, 1.0]])
    kw = dict(pivots=3, N_margin_start=5.0, N_margin_end=8.0,
              dense_steps=1200, tail_steps=500)
    sw = perturbations.mode_sweep(
        art, pars, [12.0, 0.0], [0.0, 0.0], steps=2000, max_err=1e-9, **kw
    )
    assert sw["ok"].all() and sw["P_zeta"].shape == (2, 3)
    one = perturbations.mode_spectrum(art, m, rows, times, **kw)
    np.testing.assert_allclose(sw["ln_k"][0], one["ln_k"], atol=1e-6)
    np.testing.assert_allclose(sw["P_zeta"][0], one["P_zeta"], rtol=1e-3)
    np.testing.assert_allclose(sw["P_tensor"][0], one["P_tensor"], rtol=1e-3)
    np.testing.assert_allclose(sw["P_zeta"][1] / sw["P_zeta"][0],
                               1.05**2, rtol=1e-3)
    np.testing.assert_allclose(sw["P_tensor"][1] / sw["P_tensor"][0],
                               1.05**2, rtol=1e-3)


def test_mode_sweep_failure_isolation_and_config_errors(quadratic):
    art, m, rows, times = quadratic
    pars = np.array([[1.0, 1.0], [1.0, 1.0]])
    f0 = np.array([[12.0, 0.0], [1.0, 0.0]])
    kw = dict(pivots=3, N_margin_start=5.0, N_margin_end=8.0,
              dense_steps=800, tail_steps=300, steps=2000)
    sw = perturbations.mode_sweep(art, pars, f0, [0.0, 0.0],
                                  on_failure="nan", **kw)
    np.testing.assert_array_equal(sw["ok"], [True, False])
    assert np.isfinite(sw["P_zeta"][0]).all()
    assert np.isnan(sw["P_zeta"][1]).all()
    assert "too short" in sw["failures"][1]
    with pytest.raises(ValueError, match="parameter set 1"):
        perturbations.mode_sweep(art, pars, f0, [0.0, 0.0], **kw)
    # configuration-level constraint violations raise even with
    # on_failure="nan" (they would NaN every set otherwise)
    with pytest.raises(ValueError, match="N_sub"):
        perturbations.mode_sweep(
            art, pars, f0, [0.0, 0.0], on_failure="nan",
            pivots=3, N_margin_start=2.0, N_sub=4.0,
        )


def test_mode_sweep_sharded_matches_single_device(quadratic):
    import jax

    from inflatox_tpu.parallel import make_mesh

    art, m, rows, times = quadratic
    mesh = make_mesh(axis_names=("solve",), devices=jax.devices())
    pars = np.array([[1.0, 1.0], [1.05, 1.0]])
    kw = dict(pivots=3, N_margin_start=5.0, N_margin_end=8.0,
              dense_steps=800, tail_steps=300, steps=2000)
    sw0 = perturbations.mode_sweep(art, pars, [12.0, 0.0], [0.0, 0.0], **kw)
    sw1 = perturbations.mode_sweep(
        art, pars, [12.0, 0.0], [0.0, 0.0], mesh=mesh, **kw
    )
    assert sw1["ok"].all()
    # the mode integrations shard the concatenated pivot axis (identical
    # math, GSPMD partitioning only); the base solves shard the batch
    np.testing.assert_allclose(sw1["P_zeta"], sw0["P_zeta"], rtol=1e-6)
    np.testing.assert_allclose(sw1["P_tensor"], sw0["P_tensor"], rtol=1e-6)


def test_transport_sweep_batches_parameter_sets(quadratic):
    """transport_sweep must reproduce transport_spectrum per set (incl.
    the Wands transfer functions) and honor the global m-scaling law:
    rescaling BOTH masses rescales H (so P ∝ m²) but leaves the e-fold
    dynamics — and hence the transfer functions — invariant (scaling m₁
    alone would change m₂/H and the entropic decay rate)."""
    art, m, rows, times = quadratic
    pars = np.array([[1.0, 1.0], [1.05, 1.05]])
    kw = dict(pivots=3, N_margin_start=5.0, N_margin_end=8.0,
              dense_steps=1200, tail_steps=500)
    sw = perturbations.transport_sweep(
        art, pars, [12.0, 0.0], [0.0, 0.0], steps=2000, max_err=1e-9, **kw
    )
    assert sw["ok"].all() and sw["T_RS"].shape == (2, 3)
    one = perturbations.transport_spectrum(art, m, rows, times, **kw)
    np.testing.assert_allclose(sw["P_zeta"][0], one["P_zeta"], rtol=1e-3)
    np.testing.assert_allclose(sw["P_tensor"][0], one["P_tensor"], rtol=1e-3)
    np.testing.assert_allclose(sw["T_SS"][0], one["T_SS"], rtol=1e-3)
    np.testing.assert_allclose(sw["P_zeta"][1] / sw["P_zeta"][0],
                               1.05**2, rtol=1e-3)
    # transfer functions are amplitude ratios — m-independent
    np.testing.assert_allclose(sw["T_SS"][1], sw["T_SS"][0], rtol=1e-3)
    # failure isolation shares the mode_sweep machinery; spot-check it
    f0 = np.array([[12.0, 0.0], [1.0, 0.0]])
    sw2 = perturbations.transport_sweep(
        art, pars, f0, [0.0, 0.0], on_failure="nan", steps=2000,
        pivots=3, N_margin_start=5.0, N_margin_end=8.0,
        dense_steps=800, tail_steps=300,
    )
    np.testing.assert_array_equal(sw2["ok"], [True, False])
    assert np.isnan(sw2["T_RS"][1]).all()
    assert np.isfinite(sw2["P_zeta"][0]).all()


def test_pivot_placement_by_N_before_end(quadratic):
    """pivot_N_before_end places pivots at CMB-style e-fold distances
    before the end of inflation on every route, overriding pivots=."""
    art, m, rows, times = quadratic
    spec = perturbations.delta_n_spectrum(
        art, m, rows, times, pivot_N_before_end=[25.0, 20.0, 15.0],
        N_margin_start=5.0, N_margin_end=8.0, steps=2000,
    )
    assert spec["P_zeta"].shape == (3,)
    # ascending in N, spaced exactly as requested
    np.testing.assert_allclose(np.diff(spec["N"]), [5.0, 5.0], atol=1e-9)
    ms = perturbations.mode_spectrum(
        art, m, rows, times, pivot_N_before_end=[20.0, 15.0],
        N_margin_start=5.0, N_margin_end=8.0,
        dense_steps=800, tail_steps=300,
    )
    np.testing.assert_allclose(np.diff(ms["N"]), [5.0], atol=1e-9)
    assert np.isfinite(ms["P_zeta"]).all()
    # δN and mode pivots at the same N-before-end see the same k
    np.testing.assert_allclose(ms["ln_k"], spec["ln_k"][1:], atol=1e-9)
    # sweeps: same placement per set; m-invariant dynamics → same N_grad
    sw = perturbations.delta_n_sweep(
        art, np.array([[1.0, 1.0], [1.05, 1.05]]), [12.0, 0.0], [0.0, 0.0],
        steps=2000, pivot_N_before_end=[20.0, 15.0],
        N_margin_start=5.0, N_margin_end=8.0,
    )
    assert sw["ok"].all() and sw["P_zeta"].shape == (2, 2)
    # the per-set end-of-inflation crossing is resolved to solver
    # precision, shifting the pivot (and hence N_grad) at the ~1e-4 level
    np.testing.assert_allclose(sw["N_grad"][1], sw["N_grad"][0],
                               rtol=1e-4, atol=1e-6)
    # a pivot outside the margin-bounded window is rejected with the window
    with pytest.raises(ValueError, match="valid window"):
        perturbations.delta_n_spectrum(
            art, m, rows, times, pivot_N_before_end=[2.0]
        )


def test_squeezed_fnl_maldacena_consistency(quadratic):
    """The separate-universe response route must reproduce the FULL
    Maldacena consistency relation f_NL^sq = (5/12)(1 − n_s) on a
    single-field background — including the dilation contribution that the
    δN local amplitude (order=2 N_{;ab}) misses by a factor ~2."""
    art, m, rows, times = quadratic
    kw = dict(steps=2000, max_err=1e-9, N_margin_start=2.0, N_margin_end=5.0)
    sq = perturbations.squeezed_fnl(
        art, m, rows, times, N_long_before_end=28.0,
        N_short_before_end=(18.0, 12.0), **kw,
    )
    assert sq["f_NL_sq"].shape == (2,)
    # n_s measured from the same δN machinery (3-point stencil per short
    # pivot) — the consistency relation against the MEASURED tilt holds to
    # ~0.2%; the analytic slow-roll tilt only to ~5%
    dn = perturbations.delta_n_spectrum(
        art, m, rows, times,
        pivot_N_before_end=[19.0, 18.0, 17.0, 13.0, 12.0, 11.0], **kw,
    )
    maldacena = (5.0 / 12.0) * (1.0 - dn["n_s"][[1, 4]])
    np.testing.assert_allclose(sq["f_NL_sq"], maldacena, rtol=0.02)
    # the short pivots are anchored at the same physical k as the base run
    np.testing.assert_allclose(sq["ln_k_short"], dn["ln_k"][[1, 4]],
                               atol=1e-9)
    # spectator direction: no response on the single-field axis
    np.testing.assert_allclose(sq["response"][1], 0.0, atol=1e-4)
    # the ± average short spectrum is the base spectrum up to O(h²)
    np.testing.assert_allclose(sq["P_zeta_short"], dn["P_zeta"][[1, 4]],
                               rtol=1e-3)
    # error paths: shorts must cross after the long mode; window respected
    with pytest.raises(ValueError, match="squeezed limit"):
        perturbations.squeezed_fnl(
            art, m, rows, times, N_long_before_end=15.0,
            N_short_before_end=(18.0,), **kw,
        )
    with pytest.raises(ValueError, match="valid window"):
        perturbations.squeezed_fnl(
            art, m, rows, times, N_long_before_end=200.0,
            N_short_before_end=(18.0,), **kw,
        )


def test_squeezed_fnl_multifield_dilation_split(curved):
    """On the turning curved-field-space background the response route's
    f_NL^sq sits at the adiabatic consistency value (the background is
    adiabatic-dominated there), while the δN local amplitude carries only
    the non-dilation part — the physically expected split."""
    art, args, rows, times = curved
    kw = dict(steps=3000, max_err=1e-9, N_margin_start=2.0, N_margin_end=5.0)
    sq = perturbations.squeezed_fnl(
        art, args, rows, times, N_long_before_end=22.0,
        N_short_before_end=(14.0,), **kw,
    )
    dn = perturbations.delta_n_spectrum(
        art, args, rows, times, pivot_N_before_end=[15.0, 14.0, 13.0],
        order=2, **kw,
    )
    consistency = (5.0 / 12.0) * (1.0 - dn["n_s"][1])
    np.testing.assert_allclose(sq["f_NL_sq"][0], consistency, rtol=0.05)
    # both field directions respond on a genuinely two-field background
    assert np.all(np.abs(sq["response"][:, 0]) > 1e-3)
    # the δN local part alone is materially below the full squeezed value
    assert dn["f_NL"][1] < 0.7 * sq["f_NL_sq"][0]


def test_spectra_error_paths(quadratic):
    art, m, rows, times = quadratic
    with pytest.raises(ValueError, match="does not end"):
        perturbations.delta_n_spectrum(art, m, rows[:50], times[:50])
    with pytest.raises(ValueError, match="N_margin_end"):
        perturbations.mode_spectrum(art, m, rows, times, N_margin_end=1.0)
    with pytest.raises(ValueError, match="N_margin_start"):
        perturbations.mode_spectrum(art, m, rows, times, N_margin_start=1.0)
    with pytest.raises(ValueError, match="too short"):
        perturbations.delta_n_spectrum(
            art, m, rows, times, N_margin_start=50.0, N_margin_end=50.0
        )
    with pytest.raises(ValueError, match="raise steps"):
        perturbations.delta_n_spectrum(
            art, m, rows, times, pivots=3, N_margin_start=3.0, steps=60
        )


def test_transport_cross_validates_mode_flat(quadratic):
    """The moment-transport route integrates the SAME u-matrix streams as
    the mode route, so the two must agree to integrator error (the
    difference refines ~4th order; ~1e-5 at these step counts)."""
    art, m, rows, times = quadratic
    kw = dict(pivots=5, N_margin_start=5.0, N_margin_end=8.0,
              dense_steps=1500, tail_steps=600)
    ms = perturbations.mode_spectrum(art, m, rows, times, **kw)
    tr = perturbations.transport_spectrum(art, m, rows, times, **kw)
    np.testing.assert_allclose(tr["ln_k"], ms["ln_k"], rtol=1e-12)
    np.testing.assert_allclose(tr["P_zeta"], ms["P_zeta"], rtol=5e-5)
    np.testing.assert_allclose(tr["P_tensor"], ms["P_tensor"], rtol=5e-5)
    np.testing.assert_allclose(tr["P_iso"], ms["P_iso"], rtol=5e-5)
    # single-field axis: zero ζ–S correlation, zero adiabatic–entropic
    # transfer, and no super-horizon feeding of P_ζ
    np.testing.assert_allclose(tr["T_RS"], 0.0, atol=1e-8)
    np.testing.assert_allclose(tr["P_zeta"], tr["P_zeta_star"], rtol=0.03)
    # the heavy orthogonal direction decays: T_SS < 1
    assert np.all(tr["T_SS"] < 1.0)
    # scalar running on φ²: α_s ≈ −32/φ⁴ — negative and small
    inner = slice(1, -1)
    assert np.all(tr["alpha_s"][inner] < 0.0)
    assert np.all(np.abs(tr["alpha_s"][inner]) < 0.02)
    np.testing.assert_allclose(
        tr["alpha_s"][inner], ms["alpha_s"][inner], rtol=1e-2
    )


def test_transport_transfer_functions_curved(curved):
    """On a turning background the Wands transfer-function decomposition
    must be internally consistent: with ζ–S uncorrelated at the crossing
    surface (true to O(slow-roll)),

        P_ζ(end) = P_ζ* + T_RS² P_S*   and   cos Δ = T_RS √(P_S*/P_ζ(end))."""
    art, args, rows, times = curved
    kw = dict(pivots=4, N_margin_start=5.0, N_margin_end=8.0,
              dense_steps=1500, tail_steps=600)
    ms = perturbations.mode_spectrum(art, args, rows, times, **kw)
    tr = perturbations.transport_spectrum(art, args, rows, times, **kw)
    np.testing.assert_allclose(tr["P_zeta"], ms["P_zeta"], rtol=1e-3)
    np.testing.assert_allclose(tr["P_iso"], ms["P_iso"], rtol=1e-3)
    np.testing.assert_allclose(
        tr["cos_delta"], ms["cos_delta"], rtol=1e-3, atol=1e-8
    )
    pred = tr["P_zeta_star"] + tr["T_RS"] ** 2 * tr["P_iso_star"]
    np.testing.assert_allclose(tr["P_zeta"], pred, rtol=0.05)
    cos_pred = tr["T_RS"] * np.sqrt(tr["P_iso_star"] / tr["P_zeta"])
    np.testing.assert_allclose(tr["cos_delta"], cos_pred, rtol=0.05)


def test_transport_sharded_matches_single_device(quadratic):
    """Pivot-axis sharding of the transport route (GSPMD partitioning
    only — the per-pivot integrations are independent)."""
    import jax

    from inflatox_tpu.parallel import make_mesh

    art, m, rows, times = quadratic
    mesh = make_mesh(axis_names=("solve",), devices=jax.devices())
    kw = dict(pivots=4, N_margin_start=5.0, N_margin_end=8.0,
              dense_steps=800, tail_steps=400)
    tr0 = perturbations.transport_spectrum(art, m, rows, times, **kw)
    tr1 = perturbations.transport_spectrum(art, m, rows, times, mesh=mesh, **kw)
    np.testing.assert_allclose(tr1["P_zeta"], tr0["P_zeta"], rtol=1e-10)
    np.testing.assert_allclose(tr1["P_tensor"], tr0["P_tensor"], rtol=1e-10)
    np.testing.assert_allclose(
        tr1["P_iso"], tr0["P_iso"], rtol=1e-8, atol=1e-25
    )
