"""First-principles multi-field perturbation spectra.

Two independent routes to the primordial scalar power spectrum, both built
on the framework's batched background solver and geometry surfaces and both
impossible on the reference's design (its solver output has no time axis —
background_solver.rs:283-295 — and its C ABI exposes no curvature or
coordinate-Hesse functions):

* **δN formalism** (:func:`delta_n_spectrum`): ζ(x) = δN, the difference in
  e-fold count from a flat slice at horizon crossing to a final
  uniform-density (here uniform-H) surface.  P_ζ(k) = G^{ab} N_a N_b
  (H_*/2π)² with N_a = ∂N/∂φ^a_* computed by central finite differences of
  *full nonlinear background solves* from perturbed initial field values —
  every perturbed trajectory of every pivot runs in ONE batched device
  launch.  Exact on super-horizon scales given slow-roll at crossing (the
  field-velocity dependence of N is erased by the attractor); includes all
  multi-field and field-space-metric effects through the solves themselves.

The Mukhanov-Sasaki mode-integration route (:func:`mode_spectrum`, when
present) solves the coupled perturbation ODEs through horizon crossing and
is cross-validated against δN — two formalisms, one answer.

Conventions: reduced Planck units (M_Pl = 1); P_ζ is the dimensionless
spectrum (single-field slow-roll limit H²/(8π²ε)); ln k = N + ln H at
crossing with N normalized to the supplied trajectory's start (only Δln k
is physical).
"""

from __future__ import annotations

import numpy as np

from . import background
from .observables import _split_rows
from .utils.errors import ShapeError

__all__ = ["delta_n_spectrum", "mode_spectrum"]


def _base_quantities(artifact, args, rows, times):
    """Common base-trajectory analysis: e-fold axis, ε_H, end of inflation
    (ε_H = 1 crossing, interpolated) and the H value there."""
    rows = np.asarray(rows, dtype=float)
    times = np.asarray(times, dtype=float)
    if rows.ndim != 2 or times.shape != (rows.shape[0],):
        raise ShapeError(
            (rows.shape[0],), times.shape,
            "pass one base trajectory's rows with its times (return_time=True)",
        )
    x_cols, chi_cols, hubble = _split_rows(artifact, rows)
    hubble = np.asarray(hubble)
    eps_h = np.asarray(
        0.5 * artifact.inner_prod(x_cols, args, chi_cols, chi_cols)
        / (hubble * hubble)
    )
    n_axis = background.efolds(rows, times)
    above = np.nonzero(eps_h >= 1.0)[0]
    if above.size == 0:
        raise ValueError(
            "the base trajectory never reaches ε_H = 1 — integrate further "
            f"(max ε_H = {np.nanmax(eps_h):.3g})"
        )
    i = int(above[0])
    if i == 0:
        raise ValueError("base trajectory starts with ε_H ≥ 1 (not inflating)")
    frac = (1.0 - eps_h[i - 1]) / (eps_h[i] - eps_h[i - 1])
    n_end = n_axis[i - 1] + frac * (n_axis[i] - n_axis[i - 1])
    h_ref = hubble[i - 1] + frac * (hubble[i] - hubble[i - 1])
    return rows, times, hubble, eps_h, n_axis, i, n_end, h_ref


def delta_n_spectrum(
    artifact,
    args,
    rows,
    times,
    *,
    pivots: int = 12,
    N_margin_start: float = 2.0,
    N_margin_end: float = 5.0,
    h: float = 1e-4,
    steps: int = 4000,
    max_err: float = 1e-8,
    solver: str = "rkf",
    mesh=None,
) -> dict:
    """Scalar power spectrum from the δN formalism along a solved trajectory.

    ``rows``/``times`` are a solved base trajectory
    (:func:`~inflatox_tpu.background.solve_eom` with ``return_time=True``)
    that reaches the end of inflation (ε_H = 1).  ``pivots`` horizon-crossing
    points are placed evenly in e-fold time between ``N_margin_start`` after
    the start and ``N_margin_end`` before the end; for each pivot, each
    field coordinate is perturbed by ±h·max(1, |φ^a_*|) (velocities kept on
    the attractor) and ALL 2·d·pivots perturbed backgrounds are integrated
    in one :func:`~inflatox_tpu.background.solve_eom_batch` launch
    (``mesh=`` shards the batch across chips).  Each trajectory's e-fold
    count to the common final uniform-H surface (H at the base trajectory's
    ε_H = 1 crossing) gives N(φ_*) by central differences, and

        P_ζ(k_*) = G^{ab}(φ_*) N_a N_b · (H_*/2π)²,   k_* = a H|_*.

    Returns a dict of per-pivot arrays: ``ln_k``, ``N``, ``P_zeta``,
    ``P_tensor`` (= 2H²/π²), ``n_s`` (centered differences of ln P_ζ over
    ln k; NaN at the ends), ``r`` (= P_T/P_ζ), ``N_grad`` ((pivots, d) —
    the δN gradients themselves), ``H``.

    Accuracy notes: the result is exact in the super-horizon separate-
    universe limit given slow roll *at crossing* — the single-field φ²
    test reproduces H²/(8πε) to O(1/N).  ``h`` balances finite-difference
    truncation against solver noise (N is resolved to ~``max_err``); the
    default loses ~1e-4 relative on N_a.  Raise ``steps`` if a perturbed
    trajectory fails to reach the final surface (a ``ValueError`` says so).
    """
    d = artifact.n_fields
    rows, times, hubble, eps_h, n_axis, i, n_end, h_ref = _base_quantities(
        artifact, args, rows, times
    )

    n_lo = n_axis[0] + float(N_margin_start)
    n_hi = n_end - float(N_margin_end)
    if not n_hi > n_lo:
        raise ValueError(
            f"trajectory spans only {n_end - n_axis[0]:.1f} e-folds — too "
            "short for the requested pivot margins"
        )
    n_pivots = np.linspace(n_lo, n_hi, int(pivots))

    # pivot states interpolated in e-fold time
    span = slice(0, i + 1)
    x_star = np.stack([
        np.interp(n_pivots, n_axis[span], rows[span, c]) for c in range(d)
    ], axis=1)                                   # (pivots, d)
    chi_star = np.stack([
        np.interp(n_pivots, n_axis[span], rows[span, d + c]) for c in range(d)
    ], axis=1)                                   # (pivots, d)
    h_star = np.interp(n_pivots, n_axis[span], hubble[span])

    # batch of perturbed initial conditions: (pivots, d directions, ±)
    h_a = h * np.maximum(1.0, np.abs(x_star))    # (pivots, d) per-field steps
    f0 = []
    for p in range(int(pivots)):
        for a in range(d):
            for s in (+1.0, -1.0):
                xp = x_star[p].copy()
                xp[a] += s * h_a[p, a]
                f0.append(xp)
    f0 = np.asarray(f0)                          # (B, d), B = pivots·2d
    chi0 = np.repeat(chi_star, 2 * d, axis=0)

    rows_b, times_b = background.solve_eom_batch(
        artifact, np.asarray(args, dtype=float), int(steps), f0, chi0,
        max_err=max_err, solver=solver, return_time=True,
        **({"mesh": mesh} if mesh is not None else {}),
    )
    rows_b = np.asarray(rows_b)
    times_b = np.asarray(times_b)
    n_b = background.efolds(rows_b, times_b)     # (B, steps)
    hub_b = rows_b[..., -1]

    # e-folds to the common uniform-H surface (H decreases monotonically:
    # H' = -½G_ab χ^a χ^b < 0), interpolated at the crossing segment
    reached = hub_b.min(axis=1) <= h_ref
    if not reached.all():
        bad = int(np.nonzero(~reached)[0][0])
        raise ValueError(
            f"perturbed trajectory {bad} never reaches the final surface "
            f"H = {h_ref:.4g} within {steps} rows (min H "
            f"{hub_b[bad].min():.4g}) — raise steps"
        )
    idx = np.argmax(hub_b <= h_ref, axis=1)      # first row past the surface
    rows_idx = np.arange(rows_b.shape[0])
    h_hi = hub_b[rows_idx, idx - 1]
    h_lo = hub_b[rows_idx, idx]
    w = (h_hi - h_ref) / (h_hi - h_lo)
    n_surface = (
        n_b[rows_idx, idx - 1]
        + w * (n_b[rows_idx, idx] - n_b[rows_idx, idx - 1])
    )

    n_surface = n_surface.reshape(int(pivots), d, 2)
    n_grad = (n_surface[:, :, 0] - n_surface[:, :, 1]) / (2.0 * h_a)

    # P_ζ = G^{ab} N_a N_b (H_*/2π)² per pivot
    p_zeta = np.empty(int(pivots))
    for p in range(int(pivots)):
        g = np.asarray(artifact.metric(x_star[p], np.asarray(args, float)))
        ginv = np.linalg.inv(g)
        p_zeta[p] = (n_grad[p] @ ginv @ n_grad[p]) * (h_star[p] / (2 * np.pi)) ** 2

    ln_k = n_pivots + np.log(h_star)
    p_tens = 2.0 * h_star * h_star / np.pi**2
    n_s = np.full(int(pivots), np.nan)
    if int(pivots) >= 3:
        ln_p = np.log(p_zeta)
        n_s[1:-1] = 1.0 + (ln_p[2:] - ln_p[:-2]) / (ln_k[2:] - ln_k[:-2])
    return {
        "ln_k": ln_k,
        "N": n_pivots,
        "P_zeta": p_zeta,
        "P_tensor": p_tens,
        "n_s": n_s,
        "r": p_tens / p_zeta,
        "N_grad": n_grad,
        "H": h_star,
    }


# ----------------------------------------------------------------------- #
# Mukhanov-Sasaki mode integration                                         #
# ----------------------------------------------------------------------- #


def _with_samples(arr, nd, s):
    """Give a lowered-constant result (ndim == nd, no grid axis) the trailing
    sample axis — flat metrics lower Γ/R/G/V_ab to literal constants."""
    arr = np.asarray(arr, dtype=float)
    if arr.ndim == nd:
        arr = np.broadcast_to(arr[..., None], arr.shape + (s,))
    return arr


def _mass_matrix_over_h2(artifact, args, x_pts, u_pts, h_pts, eps_pts):
    """The coupled perturbation mass matrix M^a_b / H² at sample points.

    Standard multi-field result (spatially flat gauge, cosmic time):

        M^a_b = V^a_{;b} − R^a_{cdb} χ^c χ^d
                − (1/a³) D_t(a³ χ^a χ_b / H)
              = V^a_{;b} − R^a_{cdb} χ^c χ^d + (3 − ε) χ^a χ_b
                + (V^a χ_b + χ^a V_b)/H

    (the last equality expands the kinematic term with the background EoM
    D_t χ^a = −3Hχ^a − V^a and Ḣ = −εH²).  ``x_pts``/``u_pts`` are (d, S)
    arrays of field points and e-fold velocities u = χ/H; returns (S, d, d).
    Cross-validated against the δN spectrum on flat and curved field
    spaces (tests/test_perturbations.py)."""
    d = artifact.n_fields
    a = np.asarray(args, dtype=float)
    x_list = [x_pts[c] for c in range(d)]
    chi = u_pts * h_pts                                    # χ^a, (d, S)

    s = x_pts.shape[-1]
    g = np.moveaxis(
        _with_samples(artifact.metric(x_list, a), 2, s), -1, 0
    )                                                      # (S,d,d)
    ginv = np.linalg.inv(g)
    grad = _with_samples(artifact.grad(x_list, a), 1, s)   # V_a, (d, S)
    hess = np.moveaxis(
        _with_samples(artifact.geometry.hesse(x_list, a), 2, s), -1, 0
    )                                                      # V_{;ab}, (S,d,d)
    riem = _with_samples(
        artifact.geometry.riemann(x_list, a), 4, s
    )                                                      # (d,d,d,d,S)

    chi_s = chi.T                                          # (S, d) upper
    chi_lo = np.einsum("sbc,sc->sb", g, chi_s)             # χ_b
    grad_s = grad.T                                        # V_b, (S, d)
    grad_up = np.einsum("sab,sb->sa", ginv, grad_s)        # V^a

    m = np.einsum("sac,scb->sab", ginv, hess)              # V^a_{;b}
    m = m - np.einsum("aklbs,sk,sl->sab", riem, chi_s, chi_s)
    m = m + (3.0 - eps_pts)[:, None, None] * np.einsum(
        "sa,sb->sab", chi_s, chi_lo
    )
    m = m + (
        np.einsum("sa,sb->sab", grad_up, chi_lo)
        + np.einsum("sa,sb->sab", chi_s, grad_s)
    ) / h_pts[:, None, None]
    return m / (h_pts * h_pts)[:, None, None]


def _gamma_u(artifact, args, x_pts, u_pts):
    """Transport matrix (Γ^a_{bc} u^b) at sample points → (S, d, d)."""
    d = artifact.n_fields
    gam = _with_samples(
        artifact.geometry.christoffels([x_pts[c] for c in range(d)],
                                       np.asarray(args, dtype=float)),
        3, x_pts.shape[-1],
    )                                                      # (d,d,d,S)
    return np.einsum("abcs,bs->sac", gam, u_pts)


def mode_spectrum(
    artifact,
    args,
    rows,
    times,
    *,
    pivots: int = 12,
    N_margin_start: float = 5.0,
    N_margin_end: float = 5.0,
    N_sub: float = 4.0,
    N_dense: float = 2.0,
    dense_steps: int = 4000,
    tail_steps: int = 1500,
) -> dict:
    """Scalar power spectrum by direct Mukhanov-Sasaki mode integration.

    For each pivot k = aH|_* the coupled gauge-invariant field perturbations
    Q^a (spatially flat gauge) are evolved in e-fold time through horizon
    crossing,

        D_N² Q^a + (3 − ε) D_N Q^a + (k/aH)² Q^a + (M^a_b/H²) Q^b = 0,

    with D_N the covariant derivative along the trajectory
    (:func:`_gamma_u`), M the standard mass matrix incl. the Riemann term
    (:func:`_mass_matrix_over_h2` — this is where the geometry layer pays
    off), Bunch-Davies initial conditions ``N_sub`` e-folds inside the
    horizon seeded on the model's orthonormal vielbein (d independent
    realizations), and

        P_ζ(k) = (k³/2π²) Σ_i |χ_a Q^a_(i) / (2 ε H)|²

    evaluated on the common surface ε_H = 1 − ε_margin near the end of
    inflation, so super-horizon evolution (multi-field entropic feeding) is
    included exactly as the δN route counts it.  All pivots integrate in
    one jitted ``vmap(lax.scan)`` launch: per-pivot RK4 on a two-phase
    e-fold grid — ``dense_steps`` sub-horizon steps over
    [N_* − N_sub, N_* + N_dense] resolving the oscillations, ``tail_steps``
    super-horizon steps to the end surface.  The ODE coefficients are real,
    so the complex modes ride as two real systems sharing one coefficient
    stream.

    Returns the same dict layout as :func:`delta_n_spectrum` (without
    ``N_grad``).  Accuracy budget: massless Bunch-Davies truncation
    ~1/y₀² ≈ 3·10⁻⁴ at the default ``N_sub=4`` plus RK4 phase error
    ~10⁻³ at the default step counts — agreement with δN to ~1% is the
    validated envelope.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    d = artifact.n_fields
    rows, times, hubble, eps_h, n_axis, i_end, n_end, h_ref = _base_quantities(
        artifact, args, rows, times
    )
    span = slice(0, i_end + 1)
    n_span = n_axis[span]

    n_lo = n_axis[0] + max(float(N_margin_start), float(N_sub) + 0.25)
    n_hi = n_end - float(N_margin_end)
    if not n_hi > n_lo:
        raise ValueError(
            f"trajectory spans only {n_end - n_axis[0]:.1f} e-folds — too "
            "short for the requested pivot margins"
        )
    n_pivots = np.linspace(n_lo, n_hi, int(pivots))
    n_stop = n_end - 0.25  # common final surface (ζ read-out)

    def interp(col, targets):
        return np.interp(targets, n_span, col[span])

    h_star = interp(hubble, n_pivots)
    ln_k = n_pivots + np.log(h_star)
    k_phys = np.exp(ln_k)

    # per-pivot two-phase e-fold grids (K, S+1 nodes)
    grids = []
    for p in range(int(pivots)):
        dense = np.linspace(n_pivots[p] - N_sub, n_pivots[p] + N_dense,
                            int(dense_steps) + 1)
        tail = np.linspace(n_pivots[p] + N_dense, n_stop,
                           int(tail_steps) + 1)[1:]
        grids.append(np.concatenate([dense, tail]))
    grids = np.asarray(grids)                              # (K, S+1)
    if grids[:, 0].min() < n_axis[0] - 1e-12:
        raise ValueError(
            "first pivot needs background earlier than the trajectory start "
            "— raise N_margin_start or start the base solve deeper"
        )
    mids = 0.5 * (grids[:, :-1] + grids[:, 1:])            # (K, S)
    dts = np.diff(grids, axis=1)                           # (K, S)

    # background samples at every node and midpoint, all pivots at once
    def samples(targets):
        flat = targets.ravel()
        x = np.stack([interp(rows[:, c], flat) for c in range(d)])
        u = np.stack([
            interp(rows[:, d + c], flat) for c in range(d)
        ])
        hh = interp(hubble, flat)
        u = u / hh                                          # u = χ/H
        ee = interp(eps_h, flat)
        gam = _gamma_u(artifact, args, x, u)
        cmat = _mass_matrix_over_h2(artifact, args, x, u, hh, ee)
        shape = targets.shape
        return (
            gam.reshape(shape + (d, d)),
            cmat.reshape(shape + (d, d)),
            (3.0 - ee).reshape(shape),
            hh.reshape(shape),
        )

    gam_n, c_n, fric_n, h_n = samples(grids)               # nodes (K, S+1, …)
    gam_m, c_m, fric_m, h_m = samples(mids)                # midpoints (K, S, …)

    # y² = (k/aH)² at nodes and midpoints
    y2_n = (k_phys[:, None] * np.exp(-grids) / h_n) ** 2
    y2_m = (k_phys[:, None] * np.exp(-mids) / h_m) ** 2

    # Bunch-Davies initial conditions on the vielbein at the first node.
    # The true amplitude 1/(a₀√(2k)) ~ e^{-(N*−N_sub)}·e^{-N*/2} underflows
    # the TPU's emulated f64 (f32 dynamic range) for late pivots; the ODE is
    # linear, so integrate the UNIT-amplitude modes Q̃ and fold the amplitude
    # into the read-out, where k³·amp² = k²/(2a₀²) = (H_* e^{N_sub})²/2
    # analytically — no out-of-range number ever reaches the device.
    x0 = np.stack([interp(rows[:, c], grids[:, 0]) for c in range(d)])
    basis0 = _with_samples(
        artifact.basis([x0[c] for c in range(d)], np.asarray(args, float)),
        2, int(pivots),
    )                                                      # (d real, d comp, K)
    y0 = np.sqrt(y2_n[:, 0])
    q_r0 = np.moveaxis(basis0, -1, 0)                      # (K, i, a)
    q_i0 = np.zeros_like(q_r0)
    dq_r0 = -q_r0                                           # d/dN of BD mode
    dq_i0 = -y0[:, None, None] * q_r0
    # covariant P = dQ/dN + (Γu) Q
    p_r0 = dq_r0 + np.einsum("kac,kic->kia", gam_n[:, 0], q_r0)
    p_i0 = dq_i0 + np.einsum("kac,kic->kia", gam_n[:, 0], q_i0)
    state0 = np.stack([q_r0, q_i0, p_r0, p_i0], axis=1)     # (K, 4, i, a)

    def rhs(state, gam, cmat, fric, y2):
        q_r, q_i, p_r, p_i = state[0], state[1], state[2], state[3]
        gam_t = gam.T
        c_t = cmat.T
        dq_r = p_r - q_r @ gam_t
        dq_i = p_i - q_i @ gam_t
        dp_r = -(p_r @ gam_t) - fric * p_r - y2 * q_r - q_r @ c_t
        dp_i = -(p_i @ gam_t) - fric * p_i - y2 * q_i - q_i @ c_t
        return jnp.stack([dq_r, dq_i, dp_r, dp_i])

    def integrate(state0_k, per_step):
        def step(state, s):
            g0, c0, f0, y20, g1, c1, f1, y21, g2, c2, f2, y22, dt = s
            k1 = rhs(state, g0, c0, f0, y20)
            k2 = rhs(state + 0.5 * dt * k1, g1, c1, f1, y21)
            k3 = rhs(state + 0.5 * dt * k2, g1, c1, f1, y21)
            k4 = rhs(state + dt * k3, g2, c2, f2, y22)
            return state + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        out, _ = lax.scan(step, state0_k, per_step)
        return out

    per_step = (
        jnp.asarray(gam_n[:, :-1]), jnp.asarray(c_n[:, :-1]),
        jnp.asarray(fric_n[:, :-1, None, None]),
        jnp.asarray(y2_n[:, :-1, None, None]),
        jnp.asarray(gam_m), jnp.asarray(c_m),
        jnp.asarray(fric_m[:, :, None, None]),
        jnp.asarray(y2_m[:, :, None, None]),
        jnp.asarray(gam_n[:, 1:]), jnp.asarray(c_n[:, 1:]),
        jnp.asarray(fric_n[:, 1:, None, None]),
        jnp.asarray(y2_n[:, 1:, None, None]),
        jnp.asarray(dts[:, :, None, None, None]),
    )
    final = jax.jit(jax.vmap(integrate))(jnp.asarray(state0), per_step)
    final = np.asarray(final)                               # (K, 4, i, a)

    # ζ read-out on the common end surface
    x_f = np.stack([interp(rows[:, c], grids[:, -1]) for c in range(d)])
    chi_f = np.stack([interp(rows[:, d + c], grids[:, -1]) for c in range(d)])
    h_f = interp(hubble, grids[:, -1])
    eps_f = interp(eps_h, grids[:, -1])
    g_f = np.moveaxis(
        _with_samples(artifact.metric([x_f[c] for c in range(d)],
                                      np.asarray(args, float)),
                      2, int(pivots)), -1, 0
    )                                                      # (K, d, d)
    chi_lo = np.einsum("kab,bk->ka", g_f, chi_f)           # χ_a, (K, d)
    zeta_r = np.einsum("ka,kia->ki", chi_lo, final[:, 0]) / (
        2.0 * eps_f * h_f
    )[:, None]
    zeta_i = np.einsum("ka,kia->ki", chi_lo, final[:, 1]) / (
        2.0 * eps_f * h_f
    )[:, None]
    # k³·amp² = (H_* e^{N_sub})²/2 with amp = 1/(a₀√(2k)), a₀ = e^{N*−N_sub}
    k3_amp2 = 0.5 * (h_star * np.exp(float(N_sub))) ** 2
    p_zeta = (k3_amp2 / (2.0 * np.pi**2)) * (
        zeta_r**2 + zeta_i**2
    ).sum(axis=1)

    p_tens = 2.0 * h_star * h_star / np.pi**2
    n_s = np.full(int(pivots), np.nan)
    if int(pivots) >= 3:
        ln_p = np.log(p_zeta)
        n_s[1:-1] = 1.0 + (ln_p[2:] - ln_p[:-2]) / (ln_k[2:] - ln_k[:-2])
    return {
        "ln_k": ln_k,
        "N": n_pivots,
        "P_zeta": p_zeta,
        "P_tensor": p_tens,
        "n_s": n_s,
        "r": p_tens / p_zeta,
        "H": h_star,
    }
