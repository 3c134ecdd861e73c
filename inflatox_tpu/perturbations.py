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

* **Mukhanov-Sasaki mode integration** (:func:`mode_spectrum`): solves the
  coupled perturbation ODEs through horizon crossing and is cross-validated
  against δN — two independent formalisms, one answer.  Also yields the
  exact tensor spectrum and the isocurvature decomposition.

* **Moment transport** (:func:`transport_spectrum`): evolves the phase-space
  correlation matrix Σ^{AB}(k) itself (dΣ/dN = uΣ + Σuᵀ) through the same
  covariant coefficient streams as the mode route — PyTransport-style — and
  additionally reads Σ on the post-crossing surface, yielding the Wands
  super-horizon transfer functions T_RS/T_SS.

Conventions: reduced Planck units (M_Pl = 1); P_ζ is the dimensionless
spectrum (single-field slow-roll limit H²/(8π²ε)); ln k = N + ln H at
crossing with N normalized to the supplied trajectory's start (only Δln k
is physical).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import background
from .observables import _eps1_crossing, _trajectory_eps_h
from .utils.errors import ShapeError
from .utils.logging import log_warn

__all__ = [
    "delta_n_spectrum",
    "delta_n_sweep",
    "mode_spectrum",
    "mode_sweep",
    "squeezed_fnl",
    "transport_spectrum",
    "transport_sweep",
]


def _base_quantities(artifact, args, rows, times):
    """Common base-trajectory analysis: e-fold axis, ε_H, end of inflation
    (ε_H = 1 crossing, interpolated) and the H value there."""
    rows, times, hubble, eps_h, n_axis = _trajectory_eps_h(
        artifact, rows, times, args
    )
    i, frac = _eps1_crossing(eps_h)
    n_end = n_axis[i - 1] + frac * (n_axis[i] - n_axis[i - 1])
    h_ref = hubble[i - 1] + frac * (hubble[i] - hubble[i - 1])
    return rows, times, hubble, eps_h, n_axis, i, n_end, h_ref


# ----------------------------------------------------------------------- #
# δN machinery, shared by delta_n_spectrum and delta_n_sweep               #
# ----------------------------------------------------------------------- #


def _dn_pivot_efolds(n_axis, n_end, pivots, margin_start, margin_end,
                     n_before_end=None):
    """Pivot e-fold times: evenly spaced inside the requested margins, or —
    when ``n_before_end`` is given — at the requested e-fold distances
    before the end of inflation (the CMB convention: N_* = 50–60).  The
    margins still bound the placement (they guarantee the attractor has
    settled / the final surface is clear of the pivot)."""
    n_lo = n_axis[0] + float(margin_start)
    n_hi = n_end - float(margin_end)
    if not n_hi > n_lo:
        raise ValueError(
            f"trajectory spans only {n_end - n_axis[0]:.1f} e-folds — too "
            "short for the requested pivot margins"
        )
    if n_before_end is None:
        return np.linspace(n_lo, n_hi, int(pivots))
    nb = np.sort(np.atleast_1d(np.asarray(n_before_end, dtype=float)))[::-1]
    n_piv = n_end - nb                       # ascending in N (and in ln k)
    if n_piv[0] < n_lo or n_piv[-1] > n_hi:
        raise ValueError(
            f"pivot_N_before_end requests pivots {nb[0]:.1f}–{nb[-1]:.1f} "
            f"e-folds before the end, outside the valid window "
            f"[{n_end - n_hi:.1f}, {n_end - n_lo:.1f}] set by the margins "
            f"(trajectory: {n_end - n_axis[0]:.1f} e-folds) — integrate "
            "longer or relax the margins"
        )
    return n_piv


def _dn_pivot_states(rows, hubble, n_axis, i, d, n_pivots):
    """Pivot field/velocity/Hubble states interpolated in e-fold time."""
    span = slice(0, i + 1)
    x_star = np.stack([
        np.interp(n_pivots, n_axis[span], rows[span, c]) for c in range(d)
    ], axis=1)                                   # (pivots, d)
    chi_star = np.stack([
        np.interp(n_pivots, n_axis[span], rows[span, d + c]) for c in range(d)
    ], axis=1)                                   # (pivots, d)
    h_star = np.interp(n_pivots, n_axis[span], hubble[span])
    return x_star, chi_star, h_star


def _dn_stencil(x_star, chi_star, h, h2, order):
    """Perturbed-initial-condition stencil around each pivot, flattened to
    one trajectory batch.  Per pivot, in order: 2d first-order points at
    ±h_a (for N_a), then with order=2: 1 base point, 2d points at ±h2_a
    (diagonal N_aa) and 4·C(d,2) mixed points at (±h2_a, ±h2_b)
    (off-diagonal N_ab).  Velocities are kept on the attractor."""
    pivots, d = x_star.shape
    h_a = h * np.maximum(1.0, np.abs(x_star))    # (pivots, d) per-field steps
    h2_a = h2 * np.maximum(1.0, np.abs(x_star))
    per_pivot = 2 * d + (1 + 2 * d + 2 * d * (d - 1)) * (order == 2)
    f0 = []
    for p in range(pivots):
        for a in range(d):
            for s in (+1.0, -1.0):
                xp = x_star[p].copy()
                xp[a] += s * h_a[p, a]
                f0.append(xp)
        if order == 2:
            f0.append(x_star[p].copy())
            for a in range(d):
                for s in (+1.0, -1.0):
                    xp = x_star[p].copy()
                    xp[a] += s * h2_a[p, a]
                    f0.append(xp)
            for a in range(d):
                for b in range(a + 1, d):
                    for sa in (+1.0, -1.0):
                        for sb in (+1.0, -1.0):
                            xp = x_star[p].copy()
                            xp[a] += sa * h2_a[p, a]
                            xp[b] += sb * h2_a[p, b]
                            f0.append(xp)
    f0 = np.asarray(f0)                          # (pivots·per_pivot, d)
    return f0, np.repeat(chi_star, per_pivot, axis=0), per_pivot, h_a, h2_a


def _batch_hdot_efolds(artifact, pars_b, rows_b, times_b):
    """Ḣ = −½|χ|²_G and the e-fold axis for a batch of solved trajectories
    (one vectorized inner-product call; ``pars_b`` (k,) shared or (B, k)
    per-trajectory)."""
    d = artifact.n_fields
    pars_b = np.asarray(pars_b, dtype=float)
    a_in = ([pars_b[:, j:j + 1] for j in range(pars_b.shape[1])]
            if pars_b.ndim == 2 else pars_b)
    hdot_b = np.asarray(-0.5 * artifact.inner_prod(
        [rows_b[..., c] for c in range(d)], a_in,
        [rows_b[..., d + c] for c in range(d)],
        [rows_b[..., d + c] for c in range(d)],
    ))                                           # (B, steps)
    return hdot_b, background.efolds(rows_b, times_b, hdot=hdot_b)


def _dn_surface(artifact, pars_b, rows_b, times_b, h_ref, steps, strict=True,
                aux=None):
    """E-folds from each perturbed start to its uniform-H final surface.

    ``pars_b`` is (k,) shared or (B, k) per-trajectory (parameter entries
    broadcast through the lowered functions); ``h_ref`` is a scalar or
    (B,)-broadcastable per-trajectory surface value.  H decreases
    monotonically (H' = −½G_ab χ^a χ^b < 0).  Second differences of N
    amplify readout noise by 1/h2², so the crossing is resolved with the
    cubic Hermite H(t) (values + Ḣ at the bracketing rows, Newton for
    H(t*) = h_ref) and N(t*) by integrating that cubic — O(Δt⁴) instead of
    the O(Δt²) linear-interpolation floor.

    ``aux`` accepts a precomputed ``(hdot_b, n_b)`` pair from
    :func:`_batch_hdot_efolds` when the caller also needs those arrays.

    Returns ``(n_surface, ok)``: a trajectory that fails to bracket its
    surface gets ``ok=False`` and NaN — or, with ``strict``, raises with
    the actionable message."""
    rows_b = np.asarray(rows_b)
    times_b = np.asarray(times_b)
    hdot_b, n_b = aux if aux is not None else _batch_hdot_efolds(
        artifact, pars_b, rows_b, times_b
    )
    hub_b = rows_b[..., -1]
    h_ref = np.broadcast_to(np.asarray(h_ref, dtype=float), hub_b.shape[:1])

    reached = hub_b.min(axis=1) <= h_ref
    if strict and not reached.all():
        bad = int(np.nonzero(~reached)[0][0])
        raise ValueError(
            f"perturbed trajectory {bad} never reaches the final surface "
            f"H = {h_ref[bad]:.4g} within {steps} rows (min H "
            f"{hub_b[bad].min():.4g}) — raise steps"
        )
    idx = np.argmax(hub_b <= h_ref[:, None], axis=1)  # first row past it
    if strict and (idx == 0).any():
        bad = int(np.nonzero(idx == 0)[0][0])
        raise ValueError(
            f"perturbed trajectory {bad} starts at or below the final "
            f"surface H = {h_ref[bad]:.4g} — the pivot is too close to the "
            "end of inflation; raise N_margin_end"
        )
    ok = reached & (idx != 0)
    # clamp failed rows to a valid bracket so the vector math stays finite;
    # their outputs are NaN-masked below
    idx = np.where(ok, idx, 1)
    rows_idx = np.arange(rows_b.shape[0])
    h0 = hub_b[rows_idx, idx - 1]
    h1 = hub_b[rows_idx, idx]
    d0 = hdot_b[rows_idx, idx - 1]
    d1 = hdot_b[rows_idx, idx]
    dt = times_b[rows_idx, idx] - times_b[rows_idx, idx - 1]
    with np.errstate(invalid="ignore", divide="ignore"):
        s = (h0 - h_ref) / (h0 - h1)             # linear first guess
        for _ in range(3):
            val = (
                (2 * s**3 - 3 * s**2 + 1) * h0
                + (s**3 - 2 * s**2 + s) * dt * d0
                + (-2 * s**3 + 3 * s**2) * h1
                + (s**3 - s**2) * dt * d1
                - h_ref
            )
            dval = (
                (6 * s**2 - 6 * s) * h0
                + (3 * s**2 - 4 * s + 1) * dt * d0
                + (-6 * s**2 + 6 * s) * h1
                + (3 * s**2 - 2 * s) * dt * d1
            )
            s = np.clip(s - val / np.where(dval == 0.0, 1.0, dval), 0.0, 1.0)
        n_surface = n_b[rows_idx, idx - 1] + dt * (
            (0.5 * s**4 - s**3 + s) * h0
            + (0.25 * s**4 - (2.0 / 3.0) * s**3 + 0.5 * s**2) * dt * d0
            + (-0.5 * s**4 + s**3) * h1
            + (0.25 * s**4 - s**3 / 3.0) * dt * d1
        )
    return np.where(ok, n_surface, np.nan), ok


def _dn_pivot_geometry(artifact, args, x_star, order):
    """Metric (K, d, d) and, for order=2, Christoffels (d, d, d, K) at the
    pivot points — one vectorized device call each (``args`` entries may be
    per-sample arrays, which is how the sweep evaluates every set's pivots
    in one launch)."""
    pivots, d = x_star.shape
    x_list = [x_star[:, c] for c in range(d)]
    g = np.moveaxis(
        _with_samples(artifact.metric(x_list, args), 2, pivots), -1, 0
    )
    gam = None
    if order == 2:
        gam = _with_samples(
            artifact.geometry.christoffels(x_list, args), 3, pivots
        )
    return g, gam


def _dn_assemble(g_piv, gam, x_star, h_star, n_pivots, n_surface, h_a, h2_a,
                 order):
    """Finite differences → N_a (and covariant N_{;ab}) → spectra for one
    parameter set.  ``n_surface`` is (pivots, per_pivot) e-fold counts in
    stencil order (:func:`_dn_stencil`); ``g_piv`` the metric at the pivots
    (pivots, d, d); ``gam`` the Christoffels (d, d, d, pivots), required
    for ``order=2``.  Pure host numpy — NaN trajectories (a non-strict
    surface read-out) propagate to NaN pivots."""
    pivots, d = x_star.shape
    n_first = n_surface[:, : 2 * d].reshape(pivots, d, 2)
    n_grad = (n_first[:, :, 0] - n_first[:, :, 1]) / (2.0 * h_a)

    n_hess = None
    if order == 2:
        n_base = n_surface[:, 2 * d]                       # (pivots,)
        n_diag = n_surface[:, 2 * d + 1 : 4 * d + 1].reshape(pivots, d, 2)
        n_hess = np.zeros((pivots, d, d))
        for a in range(d):
            n_hess[:, a, a] = (
                n_diag[:, a, 0] - 2.0 * n_base + n_diag[:, a, 1]
            ) / h2_a[:, a] ** 2
        k = 4 * d + 1
        for a in range(d):
            for b in range(a + 1, d):
                pp, pm, mp, mm_ = (n_surface[:, k + j] for j in range(4))
                k += 4
                n_hess[:, a, b] = n_hess[:, b, a] = (pp - pm - mp + mm_) / (
                    4.0 * h2_a[:, a] * h2_a[:, b]
                )
        # covariant Hessian: N_{;ab} = ∂_a∂_b N − Γ^c_ab N_c at the pivot
        n_hess = n_hess - np.einsum("cabk,kc->kab", gam, n_grad)

    # P_ζ = G^{ab} N_a N_b (H_*/2π)², f_NL = (5/6) N^aN^b N_{;ab}/(N·N)²
    with np.errstate(invalid="ignore", divide="ignore"):
        ginv = np.linalg.inv(g_piv)
        n_up = np.einsum("kab,kb->ka", ginv, n_grad)
        nn = np.einsum("ka,ka->k", n_grad, n_up)
        p_zeta = nn * (h_star / (2 * np.pi)) ** 2
        f_nl = None
        if order == 2:
            f_nl = (5.0 / 6.0) * np.einsum(
                "ka,kab,kb->k", n_up, n_hess, n_up
            ) / nn**2

        ln_k = n_pivots + np.log(h_star)
        p_tens = 2.0 * h_star * h_star / np.pi**2
        n_s = np.full(pivots, np.nan)
        if pivots >= 3:
            ln_p = np.log(p_zeta)
            n_s[1:-1] = 1.0 + (ln_p[2:] - ln_p[:-2]) / (ln_k[2:] - ln_k[:-2])
        out = {
            "ln_k": ln_k,
            "N": n_pivots,
            "P_zeta": p_zeta,
            "P_tensor": p_tens,
            "n_s": n_s,
            "r": p_tens / p_zeta,
            "N_grad": n_grad,
            "H": h_star,
        }
    if order == 2:
        out["N_hess"] = n_hess
        out["f_NL"] = f_nl
    return out


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
    order: int = 1,
    h2: float = 2e-3,
    pivot_N_before_end=None,
) -> dict:
    """Scalar power spectrum from the δN formalism along a solved trajectory.

    ``rows``/``times`` are a solved base trajectory
    (:func:`~inflatox_tpu.background.solve_eom` with ``return_time=True``)
    that reaches the end of inflation (ε_H = 1).  ``pivots`` horizon-crossing
    points are placed evenly in e-fold time between ``N_margin_start`` after
    the start and ``N_margin_end`` before the end — or, when
    ``pivot_N_before_end`` is given (a sequence of e-fold distances before
    the end of inflation, the CMB convention N_* = 50–60), at exactly those
    points, overriding ``pivots`` (all six spectrum routes accept this
    kwarg); for each pivot, each
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

    With ``order=2`` the stencil is widened (one base solve, ±``h2`` axis
    points and (±h2, ±h2) mixed points per pivot — still ONE batched
    launch) to second differences of N, and the result gains ``N_hess``
    ((pivots, d, d) — the *covariant* Hessian N_{;ab} = ∂_a∂_b N − Γ^c_ab N_c)
    and ``f_NL`` — the local bispectrum amplitude of the δN formalism
    (Lyth–Rodríguez),

        f_NL = (5/6) · N^a N^b N_{;ab} / (N_c N^c)²

    (super-horizon part only; the intrinsic horizon-crossing contribution
    is O(slow-roll) on top).

    Accuracy notes: the result is exact in the super-horizon separate-
    universe limit given slow roll *at crossing* — the single-field φ²
    test reproduces H²/(8πε) to O(1/N).  The (H_*/2π)² mode normalization
    is leading order: relative to full linear theory
    (:func:`mode_spectrum`) it misses the Stewart–Lyth O(ε, dlnε/dN)
    factor at crossing — negligible deep in slow roll, but on strongly
    flattened potentials (α-attractors: dlnε/dN ≈ 2/N_remaining) pivots
    near the end of inflation can differ by tens of percent in power;
    when the two routes disagree there, trust :func:`mode_spectrum`.  ``h`` balances finite-difference
    truncation against solver noise (N is resolved to ~``max_err``); the
    default loses ~1e-4 relative on N_a.  Second differences amplify that
    noise by 1/h2², so ``h2`` is wider: the defaults resolve N_{;ab} to
    ~``4·max_err/h2²`` ≈ 1e-2 absolute — tighten ``max_err`` for small
    f_NL.  Raise ``steps`` if a perturbed trajectory fails to reach the
    final surface (a ``ValueError`` says so).
    """
    order = int(order)
    if order not in (1, 2):
        raise ValueError(f"order must be 1 or 2, got {order}")
    d = artifact.n_fields
    rows, times, hubble, eps_h, n_axis, i, n_end, h_ref = _base_quantities(
        artifact, args, rows, times
    )
    n_pivots = _dn_pivot_efolds(
        n_axis, n_end, pivots, N_margin_start, N_margin_end,
        pivot_N_before_end,
    )
    pivots = len(n_pivots)
    x_star, chi_star, h_star = _dn_pivot_states(
        rows, hubble, n_axis, i, d, n_pivots
    )
    f0, chi0, per_pivot, h_a, h2_a = _dn_stencil(x_star, chi_star, h, h2,
                                                 order)
    a_f = np.asarray(args, dtype=float)
    rows_b, times_b = background.solve_eom_batch(
        artifact, a_f, int(steps), f0, chi0,
        max_err=max_err, solver=solver, return_time=True,
        **({"mesh": mesh} if mesh is not None else {}),
    )
    n_surface, _ = _dn_surface(artifact, a_f, rows_b, times_b, h_ref, steps)
    g_piv, gam = _dn_pivot_geometry(artifact, a_f, x_star, order)
    return _dn_assemble(
        g_piv, gam, x_star, h_star, n_pivots,
        n_surface.reshape(int(pivots), per_pivot), h_a, h2_a, order,
    )


def delta_n_sweep(
    artifact,
    pars,
    fields_init,
    derivatives_init,
    *,
    steps: int = 4000,
    pivots: int = 12,
    N_margin_start: float = 2.0,
    N_margin_end: float = 5.0,
    h: float = 1e-4,
    h2: float = 2e-3,
    order: int = 1,
    max_err: float = 1e-8,
    solver: str = "rkf",
    mesh=None,
    on_failure: str = "raise",
    pivot_N_before_end=None,
) -> dict:
    """δN spectra for a batch of parameter sets — the survey tool.

    For every parameter set in ``pars`` ((S, k); initial conditions (d,)
    shared or (S, d) per-set) the sweep solves the base background, places
    ``pivots`` horizon-crossing points, and computes the full δN spectrum
    (same rules, stencils and read-out as :func:`delta_n_spectrum`,
    including ``order=2`` → f_NL) — with ALL device work batched across
    the sweep: one launch integrates every base trajectory and a second
    launch integrates every perturbed trajectory of every set
    (S·pivots·(2d [+ second-order stencil]) solves ride the batched
    solver / Pallas DF kernel together, with per-trajectory parameters;
    ``mesh=`` shards both launches across chips with zero collectives).
    The per-pivot geometry read-back is likewise one vectorized call over
    all S·pivots points, so host↔device round-trips stay O(1) in S.

    Per-set failures — a base trajectory that never inflates or ends too
    early for the pivot margins, or a perturbed solve that misses the
    final uniform-H surface — raise by default with the set index in the
    message; ``on_failure="nan"`` instead NaN-fills the affected outputs,
    clears that set's flag in the returned ``ok`` mask, records the reason
    in ``failures``, and logs one warning (parameter scans hit
    pathological corners, and one bad set must not kill a pod-scale
    sweep).  A set whose base solve succeeds but loses individual
    perturbed trajectories keeps its finite pivots and NaNs only the
    affected ones.

    Returns a dict of stacked arrays: ``ln_k``/``N``/``P_zeta``/
    ``P_tensor``/``n_s``/``r``/``H`` (S, pivots), ``N_grad``
    (S, pivots, d), ``ok`` (S,) bool, ``failures`` (length-S list of
    ``None`` or the failure reason) [+ ``N_hess`` (S, pivots, d, d),
    ``f_NL`` (S, pivots) with ``order=2``].

    No reference equivalent: the reference's solver integrates one
    trajectory per call (background_solver.rs:283-295) and exposes no
    spectra at all.
    """
    if on_failure not in ("raise", "nan"):
        raise ValueError(
            f"on_failure must be 'raise' or 'nan', got {on_failure!r}"
        )
    order = int(order)
    if order not in (1, 2):
        raise ValueError(f"order must be 1 or 2, got {order}")
    if pivot_N_before_end is not None:
        pivots = len(np.atleast_1d(pivot_N_before_end))
    d = artifact.n_fields
    pars = np.asarray(pars, dtype=float)
    if pars.ndim == 1:
        pars = pars[None]
    if pars.ndim != 2 or pars.shape[1] != artifact.n_parameters:
        raise ShapeError(
            (-1, artifact.n_parameters), pars.shape,
            "sweep parameters must be (S, n_parameters)",
        )
    S = pars.shape[0]
    f0b = np.broadcast_to(np.asarray(fields_init, dtype=float), (S, d))
    chi0b = np.broadcast_to(np.asarray(derivatives_init, dtype=float), (S, d))
    mesh_kw = {"mesh": mesh} if mesh is not None else {}

    # every base trajectory in one launch, then the shared along-trajectory
    # quantities (ε_H, e-fold axis) vectorized over the whole batch
    rows_base, times_base = background.solve_eom_batch(
        artifact, pars, int(steps), f0b, chi0b,
        max_err=max_err, solver=solver, return_time=True, **mesh_kw,
    )
    rows_base = np.asarray(rows_base)
    times_base = np.asarray(times_base)
    a_cols = [pars[:, j:j + 1] for j in range(pars.shape[1])]
    chi_sq = np.asarray(artifact.inner_prod(
        [rows_base[..., c] for c in range(d)], a_cols,
        [rows_base[..., d + c] for c in range(d)],
        [rows_base[..., d + c] for c in range(d)],
    ))
    hub_base = rows_base[..., -1]
    with np.errstate(invalid="ignore", divide="ignore"):
        eps_base = 0.5 * chi_sq / (hub_base * hub_base)
    n_base = background.efolds(rows_base, times_base, hdot=-0.5 * chi_sq)

    # host-side per-set analysis: end-of-inflation crossing, pivot states,
    # stencil construction (pure numpy — no device calls in this loop)
    per_pivot = 2 * d + (1 + 2 * d + 2 * d * (d - 1)) * (order == 2)
    b_set = int(pivots) * per_pivot
    sets = [None] * S
    failures = [None] * S
    for s_i in range(S):
        try:
            i, frac = _eps1_crossing(eps_base[s_i])
            n_end = n_base[s_i, i - 1] + frac * (
                n_base[s_i, i] - n_base[s_i, i - 1]
            )
            h_ref = hub_base[s_i, i - 1] + frac * (
                hub_base[s_i, i] - hub_base[s_i, i - 1]
            )
            n_piv = _dn_pivot_efolds(
                n_base[s_i], n_end, pivots, N_margin_start, N_margin_end,
                pivot_N_before_end,
            )
        except ValueError as e:
            if on_failure == "raise":
                raise ValueError(f"parameter set {s_i}: {e}") from e
            failures[s_i] = str(e)
            continue
        x_star, chi_star, h_star = _dn_pivot_states(
            rows_base[s_i], hub_base[s_i], n_base[s_i], i, d, n_piv
        )
        f0, chi0, _, h_a, h2_a = _dn_stencil(x_star, chi_star, h, h2, order)
        sets[s_i] = (n_piv, x_star, h_star, h_a, h2_a, h_ref, f0, chi0)

    valid = [s_i for s_i in range(S) if sets[s_i] is not None]
    outs = [None] * S
    if valid:
        # every perturbed trajectory of every set in ONE launch,
        # per-trajectory parameters riding the batch
        pars_all = np.repeat(pars[valid], b_set, axis=0)
        rows_b, times_b = background.solve_eom_batch(
            artifact, pars_all, int(steps),
            np.concatenate([sets[s_i][6] for s_i in valid]),
            np.concatenate([sets[s_i][7] for s_i in valid]),
            max_err=max_err, solver=solver, return_time=True, **mesh_kw,
        )
        n_surf, ok_traj = _dn_surface(
            artifact, pars_all, rows_b, times_b,
            np.repeat(np.array([sets[s_i][5] for s_i in valid]), b_set),
            steps, strict=False,
        )
        if on_failure == "raise" and not ok_traj.all():
            bad = int(np.nonzero(~ok_traj)[0][0])
            raise ValueError(
                f"parameter set {valid[bad // b_set]}: perturbed trajectory "
                f"{bad % b_set} fails to bracket the final uniform-H "
                "surface — raise steps (it never reaches H_ref) or "
                "N_margin_end (its pivot starts at or below H_ref)"
            )
        # pivot geometry for every valid set in one vectorized call
        x_all = np.concatenate([sets[s_i][1] for s_i in valid])
        a_geo = [np.repeat(pars[valid, j], int(pivots))
                 for j in range(pars.shape[1])]
        g_all, gam_all = _dn_pivot_geometry(artifact, a_geo, x_all, order)

        for v, s_i in enumerate(valid):
            n_piv, x_star, h_star, h_a, h2_a = sets[s_i][:5]
            sl = slice(v * b_set, (v + 1) * b_set)
            if not ok_traj[sl].all():
                failures[s_i] = (
                    f"{int((~ok_traj[sl]).sum())} perturbed trajectories "
                    "fail to bracket the final uniform-H surface — their "
                    "pivots are NaN (raise steps or N_margin_end)"
                )
            gl = slice(v * int(pivots), (v + 1) * int(pivots))
            outs[s_i] = _dn_assemble(
                g_all[gl],
                gam_all[..., gl] if gam_all is not None else None,
                x_star, h_star, n_piv,
                n_surf[sl].reshape(int(pivots), per_pivot),
                h_a, h2_a, order,
            )

    keys = {"ln_k": (int(pivots),), "N": (int(pivots),),
            "P_zeta": (int(pivots),), "P_tensor": (int(pivots),),
            "n_s": (int(pivots),), "r": (int(pivots),),
            "H": (int(pivots),), "N_grad": (int(pivots), d)}
    if order == 2:
        keys["N_hess"] = (int(pivots), d, d)
        keys["f_NL"] = (int(pivots),)
    out = {
        key: np.stack([
            outs[s_i][key] if outs[s_i] is not None else np.full(shape, np.nan)
            for s_i in range(S)
        ])
        for key, shape in keys.items()
    }
    out["ok"] = np.array([
        failures[s_i] is None and outs[s_i] is not None for s_i in range(S)
    ])
    out["failures"] = failures
    n_fail = int(S - out["ok"].sum())
    if n_fail:
        first = int(np.nonzero(~out["ok"])[0][0])
        log_warn(
            f"delta_n_sweep: {n_fail}/{S} parameter sets failed and were "
            f"NaN-filled — first: set {first}: {failures[first]}"
        )
    return out


# ----------------------------------------------------------------------- #
# Squeezed-limit bispectrum (separate-universe response route)             #
# ----------------------------------------------------------------------- #


def _n_from_ln_k(n_axis, hubble, i, targets):
    """Invert ln(aH)(N) = target on the inflating span of a trajectory
    (monotone while ε_H < 1: d ln(aH)/dN = 1 − ε; ``i`` is the first row
    past the ε_H = 1 crossing)."""
    lnah = n_axis[: i + 1] + np.log(hubble[: i + 1])
    return np.interp(targets, lnah, n_axis[: i + 1])


def squeezed_fnl(
    artifact,
    args,
    rows,
    times,
    *,
    N_long_before_end: float = 55.0,
    N_short_before_end=(50.0, 45.0),
    h: float = 2e-3,
    h_short: float = 1e-4,
    steps: int = 4000,
    max_err: float = 1e-8,
    solver: str = "rkf",
    mesh=None,
    N_margin_start: float = 2.0,
    N_margin_end: float = 5.0,
) -> dict:
    """Squeezed-limit bispectrum amplitude f_NL(k_L; k_S) by the
    separate-universe response route.

    In the squeezed limit k_L ≪ k_S the bispectrum is exactly the response
    of the short-mode power spectrum to the long mode's background
    modulation (Maldacena's argument, multi-field form):

        lim_{k_L→0} B_ζ(k_L, k_S, k_S)
            = Σ_a ⟨ζ_{k_L} δφ^a_{k_L}⟩ · ∂𝒫_ζ(k_S)/∂φ^a|_*L ,

    i.e. with the standard normalization B = (6/5) f_NL [P P + perms],

        f_NL^sq = (5/12) · (N^a ∂_a ln 𝒫_ζ(k_S)) / (N_b N^b),

    where N_a is the δN gradient at the long pivot (so
    ⟨ζ δφ^a⟩/P_ζ = N^a/(N·N) at leading order in slow roll) and the
    response derivative ∂_a ln 𝒫(k_S) is evaluated **at fixed physical
    k_S** on perturbed separate-universe backgrounds: each of the 2d
    stencil trajectories of the long pivot (which double as the N_a finite
    differences — one batched launch serves both) is treated as its own
    universe, its short-mode spectrum read at the common anchored
    ln k_S (the pivot-frame target ln k_S − N_L; all stencil universes
    share the scale factor of the flat slice at the long crossing), and
    central differences over ±h·max(1, |φ^a|) give the derivative.

    Unlike the δN local amplitude (:func:`delta_n_spectrum` ``order=2``),
    the fixed-k anchoring captures the **dilation** contribution: for
    single-field models this function reproduces the full Maldacena
    consistency relation f_NL^sq = (5/12)(1 − n_s) (asserted in the
    suite), which the N_{;ab} term alone misses by a factor ~2.  The
    residual error is O(slow-roll²) from the leading-order ⟨ζ δφ⟩
    correlation and O((k_L/k_S)²) squeezedness corrections.

    The short spectra are the δN 𝒫 = G^{ab} N_a N_b (H_*/2π)² of each
    perturbed universe, computed against that universe's **own** final
    uniform-H surface, with all 4d²·len(k_S) short-stencil trajectories in
    ONE batched launch (``mesh=`` shards both launches across chips).

    Returns a dict: ``f_NL_sq`` (n_S,), ``response`` ((d, n_S) — the
    ∂_a ln 𝒫(k_S) derivatives), ``N_grad_long`` (d,), ``ln_k_long``/
    ``N_long``/``P_zeta_long``/``H_long`` scalars and ``ln_k_short``/
    ``N_short``/``P_zeta_short`` (n_S,) in the base trajectory's frame
    (``P_zeta_short`` is the ± average over the stencil universes — the
    base value up to O(h²)).

    No reference equivalent (the reference computes no spectra at all);
    the route needs the batched per-trajectory solver and vectorized
    geometry surfaces end to end.
    """
    d = artifact.n_fields
    a_f = np.asarray(args, dtype=float)
    mesh_kw = {"mesh": mesh} if mesh is not None else {}
    rows, times, hubble, eps_h, n_axis, i, n_end, h_ref = _base_quantities(
        artifact, a_f, rows, times
    )
    nb_long = float(N_long_before_end)
    nb_short = np.atleast_1d(np.asarray(N_short_before_end, dtype=float))
    sep_floor = max(float(N_margin_start), 2.0)
    if not (nb_short <= nb_long - sep_floor).all():
        raise ValueError(
            "every short mode must cross at least "
            f"max(N_margin_start, 2) = {sep_floor:.1f} e-folds after the "
            f"long mode (N_short_before_end ≤ N_long_before_end − "
            f"{sep_floor:.1f} = {nb_long - sep_floor:.1f}): the response is "
            "read on universes branched at the long crossing, which need "
            "the separation to settle onto their own attractors — and the "
            "squeezed limit itself assumes k_L ≪ k_S (tens of e-folds)"
        )
    # validates long + short pivots against the usual margins
    _dn_pivot_efolds(
        n_axis, n_end, 0, N_margin_start, N_margin_end,
        np.concatenate([[nb_long], nb_short]),
    )
    n_long = n_end - nb_long
    n_short = np.sort(n_end - nb_short)              # ascending in N / ln k
    n_s_count = len(n_short)

    x_l, chi_l, h_l = _dn_pivot_states(
        rows, hubble, n_axis, i, d, np.array([n_long])
    )
    h_l = float(h_l[0])
    h_s_base = np.interp(n_short, n_axis[: i + 1], hubble[: i + 1])
    ln_ks_base = n_short + np.log(h_s_base)
    # anchored short-mode targets in the stencil universes' common frame
    # (N = 0 on the flat slice at the long crossing, a continuous there)
    ln_ks_piv = ln_ks_base - n_long
    ln_kl = n_long + np.log(h_l)

    # ONE stencil of 2d trajectories around the long pivot: their e-fold
    # counts to the base final surface give N_a, and the trajectories ARE
    # the perturbed separate-universe backgrounds for the short response
    f0, chi0, per_pivot, h_a, _ = _dn_stencil(x_l, chi_l, h, h, order=1)
    rows_b, times_b = background.solve_eom_batch(
        artifact, a_f, int(steps), f0, chi0,
        max_err=max_err, solver=solver, return_time=True, **mesh_kw,
    )
    rows_b = np.asarray(rows_b)
    times_b = np.asarray(times_b)
    hdot_b, n_b = _batch_hdot_efolds(artifact, a_f, rows_b, times_b)
    n_surf, _ = _dn_surface(artifact, a_f, rows_b, times_b, h_ref, steps,
                            aux=(hdot_b, n_b))
    g_l, _ = _dn_pivot_geometry(artifact, a_f, x_l, 1)
    long_out = _dn_assemble(
        g_l, None, x_l, np.array([h_l]), np.array([n_long]),
        n_surf.reshape(1, per_pivot), h_a, h_a, 1,
    )
    n_grad = long_out["N_grad"][0]                   # (d,)
    n_up = np.linalg.solve(g_l[0], n_grad)           # N^a
    nn = float(n_grad @ n_up)
    p_zeta_long = float(long_out["P_zeta"][0])

    # per-universe trajectory analysis (host): ε_H, its own end-of-inflation
    # surface, and fixed-ln-k short-pivot placement in the common frame
    # (Ḣ/e-fold arrays shared with the surface read-out above)
    B = 2 * d
    hub_b = rows_b[..., -1]
    with np.errstate(invalid="ignore", divide="ignore"):
        eps_b = -hdot_b / (hub_b * hub_b)

    f0_s, chi0_s, href_s, x_short, h_short_star = [], [], [], [], []
    for b in range(B):
        ib, frac = _eps1_crossing(eps_b[b])
        n_end_b = n_b[b, ib - 1] + frac * (n_b[b, ib] - n_b[b, ib - 1])
        href_b = hub_b[b, ib - 1] + frac * (hub_b[b, ib] - hub_b[b, ib - 1])
        n_s_b = _n_from_ln_k(n_b[b], hub_b[b], ib, ln_ks_piv)
        if (n_s_b > n_end_b - float(N_margin_end)).any():
            raise ValueError(
                f"stencil universe {b}: the anchored short pivot lands "
                f"within N_margin_end = {N_margin_end} of its end of "
                "inflation — lower N_short_before_end or the margin"
            )
        x_s, c_s, h_s = _dn_pivot_states(
            rows_b[b], hub_b[b], n_b[b], ib, d, n_s_b
        )
        f0b, c0b, pp_s, _, _ = _dn_stencil(x_s, c_s, h_short, h_short, 1)
        f0_s.append(f0b)
        chi0_s.append(c0b)
        href_s.append(np.full(len(f0b), href_b))
        x_short.append(x_s)
        h_short_star.append(h_s)

    # every short-stencil trajectory of every universe in ONE launch
    rows_s, times_s = background.solve_eom_batch(
        artifact, a_f, int(steps), np.concatenate(f0_s),
        np.concatenate(chi0_s),
        max_err=max_err, solver=solver, return_time=True, **mesh_kw,
    )
    n_surf_s, _ = _dn_surface(
        artifact, a_f, np.asarray(rows_s), np.asarray(times_s),
        np.concatenate(href_s), steps,
    )
    x_all = np.concatenate(x_short)                  # (B·n_S, d)
    g_all, _ = _dn_pivot_geometry(artifact, a_f, x_all, 1)

    # δN read-out per universe → ln 𝒫(k_S) → central-difference response
    n_first = n_surf_s.reshape(B, n_s_count, d, 2)
    hh = h_short * np.maximum(1.0, np.abs(x_all)).reshape(B, n_s_count, d)
    ng_s = (n_first[..., 0] - n_first[..., 1]) / (2.0 * hh)
    g_bs = g_all.reshape(B, n_s_count, d, d)
    nup_s = np.linalg.solve(g_bs, ng_s[..., None])[..., 0]
    h_star_s = np.stack(h_short_star)                # (B, n_S)
    p_s = np.einsum("bsa,bsa->bs", ng_s, nup_s) * (
        h_star_s / (2.0 * np.pi)
    ) ** 2
    ln_p = np.log(p_s).reshape(d, 2, n_s_count)      # stencil: a-major, +/−
    response = (ln_p[:, 0] - ln_p[:, 1]) / (2.0 * h_a[0][:, None])

    f_nl_sq = (5.0 / 12.0) * (n_up @ response) / nn
    return {
        "f_NL_sq": f_nl_sq,
        "response": response,
        "N_grad_long": n_grad,
        "ln_k_long": ln_kl,
        "ln_k_short": ln_ks_base,
        "N_long": n_long,
        "N_short": n_short,
        "P_zeta_long": p_zeta_long,
        "P_zeta_short": np.exp(ln_p).mean(axis=(0, 1)),
        "H_long": h_l,
    }


# ----------------------------------------------------------------------- #
# Mukhanov-Sasaki mode integration                                         #
# ----------------------------------------------------------------------- #


def _ms_rhs(state, gam, cmat, fric, y2):
    """Scalar-mode RHS: state (4, i, a) = (Re Q, Im Q, Re P, Im P) with the
    covariant P = dQ/dN + (Γu)Q."""
    q_r, q_i, p_r, p_i = state[0], state[1], state[2], state[3]
    gam_t = gam.T
    c_t = cmat.T
    dq_r = p_r - q_r @ gam_t
    dq_i = p_i - q_i @ gam_t
    dp_r = -(p_r @ gam_t) - fric * p_r - y2 * q_r - q_r @ c_t
    dp_i = -(p_i @ gam_t) - fric * p_i - y2 * q_i - q_i @ c_t
    return jnp.stack([dq_r, dq_i, dp_r, dp_i])


def _ms_integrate(state0_k, per_step):
    """RK4 over one pivot's e-fold grid (node/midpoint coefficient streams)."""
    def step(state, s):
        g0, c0, f0, y20, g1, c1, f1, y21, g2, c2, f2, y22, dt = s
        k1 = _ms_rhs(state, g0, c0, f0, y20)
        k2 = _ms_rhs(state + 0.5 * dt * k1, g1, c1, f1, y21)
        k3 = _ms_rhs(state + 0.5 * dt * k2, g1, c1, f1, y21)
        k4 = _ms_rhs(state + dt * k3, g2, c2, f2, y22)
        return state + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    out, _ = lax.scan(step, state0_k, per_step)
    return out


def _ms_rhs_t(state, fric, y2):
    """Tensor-mode RHS: each polarization is a massless scalar (no Γ, no M)."""
    q_r, q_i, p_r, p_i = state
    return jnp.stack([p_r, p_i,
                      -fric * p_r - y2 * q_r,
                      -fric * p_i - y2 * q_i])


def _ms_integrate_t(state0_k, per_step_k):
    def step(state, s):
        f0, y20, f1, y21, f2, y22, dt = s
        k1 = _ms_rhs_t(state, f0, y20)
        k2 = _ms_rhs_t(state + 0.5 * dt * k1, f1, y21)
        k3 = _ms_rhs_t(state + 0.5 * dt * k2, f1, y21)
        k4 = _ms_rhs_t(state + dt * k3, f2, y22)
        return state + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    out, _ = lax.scan(step, state0_k, per_step_k)
    return out


# module-level jits: repeated mode_spectrum calls with the same grid shape
# hit the trace cache instead of recompiling a per-call closure
_MS_INTEGRATE = jax.jit(jax.vmap(_ms_integrate))
_MS_INTEGRATE_T = jax.jit(jax.vmap(_ms_integrate_t))


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


def _pivot_setup(
    artifact, args, rows, times, pivots, N_margin_start, N_margin_end,
    N_sub, N_dense, dense_steps, tail_steps, n_before_end=None,
):
    """Shared linear-perturbation setup for the mode and transport routes.

    Places the pivots, builds the per-pivot two-phase e-fold grids, samples
    every ODE coefficient (Γu, M/H², 3−ε, (k/aH)²) at the grid nodes and
    midpoints, constructs the unit-amplitude Bunch-Davies initial state on
    the vielbein, and exposes a ``surface(targets)`` sampler for read-out
    surfaces.  Both routes integrate the SAME coefficient streams — their
    agreement tests only the integrators."""
    import types  # noqa: PLC0415

    d = artifact.n_fields
    rows, times, hubble, eps_h, n_axis, i_end, n_end, h_ref = _base_quantities(
        artifact, args, rows, times
    )
    span = slice(0, i_end + 1)
    n_span = n_axis[span]

    if float(N_margin_start) < float(N_sub) + 0.25:
        raise ValueError(
            f"N_margin_start ({N_margin_start}) must be at least "
            f"N_sub + 0.25 ({float(N_sub) + 0.25}) so the Bunch-Davies "
            "initialization has tabulated background before the first pivot"
        )
    if float(N_margin_end) < float(N_dense) + 0.25:
        raise ValueError(
            f"N_margin_end ({N_margin_end}) must be at least "
            f"N_dense + 0.25 ({float(N_dense) + 0.25}) so every pivot's "
            "dense phase ends before the ζ read-out surface (np.interp "
            "would silently clamp the ODE coefficients past the table)"
        )
    n_pivots = _dn_pivot_efolds(
        n_axis, n_end, pivots, N_margin_start, N_margin_end, n_before_end
    )
    pivots = len(n_pivots)
    n_stop = n_end - 0.25  # common final surface (ζ read-out)

    def interp(col, targets):
        return np.interp(targets, n_span, col[span])

    h_star = interp(hubble, n_pivots)
    ln_k = n_pivots + np.log(h_star)
    k_phys = np.exp(ln_k)

    # per-pivot two-phase e-fold grids (K, S+1 nodes); node index
    # ``dense_steps`` is exactly N_* + N_dense (the crossing surface)
    grids = []
    for p in range(int(pivots)):
        dense = np.linspace(n_pivots[p] - N_sub, n_pivots[p] + N_dense,
                            int(dense_steps) + 1)
        tail = np.linspace(n_pivots[p] + N_dense, n_stop,
                           int(tail_steps) + 1)[1:]
        grids.append(np.concatenate([dense, tail]))
    grids = np.asarray(grids)                              # (K, S+1)
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
    state0_t = np.stack(
        [np.ones_like(y0), np.zeros_like(y0), -np.ones_like(y0), -y0], axis=1
    )                                                       # (K, 4)

    # k³·amp² = (H_* e^{N_sub})²/2 with amp = 1/(a₀√(2k)), a₀ = e^{N*−N_sub}
    k3_amp2 = 0.5 * (h_star * np.exp(float(N_sub))) ** 2
    norm = k3_amp2 / (2.0 * np.pi**2)

    def surface(targets):
        """Read-out surface data at per-pivot e-fold targets (K,):
        returns (g (K,d,d), χ (d,K), H (K,), ε_H (K,))."""
        x_f = np.stack([interp(rows[:, c], targets) for c in range(d)])
        chi_f = np.stack([interp(rows[:, d + c], targets) for c in range(d)])
        h_f = interp(hubble, targets)
        eps_f = interp(eps_h, targets)
        g_f = np.moveaxis(
            _with_samples(artifact.metric([x_f[c] for c in range(d)],
                                          np.asarray(args, float)),
                          2, len(targets)), -1, 0
        )                                                  # (K, d, d)
        return g_f, chi_f, h_f, eps_f

    return types.SimpleNamespace(
        d=d, n_pivots=n_pivots, h_star=h_star, ln_k=ln_k, grids=grids,
        mids=mids, dts=dts, gam_n=gam_n, c_n=c_n, fric_n=fric_n,
        gam_m=gam_m, c_m=c_m, fric_m=fric_m, y2_n=y2_n, y2_m=y2_m,
        state0=state0, state0_t=state0_t, norm=norm, surface=surface,
    )


def _pivot_shard(mesh, pivots, pivot_axis):
    """Shard-the-pivot-axis helper shared by the mode and transport routes:
    returns a tree-map that pads the leading (pivot) axis to the mesh size
    and device_puts with a NamedSharding — or identity when mesh is None."""
    if mesh is None:
        def shard(tree):
            return tree

        return shard
    from jax.sharding import NamedSharding, PartitionSpec  # noqa: PLC0415

    axis = pivot_axis if pivot_axis is not None else mesh.axis_names[0]
    sh = NamedSharding(mesh, PartitionSpec(axis))
    # device_put needs the sharded axis divisible by the mesh size —
    # pad with copies of the last pivot and slice the results back
    pad = (-int(pivots)) % int(mesh.shape[axis])

    def shard(tree):
        def put(v):
            v = jnp.asarray(v)
            if pad:
                v = jnp.concatenate(
                    [v, jnp.repeat(v[-1:], pad, axis=0)], axis=0
                )
            return jax.device_put(v, sh)

        return jax.tree_util.tree_map(put, tree)

    return shard


def _sigma_readout(sigma_qq, g, chi, h, eps, norm):
    """Gauge read-outs from the field-field correlation matrix Σ_QQ^{ab}.

    ``sigma_qq`` (K, d, d) is Σ_i Re[Q^a Q^b*] in the unit-amplitude
    normalization (fold ``norm`` back in here); returns
    ``(P_ζ, P_iso, cos Δ, C_ζS)`` with the ζ–S pieces NaN unless d == 2.
    The mode route's per-realization read-out and this matrix form are
    algebraically identical (Σ_i |χ_a Q^a_i|² = χ_a χ_b Σ^{ab} etc.)."""
    kk = sigma_qq.shape[0]
    chi_t = chi.T                                          # (K, d)
    chi_lo = np.einsum("kab,kb->ka", g, chi_t)             # χ_a
    chi2 = np.einsum("ka,ka->k", chi_lo, chi_t)            # |χ|²
    zz = np.einsum("ka,kab,kb->k", chi_lo, sigma_qq, chi_lo)
    p_zeta = norm * zz / (2.0 * eps * h) ** 2
    s_norm = h / np.sqrt(chi2)                             # H/|χ|
    tr_g = np.einsum("kab,kab->k", g, sigma_qq)            # g_ab Σ^{ab}
    q_s2 = np.maximum(tr_g - zz / chi2, 0.0)
    p_iso = norm * s_norm**2 * q_s2
    cos_delta = np.full(kk, np.nan)
    c_zs = np.full(kk, np.nan)
    if sigma_qq.shape[-1] == 2:
        # signed entropic direction s^a = ε^{ab} σ_b (contravariant
        # Levi-Civita, [[0,1],[−1,0]]/√detG) — G-orthonormal to σ̂ and
        # CONTINUOUS along the trajectory
        sig_lo = chi_lo / np.sqrt(chi2)[:, None]           # σ_b, (K, 2)
        detg = np.linalg.det(g)                            # (K,)
        s_up = np.stack(
            [sig_lo[:, 1], -sig_lo[:, 0]], axis=1
        ) / np.sqrt(detg)[:, None]
        s_lo = np.einsum("kab,kb->ka", g, s_up)
        c_zs = norm * s_norm * np.einsum(
            "ka,kab,kb->k", s_lo, sigma_qq, chi_lo
        ) / (2.0 * eps * h)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos_delta = c_zs / np.sqrt(p_zeta * p_iso)
    return p_zeta, p_iso, cos_delta, c_zs


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
    mesh=None,
    pivot_axis: str | None = None,
    pivot_N_before_end=None,
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

    evaluated on the common read-out surface N_end − 0.25 (a fixed e-fold
    offset before the ε_H = 1 crossing — the same surface the
    ``N_margin_end`` validation messages guard), so super-horizon evolution
    (multi-field entropic feeding) is included exactly as the δN route
    counts it.  All pivots integrate in
    one jitted ``vmap(lax.scan)`` launch: per-pivot RK4 on a two-phase
    e-fold grid — ``dense_steps`` sub-horizon steps over
    [N_* − N_sub, N_* + N_dense] resolving the oscillations, ``tail_steps``
    super-horizon steps to the end surface.  The ODE coefficients are real,
    so the complex modes ride as two real systems sharing one coefficient
    stream.

    Returns the same dict layout as :func:`delta_n_spectrum` (without
    ``N_grad``), plus:

    * ``P_tensor`` is EXACT here — the massless tensor modes are integrated
      through crossing alongside the scalars (8 × a canonically-normalized
      massless scalar), not the slow-roll ``2H²/π²`` snapshot — and ``n_t``
      is its centered-difference tilt (the consistency relation n_t = −r/8
      only holds to first order in slow roll); ``alpha_s`` is the scalar
      running d n_s/d ln k (three-point second difference; NaN at the
      ends);
    * ``P_iso`` — the primordial isocurvature spectrum: the G-orthogonal
      complement of Q along the adiabatic direction, normalized as
      S = (H/|χ|)·Q_s so ``P_iso/P_zeta`` is the isocurvature fraction;
    * ``cos_delta`` — the ζ–S correlation cosine (two-field models only;
      NaN otherwise).

    ``mesh=`` shards the pivot axis of both mode integrations across the
    mesh (zero collectives — each device integrates its own pivots;
    ``pivot_axis`` names the mesh axis, default its first).

    Accuracy budget: massless Bunch-Davies truncation
    ~1/y₀² ≈ 3·10⁻⁴ at the default ``N_sub=4`` plus RK4 phase error
    ~10⁻³ at the default step counts — agreement with δN to ~1% is the
    validated envelope.
    """
    t = _pivot_setup(
        artifact, args, rows, times, pivots, N_margin_start, N_margin_end,
        N_sub, N_dense, dense_steps, tail_steps,
        n_before_end=pivot_N_before_end,
    )
    pivots = len(t.n_pivots)
    shard = _pivot_shard(mesh, pivots, pivot_axis)

    per_step, per_step_t = _ms_streams(t)
    per_step = tuple(jnp.asarray(a) for a in per_step)
    final = np.asarray(
        _MS_INTEGRATE(shard(jnp.asarray(t.state0)), shard(per_step))
    )[: int(pivots)]                                        # (K, 4, i, a)

    # tensor modes: each polarization is a canonically-normalized massless
    # scalar (no Γ, no mass matrix), P_T = 8 · P_massless
    per_step_t = tuple(jnp.asarray(a) for a in per_step_t)
    final_t = np.asarray(
        _MS_INTEGRATE_T(shard(jnp.asarray(t.state0_t)), shard(per_step_t))
    )[: int(pivots)]                                        # (K, 4)

    # ζ/S read-out on the common end surface via the correlation matrix
    # Σ_QQ^{ab} = Σ_i (Re Q^a Re Q^b + Im Q^a Im Q^b) — algebraically the
    # per-realization sums, shared with the transport route
    sigma_qq = (
        np.einsum("kia,kib->kab", final[:, 0], final[:, 0])
        + np.einsum("kia,kib->kab", final[:, 1], final[:, 1])
    )
    g_f, chi_f, h_f, eps_f = t.surface(t.grids[:, -1])
    p_zeta, p_iso, cos_delta, _ = _sigma_readout(
        sigma_qq, g_f, chi_f, h_f, eps_f, t.norm
    )

    # exact tensor spectrum from the massless-mode integration
    p_tens = 8.0 * t.norm * (final_t[:, 0] ** 2 + final_t[:, 1] ** 2)
    n_s, n_t, alpha_s = _tilts(p_zeta, p_tens, t.ln_k)
    return {
        "ln_k": t.ln_k,
        "N": t.n_pivots,
        "P_zeta": p_zeta,
        "P_tensor": p_tens,
        "P_iso": p_iso,
        "cos_delta": cos_delta,
        "n_s": n_s,
        "n_t": n_t,
        "alpha_s": alpha_s,
        "r": p_tens / p_zeta,
        "H": t.h_star,
    }


def _ms_streams(t):
    """The scalar- and tensor-mode per-step coefficient streams of one
    :func:`_pivot_setup` result, in the argument order of
    :func:`_ms_integrate` / :func:`_ms_integrate_t` (host numpy; the
    caller jnp.asarray's them — the sweep concatenates several setups'
    streams along the pivot axis first)."""
    per_step = (
        t.gam_n[:, :-1], t.c_n[:, :-1],
        t.fric_n[:, :-1, None, None], t.y2_n[:, :-1, None, None],
        t.gam_m, t.c_m,
        t.fric_m[:, :, None, None], t.y2_m[:, :, None, None],
        t.gam_n[:, 1:], t.c_n[:, 1:],
        t.fric_n[:, 1:, None, None], t.y2_n[:, 1:, None, None],
        t.dts[:, :, None, None, None],
    )
    per_step_t = (
        t.fric_n[:, :-1], t.y2_n[:, :-1],
        t.fric_m, t.y2_m,
        t.fric_n[:, 1:], t.y2_n[:, 1:],
        t.dts,
    )
    return per_step, per_step_t


def _sweep_validate(on_failure, N_margin_start, N_margin_end, N_sub,
                    N_dense):
    """Configuration-level validation shared by mode_sweep and
    transport_sweep — these raise regardless of ``on_failure`` (they would
    otherwise NaN-fill every set of a misconfigured sweep)."""
    if on_failure not in ("raise", "nan"):
        raise ValueError(
            f"on_failure must be 'raise' or 'nan', got {on_failure!r}"
        )
    if float(N_margin_start) < float(N_sub) + 0.25:
        raise ValueError(
            f"N_margin_start ({N_margin_start}) must be at least "
            f"N_sub + 0.25 ({float(N_sub) + 0.25}) so the Bunch-Davies "
            "initialization has tabulated background before the first pivot"
        )
    if float(N_margin_end) < float(N_dense) + 0.25:
        raise ValueError(
            f"N_margin_end ({N_margin_end}) must be at least "
            f"N_dense + 0.25 ({float(N_dense) + 0.25}) so every pivot's "
            "dense phase ends before the ζ read-out surface"
        )


def _sweep_base_setups(
    artifact, pars, fields_init, derivatives_init, *,
    steps, max_err, solver, mesh_kw, on_failure,
    pivots, N_margin_start, N_margin_end, N_sub, N_dense,
    dense_steps, tail_steps, n_before_end=None,
):
    """Shared sweep preamble of mode_sweep/transport_sweep: validate the
    parameter batch, solve every base trajectory in ONE batched launch,
    and run :func:`_pivot_setup` per set with failure isolation.  Returns
    ``(pars, setups, failures)`` — a failed set has ``setups[s] = None``
    and its reason in ``failures[s]`` (or raised, under
    ``on_failure="raise"``, with the set index in the message)."""
    d = artifact.n_fields
    pars = np.asarray(pars, dtype=float)
    if pars.ndim == 1:
        pars = pars[None]
    if pars.ndim != 2 or pars.shape[1] != artifact.n_parameters:
        raise ShapeError(
            (-1, artifact.n_parameters), pars.shape,
            "sweep parameters must be (S, n_parameters)",
        )
    S = pars.shape[0]
    f0b = np.broadcast_to(np.asarray(fields_init, dtype=float), (S, d))
    chi0b = np.broadcast_to(np.asarray(derivatives_init, dtype=float), (S, d))
    rows_base, times_base = background.solve_eom_batch(
        artifact, pars, int(steps), f0b, chi0b,
        max_err=max_err, solver=solver, return_time=True, **mesh_kw,
    )
    rows_base = np.asarray(rows_base)
    times_base = np.asarray(times_base)

    setups = [None] * S
    failures = [None] * S
    for s_i in range(S):
        try:
            setups[s_i] = _pivot_setup(
                artifact, pars[s_i], rows_base[s_i], times_base[s_i],
                pivots, N_margin_start, N_margin_end,
                N_sub, N_dense, dense_steps, tail_steps,
                n_before_end=n_before_end,
            )
        except ValueError as e:
            if on_failure == "raise":
                raise ValueError(f"parameter set {s_i}: {e}") from e
            failures[s_i] = str(e)
    return pars, setups, failures


def _sweep_stack(outs, failures, keys, pivots, name):
    """Stack per-set result dicts into (S, pivots) arrays with NaN rows for
    failed sets, the ``ok`` mask, and the one-shot warning."""
    S = len(outs)
    out = {
        key: np.stack([
            outs[s_i][key] if outs[s_i] is not None
            else np.full((int(pivots),), np.nan)
            for s_i in range(S)
        ])
        for key in keys
    }
    out["ok"] = np.array([outs[s_i] is not None for s_i in range(S)])
    out["failures"] = failures
    n_fail = int(S - out["ok"].sum())
    if n_fail:
        first = int(np.nonzero(~out["ok"])[0][0])
        log_warn(
            f"{name}: {n_fail}/{S} parameter sets failed and were "
            f"NaN-filled — first: set {first}: {failures[first]}"
        )
    return out


def mode_sweep(
    artifact,
    pars,
    fields_init,
    derivatives_init,
    *,
    steps: int = 4000,
    max_err: float = 1e-8,
    solver: str = "rkf",
    pivots: int = 12,
    N_margin_start: float = 5.0,
    N_margin_end: float = 5.0,
    N_sub: float = 4.0,
    N_dense: float = 2.0,
    dense_steps: int = 4000,
    tail_steps: int = 1500,
    mesh=None,
    pivot_axis: str | None = None,
    on_failure: str = "raise",
    pivot_N_before_end=None,
) -> dict:
    """Mukhanov-Sasaki spectra for a batch of parameter sets.

    The linear-theory counterpart of :func:`delta_n_sweep` (run both for
    a cross-validated survey — the mode route is authoritative near the
    end of inflation): for every parameter set in ``pars`` ((S, k);
    initial conditions (d,) shared or (S, d) per-set) the sweep solves
    the base background — ALL sets in one batched launch — then
    integrates the coupled scalar modes and the massless tensor modes of
    EVERY pivot of EVERY set in one jitted ``vmap(lax.scan)`` launch
    each (the per-set coefficient streams concatenate along the vmapped
    pivot axis; ``mesh=`` shards that axis across chips with zero
    collectives).

    Same per-set failure semantics as :func:`delta_n_sweep`
    (``on_failure="raise"`` names the set; ``"nan"`` NaN-fills it, flags
    it in ``ok``/``failures``, and warns once).  Returns the
    :func:`mode_spectrum` dict with a leading S axis plus ``ok`` and
    ``failures``.
    """
    _sweep_validate(on_failure, N_margin_start, N_margin_end, N_sub, N_dense)
    if pivot_N_before_end is not None:
        pivots = len(np.atleast_1d(pivot_N_before_end))
    pars, setups, failures = _sweep_base_setups(
        artifact, pars, fields_init, derivatives_init,
        steps=steps, max_err=max_err, solver=solver,
        mesh_kw={"mesh": mesh} if mesh is not None else {},
        on_failure=on_failure, pivots=pivots,
        N_margin_start=N_margin_start, N_margin_end=N_margin_end,
        N_sub=N_sub, N_dense=N_dense,
        dense_steps=dense_steps, tail_steps=tail_steps,
        n_before_end=pivot_N_before_end,
    )
    S = pars.shape[0]
    valid = [s_i for s_i in range(S) if setups[s_i] is not None]
    outs = [None] * S
    if valid:
        # one scalar-mode launch and one tensor-mode launch for the whole
        # sweep: per-set streams concatenate along the vmapped pivot axis
        streams = [_ms_streams(setups[s_i]) for s_i in valid]
        per_step = tuple(
            jnp.asarray(np.concatenate(parts, axis=0))
            for parts in zip(*[st[0] for st in streams])
        )
        per_step_t = tuple(
            jnp.asarray(np.concatenate(parts, axis=0))
            for parts in zip(*[st[1] for st in streams])
        )
        total_k = len(valid) * int(pivots)
        shard = _pivot_shard(mesh, total_k, pivot_axis)
        final = np.asarray(_MS_INTEGRATE(
            shard(jnp.asarray(np.concatenate(
                [setups[s_i].state0 for s_i in valid], axis=0))),
            shard(per_step),
        ))[:total_k]                                        # (ΣK, 4, i, a)
        final_t = np.asarray(_MS_INTEGRATE_T(
            shard(jnp.asarray(np.concatenate(
                [setups[s_i].state0_t for s_i in valid], axis=0))),
            shard(per_step_t),
        ))[:total_k]                                        # (ΣK, 4)

        for v, s_i in enumerate(valid):
            t = setups[s_i]
            sl = slice(v * int(pivots), (v + 1) * int(pivots))
            f_s = final[sl]
            sigma_qq = (
                np.einsum("kia,kib->kab", f_s[:, 0], f_s[:, 0])
                + np.einsum("kia,kib->kab", f_s[:, 1], f_s[:, 1])
            )
            g_f, chi_f, h_f, eps_f = t.surface(t.grids[:, -1])
            p_zeta, p_iso, cos_delta, _ = _sigma_readout(
                sigma_qq, g_f, chi_f, h_f, eps_f, t.norm
            )
            ft_s = final_t[sl]
            p_tens = 8.0 * t.norm * (ft_s[:, 0] ** 2 + ft_s[:, 1] ** 2)
            n_s, n_t, alpha_s = _tilts(p_zeta, p_tens, t.ln_k)
            outs[s_i] = {
                "ln_k": t.ln_k, "N": t.n_pivots, "P_zeta": p_zeta,
                "P_tensor": p_tens, "P_iso": p_iso, "cos_delta": cos_delta,
                "n_s": n_s, "n_t": n_t, "alpha_s": alpha_s,
                "r": p_tens / p_zeta, "H": t.h_star,
            }

    keys = ["ln_k", "N", "P_zeta", "P_tensor", "P_iso", "cos_delta",
            "n_s", "n_t", "alpha_s", "r", "H"]
    return _sweep_stack(outs, failures, keys, pivots, "mode_sweep")


def _tilts(p_zeta, p_tens, ln_k):
    """Centered-difference tilts (n_s, n_t) and scalar running α_s
    (three-point second difference, nonuniform-grid form); NaN at the
    ends."""
    kk = len(ln_k)
    n_s = np.full(kk, np.nan)
    n_t = np.full(kk, np.nan)
    alpha_s = np.full(kk, np.nan)
    if kk >= 3:
        ln_p = np.log(p_zeta)
        ln_pt = np.log(p_tens)
        n_s[1:-1] = 1.0 + (ln_p[2:] - ln_p[:-2]) / (ln_k[2:] - ln_k[:-2])
        n_t[1:-1] = (ln_pt[2:] - ln_pt[:-2]) / (ln_k[2:] - ln_k[:-2])
        dk0 = ln_k[1:-1] - ln_k[:-2]
        dk1 = ln_k[2:] - ln_k[1:-1]
        alpha_s[1:-1] = 2.0 * (
            (ln_p[2:] - ln_p[1:-1]) / dk1 - (ln_p[1:-1] - ln_p[:-2]) / dk0
        ) / (dk0 + dk1)
    return n_s, n_t, alpha_s


# ----------------------------------------------------------------------- #
# Moment-transport integration                                             #
# ----------------------------------------------------------------------- #


def _u_matrix(gam, cmat, fric, y2):
    """Phase-space transport matrix u^A_B for X = (Q^a, P^a) (numpy, host):

        dQ = P − (Γu) Q
        dP = −(Γu) P − (3−ε) P − (k/aH)² Q − (M/H²) Q

    ``gam``/``cmat`` (..., d, d), ``fric``/``y2`` (...) → u (..., 2d, 2d).
    The SAME dynamics as :func:`_ms_rhs` in first-order form — the mode and
    transport routes integrate one u."""
    d = gam.shape[-1]
    eye = np.broadcast_to(np.eye(d), gam.shape)
    top = np.concatenate([-gam, eye], axis=-1)
    bot = np.concatenate(
        [-(y2[..., None, None] * eye + cmat),
         -fric[..., None, None] * eye - gam],
        axis=-1,
    )
    return np.concatenate([top, bot], axis=-2)


def _tr_rhs(sig, u):
    """dΣ/dN = u Σ + Σ uᵀ (Σ symmetric ⇒ uΣ + (uΣ)ᵀ)."""
    us = u @ sig
    return us + jnp.swapaxes(us, -2, -1)


def _tr_integrate(sig0, per_step):
    """RK4 on the covariance transport over one pivot's e-fold segment."""
    def step(sig, s):
        u0, um, u1, dt = s
        k1 = _tr_rhs(sig, u0)
        k2 = _tr_rhs(sig + 0.5 * dt * k1, um)
        k3 = _tr_rhs(sig + 0.5 * dt * k2, um)
        k4 = _tr_rhs(sig + dt * k3, u1)
        return sig + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    out, _ = lax.scan(step, sig0, per_step)
    return out


_TR_INTEGRATE = jax.jit(jax.vmap(_tr_integrate))


def _tr_streams(t):
    """Transport u-matrices of one :func:`_pivot_setup` result: the scalar
    phase-space u at step start-nodes / midpoints / end-nodes
    ((K, S, 2d, 2d)) and the massless tensor-block u's ((K, S, 2, 2))."""
    u_start = _u_matrix(t.gam_n[:, :-1], t.c_n[:, :-1],
                        t.fric_n[:, :-1], t.y2_n[:, :-1])
    u_mid = _u_matrix(t.gam_m, t.c_m, t.fric_m, t.y2_m)
    u_end = _u_matrix(t.gam_n[:, 1:], t.c_n[:, 1:],
                      t.fric_n[:, 1:], t.y2_n[:, 1:])
    zeros1 = np.zeros(t.fric_n.shape + (1, 1))
    u_t_start = _u_matrix(zeros1[:, :-1], zeros1[:, :-1],
                          t.fric_n[:, :-1], t.y2_n[:, :-1])
    u_t_mid = _u_matrix(zeros1[:, :-1], zeros1[:, :-1],
                        t.fric_m, t.y2_m)
    u_t_end = _u_matrix(zeros1[:, 1:], zeros1[:, 1:],
                        t.fric_n[:, 1:], t.y2_n[:, 1:])
    return u_start, u_mid, u_end, u_t_start, u_t_mid, u_t_end


def _tr_sigma0(t):
    """Σ(N₀) for the scalar and tensor transport from the same
    unit-amplitude BD mode matrix (state0 = (K, 4, i, a) → X columns)."""
    x_r = np.concatenate([t.state0[:, 0], t.state0[:, 2]], axis=-1)
    x_i = np.concatenate([t.state0[:, 1], t.state0[:, 3]], axis=-1)
    sig0 = (
        np.einsum("kiA,kiB->kAB", x_r, x_r)
        + np.einsum("kiA,kiB->kAB", x_i, x_i)
    )                                                      # (K, 2d, 2d)
    xt_r = np.stack([t.state0_t[:, 0], t.state0_t[:, 2]], axis=-1)[:, None]
    xt_i = np.stack([t.state0_t[:, 1], t.state0_t[:, 3]], axis=-1)[:, None]
    sig0_t = (
        np.einsum("kiA,kiB->kAB", xt_r, xt_r)
        + np.einsum("kiA,kiB->kAB", xt_i, xt_i)
    )                                                      # (K, 2, 2)
    return sig0, sig0_t


def _tr_integrate_all(shard, total_k, ds, dts, u_start, u_mid, u_end,
                      u_t_start, u_t_mid, u_t_end, sig0, sig0_t):
    """The transport route's three device launches: the scalar Σ over the
    dense segment (→ crossing surface), its continuation over the tail
    (→ end surface), and the massless tensor block.  All arrays carry the
    (possibly sweep-concatenated) pivot axis leading; ``shard`` pads it to
    the mesh and the ``[:total_k]`` trims take it back."""
    def seg(a, b):
        return (
            jnp.asarray(u_start[:, a:b]), jnp.asarray(u_mid[:, a:b]),
            jnp.asarray(u_end[:, a:b]),
            jnp.asarray(dts[:, a:b, None, None]),
        )

    # dense segment → Σ at the crossing surface; tail segment → Σ at end
    sig_star = _TR_INTEGRATE(shard(jnp.asarray(sig0)), shard(seg(0, ds)))
    sig_end = np.asarray(
        _TR_INTEGRATE(sig_star, shard(seg(ds, u_start.shape[1])))
    )[:total_k]
    sig_star = np.asarray(sig_star)[:total_k]

    # tensor modes: massless scalar transport (d=1 blocks, no Γ, no mass)
    per_step_t = (
        jnp.asarray(u_t_start), jnp.asarray(u_t_mid), jnp.asarray(u_t_end),
        jnp.asarray(dts[:, :, None, None]),
    )
    sig_t = np.asarray(
        _TR_INTEGRATE(shard(jnp.asarray(sig0_t)), shard(per_step_t))
    )[:total_k]
    return sig_star, sig_end, sig_t


def _transport_readout(t, sig_star, sig_end, sig_t, d, ds):
    """Spectra + Wands transfer functions from the integrated Σ blocks of
    one parameter set (``t`` its pivot setup; ``sig_star``/``sig_end`` the
    scalar Σ on the crossing/end surfaces, ``sig_t`` the tensor Σ)."""
    qq_end = sig_end[:, :d, :d]
    g_f, chi_f, h_f, eps_f = t.surface(t.grids[:, -1])
    p_zeta, p_iso, cos_delta, c_zs_end = _sigma_readout(
        qq_end, g_f, chi_f, h_f, eps_f, t.norm
    )
    qq_star = sig_star[:, :d, :d]
    g_s, chi_s, h_s, eps_s = t.surface(t.grids[:, ds])
    p_zeta_star, p_iso_star, _, _ = _sigma_readout(
        qq_star, g_s, chi_s, h_s, eps_s, t.norm
    )

    with np.errstate(invalid="ignore", divide="ignore"):
        t_ss = np.sqrt(p_iso / p_iso_star)
        # correlation-based T_RS = C_ζS(end)/(T_SS·P_S*) where the entropic
        # mode survives to the end surface; where it has fully decayed
        # (double-inflation-style transitions: T_SS → 0 makes the ratio
        # 0/0) fall back to the growth-based magnitude
        # √((P_ζ(end) − P_ζ*)/P_S*) — the sign is unobservable once S has
        # died (only T_RS² enters P_ζ), reported positive
        corr = c_zs_end / (t_ss * p_iso_star)
        growth = np.sqrt(
            np.maximum(p_zeta - p_zeta_star, 0.0) / p_iso_star
        )
        alive = p_iso > 1e-16 * p_zeta
        t_rs = np.where(alive & np.isfinite(corr), corr, growth)

    p_tens = 8.0 * t.norm * sig_t[:, 0, 0]
    n_s, n_t, alpha_s = _tilts(p_zeta, p_tens, t.ln_k)
    return {
        "ln_k": t.ln_k,
        "N": t.n_pivots,
        "P_zeta": p_zeta,
        "P_tensor": p_tens,
        "P_iso": p_iso,
        "cos_delta": cos_delta,
        "n_s": n_s,
        "n_t": n_t,
        "alpha_s": alpha_s,
        "r": p_tens / p_zeta,
        "H": t.h_star,
        "T_RS": t_rs,
        "T_SS": t_ss,
        "P_zeta_star": p_zeta_star,
        "P_iso_star": p_iso_star,
    }


def transport_spectrum(
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
    mesh=None,
    pivot_axis: str | None = None,
    pivot_N_before_end=None,
) -> dict:
    """Scalar/tensor spectra by moment transport (the PyTransport-style
    third route): instead of integrating mode realizations, evolve the full
    phase-space correlation matrix

        Σ^{AB}(k, N) = Σᵢ Re⟨X^A X^B⟩,   X = (Q^a, P^a),
        dΣ/dN = u Σ + Σ uᵀ,

    with the SAME covariant transport matrix u (Γu, mass matrix M/H²,
    friction 3−ε, (k/aH)²) the Mukhanov-Sasaki route uses — agreement
    between :func:`mode_spectrum` and this function tests only the two
    integrators, and is asserted to ~1e-9 in the suite.  Bunch-Davies
    initial conditions, pivot placement, read-out surfaces, sharding
    (``mesh=`` shards the pivot axis, zero collectives) and the returned
    dict all match :func:`mode_spectrum`.

    What transport adds over the mode route:

    * Σ is read out on TWO surfaces — shortly after crossing
      (N_* + ``N_dense``) and at the end of inflation — which yields the
      Wands et al. (astro-ph/0205253) super-horizon **transfer functions**

          ζ(N_end) = ζ_* + T_RS S_*,     S(N_end) = T_SS S_*,

      measured from the evolved correlators themselves (two-field models):
      ``T_SS = √(P_S(end)/P_S(*))`` and ``T_RS = C_ζS(end)/(T_SS P_S(*))``
      — exact up to the O(slow-roll) ζ–S correlation already present at
      the first surface.  Where the entropic mode has fully decayed by the
      end surface (double-inflation transitions: T_SS → 0), T_RS falls
      back to the growth-based magnitude ``√((P_ζ(end) − P_ζ*)/P_S*)``
      with positive sign (the sign is unobservable once S has died).
      Extra keys: ``T_RS``, ``T_SS``, ``P_zeta_star``, ``P_iso_star``
      (for d ≠ 2 the correlation form is unavailable and T_RS is always
      the growth-based magnitude).
    * The evolution is the first-order moment hierarchy of the transport
      method — the natural base for higher moments (the bispectrum's
      Σ³ source terms contract this Σ).

    No reference equivalent: the reference computes no perturbation
    spectra at all (its solver output has no time axis,
    background_solver.rs:283-295)."""
    t = _pivot_setup(
        artifact, args, rows, times, pivots, N_margin_start, N_margin_end,
        N_sub, N_dense, dense_steps, tail_steps,
        n_before_end=pivot_N_before_end,
    )
    pivots = len(t.n_pivots)
    shard = _pivot_shard(mesh, pivots, pivot_axis)
    d = t.state0.shape[-1]
    ds = int(dense_steps)

    u_start, u_mid, u_end, u_t_start, u_t_mid, u_t_end = _tr_streams(t)
    sig0, sig0_t = _tr_sigma0(t)
    sig_star, sig_end, sig_t = _tr_integrate_all(
        shard, int(pivots), ds, t.dts,
        u_start, u_mid, u_end, u_t_start, u_t_mid, u_t_end, sig0, sig0_t,
    )
    return _transport_readout(t, sig_star, sig_end, sig_t, d, ds)


def transport_sweep(
    artifact,
    pars,
    fields_init,
    derivatives_init,
    *,
    steps: int = 4000,
    max_err: float = 1e-8,
    solver: str = "rkf",
    pivots: int = 12,
    N_margin_start: float = 5.0,
    N_margin_end: float = 5.0,
    N_sub: float = 4.0,
    N_dense: float = 2.0,
    dense_steps: int = 4000,
    tail_steps: int = 1500,
    mesh=None,
    pivot_axis: str | None = None,
    on_failure: str = "raise",
    pivot_N_before_end=None,
) -> dict:
    """Moment-transport spectra + Wands transfer functions for a batch of
    parameter sets.

    The survey form of :func:`transport_spectrum`, with the same batching
    plan as :func:`mode_sweep`: every base background solves in one
    batched launch, then the whole sweep's Σ evolution runs in three
    device launches total (scalar dense segment, scalar tail segment,
    tensor block — per-set u-matrix streams concatenated along the
    vmapped pivot axis, which ``mesh=`` shards with zero collectives).
    Same per-set failure isolation as :func:`delta_n_sweep`.  Returns the
    :func:`transport_spectrum` dict (including ``T_RS``/``T_SS``/
    ``P_zeta_star``/``P_iso_star``) with a leading S axis plus ``ok`` and
    ``failures``.
    """
    _sweep_validate(on_failure, N_margin_start, N_margin_end, N_sub, N_dense)
    if pivot_N_before_end is not None:
        pivots = len(np.atleast_1d(pivot_N_before_end))
    pars, setups, failures = _sweep_base_setups(
        artifact, pars, fields_init, derivatives_init,
        steps=steps, max_err=max_err, solver=solver,
        mesh_kw={"mesh": mesh} if mesh is not None else {},
        on_failure=on_failure, pivots=pivots,
        N_margin_start=N_margin_start, N_margin_end=N_margin_end,
        N_sub=N_sub, N_dense=N_dense,
        dense_steps=dense_steps, tail_steps=tail_steps,
        n_before_end=pivot_N_before_end,
    )
    S = pars.shape[0]
    valid = [s_i for s_i in range(S) if setups[s_i] is not None]
    outs = [None] * S
    if valid:
        d = artifact.n_fields
        ds = int(dense_steps)
        streams = [_tr_streams(setups[s_i]) for s_i in valid]
        u_start, u_mid, u_end, u_t_start, u_t_mid, u_t_end = (
            np.concatenate(parts, axis=0) for parts in zip(*streams)
        )
        sig0s = [_tr_sigma0(setups[s_i]) for s_i in valid]
        sig0 = np.concatenate([a for a, _ in sig0s], axis=0)
        sig0_t = np.concatenate([b for _, b in sig0s], axis=0)
        dts = np.concatenate([setups[s_i].dts for s_i in valid], axis=0)
        total_k = len(valid) * int(pivots)
        shard = _pivot_shard(mesh, total_k, pivot_axis)
        sig_star, sig_end, sig_t = _tr_integrate_all(
            shard, total_k, ds, dts,
            u_start, u_mid, u_end, u_t_start, u_t_mid, u_t_end,
            sig0, sig0_t,
        )
        for v, s_i in enumerate(valid):
            sl = slice(v * int(pivots), (v + 1) * int(pivots))
            outs[s_i] = _transport_readout(
                setups[s_i], sig_star[sl], sig_end[sl], sig_t[sl], d, ds
            )

    keys = ["ln_k", "N", "P_zeta", "P_tensor", "P_iso", "cos_delta",
            "n_s", "n_t", "alpha_s", "r", "H",
            "T_RS", "T_SS", "P_zeta_star", "P_iso_star"]
    return _sweep_stack(outs, failures, keys, pivots, "transport_sweep")
