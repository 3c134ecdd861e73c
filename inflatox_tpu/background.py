"""Background equation-of-motion solver: batched adaptive Runge-Kutta on device.

Reference parity: ``background.solve_eom`` (background.py:30-49) driving the
Rust ``RKNSolver`` (background_solver.rs:72-336).  Semantics preserved:

* the integrated system is the multi-field background EoM in e-fold/physical
  time form used by the reference (background_solver.rs:50-59):

      φ'^a   = χ^a
      χ'^a   = −eom_a(φ, χ) − 3 H χ^a         (eom_a = Γ^a_bc χ^b χ^c + g^ab ∂_b V)
      H'     = −½ G_ab χ^a χ^b                 (= eomhdot)

  with H initialised from the Friedmann constraint ``eomh`` at the first
  step (background_solver.rs:279-281);
* each output row records the state after **one accepted adaptive step**
  (the reference's `while solver.step() {}` per row,
  background_solver.rs:283-295); step control matches: start dt = 1e-10,
  reject when err/max_err > 1.1, dt *= (max_err/err)^(1/(s+1))
  (background_solver.rs:178-187, 227).

Documented divergences (the reference integrator is numerically suspect —
see SURVEY.md §2.2 — so the Butcher tableaus are implemented from the
textbook, not bug-for-bug):

* stage accumulation uses the standard ``y + dt Σ a_nm k_m`` form (the
  reference's stage loops drop the last sub-diagonal coefficient and its
  step accumulators add ``b_i + k_i`` where ``b_i·k_i`` is required,
  background_solver.rs:99-107, 157-160);
* H is advanced with ``eomhdot`` (= −½G_ab χχ) rather than ``V − 3H²``; the
  two agree exactly on the constraint surface and the former does not
  require the (reference-buggy) unhalved constraint;
* ``solver="rk4"`` uses classical RK4 with step-doubling error control — the
  reference's "adaptive" RK4 has b ≡ bbar so its error estimate is
  identically zero (background_solver.rs:208-209) and its dt update
  divides by that zero;
* row 0 of the output holds the *initial* state (with H from the
  constraint); the reference overwrites it with the first step's result;
* the entry point actually works — the reference's `solve_eom` passes one
  argument to a two-argument opener and raises TypeError as shipped
  (background.py:44 vs lib.rs:109).

Everything is jit-compiled; :func:`solve_eom_batch` vmaps the whole
integration over initial conditions and/or parameter sets, which is how
parameter-sweep trajectory studies scale on TPU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .compiler import CompiledModel
from .utils.errors import ShapeError

__all__ = ["solve_eom", "solve_eom_batch", "survey_initial_conditions",
           "efolds"]


# ----------------------------------------------------------------------- #
# Butcher tableaus (textbook values)                                      #
# ----------------------------------------------------------------------- #

# Fehlberg 4(5): same coefficient set the reference intends
# (background_solver.rs:231-259)
_RKF_A = np.zeros((6, 6))
_RKF_A[1, 0] = 1 / 4
_RKF_A[2, :2] = (3 / 32, 9 / 32)
_RKF_A[3, :3] = (1932 / 2197, -7200 / 2197, 7296 / 2197)
_RKF_A[4, :4] = (439 / 216, -8.0, 3680 / 513, -845 / 4104)
_RKF_A[5, :5] = (-8 / 27, 2.0, -3544 / 2565, 1859 / 4104, -11 / 40)
_RKF_B5 = np.array([16 / 135, 0.0, 6656 / 12825, 28561 / 56430, -9 / 50, 2 / 55])
_RKF_B4 = np.array([25 / 216, 0.0, 1408 / 2565, 2197 / 4104, -1 / 5, 0.0])

_RK4_A = np.zeros((4, 4))
_RK4_A[1, 0] = 0.5
_RK4_A[2, 1] = 0.5
_RK4_A[3, 2] = 1.0
_RK4_B = np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6])

_DT_INIT = 1e-10  # background_solver.rs:227
_DT_FLOOR = 1e-250  # bail-out: forcibly accept rather than loop forever


def _state_derivative(model: CompiledModel, dtype):
    """RHS of the first-order system over the flat state y = (φ, χ, H)."""
    d = model.n_fields

    def f(y, args):
        x = y[:d]
        chi = y[d : 2 * d]
        hubble = y[2 * d]
        eom = model.eom(x, chi, args)  # tuple of d scalars
        acc = jnp.stack([-eom[a] - 3.0 * hubble * chi[a] for a in range(d)])
        hdot = model.eom_hdot(x, chi, args)
        return jnp.concatenate([chi, acc, jnp.reshape(hdot, (1,))]).astype(dtype)

    return f


def _rk_step(f, y, dt, args, a_mat, b_hi, b_lo):
    """One embedded RK step: returns (y_high, y_low)."""
    stages = a_mat.shape[0]
    ks = []
    for n in range(stages):
        yn = y
        for m in range(n):
            if a_mat[n, m] != 0.0:
                yn = yn + dt * a_mat[n, m] * ks[m]
        ks.append(f(yn, args))
    hi = y
    lo = y
    for n in range(stages):
        if b_hi[n] != 0.0:
            hi = hi + dt * b_hi[n] * ks[n]
        if b_lo[n] != 0.0:
            lo = lo + dt * b_lo[n] * ks[n]
    return hi, lo


def _build_solver(model: CompiledModel, solver: str, steps: int, dtype, max_err: float):
    """jit-compiled single-trajectory integrator (closure over max_err)."""
    f = _state_derivative(model, dtype)
    d = model.n_fields

    if solver == "rkf":
        stages = 6

        def embedded(y, dt, args):
            return _rk_step(f, y, dt, args, _RKF_A, _RKF_B5, _RKF_B4)

    elif solver == "rk4":
        stages = 4

        def embedded(y, dt, args):
            big, _ = _rk_step(f, y, dt, args, _RK4_A, _RK4_B, _RK4_B)
            half1, _ = _rk_step(f, y, dt / 2.0, args, _RK4_A, _RK4_B, _RK4_B)
            small, _ = _rk_step(f, half1, dt / 2.0, args, _RK4_A, _RK4_B, _RK4_B)
            return small, big

    else:
        raise ValueError(f'unknown solver {solver!r}; expected "rk4" or "rkf"')

    exponent = 1.0 / (stages + 1)
    max_err_c = float(max_err)

    def one_row(args, carry):
        y, dt, t = carry

        def body(state):
            y_s, dt_s, t_s, _ = state
            hi, lo = embedded(y_s, dt_s, args)
            err = jnp.sqrt(jnp.sum((hi - lo) ** 2))
            ratio = err / max_err_c
            q = jnp.where(
                err > 0.0,
                jnp.clip((max_err_c / jnp.maximum(err, 1e-300)) ** exponent, 0.1, 5.0),
                5.0,  # zero error: grow at the cap
            )
            # non-finite error (diverging state): shrink and retry
            q = jnp.where(jnp.isfinite(err), q, 0.1)
            accept = jnp.logical_or(ratio <= 1.1, dt_s <= _DT_FLOOR)
            y_next = jnp.where(accept, hi, y_s)
            t_next = jnp.where(accept, t_s + dt_s, t_s)
            return y_next, dt_s * q, t_next, accept

        def cond(state):
            return jnp.logical_not(state[3])

        y, dt, t, _ = lax.while_loop(cond, body, (y, dt, t, jnp.asarray(False)))
        return y, dt, t

    def run(fields_init, derivs_init, args):
        x0 = jnp.asarray(fields_init, dtype)
        chi0 = jnp.asarray(derivs_init, dtype)
        args = jnp.asarray(args, dtype)
        h0 = model.eom_h(x0, chi0, args)
        y0 = jnp.concatenate([x0, chi0, jnp.reshape(h0, (1,))]).astype(dtype)

        def scan_body(carry, _):
            y, dt, t = one_row(args, carry)
            return (y, dt, t), jnp.concatenate([y, jnp.reshape(t, (1,))])

        carry0 = (y0, jnp.asarray(_DT_INIT, dtype), jnp.asarray(0.0, dtype))
        _, rows = lax.scan(scan_body, carry0, None, length=steps - 1)
        row0 = jnp.concatenate([y0, jnp.zeros((1,), dtype)])
        return jnp.concatenate([row0[None, :], rows], axis=0)  # (steps, 2d+2)

    return jax.jit(run), d


def _model_cache(model) -> dict:
    """Solver cache stored ON the model object: lifetime tied to the model
    (a module-global id(model)-keyed dict would pin every artifact and its
    executables forever, and invite id-reuse aliasing after gc)."""
    return model.__dict__.setdefault("_solver_cache", {})


def _get_solver(model, solver, steps, dtype, max_err):
    cache = _model_cache(model)
    key = (solver, steps, jnp.dtype(dtype).name, float(max_err))
    entry = cache.get(key)
    if entry is None:
        entry = _build_solver(model, solver, steps, dtype, max_err)
        cache[key] = entry
    return entry


def solve_eom(
    artifact: CompiledModel,
    pars,
    steps: int,
    fields_init,
    derivatives_init,
    max_err: float = 1e-6,
    solver: str = "rk4",
    return_time: bool = False,
):
    """Integrate the background EoM for one trajectory.

    Args mirror reference background.py:30-38.  Returns a (steps, 2n+1)
    array: fields, field derivatives, Hubble parameter per row; row 0 is the
    initial state with H from the Friedmann constraint.  With
    ``return_time=True`` also returns the (steps,) array of physical times of
    each row (the reference discards this information, making its output
    hard to interpret — each row is one adaptive step of unknown size).
    """
    n = artifact.n_fields
    fields_init = np.asarray(fields_init, dtype=float)
    derivatives_init = np.asarray(derivatives_init, dtype=float)
    pars = np.asarray(pars, dtype=float)
    if fields_init.shape != (n,) or derivatives_init.shape != (n,):
        raise ShapeError(
            (n,), fields_init.shape, "initial conditions must have one entry per field"
        )
    if pars.shape != (artifact.n_parameters,):
        raise ShapeError(
            (artifact.n_parameters,), pars.shape,
            f'model "{artifact.model_name}" has {artifact.n_parameters} parameters',
        )
    run, _ = _get_solver(artifact, solver, int(steps), jnp.float64, max_err)
    rows = np.asarray(run(fields_init, derivatives_init, pars))
    out, times = rows[:, :-1], rows[:, -1]
    if return_time:
        return out, times
    return out


def solve_eom_batch(
    artifact: CompiledModel,
    pars,
    steps: int,
    fields_init,
    derivatives_init,
    max_err: float = 1e-6,
    solver: str = "rk4",
    return_time: bool = False,
    mesh=None,
):
    """Integrate a batch of trajectories in one device launch.

    ``fields_init``/``derivatives_init`` have shape (B, n); ``pars`` is
    either (k,) (shared) or (B, k) (per-trajectory — this is how parameter
    sweeps of background evolutions run on TPU).  Returns (B, steps, 2n+1)
    [+ (B, steps) times].  No reference equivalent (the reference is
    strictly sequential, one trajectory per call).

    ``mesh=`` shards the batch across a device mesh with zero collectives
    (trajectories are independent) — see
    :func:`inflatox_tpu.parallel.sharded_solve_eom_batch`, which this
    forwards to (any ``solver``, incl. ``"rkf_pallas"``).

    ``solver="rkf_pallas"`` (round 3) runs the double-f32 Pallas solver
    kernel (ops/pallas_solver.py) — RKF45 with the state advanced in DF
    pairs inside compiled Mosaic, ~350× the while-loop path's throughput on
    hardware.  Any field count; parameters shared or per-trajectory (the
    (B, k) form rides DF planes alongside the state — parameter sweeps of
    background evolutions are one kernel launch).  Off-TPU it falls back
    to the while-loop RKF45.  Step sequences agree with
    ``solver="rkf"`` to controller precision (adaptive dt computed in f32;
    per-step error control is identical)."""
    # validate BEFORE the mesh / rkf_pallas dispatch branches so every path
    # raises the typed ShapeError instead of a cryptic trace-time broadcast
    n = artifact.n_fields
    fields_init = np.asarray(fields_init, dtype=float)
    derivatives_init = np.asarray(derivatives_init, dtype=float)
    pars = np.asarray(pars, dtype=float)
    if fields_init.ndim != 2 or fields_init.shape[1] != n:
        raise ShapeError(
            (-1, n), fields_init.shape,
            "batched initial conditions must be (B, n_fields)",
        )
    if derivatives_init.shape != fields_init.shape:
        raise ShapeError(
            fields_init.shape, derivatives_init.shape,
            "derivatives_init must match fields_init (B, n_fields)",
        )
    if pars.ndim == 2 and pars.shape != (fields_init.shape[0],
                                         artifact.n_parameters):
        raise ShapeError(
            (fields_init.shape[0], artifact.n_parameters), pars.shape,
            "per-trajectory parameters must be (B, n_parameters)",
        )
    if pars.ndim == 1 and pars.shape != (artifact.n_parameters,):
        raise ShapeError(
            (artifact.n_parameters,), pars.shape,
            "shared parameters must be (n_parameters,)",
        )
    if mesh is not None:
        from .parallel.solve import sharded_solve_eom_batch  # noqa: PLC0415

        return sharded_solve_eom_batch(
            artifact, pars, steps, fields_init, derivatives_init, mesh,
            solve_axis=mesh.axis_names[0], max_err=max_err, solver=solver,
            return_time=return_time,
        )
    if solver == "rkf_pallas":
        from .ops.pallas_solver import solve_eom_batch_pallas  # noqa: PLC0415

        return solve_eom_batch_pallas(
            artifact, pars, steps, fields_init, derivatives_init,
            max_err=max_err, return_time=return_time,
        )
    # cache the jitted vmapped wrapper too: a fresh jax.jit(jax.vmap(...))
    # object per call would miss the jit cache every time and re-compile
    # the whole batched integrator (~minutes cold) on every invocation
    mode = "shared" if pars.ndim == 1 else "per_traj"
    cache = _model_cache(artifact)
    bkey = ("batch", solver, int(steps), float(max_err), mode)
    batched = cache.get(bkey)
    if batched is None:
        run, _ = _get_solver(artifact, solver, int(steps), jnp.float64, max_err)
        in_axes = (0, 0, None) if mode == "shared" else (0, 0, 0)
        batched = jax.jit(jax.vmap(run, in_axes=in_axes))
        cache[bkey] = batched
    rows = np.asarray(batched(fields_init, derivatives_init, pars))
    out, times = rows[:, :, :-1], rows[:, :, -1]
    if return_time:
        return out, times
    return out


def _solve_batch_device(artifact, pars, steps, fields_init, derivatives_init,
                        max_err, solver):
    """Batched solve returning (rows, times) WITHOUT forcing a host fetch —
    device arrays feed on-device reductions (the CPU while-loop path is
    host-resident anyway).  Inputs must be pre-validated."""
    if solver == "rkf_pallas":
        from .ops.pallas_solver import solve_eom_batch_pallas  # noqa: PLC0415

        return solve_eom_batch_pallas(
            artifact, pars, steps, fields_init, derivatives_init,
            max_err=max_err, combine="device",
        )
    mode = "shared" if np.asarray(pars).ndim == 1 else "per_traj"
    cache = _model_cache(artifact)
    bkey = ("batch", solver, int(steps), float(max_err), mode)
    batched = cache.get(bkey)
    if batched is None:
        run, _ = _get_solver(artifact, solver, int(steps), jnp.float64, max_err)
        in_axes = (0, 0, None) if mode == "shared" else (0, 0, 0)
        batched = jax.jit(jax.vmap(run, in_axes=in_axes))
        cache[bkey] = batched
    rows = batched(fields_init, derivatives_init, pars)
    return rows[:, :, :-1], rows[:, :, -1]


def _survey_reduce(artifact, mode):
    """Jitted per-trajectory summary of a batch of solved backgrounds:
    e-fold count through inflation (ε_H = 1 crossing, interpolated like
    :func:`~inflatox_tpu.observables._eps1_crossing`), the crossing's H and
    field point, and the integrated span — (B,) outputs from (B, steps)
    inputs, so the trajectories themselves never leave the device."""
    d = artifact.n_fields

    @jax.jit
    def reduce(rows, times, pars):
        x = [rows[..., c] for c in range(d)]
        chi = [rows[..., d + c] for c in range(d)]
        hub = rows[..., 2 * d]
        a_in = (pars if mode == "shared"
                else [pars[:, j:j + 1] for j in range(pars.shape[1])])
        chi_sq = artifact.inner_prod(x, a_in, chi, chi)
        hdot = -0.5 * chi_sq
        eps = -hdot / (hub * hub)
        dt = times[:, 1:] - times[:, :-1]
        seg = 0.5 * (hub[:, 1:] + hub[:, :-1]) * dt \
            + (dt * dt / 12.0) * (hdot[:, :-1] - hdot[:, 1:])
        n = jnp.concatenate(
            [jnp.zeros_like(times[:, :1]), jnp.cumsum(seg, axis=1)], axis=1
        )
        finite = jnp.isfinite(eps) & (hub > 0.0)
        below = finite & (eps < 1.0)
        inflated = jnp.any(below, axis=1)
        start = jnp.argmax(below, axis=1)          # first inflating row
        idxs = jnp.arange(times.shape[1])[None, :]
        crossing = (idxs > start[:, None]) & finite & (eps >= 1.0)
        ended = inflated & jnp.any(crossing, axis=1)
        i = jnp.maximum(jnp.argmax(crossing, axis=1), 1)

        def pair(arr):
            lo = jnp.take_along_axis(arr, (i - 1)[:, None], axis=1)[:, 0]
            hi = jnp.take_along_axis(arr, i[:, None], axis=1)[:, 0]
            return lo, hi

        e0, e1 = pair(eps)
        frac = jnp.where(e1 != e0, (1.0 - e0) / (e1 - e0), 0.0)

        def interp(arr):
            a0, a1 = pair(arr)
            return a0 + frac * (a1 - a0)

        n_start = jnp.take_along_axis(n, start[:, None], axis=1)[:, 0]
        nan = jnp.full_like(n_start, jnp.nan)
        n_inf = jnp.where(ended, interp(n) - n_start, nan)
        h_end = jnp.where(ended, interp(hub), nan)
        x_end = jnp.where(
            ended[:, None],
            jnp.stack([interp(xc) for xc in x], axis=1), jnp.nan,
        )
        return n_inf, ended, h_end, x_end, n[:, -1]

    return reduce


def survey_initial_conditions(
    artifact: CompiledModel,
    pars,
    steps: int,
    fields_init,
    derivatives_init,
    *,
    max_err: float = 1e-6,
    solver: str | None = None,
    chunk: int = 8192,
    mesh=None,
) -> dict:
    """Map the inflationary outcome over a batch of initial conditions.

    For every row of ``fields_init``/``derivatives_init`` ((B, n); either
    may broadcast from (n,)), integrates the background and reduces the
    trajectory ON DEVICE to a per-IC summary — how many e-folds of
    inflation the initial condition produces (ε_H < 1 → ε_H = 1 crossing,
    interpolated), whether inflation ends inside the integrated span, and
    the crossing's H and field point.  ``pars`` is (k,) shared or (B, k)
    per-trajectory, so the same call surveys initial conditions, parameter
    sets, or both jointly.

    This is the basin-of-attraction companion to the consistency-condition
    maps: a 512² grid of initial conditions is ~262k trajectories — ~5 s
    on one chip with the default ``solver`` (the Pallas DF kernel at
    ~50k traj/s) — and the (B, steps) trajectories never cross the
    host↔device link; only the (B,) summary maps do (the batch runs in
    ``chunk``-sized launches to bound device memory).  ``mesh=`` shards
    each launch across chips (zero collectives).

    Returns a dict of (B,) numpy arrays: ``N_inflation`` (e-folds from
    the first inflating row to the ε_H = 1 crossing; NaN where inflation
    never happens or never ends), ``ended`` (bool), ``H_end``, ``x_end``
    ((B, n) field point at the crossing), ``N_span`` (e-folds integrated
    over the whole trajectory, ended or not).  Reshape to your grid for
    maps: ``out["N_inflation"].reshape(ny, nx)``.

    No reference equivalent — its solver integrates one trajectory per
    call and returns rows of unknown time spacing
    (background_solver.rs:283-295), making both the batching and the
    e-fold counting impossible on its output.
    """
    n = artifact.n_fields
    fields_init = np.atleast_2d(np.asarray(fields_init, dtype=float))
    derivatives_init = np.asarray(derivatives_init, dtype=float)
    B = fields_init.shape[0]
    derivatives_init = np.broadcast_to(derivatives_init, (B, n)).copy()
    pars = np.asarray(pars, dtype=float)
    if fields_init.shape[1] != n:
        raise ShapeError((-1, n), fields_init.shape,
                         "initial conditions must be (B, n_fields)")
    if pars.ndim == 2 and pars.shape != (B, artifact.n_parameters):
        raise ShapeError((B, artifact.n_parameters), pars.shape,
                         "per-trajectory parameters must be (B, n_parameters)")
    if pars.ndim == 1 and pars.shape != (artifact.n_parameters,):
        raise ShapeError((artifact.n_parameters,), pars.shape,
                         "shared parameters must be (n_parameters,)")
    if solver is None:
        solver = "rkf_pallas" if jax.default_backend() == "tpu" else "rkf"
    mode = "shared" if pars.ndim == 1 else "per_traj"
    cache = _model_cache(artifact)
    rkey = ("survey_reduce", mode)
    reduce = cache.get(rkey)
    if reduce is None:
        reduce = _survey_reduce(artifact, mode)
        cache[rkey] = reduce

    outs = []
    for c0 in range(0, B, int(chunk)):
        sl = slice(c0, min(B, c0 + int(chunk)))
        p_c = pars if mode == "shared" else pars[sl]
        if mesh is not None:
            # combine="device": trajectories stay on their chips; only the
            # (B,) summary maps produced by the jitted reduce below ever
            # cross the host↔device link (round 4, ADVICE r3 — the default
            # host fetch defeated the on-device design exactly in the
            # multi-chip case)
            from .parallel.solve import (  # noqa: PLC0415
                sharded_solve_eom_batch,
            )

            rows, times = sharded_solve_eom_batch(
                artifact, p_c, int(steps), fields_init[sl],
                derivatives_init[sl], mesh,
                solve_axis=mesh.axis_names[0], max_err=max_err,
                solver=solver, combine="device",
            )
        else:
            rows, times = _solve_batch_device(
                artifact, p_c, int(steps), fields_init[sl],
                derivatives_init[sl], max_err, solver,
            )
        outs.append([np.asarray(v) for v in reduce(rows, times, p_c)])
    n_inf, ended, h_end, x_end, n_span = (
        np.concatenate([o[j] for o in outs]) for j in range(5)
    )
    return {
        "N_inflation": n_inf,
        "ended": ended.astype(bool),
        "H_end": h_end,
        "x_end": x_end,
        "N_span": n_span,
    }


def efolds(rows, times, hdot=None):
    """Cumulative e-fold count N(t) = ∫₀ᵗ H dt' along solved trajectories.

    ``rows``/``times`` are the outputs of :func:`solve_eom` ((steps, 2n+1),
    (steps,)) or :func:`solve_eom_batch` ((B, steps, 2n+1), (B, steps)) with
    ``return_time=True``; H is the last state column.  Returns an array
    shaped like ``times`` with N per output row (trapezoid rule over the
    adaptive step sequence; row 0 is 0).

    ``hdot`` (optional, shaped like ``times``) supplies Ḣ at every row
    (Ḣ = −½ G_ab χ^a χ^b, e.g. ``-0.5 * artifact.inner_prod(x, args, chi,
    chi)``); the quadrature is then corrected to cubic-Hermite order
    (trapezoid + Δt²/12·(Ḣᵢ − Ḣᵢ₊₁), per-segment error O(Δt⁵) instead of
    O(Δt³)) — needed when N differences at the 1e-6 level matter (second-
    order δN).

    No reference equivalent: the reference discards the per-row step sizes
    entirely (background_solver.rs:283-295 returns state rows of unknown
    spacing), leaving e-fold counts uncomputable from its output.
    """
    rows = np.asarray(rows, dtype=float)
    times = np.asarray(times, dtype=float)
    if rows.shape[:-1] != times.shape:
        raise ShapeError(rows.shape[:-1], times.shape,
                         "times must match the solver rows per trajectory")
    hubble = rows[..., -1]
    dt = np.diff(times, axis=-1)
    seg = 0.5 * (hubble[..., 1:] + hubble[..., :-1]) * dt
    if hdot is not None:
        hdot = np.asarray(hdot, dtype=float)
        if hdot.shape != times.shape:
            raise ShapeError(times.shape, hdot.shape,
                             "hdot must give Ḣ at every output row")
        seg = seg + (dt * dt / 12.0) * (hdot[..., :-1] - hdot[..., 1:])
    out = np.zeros_like(times)
    np.cumsum(seg, axis=-1, out=out[..., 1:])
    return out
