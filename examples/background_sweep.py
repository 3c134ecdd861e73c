"""Background-evolution parameter sweep on the Pallas DF solver.

Run with `python examples/background_sweep.py` — works on TPU or CPU (the
compiled Mosaic kernel needs a TPU; off-TPU the same call falls back to the
while-loop f64 integrator, same contract).

Demonstrates the trajectory pipeline around
`background.solve_eom_batch`:

1. one batched launch integrating thousands of backgrounds at once,
2. per-trajectory parameters — a sweep over the model's mass parameter is
   ONE kernel launch (the parameters ride (8, 128) DF planes alongside the
   state; reference parity point: the reference integrates strictly one
   trajectory per call, background_solver.rs:263-336),
3. sharding the batch over a device mesh (`mesh=`) with zero collectives,
4. feeding the solved trajectories to the on-trajectory consistency scans.
"""


try:  # installed wheel, or repo checkout (axon forbids PYTHONPATH)
    import inflatox_tpu  # noqa: F401
except ModuleNotFoundError:
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import sympy

import jax

import inflatox_tpu as inflatox
from inflatox_tpu import background
from inflatox_tpu.consistency_conditions import GeneralisedAL
from inflatox_tpu.parallel import make_mesh

# ---- model: the doc-example hyperinflation potential --------------------- #
r, θ, m = sympy.symbols("r θ m")
V = sympy.Rational(1, 2) * m**2 * (θ**2 - sympy.Rational(2, 3) / r**2)
metric = [[sympy.Rational(1, 2), 0], [0, sympy.Rational(1, 2) * r**2]]
model = inflatox.InflationModelBuilder.new([r, θ], metric, V, silent=True).build()
artifact = inflatox.Compiler(model, silent=True).compile()

# ---- 1. one batched launch, shared parameters ---------------------------- #
B, steps = 512, 400
rng = np.random.default_rng(0)
fields0 = np.column_stack([rng.uniform(1.8, 2.4, B), rng.uniform(1.7, 2.3, B)])
derivs0 = np.zeros((B, 2))

rows, times = background.solve_eom_batch(
    artifact, np.array([1.0]), steps, fields0, derivs0,
    solver="rkf_pallas",  # Pallas DF kernel on TPU; while-loop RKF45 off-TPU
    return_time=True,
)


def t_end(rows_b, times_b):
    """Physical time where H crosses zero (end of validity — neither this
    nor the reference integrator enforces a stop, so later rows continue
    into the unphysical H<0 regime)."""
    crossed = rows_b[:, :, 4] < 0.0
    idx = np.where(crossed.any(1), crossed.argmax(1), rows_b.shape[1] - 1)
    return times_b[np.arange(rows_b.shape[0]), idx]


print(f"batch: {rows.shape} rows; H crosses 0 at t ≈ "
      f"{np.median(t_end(rows, times)):.3f} (median over {B})")

# ---- 2. per-trajectory parameters: a mass sweep in one launch ------------ #
masses = np.linspace(0.5, 2.0, B)[:, None]  # (B, 1) — one m per trajectory
sweep_rows, sweep_t = background.solve_eom_batch(
    artifact, masses, steps, fields0, derivs0, solver="rkf_pallas",
    return_time=True,
)
ends = t_end(sweep_rows, sweep_t)
print(f"mass sweep: background survives t ≈ {ends.max():.2f} at m=0.5 "
      f"down to t ≈ {ends.min():.2f} at m=2.0 (one launch, {B} masses)")

# ---- 3. shard the batch over every available chip ------------------------ #
if len(jax.devices()) > 1 and B % len(jax.devices()) == 0:
    mesh = make_mesh(axis_names=("solve",), devices=jax.devices())
    rows_sharded = background.solve_eom_batch(
        artifact, np.array([1.0]), steps, fields0, derivs0,
        solver="rkf_pallas", mesh=mesh,
    )
    print("sharded batch matches:",
          bool(np.allclose(rows_sharded, rows, rtol=1e-9, atol=1e-12)))

# ---- 4. on-trajectory analysis of one solved background ------------------ #
al = GeneralisedAL(artifact, validate_basis=False)
trajectory = rows[0, :, :2]  # (steps, 2) field-space path
ot = al.complete_analysis_ot(np.array([1.0]), trajectory)
print(f"on-trajectory maps: {len(ot)} quantities × {ot[0].shape} points; "
      f"consistency range {np.nanmin(ot[0]):.3e}..{np.nanmax(ot[0]):.3e}")

# ---- 5. basin survey: which initial conditions inflate, and how much ----- #
# the trajectories are reduced ON DEVICE (eps_H = 1 crossing, e-fold
# count); only the per-IC summary maps come back over the host link
gx, gy = np.meshgrid(np.linspace(1.6, 2.6, 32), np.linspace(1.5, 2.5, 32))
basin = background.survey_initial_conditions(
    artifact, np.array([1.0]), 400,
    np.stack([gx.ravel(), gy.ravel()], axis=1), np.zeros(2),
)
n_map = basin["N_inflation"].reshape(32, 32)
print(f"basin survey: {int(basin['ended'].sum())}/{n_map.size} ICs end "
      f"inflation in-span; N_inflation up to {np.nanmax(n_map):.1f} e-folds")
