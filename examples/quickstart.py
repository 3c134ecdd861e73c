"""Quickstart: define a model, compile it, run the full analysis suite.

Run with `python examples/quickstart.py` — works on TPU or CPU.  Mirrors
the reference README example (hyperinflation) and then goes beyond it:
engine selection, background trajectories, multi-chip scans, sweeps.
"""


try:  # installed wheel, or repo checkout (axon forbids PYTHONPATH)
    import inflatox_tpu  # noqa: F401
except ModuleNotFoundError:
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import sympy

import inflatox_tpu as inflatox
from inflatox_tpu.consistency_conditions import GeneralisedAL

# ---- 1. specify the model symbolically ---------------------------------- #
r, θ, m = sympy.symbols("r θ m")
V = sympy.Rational(1, 2) * m**2 * (θ**2 - sympy.Rational(2, 3) / r**2)
metric = [[sympy.Rational(1, 2), 0], [0, sympy.Rational(1, 2) * r**2]]

model = inflatox.InflationModelBuilder.new([r, θ], metric, V, silent=True).build()

# ---- 2. compile (sympy → JAX; no C compiler, no dlopen) ------------------ #
artifact = inflatox.Compiler(model, silent=True).compile()
artifact.print_sym_lookup_table()  # which sympy symbol is args[i]

# ---- 3. point evaluation + the full grid analysis ------------------------ #
al = GeneralisedAL(artifact)
args = np.array([1.0])  # m = 1
print("V(2, -2) =", al.calc_V(np.array([2.0, -2.0]), args))
print("H(2, -2) =\n", al.calc_H(np.array([2.0, -2.0]), args))

cons, eps_v, eps_h, eta, delta, omega = al.complete_analysis(
    args, 0.0, 2.5, 0.0, np.pi, N_x0=512, N_x1=512, progress=False
)
print("consistency map:", cons.shape, "nanmin:", np.nanmin(cons))

# Engines: "xla" (default), "pallas" (fp32 TPU kernel),
# "pallas_df64" (double-f32 TPU kernel, f64-grade — the fast parity path)
fast = al.complete_analysis(
    args, 0.0, 2.5, 0.0, np.pi, 512, 512, progress=False, engine="pallas_df64"
)
print("df64 engine:", fast[0].dtype)

# ---- 4. background trajectories ------------------------------------------ #
from inflatox_tpu import background

traj, t = background.solve_eom(
    artifact, args, steps=200, fields_init=[2.0, 2.0],
    derivatives_init=[0.0, 0.0], solver="rkf", return_time=True,
)
print("trajectory: H goes", traj[0, 4], "->", traj[-1, 4], "over t =", t[-1])

# batched: one device launch for many initial conditions
inits = np.column_stack([np.linspace(1.8, 2.2, 16), np.full(16, 2.0)])
batch = background.solve_eom_batch(
    artifact, args, 100, inits, np.zeros_like(inits), solver="rkf"
)
print("batched trajectories:", batch.shape)

# ---- 5. multi-chip (runs on however many devices are attached) ----------- #
import jax

from inflatox_tpu.parallel import make_mesh, parameter_sweep, sharded_scan

if len(jax.devices()) > 1:
    mesh = make_mesh(axis_names=("grid",))
    maps = sharded_scan(al, args, (0.5, 2.5, 0.25, 3.0), (1024, 1024), mesh)
    print("sharded maps:", maps.shape)

# parameter sweep with per-chunk checkpointing (resumable)
sweep = parameter_sweep(
    al,
    np.linspace(0.5, 2.0, 8)[:, None],  # 8 values of m
    (0.5, 2.5, 0.25, 3.0),
    (128, 128),
    progress=False,
    reduce_fn=lambda maps: maps[0].min(),  # keep only min-consistency
)
print("sweep min-consistency per m:", np.round(sweep, 4))
