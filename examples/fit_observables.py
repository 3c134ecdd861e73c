"""Gradient-based parameter fitting of CMB observables.

Run with `python examples/fit_observables.py` — works on TPU or CPU.

The reference can only *evaluate* a model at given parameters; finding
parameters that reproduce observed quantities means a grid search over
repeated scans.  Because this framework lowers models to pure JAX, the map
parameters → observables is differentiable end-to-end, so the same problem
is a few hundred compiled optimizer steps in one `lax.scan` launch:

1. build a two-field natural-inflation-style model (host-side sympy, as
   always) — a cosine potential, because Planck-like targets need a
   concave region (η_V < 0), which no positive-definite quadratic can
   provide,
2. fit the axion decay constant AND the horizon-exit pivot point so the
   leading-order slow-roll predictions hit Planck-like targets
   (n_s = 0.9649, r = 0.036) — the pivot is part of the inference, since
   observables are evaluated where the mode exits the horizon,
3. cross-check the fitted point on the standard consistency scan API, and
4. differentiate *through the background integrator* (fixed-step RK4 under
   `lax.scan`) to show trajectory-level losses work too.
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
import jax.numpy as jnp

import inflatox_tpu as inflatox
from inflatox_tpu import observables

# ---- 1. model: axion + spectator on a flat field space ------------------- #
# V = 1 + cos(phi_1/f_a) + (m phi_2)^2 on a flat metric — the zoo's
# natural-inflation model (inflatox_tpu/models).  Building your own works
# identically: InflationModelBuilder.new(fields, metric, V).build().
from inflatox_tpu.models import natural

model, _default_args = natural()
artifact = inflatox.Compiler(model, silent=True).compile()
fa, m = sympy.symbols("f_a m")

# parameter slots follow printer registration order (reference contract,
# compiler.py:102-106); query them instead of guessing
def slot(sym):
    s = artifact.lookup_symbol(sym)  # e.g. "args[0]"
    return int(s[s.index("[") + 1 : -1])


SLOT_FA, SLOT_M = slot(fa), slot(m)
M_SPECTATOR = 0.05  # held fixed during the fit

# ---- 2. fit decay constant + pivot to Planck-like targets ---------------- #
targets = {"n_s": 0.9649, "r": 0.036}
sr = observables.slow_roll(artifact)


def loss(z):
    # z = (f_a, phi_1*, phi_2*): model shape + horizon-exit point
    args = jnp.zeros(artifact.n_parameters)
    args = args.at[SLOT_FA].set(z[0]).at[SLOT_M].set(M_SPECTATOR)
    got = sr(z[1:], args)
    return (got["n_s"] - targets["n_s"]) ** 2 + (got["r"] - targets["r"]) ** 2


res = observables.fit_parameters(loss, np.array([5.0, 4.0, 0.1]), steps=2000,
                                 learning_rate=0.01)
args = np.zeros(artifact.n_parameters)
args[SLOT_FA], args[SLOT_M] = res.params[0], M_SPECTATOR
pivot = jnp.asarray(res.params[1:])
fitted = sr(pivot, args)
print(f"fitted f_a, pivot   : {res.params[0]:.5f}, {np.asarray(pivot)}")
print(f"loss start -> end   : {res.loss_history[0]:.3e} -> "
      f"{float(loss(jnp.asarray(res.params))):.3e}")
print(f"n_s at pivot        : {float(fitted['n_s']):.6f}  (target {targets['n_s']})")
print(f"r at pivot          : {float(fitted['r']):.6f}  (target {targets['r']})")
print(f"epsilon_V / eta_V   : {float(fitted['epsilon_v']):.5f} / "
      f"{float(fitted['eta_v']):.5f}")

# ---- 3. cross-check on the scan API (same formulas, grid form) ----------- #
al = inflatox.consistency_conditions.GeneralisedAL(artifact, validate_basis=False)
eps_map = al.epsilon_v(
    args, *(float(pivot[0]),) * 2, *(float(pivot[1]),) * 2,
    N_x0=1, N_x1=1, progress=False, engine="xla",
)
print(f"scan-API epsilon_V  : {float(eps_map[0, 0]):.5f} "
      f"(matches {float(fitted['epsilon_v']):.5f})")

# ---- 4. trajectory-level gradient through the integrator ----------------- #
grid = jnp.linspace(0.0, 2.0, 401)


def displacement(a):
    rows = observables.solve_eom_fixed(
        artifact, a, grid, pivot, jnp.zeros(2)
    )
    return rows[-1, 0] - rows[0, 0]  # how far phi_1 rolled by t=2


g = jax.grad(displacement)(jnp.asarray(args))
print(f"d(roll distance)/d(f_a, m) = {np.asarray(g)[[SLOT_FA, SLOT_M]]}  "
      "(reverse-mode, through 400 RK4 steps)")
