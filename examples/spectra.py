"""First-principles primordial spectra — δN and Mukhanov-Sasaki.

Run with `python examples/spectra.py` — works on TPU or CPU.

The reference stops at the consistency-condition maps; this framework's
time-resolved batched solver makes the actual observables computable from
first principles, two independent ways:

1. solve one background trajectory on a curved two-field space,
2. δN: perturb the initial fields at 8 horizon-crossing pivots and solve
   every perturbed background in ONE batched device launch — the e-fold
   differences to a uniform-H surface give P_ζ(k), n_s, r, and (order=2)
   the local non-Gaussianity f_NL,
3. Mukhanov-Sasaki: integrate the coupled mode equations Q^a through
   horizon crossing (Riemann mass matrix from the geometry layer) in one
   jitted vmap(lax.scan) — an independent formalism that must agree,
   and additionally yields the exact tensor spectrum and the
   isocurvature fraction.
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
from inflatox_tpu import background, perturbations
from inflatox_tpu.models import _args_by_symbol

# ---- 1. a curved two-field model and its background ---------------------- #
p1, p2, m1, m2, b = sympy.symbols("p1 p2 m1 m2 b", real=True)
V = sympy.Rational(1, 2) * (m1 * p1) ** 2 + sympy.Rational(1, 2) * (m2 * p2) ** 2
metric = [[sympy.Integer(1), 0], [0, sympy.exp(2 * b * p1)]]
model = inflatox.InflationModelBuilder.new([p1, p2], metric, V, silent=True).build()
artifact = inflatox.Compiler(model, silent=True).compile()
args = _args_by_symbol(artifact.model, {"m1": 1e-5, "m2": 0.8e-5, "b": 0.25})

rows, times = background.solve_eom(
    artifact, args, 3000, [10.0, 1.5], [0.0, 0.0],
    max_err=1e-10, solver="rkf", return_time=True,
)

# ---- 2. δN route: nonlinear separate-universe solves, one launch --------- #
# keep pivots ≥8 e-folds before the end — closer in, slow roll is breaking
# (r grows past 1) and both formalisms leave their validated envelope
dn = perturbations.delta_n_spectrum(
    artifact, args, rows, times, pivots=8, order=2, max_err=1e-10,
    N_margin_end=8.0,
)
print("delta-N   P_zeta:", np.array2string(dn["P_zeta"], precision=3))
print("          n_s   :", np.array2string(dn["n_s"][1:-1], precision=4))
print("          f_NL  :", np.array2string(dn["f_NL"], precision=4))

# ---- 3. Mukhanov-Sasaki route: mode integration, must agree -------------- #
ms = perturbations.mode_spectrum(
    artifact, args, rows, times, pivots=8, N_margin_end=8.0,
)
rel = ms["P_zeta"] / np.interp(ms["ln_k"], dn["ln_k"], dn["P_zeta"]) - 1.0
print("MS vs dN  rel   :", np.array2string(rel, precision=3))
print("          r     :", np.array2string(ms["r"], precision=4))
print("          P_iso/P_zeta:", np.array2string(ms["P_iso"] / ms["P_zeta"],
                                                 precision=3))
# flat models agree to ~0.5%; on this turning trajectory δN's
# velocities-on-the-attractor assumption costs a few % — 8% is the
# validated envelope (tests/test_perturbations.py)
assert np.all(np.abs(rel) < 0.08), "the two formalisms disagree"
print("two independent formalisms agree — spectrum is trustworthy")

# ---- 4. survey: δN spectra for a batch of parameter sets ------------------ #
# one launch solves every base trajectory, one launch every perturbed
# trajectory of every set; on_failure="nan" keeps a pathological corner
# from killing the scan (its row NaN-fills and `ok` flags it)
grid_m2, grid_b = np.meshgrid([0.6e-5, 0.8e-5, 1.0e-5], [0.15, 0.25])
pars = np.stack([
    _args_by_symbol(artifact.model,
                    {"m1": 1e-5, "m2": mm, "b": bb})
    for mm, bb in zip(grid_m2.ravel(), grid_b.ravel())
])
sweep = perturbations.delta_n_sweep(
    artifact, pars, [10.0, 1.5], [0.0, 0.0], steps=3000, pivots=6,
    max_err=1e-10, N_margin_end=8.0, on_failure="nan",
)
print(f"survey: {int(sweep['ok'].sum())}/{len(pars)} sets ok; "
      "P_zeta at the middle pivot per set:",
      np.array2string(sweep["P_zeta"][:, 3], precision=3))
