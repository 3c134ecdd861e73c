"""Special-function potentials: Bessel and hypergeometric models on the
compensated engine.

The reference transpiles these to GSL calls in its generated C
(compiler.py:158-212, GSLInflatoxPrinter) and evaluates them through the
dlopen'd dylib; here the same sympy functions lower to the compensated
Pallas engine's own implementations — integer AND any fractional order
|ν| ≤ 30 for J/Y/I/K (near-integer included), fractional spherical
orders, 0F1/1F1/2F1/2F0 and erf/gamma — all parity-grade (~1e-13 vs the
f64 oracle; docs/numerics.md §7 has the measured envelope table).

Run with `python examples/special_functions.py` — works on TPU or CPU
(the first TPU compile of a special-function kernel takes minutes and is
cached persistently; CPU falls back to the exact eager evaluation).
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

# ---- 1. a Bessel-well potential with a FRACTIONAL order ------------------ #
# (the round-5 envelope: any non-integer |ν| ≤ 30 stays on the fast
# compensated engine — near-integer orders like 2.01 included)
x, y, a = sympy.symbols("x y a")
V_bessel = (
    a * sympy.besselj(sympy.Rational(5, 2), x + 1) ** 2
    + sympy.besselk(sympy.Rational(201, 100), x + 2) * y**2
    + 2
)
model = inflatox.InflationModelBuilder.new(
    [x, y], [[1, 0], [0, 1]], V_bessel, silent=True, simplify=False,
    assertions=False,
).build()
art = inflatox.Compiler(model, silent=True).compile()
print("Bessel model stays on the compensated engine:", art.df32_compatible)

al = GeneralisedAL(art, validate_basis=False)
maps = al.complete_analysis(np.array([2.0]), 0.5, 3.0, 0.2, 1.5, 128, 128,
                            progress=False)
print("consistency map finite fraction:",
      float(np.isfinite(maps[0]).mean()))

# ---- 2. the GSL hypergeometric family ------------------------------------ #
half, th, fh = (sympy.Rational(1, 2), sympy.Rational(3, 2),
                sympy.Rational(5, 2))
V_hyp = (
    a * sympy.hyper((half,), (th,), -(x**2))            # 1F1 via 0F1 form
    + sympy.hyper((half, th), (fh,), y**2 / 4) / 10     # 2F1
    + sympy.erf(x) * sympy.gamma(y + 2) / 50 + 2
)
model_h = inflatox.InflationModelBuilder.new(
    [x, y], [[1, 0], [0, 1]], V_hyp, silent=True, simplify=False,
    assertions=False,
).build()
art_h = inflatox.Compiler(model_h, silent=True).compile()
print("hyp/erf/gamma model on the compensated engine:",
      art_h.df32_compatible)
al_h = GeneralisedAL(art_h, validate_basis=False)
V_grid = al_h.calc_V_array(np.array([2.0]), (0.3, 0.2), (2.0, 1.2),
                           N=(64, 64))
print("V grid:", V_grid.shape, "finite:", bool(np.isfinite(V_grid).all()))

# engine="xla" gives the true-IEEE-f64 oracle on CPU for spot checks
v_point = al_h.calc_V(np.array([1.0, 0.7]), np.array([2.0]))
print(f"V(1.0, 0.7) = {v_point:.12f}")
