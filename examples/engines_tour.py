"""Tour of the numeric engines on one model.

Runs the same complete-analysis window on every engine and prints a small
agreement/throughput table.  On a TPU this exercises the real Pallas
kernels; on CPU the compensated engines run their EFT-safe eager fallbacks
(slow but bit-identical), so the script works anywhere.

See docs/manual.md ("Engines and precision") for when to use which.
"""


try:  # installed wheel, or repo checkout (axon forbids PYTHONPATH)
    import inflatox_tpu  # noqa: F401
except ModuleNotFoundError:
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import numpy as np
import sympy

import inflatox_tpu as inflatox
from inflatox_tpu.consistency_conditions import GeneralisedAL

# the doc-example (hyperinflation) model
r, th, m = sympy.symbols("r θ m")
V = sympy.Rational(1, 2) * m**2 * (th**2 - sympy.Rational(2, 3) / r**2)
g = [[sympy.Rational(1, 2), 0], [0, sympy.Rational(1, 2) * r**2]]
model = inflatox.InflationModelBuilder.new([r, th], g, V, silent=True).build()
al = GeneralisedAL(inflatox.Compiler(model, silent=True).compile())

args = np.array([1.0])
extent = (0.5, 2.5, 0.25, 3.0)
N = 256

ref = None
for engine in ("xla", "pallas", "pallas_df64", "pallas_edf64", "pallas_tf64"):
    t0 = time.perf_counter()
    maps = al.complete_analysis(
        args, *extent, N, N, progress=False, engine=engine
    )
    wall = time.perf_counter() - t0
    cons = np.asarray(maps[0])
    if engine == "xla":
        ref = [np.asarray(v) for v in maps]
        agree = "—  (reference)"
    else:
        worst = 0.0
        for got, want in zip(maps, ref):
            got = np.asarray(got)
            both = np.isfinite(got) & np.isfinite(want)
            rel = np.abs(got[both] - want[both]) / np.maximum(
                np.abs(want[both]), 1e-300
            )
            worst = max(worst, float(np.median(rel)))
        agree = f"median dev vs xla ≤ {worst:.1e}"
    print(
        f"{engine:14s}  wall {wall*1e3:8.1f} ms   "
        f"nanmax(consistency) = {np.nanmax(cons):.3f}   {agree}"
    )

# the df64 engine's native pair output (no pair→f64 conversion pass):
from inflatox_tpu.ops.pallas_kernels import scan_pallas_df64  # noqa: E402

pairs = scan_pallas_df64(
    al.artifact, "complete_analysis", args, extent, (N, N), output="pair"
)
hi, lo = pairs[0]
print(
    f"pair output: consistency as (hi, lo) f32 planes, "
    f"value[0,0] = {float(np.asarray(hi)[0, 0]) + float(np.asarray(lo)[0, 0]):.6f}"
)
