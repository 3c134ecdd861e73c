"""Measure the range-aware-series lever on the cfg4b model (round-6
candidate, STATUS.md): trace the df64 scan kernel under
``df32_special.series_budget`` chain lengths sized for cfg4b's actual
argument window (|z_1F1| ≤ 4 → 48 terms vs 150; |z_2F1| ≤ 0.36 → 90 vs
340) and K-chain both kernels on hardware.  The series guard NaN-poisons
under-budgeted lanes, so correctness is also checked (64² map equality
against the default-budget kernel at 1e-13).

Run from /root/repo:  python -u scripts/probe_r5_hyp_budget.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import sympy

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import inflatox_tpu as inflatox
from inflatox_tpu.lowering import df32_special as dsp
from inflatox_tpu.ops import pallas_kernels as pk
from inflatox_tpu.ops.pallas_kernels import scan_pallas_df64

x, y, a = sympy.symbols("x y a")
half, th_, fh = (sympy.Rational(1, 2), sympy.Rational(3, 2),
                 sympy.Rational(5, 2))
V = (a * sympy.hyper((half,), (th_,), -(x**2))
     + sympy.hyper((half, th_), (fh,), y**2 / 4) / 10
     + sympy.erf(x) * sympy.gamma(y + 2) / 50 + 2)
model = inflatox.InflationModelBuilder.new(
    [x, y], [[1, 0], [0, 1]], V, silent=True, simplify=False,
    assertions=False,
).build()
art = inflatox.Compiler(model, silent=True).compile()
args = np.array([2.0])
extent = (0.3, 2.0, 0.2, 1.2)
N = 1024
scal = pk._df_scalars(args, extent, (N, N))
BUDGET = dict(hyp1f1=48, hyp2f1=90)


def make_chain(budget):
    @jax.jit
    def run(s, K):
        def body(_, carry):
            ss, acc = carry
            outs = pk._launch_df(ss, art, (N, N),
                                 pk._auto_tile((N, N), art), False,
                                 "complete_analysis", combine=False)
            probe = outs[0][0, 0]
            return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

        _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
        return acc

    # the budget context must wrap the TRACE (first call)
    if budget:
        with dsp.series_budget(**budget):
            run(scal, jnp.int32(1)).block_until_ready()
    return run


def timed(run, K1=2, K2=16, reps=3):
    def one(K):
        t0 = time.perf_counter()
        out = run(scal, jnp.int32(K))
        jax.block_until_ready(out)
        float(out)
        return time.perf_counter() - t0

    one(K1)
    t1 = min(one(K1) for _ in range(reps))
    t2 = min(one(K2) for _ in range(reps))
    return (t2 - t1) / (K2 - K1)


# correctness first, at 64² on the scan surface
print("correctness 64²:", flush=True)
base_maps = [np.asarray(m) for m in
             scan_pallas_df64(art, "complete_analysis", args, extent,
                              (64, 64))]
with dsp.series_budget(**BUDGET):
    bud_maps = [np.asarray(m) for m in
                scan_pallas_df64(art, "complete_analysis", args, extent,
                                 (64, 64))]
worst = 0.0
for g, r in zip(bud_maps, base_maps):
    both = np.isfinite(g) & np.isfinite(r)
    assert both.mean() > 0.99, "budgeted kernel lost finite coverage"
    rel = np.abs(g[both] - r[both]) / np.maximum(np.abs(r[both]), 1e-300)
    worst = max(worst, float(rel.max()))
print(f"  budgeted vs default max rel: {worst:.2e}", flush=True)

t0 = time.perf_counter()
base = make_chain(None)
ms_base = timed(base)
print(f"default budget: {ms_base * 1e3:.2f} ms/call "
      f"(setup {time.perf_counter() - t0:.0f}s)", flush=True)
t0 = time.perf_counter()
bud = make_chain(BUDGET)
ms_bud = timed(bud)
print(f"window budget (1F1=48, 2F1=90): {ms_bud * 1e3:.2f} ms/call "
      f"(setup {time.perf_counter() - t0:.0f}s)  x{ms_base / ms_bud:.2f}",
      flush=True)
