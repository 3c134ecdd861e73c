#!/usr/bin/env python
"""Benchmark driver: one JSON line on stdout, detail on stderr.

Headline metric (BASELINE.json north star): fp64 `complete_analysis` on a
4096x4096 grid of the hyperinflation (doc-example) model, points/sec on one
TPU chip, compared against the reference-equivalent CPU baseline.

The reference publishes no numbers (BASELINE.md), so the baseline is
*measured here*: the native C backend (inflatox_tpu/native — same fused
formulas, gcc -O3 -march=native) timed on this host's CPU and scaled to the
32 cores named in the target.  That fused-single-call C scan is strictly
faster per core than the reference's 5-FFI-calls-per-pixel rayon loop
(anguelova.rs:103-135), so the scaling is generous to the baseline.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_artifact():
    import sympy

    import inflatox_tpu as inflatox

    r, theta, m = sympy.symbols("r θ m")
    V = sympy.Rational(1, 2) * m**2 * (theta**2 - sympy.Rational(2, 3) / r**2)
    g = [[sympy.Rational(1, 2), 0], [0, sympy.Rational(1, 2) * r**2]]
    model = inflatox.InflationModelBuilder.new(
        [r, theta], g, V, silent=True
    ).build()
    return inflatox.Compiler(model, silent=True).compile()


def time_call(fn, *args, repeats=3):
    import jax

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
            out,
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from inflatox_tpu.consistency_conditions import GeneralisedAL
    from inflatox_tpu.ops.pallas_kernels import complete_analysis_pallas

    N = 4096
    extent = (0.5, 2.5, 0.25, 3.0)
    args = np.array([1.0])

    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    artifact = build_artifact()
    al = GeneralisedAL(artifact, validate_basis=False)
    pts = N * N

    # --- TPU fp64 (parity path, the headline) --------------------------- #
    fn64 = al._cached_grid_fn("complete_analysis", (N, N), jnp.float64)
    a64 = jnp.asarray(args, jnp.float64)
    e64 = jnp.asarray(np.asarray(extent), jnp.float64)
    fn64(a64, e64)[0].block_until_ready()  # compile
    t64 = time_call(fn64, a64, e64)
    log(f"TPU fp64 XLA  {N}x{N}: {t64 * 1e3:8.1f} ms  {pts / t64 / 1e9:7.3f} Gpts/s")

    # --- TPU fp32 XLA + Pallas fast paths -------------------------------- #
    fn32 = al._cached_grid_fn("complete_analysis", (N, N), jnp.float32)
    a32 = jnp.asarray(args, jnp.float32)
    e32 = jnp.asarray(np.asarray(extent), jnp.float32)
    fn32(a32, e32)[0].block_until_ready()
    t32 = time_call(fn32, a32, e32)
    log(f"TPU fp32 XLA  {N}x{N}: {t32 * 1e3:8.1f} ms  {pts / t32 / 1e9:7.3f} Gpts/s")

    try:
        complete_analysis_pallas(artifact, args, extent, (N, N))[0].block_until_ready()
        tp = time_call(lambda: complete_analysis_pallas(artifact, args, extent, (N, N)))
        log(f"TPU fp32 Pallas {N}x{N}: {tp * 1e3:6.1f} ms  {pts / tp / 1e9:7.3f} Gpts/s")
    except Exception as e:  # pallas unavailable off-TPU
        log(f"pallas path skipped: {type(e).__name__}: {e}")

    # --- CPU baseline (reference-equivalent compiled-C path) ------------- #
    baseline_pps = None
    try:
        import os

        from inflatox_tpu.native import NativeModel, native_available

        if native_available():
            native = NativeModel(artifact.model)
            nb = 1024  # enough to amortize; single host core
            t0 = time.perf_counter()
            native.complete_analysis(args, *extent, nb, nb, threads=0)
            t_native = time.perf_counter() - t0
            cores = os.cpu_count() or 1
            pps_host = nb * nb / t_native
            baseline_pps = pps_host / cores * 32  # scale to the 32-core target
            log(
                f"CPU native C  {nb}x{nb}: {t_native * 1e3:8.1f} ms on "
                f"{cores} core(s) -> 32-core baseline estimate "
                f"{baseline_pps / 1e6:.1f} Mpts/s"
            )
    except Exception as e:
        log(f"native baseline skipped: {type(e).__name__}: {e}")

    value = pts / t64
    vs_baseline = (value / baseline_pps) if baseline_pps else None
    print(
        json.dumps(
            {
                "metric": "complete_analysis_4096x4096_fp64_points_per_sec",
                "value": round(value, 1),
                "unit": "points/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
