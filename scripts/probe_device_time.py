#!/usr/bin/env python
"""Probe: true device time of the scan engines via amortized K-iteration
chaining (one dispatch, K kernel executions serialized by a data
dependence) — immune to the axon tunnel's per-call overhead.

Usage: python scripts/probe_device_time.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    import inflatox_tpu as inflatox
    from inflatox_tpu.models import hyperinflation
    from inflatox_tpu.ops import pallas_kernels as pk

    model, _ = hyperinflation()
    artifact = inflatox.Compiler(model, silent=True).compile()

    N = 4096
    extent = (0.5, 2.5, 0.25, 3.0)
    args = np.array([1.0])
    shape = (N, N)
    pts = N * N

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          file=sys.stderr, flush=True)

    def timeit(fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf if leaf.ndim == 0 else leaf[(0,) * leaf.ndim])
        return time.perf_counter() - t0

    def chain_df(tile, K, combine=True):
        scalars = pk._df_scalars(args, extent, shape)

        @jax.jit
        def run(s):
            def body(_, carry):
                ss, acc = carry
                outs = pk._launch_df(ss, artifact, shape, tile, False,
                                     "complete_analysis")
                if combine:
                    probe = outs[0][0, 0]
                else:
                    probe = outs[0][0, 0].astype(jnp.float64)
                delta = (probe * 0.0).astype(ss.dtype)
                return (ss + delta, acc + probe)

            _, acc = lax.fori_loop(0, K, body, (s, jnp.float64(0.0)))
            return acc

        return run, scalars

    def chain_df_raw(tile, K):
        """Time the raw pallas_call only (hi/lo f32 outputs, no f64 combine)."""
        scalars = pk._df_scalars(args, extent, shape)
        import functools
        tm, tn = tile
        n_out = 6
        n0p = -(-shape[0] // tm) * tm
        n1p = -(-shape[1] // tn) * tn
        grid = (n0p // tm, n1p // tn)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        kernel = functools.partial(
            pk._kernel_df, model=artifact, tile=(tm, tn),
            n_params=artifact.n_parameters, kind="complete_analysis",
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[],
            out_specs=tuple(
                pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
                for _ in range(2 * n_out)
            ),
        )

        @jax.jit
        def run(s):
            def body(_, carry):
                ss, acc = carry
                outs = pl.pallas_call(
                    kernel, out_shape=tuple(
                        jax.ShapeDtypeStruct((n0p, n1p), jnp.float32)
                        for _ in range(2 * n_out)),
                    grid_spec=grid_spec)(ss)
                probe = outs[0][0, 0]
                delta = probe * 0.0
                return (ss + delta, acc + probe)

            _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
            return acc

        return run, scalars

    def chain_f32(tile, K):
        x0a, x0b, x1a, x1b = (float(v) for v in extent)
        geom = [x0a, (x0b - x0a) / N, x1a, (x1b - x1a) / N]
        scalars = jnp.asarray([float(v) for v in args] + geom, jnp.float32)

        @jax.jit
        def run(s):
            def body(_, carry):
                ss, acc = carry
                outs = pk._launch(ss, artifact, shape, tile, False,
                                  jnp.dtype(jnp.float32), "complete_analysis")
                probe = outs[0][0, 0]
                delta = probe * 0.0
                return (ss + delta, acc + probe)

            _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
            return acc

        return run, scalars

    def measure(name, mk, K1, K2):
        try:
            run1, s = mk(K1)
            run2, _ = mk(K2)
            t1 = timeit(run1, s)  # compile
            t1 = min(timeit(run1, s), timeit(run1, s))
            t2 = timeit(run2, s)
            t2 = min(timeit(run2, s), timeit(run2, s))
            per = (t2 - t1) / (K2 - K1)
            print(f"{name:42s}: K{K1}={t1*1e3:8.1f} ms  K{K2}={t2*1e3:8.1f} ms"
                  f"  -> {per*1e3:8.3f} ms/iter  {pts/per/1e9:8.3f} Gpts/s",
                  file=sys.stderr, flush=True)
            return per
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            return None

    # df64 full path (incl. f64 combine), several tiles
    for tile in [(64, 256), (128, 256), (256, 256)]:
        measure(f"df64 full (tile {tile})",
                lambda K, t=tile: chain_df(t, K), 1, 6)
    # df64 raw kernel (hi/lo outputs only)
    for tile in [(64, 256), (128, 256), (256, 256), (128, 512), (64, 512)]:
        measure(f"df64 raw kernel (tile {tile})",
                lambda K, t=tile: chain_df_raw(t, K), 1, 11)
    # fp32 kernel
    for tile in [(256, 256), (128, 512), (512, 512)]:
        measure(f"fp32 kernel (tile {tile})",
                lambda K, t=tile: chain_f32(t, K), 1, 21)


if __name__ == "__main__":
    main()
