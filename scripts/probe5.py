#!/usr/bin/env python
"""Probe 5: robust (high-K, best-of-3) tile sweep of the optimized df64
full kernel + fp32 kernel, via the library entry points."""

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

    def timeit(fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        float(out)
        return time.perf_counter() - t0

    def chain_df(tile, K):
        scalars = pk._df_scalars(args, extent, shape)

        @jax.jit
        def run(s):
            def body(_, carry):
                ss, acc = carry
                outs = pk._launch_df(ss, artifact, shape, tile, False,
                                     "complete_analysis")
                probe = outs[0][0, 0]
                return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

            _, acc = lax.fori_loop(0, K, body, (s, jnp.float64(0.0)))
            return acc

        return run, scalars

    def measure(name, mk, K1, K2, reps=3):
        try:
            run1, s = mk(K1)
            run2, _ = mk(K2)
            timeit(run1, s)
            t1 = min(timeit(run1, s) for _ in range(reps))
            timeit(run2, s)
            t2 = min(timeit(run2, s) for _ in range(reps))
            per = (t2 - t1) / (K2 - K1)
            print(f"{name:30s}: {per*1e3:8.3f} ms/iter  {pts/per/1e9:8.3f} Gpts/s",
                  file=sys.stderr, flush=True)
            return per
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            return None

    for tile in [(32, 256), (64, 256), (16, 512), (8, 1024), (32, 512),
                 (16, 256)]:
        measure(f"df64 full {tile}", lambda K, t=tile: chain_df(t, K), 2, 22)


if __name__ == "__main__":
    main()
