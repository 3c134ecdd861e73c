#!/usr/bin/env python
"""Probe 2: more df64 tiles + XLA f32/f64 amortized + CPU baseline spread."""

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
    from inflatox_tpu.consistency_conditions import GeneralisedAL
    from inflatox_tpu.models import hyperinflation
    from inflatox_tpu.ops import pallas_kernels as pk

    model, _ = hyperinflation()
    artifact = inflatox.Compiler(model, silent=True).compile()
    al = GeneralisedAL(artifact, validate_basis=False)

    N = 4096
    extent = (0.5, 2.5, 0.25, 3.0)
    args = np.array([1.0])
    shape = (N, N)
    pts = N * N

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)

    def timeit(fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf if leaf.ndim == 0 else leaf[(0,) * leaf.ndim])
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

    def measure(name, mk, K1, K2):
        try:
            run1, s = mk(K1)
            run2, _ = mk(K2)
            timeit(run1, s)
            t1 = min(timeit(run1, s), timeit(run1, s))
            timeit(run2, s)
            t2 = min(timeit(run2, s), timeit(run2, s))
            per = (t2 - t1) / (K2 - K1)
            print(f"{name:38s}: {per*1e3:8.3f} ms/iter  {pts/per/1e9:8.3f} Gpts/s",
                  file=sys.stderr, flush=True)
            return per
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            return None

    for tile in [(32, 256), (16, 256), (8, 256), (32, 512), (8, 1024)]:
        measure(f"df64 full (tile {tile})", lambda K, t=tile: chain_df(t, K), 1, 6)

    # XLA fused f32 scan, amortized
    def chain_xla32(K):
        fn32 = al._cached_grid_fn("complete_analysis", shape, jnp.float32)
        a32 = jnp.asarray(args, jnp.float32)
        e32 = jnp.asarray(np.asarray(extent), jnp.float32)

        @jax.jit
        def run(a, e):
            def body(_, carry):
                aa, acc = carry
                outs = fn32(aa, e)
                probe = outs[0][0, 0]
                return (aa + probe * 0.0, acc + probe)

            _, acc = lax.fori_loop(0, K, body, (a, jnp.float32(0.0)))
            return acc

        return run, (a32, e32)

    def chain_xla64(K, n=1024):
        fn64 = al._cached_grid_fn("complete_analysis", (n, n), jnp.float64)
        a64 = jnp.asarray(args, jnp.float64)
        e64 = jnp.asarray(np.asarray(extent), jnp.float64)

        @jax.jit
        def run(a, e):
            def body(_, carry):
                aa, acc = carry
                outs = fn64(aa, e)
                probe = outs[0][0, 0]
                return (aa + probe * 0.0, acc + probe)

            _, acc = lax.fori_loop(0, K, body, (a, jnp.float64(0.0)))
            return acc

        return run, (a64, e64)

    try:
        run1, sx = chain_xla32(1)
        run2, _ = chain_xla32(11)
        timeit(run1, *sx)
        t1 = min(timeit(run1, *sx), timeit(run1, *sx))
        timeit(run2, *sx)
        t2 = min(timeit(run2, *sx), timeit(run2, *sx))
        per = (t2 - t1) / 10
        print(f"{'XLA f32 4096²':38s}: {per*1e3:8.3f} ms/iter  {pts/per/1e9:8.3f} Gpts/s",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"xla f32 FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    try:
        run1, sx = chain_xla64(1)
        run2, _ = chain_xla64(3)
        timeit(run1, *sx)
        t1 = min(timeit(run1, *sx), timeit(run1, *sx))
        timeit(run2, *sx)
        t2 = min(timeit(run2, *sx), timeit(run2, *sx))
        per = (t2 - t1) / 2
        print(f"{'XLA emulated-f64 1024²':38s}: {per*1e3:8.3f} ms/iter  "
              f"{1024*1024/per/1e6:8.1f} Mpts/s",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"xla f64 FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    # CPU baseline spread: best-of-10 + quartiles
    try:
        import os

        from inflatox_tpu.native import NativeModel, native_available

        if native_available():
            native = NativeModel(artifact.model)
            nb = 1024
            cores = os.cpu_count() or 1
            for nm, fn in [
                ("refstyle", lambda: native.complete_analysis_refstyle(
                    args, *extent, nb, nb, threads=0)),
                ("fused", lambda: native.complete_analysis(
                    args, *extent, nb, nb, threads=0)),
            ]:
                ts = []
                for _ in range(10):
                    t0 = time.perf_counter()
                    fn()
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                pps = nb * nb / ts[0] / cores * 32
                print(f"CPU {nm:10s}: best {ts[0]*1e3:7.1f} ms  med "
                      f"{ts[len(ts)//2]*1e3:7.1f}  worst {ts[-1]*1e3:7.1f} "
                      f"-> 32-core {pps/1e6:7.1f} Mpts/s",
                      file=sys.stderr, flush=True)
    except Exception as e:
        print(f"native FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)


if __name__ == "__main__":
    main()
