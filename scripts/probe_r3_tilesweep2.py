"""Round-3 tile/strip sweep, part 2: angular (1024²) and EGNO (2048²) df64.

Hyperinflation 4096² showed (16, 2048)+256 ≈ 6% faster than the (8, 1024)
default.  Before moving any default, check the other bench models: bigger
blocks mean more live values per strip (spill risk for big models) and
column padding for grids smaller than the block.

PYTHONPATH=/root/.axon_site python scripts/probe_r3_tilesweep2.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import inflatox_tpu as inflatox  # noqa: E402
from inflatox_tpu.models import angular, egno  # noqa: E402
from inflatox_tpu.ops import pallas_kernels as pk  # noqa: E402


def amortized(run, scalars, K1=2, K2=22, reps=3):
    def timed(K):
        t0 = time.perf_counter()
        out = run(scalars, jnp.int32(K))
        jax.block_until_ready(out)
        float(out)
        return time.perf_counter() - t0

    timed(K1)
    t1 = min(timed(K1) for _ in range(reps))
    timed(K2)
    t2 = min(timed(K2) for _ in range(reps))
    return (t2 - t1) / (K2 - K1)


def sweep(name, artifact, args, extent, shape, kind, combos):
    scalars = pk._df_scalars(args, extent, shape)
    pts = shape[0] * shape[1]
    results = []
    for tile, strip in combos:
        launch = lambda s, t=tile, st=strip: pk._launch_df(  # noqa: E731
            s, artifact, shape, t, False, kind, strip=st, combine=False
        )

        @jax.jit
        def run(s, K, launch=launch):
            def body(_, carry):
                ss, acc = carry
                outs = launch(ss)
                probe = outs[0][0, 0]
                return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

            _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
            return acc

        try:
            t = amortized(run, scalars)
        except Exception as e:  # noqa: BLE001
            print(f"{name} tile={tile} strip={strip}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            continue
        results.append((t, tile, strip))
        print(f"{name} tile={tile} strip={strip}: {t*1e3:.3f} ms  "
              f"{pts/t/1e9:.3f} Gpts/s", flush=True)
    results.sort()
    if results:
        print(f"{name} best: {results[0][1]} strip {results[0][2]} "
              f"at {results[0][0]*1e3:.3f} ms\n", flush=True)


if __name__ == "__main__":
    ang_model, ang_args = angular()
    ang = inflatox.Compiler(ang_model, silent=True).compile()
    sweep(
        "angular-1024", ang, ang_args, (-1.05, 1.05, -1.05, 1.05),
        (1024, 1024), "complete_analysis",
        [((8, 1024), 128), ((16, 1024), 128), ((8, 1024), 256),
         ((16, 512), 128), ((8, 512), 128)],
    )

    egno_model, egno_args = egno()
    eg = inflatox.Compiler(egno_model, silent=True).compile()
    sweep(
        "egno-2048", eg, egno_args, (0.46, 0.50, 0.0, np.pi),
        (2048, 2048), "consistency_rapidturn",
        [((8, 1024), 128), ((16, 1024), 128), ((8, 2048), 128),
         ((16, 2048), 128), ((8, 1024), 256)],
    )
