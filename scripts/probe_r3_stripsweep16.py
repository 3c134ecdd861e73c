"""Round-3 strip re-check under 16-row blocks.

The strip-width constants (_DF_STRIP = 256, narrow 128 for big models) were
measured round 2 under 8-row blocks.  16-row blocks double the vregs per
strip chunk, so re-check the crossover: hyper (16, 2048) × strip {256, 512},
angular/EGNO (16, 1024) × strip {128, 256}.

PYTHONPATH=/root/.axon_site python scripts/probe_r3_stripsweep16.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import inflatox_tpu as inflatox  # noqa: E402
from inflatox_tpu.models import angular, hyperinflation  # noqa: E402
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


def sweep(name, artifact, args, extent, shape, kind, combos, K2=22):
    scalars = pk._df_scalars(args, extent, shape)
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
            t = amortized(run, scalars, K2=K2)
        except Exception as e:  # noqa: BLE001
            print(f"{name} tile={tile} strip={strip}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            continue
        print(f"{name} tile={tile} strip={strip}: {t*1e3:.3f} ms  "
              f"{shape[0]*shape[1]/t/1e9:.3f} Gpts/s", flush=True)


if __name__ == "__main__":
    model, args = hyperinflation()
    art = inflatox.Compiler(model, silent=True).compile()
    sweep("hyper-4096", art, args, (0.5, 2.5, 0.25, 3.0), (4096, 4096),
          "complete_analysis",
          [((16, 2048), 256), ((16, 2048), 512), ((16, 2048), 1024)])

    amodel, aargs = angular()
    aart = inflatox.Compiler(amodel, silent=True).compile()
    sweep("angular-1024", aart, aargs, (-1.05, 1.05, -1.05, 1.05),
          (1024, 1024), "complete_analysis",
          [((16, 1024), 128), ((16, 1024), 256)])

    _BUNDLE = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures", "egno_bundle.json")
    eart = inflatox.CompiledModel.load(_BUNDLE)
    by = {"m": 1e-3, "a": 0.5, "c": 1000.0, "alpha": 1.0}
    eargs = np.zeros(eart.n_parameters)
    for nm, slot in eart.symbol_dictionary.items():
        if slot.startswith("args["):
            eargs[int(slot[5:-1])] = by[nm]
    sweep("egno-2048", eart, eargs, (0.46, 0.50, 0.0, np.pi), (2048, 2048),
          "consistency_rapidturn",
          [((16, 1024), 256)], K2=12)
