"""Round-3 tile sweep, EGNO minimal: (8,1024)/128 default vs (16,1024)/128.

Full EGNO sweeps are compile-bound (~5-10 min Mosaic build per variant);
this one answers the only question the df64 auto-tile change needs: do
16-row blocks also win (or at least not spill) on a big narrow-strip model.

PYTHONPATH=/root/.axon_site python scripts/probe_r3_tilesweep_egno.py
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
from inflatox_tpu.models import egno  # noqa: E402
from inflatox_tpu.ops import pallas_kernels as pk  # noqa: E402

SHAPE = (2048, 2048)
EXTENT = (0.46, 0.50, 0.0, np.pi)
KIND = "consistency_rapidturn"

import os
_BUNDLE = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "egno_bundle.json")
if os.path.exists(_BUNDLE):  # committed bundle: skips the ~10-min sympy build
    artifact = inflatox.CompiledModel.load(_BUNDLE)
    by = {"m": 1e-3, "a": 0.5, "c": 1000.0, "alpha": 1.0}
    args = np.zeros(artifact.n_parameters)
    for name, slot in artifact.symbol_dictionary.items():
        if slot.startswith("args["):
            args[int(slot[5:-1])] = by[name]
else:
    model, args = egno()
    artifact = inflatox.Compiler(model, silent=True).compile()
scalars = pk._df_scalars(args, EXTENT, SHAPE)


def amortized(run, K1=2, K2=22, reps=3):
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


for tile, strip in [((8, 1024), 128), ((16, 1024), 128)]:
    launch = lambda s, t=tile, st=strip: pk._launch_df(  # noqa: E731
        s, artifact, SHAPE, t, False, KIND, strip=st, combine=False
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
        t = amortized(run)
    except Exception as e:  # noqa: BLE001
        print(f"egno tile={tile} strip={strip}: FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        continue
    print(f"egno-2048 tile={tile} strip={strip}: {t*1e3:.3f} ms  "
          f"{SHAPE[0]*SHAPE[1]/t/1e9:.3f} Gpts/s", flush=True)
