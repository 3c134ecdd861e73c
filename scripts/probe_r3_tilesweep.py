"""Round-3 tile/strip sweep for the df64 kernel (hyperinflation 4096²).

Round 2 fixed strip widths ((8,1024) blocks + 256-lane strips for small
models, 128 for big ones) but only sampled a few block geometries.  This
probe times the remaining plausible (tile, strip) combos with the bench's
amortized K-loop methodology to confirm (or move) the default.

Run on the attached TPU: PYTHONPATH=/root/.axon_site python scripts/probe_r3_tilesweep.py
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
from inflatox_tpu.models import hyperinflation  # noqa: E402
from inflatox_tpu.ops import pallas_kernels as pk  # noqa: E402

SHAPE = (4096, 4096)
EXTENT = (0.5, 2.5, 0.25, 3.0)
KIND = "complete_analysis"

model, args = hyperinflation()
artifact = inflatox.Compiler(model, silent=True).compile()
scalars = pk._df_scalars(args, EXTENT, SHAPE)

COMBOS = [
    ((8, 1024), 256),   # current default
    ((8, 1024), 512),
    ((8, 2048), 256),
    ((8, 2048), 512),
    ((16, 1024), 256),
    ((8, 4096), 256),
    ((8, 512), 256),
    ((16, 2048), 256),
]


def make_run(tile, strip):
    launch = lambda s: pk._launch_df(  # noqa: E731
        s, artifact, SHAPE, tile, False, KIND, strip=strip, combine=False
    )

    @jax.jit
    def run(s, K):
        def body(_, carry):
            ss, acc = carry
            outs = launch(ss)
            probe = outs[0][0, 0]
            return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

        _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
        return acc

    return run


def fetch(out):
    jax.block_until_ready(out)
    return float(out)


def amortized(run, K1=2, K2=22, reps=3):
    def timed(K):
        t0 = time.perf_counter()
        fetch(run(scalars, jnp.int32(K)))
        return time.perf_counter() - t0

    timed(K1)
    t1 = min(timed(K1) for _ in range(reps))
    timed(K2)
    t2 = min(timed(K2) for _ in range(reps))
    return (t2 - t1) / (K2 - K1)


if __name__ == "__main__":
    pts = SHAPE[0] * SHAPE[1]
    results = []
    for tile, strip in COMBOS:
        try:
            t = amortized(make_run(tile, strip))
        except Exception as e:  # noqa: BLE001
            print(f"tile={tile} strip={strip}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        gpts = pts / t / 1e9
        results.append((t, tile, strip))
        print(f"tile={tile} strip={strip}: {t*1e3:.3f} ms  {gpts:.3f} Gpts/s",
              flush=True)
    results.sort()
    print("\nbest:", results[0] if results else "none")
