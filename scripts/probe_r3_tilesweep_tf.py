"""Round-3 tile sweep, tf64 minimal: EGNO 2048² at (8,512) default vs (16,512).

The triple-f32 engine triples the live planes per value, so the df64
16-row win needs its own spill check before the tf launcher's default
moves.  Loads the committed EGNO bundle (building it takes ~10 min host).

PYTHONPATH=/root/.axon_site python scripts/probe_r3_tilesweep_tf.py
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
from inflatox_tpu.ops import pallas_kernels as pk  # noqa: E402

SHAPE = (2048, 2048)
EXTENT = (0.46, 0.50, 0.0, np.pi)
KIND = "consistency_rapidturn"

_BUNDLE = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "egno_bundle.json")
artifact = inflatox.CompiledModel.load(_BUNDLE)
by = {"m": 1e-3, "a": 0.5, "c": 1000.0, "alpha": 1.0}
args = np.zeros(artifact.n_parameters)
for name, slot in artifact.symbol_dictionary.items():
    if slot.startswith("args["):
        args[int(slot[5:-1])] = by[name]
scalars = pk._tf_scalars(args, EXTENT, SHAPE)


def amortized(run, K1=2, K2=12, reps=3):
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


for tile in [(8, 512), (16, 512), (16, 1024)]:
    launch = lambda s, t=tile: pk._launch_tf(  # noqa: E731
        s, artifact, SHAPE, t, False, KIND, combine=False
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
        print(f"tf egno tile={tile}: FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        continue
    print(f"tf-egno-2048 tile={tile}: {t*1e3:.3f} ms  "
          f"{SHAPE[0]*SHAPE[1]/t/1e9:.3f} Gpts/s", flush=True)
