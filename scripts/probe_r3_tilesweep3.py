"""Round-3 tile sweep, part 3: fp32 kernel (hyper 4096²) and D5 edf64 (1024²).

Completes the tile survey of probe_r3_tilesweep{,2}.py across the remaining
engines before moving any launcher defaults.

PYTHONPATH=/root/.axon_site python scripts/probe_r3_tilesweep3.py
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
from inflatox_tpu.models import d5, hyperinflation  # noqa: E402
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


def chain(launch, probe_dtype):
    @jax.jit
    def run(s, K):
        def body(_, carry):
            ss, acc = carry
            outs = launch(ss)
            probe = outs[0][0, 0].astype(probe_dtype)
            return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

        _, acc = lax.fori_loop(0, K, body, (s, probe_dtype(0.0)))
        return acc

    return run


def report(name, shape, t):
    print(f"{name}: {t*1e3:.3f} ms  {shape[0]*shape[1]/t/1e9:.3f} Gpts/s",
          flush=True)


if __name__ == "__main__":
    # ---- fp32 kernel, hyperinflation 4096² -------------------------------- #
    model, args = hyperinflation()
    art = inflatox.Compiler(model, silent=True).compile()
    SHAPE = (4096, 4096)
    EXTENT = (0.5, 2.5, 0.25, 3.0)
    x0a, x0b, x1a, x1b = EXTENT
    geom = [x0a, (x0b - x0a) / SHAPE[0], x1a, (x1b - x1a) / SHAPE[1]]
    scal32 = jnp.asarray([float(v) for v in args] + geom, jnp.float32)
    for tile in [(8, 2048)]:  # full fp32 sweep done; (8,2048) confirmed best
        launch = lambda s, t=tile: pk._launch(  # noqa: E731
            s, art, SHAPE, t, False, jnp.dtype(jnp.float32),
            "complete_analysis",
        )
        try:
            t = amortized(chain(launch, jnp.float32), scal32)
        except Exception as e:  # noqa: BLE001
            print(f"fp32 tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
            continue
        report(f"fp32-hyper-4096 tile={tile}", SHAPE, t)

    # ---- edf64, D5 1024² --------------------------------------------------- #
    import os
    _BUNDLE = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures", "d5_bundle.json")
    if os.path.exists(_BUNDLE):  # committed bundle: skips the slow sympy build
        d5art = inflatox.CompiledModel.load(_BUNDLE)
        from inflatox_tpu.models import _args_by_symbol
        d5_args = _args_by_symbol(d5art.model, {
            "V0": -1.17e-8, "N": 1000.0, "g_s": 0.01, "l_s": 501.961,
            "u": 50 * 501.961, "q": 1.0, "p": 5.0,
            "a0": 0.001, "a1": 0.0005, "b1": 0.001,
        })
    else:
        d5_model, d5_args = d5()
        d5art = inflatox.Compiler(d5_model, silent=True).compile()
    DSHAPE = (1024, 1024)
    DEXT = (0.1, 36.0, 0.0, 4 * np.pi)
    dscal = pk._edf_scalars(d5_args, DEXT, DSHAPE)
    for tile in [(8, 1024), (16, 1024), (8, 512)]:
        launch = lambda s, t=tile: pk._launch_edf(  # noqa: E731
            s, d5art, DSHAPE, t, False, "complete_analysis", combine=False
        )
        try:
            t = amortized(chain(launch, jnp.float32), dscal)
        except Exception as e:  # noqa: BLE001
            print(f"edf tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
            continue
        report(f"edf-d5-1024 tile={tile}", DSHAPE, t)
