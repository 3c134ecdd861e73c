"""Round-4 probe: row-loop unrolling on the Pallas DF solver.

probe_r4_solver.py showed the cfg5d kernel is bound by the sequential row
fori_loop itself (write_only floor = 56 of 72 ms; DF flops, controller and
defect are minor).  Mosaic pays a per-iteration cost on the loop carry
(2·ns+3 = 13 VMEM planes), so unrolling the row body should amortize it.
This times the REAL solver at the bench shape for unroll ∈ {1, 2, 4, 8}
and checks the outputs stay identical (unroll is semantics-preserving).

Run:  cd /root/repo && python scripts/probe_r4_unroll.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import inflatox_tpu as inflatox
from inflatox_tpu.models import hyperinflation
from inflatox_tpu.ops import pallas_solver as psolve


def main():
    model, _ = hyperinflation()
    artifact = inflatox.Compiler(model, silent=True).compile()
    args = np.array([1.0])
    Bd, steps = 4096, 2000
    rng = np.random.default_rng(0)
    f0 = np.stack([rng.uniform(1.5, 2.5, Bd), rng.uniform(1.5, 2.5, Bd)], 1)
    n_blocks = Bd // psolve._TRAJ_BLOCK
    scal, planes = psolve._build_planes(
        f0, np.zeros_like(f0), args, False, 2, n_blocks)

    def timed(unroll):
        def run():
            return psolve._launch_solver(
                scal, tuple(planes), artifact, steps, n_blocks, False,
                1e-6, row_unroll=unroll)
        t_c0 = time.perf_counter()
        outs = run()
        jax.block_until_ready(outs)
        compile_s = time.perf_counter() - t_c0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            o = run()
            jax.block_until_ready(o)
            float(o[0][0, 0, 0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, compile_s, outs

    ref = None
    for unroll in (1, 2, 4, 8):
        try:
            best, compile_s, outs = timed(unroll)
        except Exception as e:
            print(json.dumps({"unroll": unroll,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        if ref is None:
            ref = outs
            same = True
        else:
            same = all(
                bool(jnp.array_equal(a, b, equal_nan=True))
                for a, b in zip(ref, outs)
            )
        print(json.dumps({
            "unroll": unroll, "s": round(best, 4),
            "traj_per_s": round(Bd / best),
            "compile_s": round(compile_s, 1),
            "bit_identical_to_unroll1": bool(same),
        }), flush=True)


if __name__ == "__main__":
    main()
