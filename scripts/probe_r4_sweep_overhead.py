"""Round-4 probe: where does the checkpointed sweep's per-chunk time go?

BENCH_r03 recorded cfg5c (kill/resume rehearsal, chunk=32 at 512²) at
3,689 configs/hr/chip while cfg5 (the same 32×512² df64 launch, unchunked)
runs 97k/hr — a ~26× gap the matrix couldn't explain (VERDICT r3 weak #3).
This probe times each per-chunk phase separately on the real chip:

  * dispatch  — run_chunk() call until the jit returns (async queueing)
  * fetch     — np.asarray of the chunk output (device completion + tunnel)
  * save      — np.save of the fetched chunk
  * first-call jit/compile amortization

Run from /root/repo with the TPU attached:  python - < scripts/... won't
keep argv; use:  cd /root/repo && python scripts/probe_r4_sweep_overhead.py
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import inflatox_tpu as inflatox
from inflatox_tpu.consistency_conditions import GeneralisedAL
from inflatox_tpu.models import hyperinflation
from inflatox_tpu.parallel import parameter_sweep
from inflatox_tpu.parallel.sweep import _pallas_chunk_runner


def main():
    shape = (512, 512)
    chunk = 32
    n_chunks = 8
    model, _ = hyperinflation()
    art = inflatox.Compiler(model, silent=True).compile()
    al = GeneralisedAL(art, validate_basis=False)
    batch = np.linspace(0.5, 2.0, chunk * n_chunks)[:, None]
    extent = (0.5, 2.5, 0.25, 3.0)

    def reduce_fn(maps):
        c = maps[0]
        return jnp.stack([jnp.nanmin(c), jnp.nanargmin(c).astype(c.dtype)])

    run_chunk = _pallas_chunk_runner(
        art, extent, shape, None, "sweep", jnp.float64, reduce_fn,
        "pallas_df64", jax.default_backend() == "tpu", "complete_analysis",
    )

    # per-chunk phase timing (manual loop mirroring parameter_sweep)
    rows = []
    ckpt = "/tmp/inflx_probe_sweep_ck"
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(ckpt, exist_ok=True)
    for ci in range(n_chunks):
        part = batch[ci * chunk:(ci + 1) * chunk]
        t0 = time.perf_counter()
        out_dev = run_chunk(part)
        t1 = time.perf_counter()
        out = np.asarray(out_dev)
        t2 = time.perf_counter()
        np.save(os.path.join(ckpt, f"chunk_{ci:06d}.npy"), out)
        t3 = time.perf_counter()
        rows.append({"chunk": ci, "dispatch_s": round(t1 - t0, 3),
                     "fetch_s": round(t2 - t1, 3),
                     "save_s": round(t3 - t2, 4)})
        print(json.dumps(rows[-1]), flush=True)

    steady = rows[2:]
    per_chunk = sum(r["dispatch_s"] + r["fetch_s"] + r["save_s"]
                    for r in steady) / len(steady)
    print(json.dumps({
        "probe": "per_chunk_phases",
        "steady_per_chunk_s": round(per_chunk, 3),
        "configs_per_hr": round(chunk / per_chunk * 3600.0),
    }), flush=True)

    # end-to-end: the real parameter_sweep (pipelined path), checkpointed
    # vs not, same depth
    for label, ckdir in (("nockpt", None), ("ckpt", ckpt + "2")):
        if ckdir:
            shutil.rmtree(ckdir, ignore_errors=True)
        t0 = time.perf_counter()
        out = parameter_sweep(
            al, batch, extent, shape, chunk_size=chunk,
            checkpoint_dir=ckdir, progress=False, engine="pallas_df64",
            reduce_fn=reduce_fn,
        )
        dt = time.perf_counter() - t0
        print(json.dumps({
            "probe": f"sweep_{label}", "configs": len(batch),
            "seconds": round(dt, 2),
            "configs_per_hr": round(len(batch) / dt * 3600.0),
            "check": float(out[:, 0].min()),
        }), flush=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(ckpt + "2", ignore_errors=True)


if __name__ == "__main__":
    main()
