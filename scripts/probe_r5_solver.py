"""Round-5 solver-rewrite probe: measure the staged-store / fused-output /
wide-block kernel variants at the cfg5d shape (4096 traj x 2000 rows,
hyperinflation) and verify per-lane bit-identity against the shipped
baseline.

The round-4 ablation (probe_r4_solver.py) pinned the 72 ms runtime's floor
at the sequential row loop itself: per-iteration carry handling plus 12
single-row dynamic stores (~6.9 us/row-iteration).  The levers probed here:

* fused_out  — all 12 output words sublane-stacked into ONE ref: one
  dynamic store per row (or per unrolled row group) instead of 12.
* row_unroll — with fused_out, unrolled rows stage into a (u, C, L) slab
  written by a single store.
* block_mult — 2/4 trajectory blocks per kernel instance: the same row
  loop advances 2048/4096 lanes, amortizing per-iteration overhead.

Run on the real chip from /root/repo:  python - < scripts/probe_r5_solver.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import inflatox_tpu as inflatox
from inflatox_tpu.models import hyperinflation
from inflatox_tpu.ops import pallas_solver as psolve

model, args = hyperinflation()
artifact = inflatox.Compiler(model, silent=True).compile()

Bd, steps = 4096, 2000
rng = np.random.default_rng(0)
f0 = np.stack([rng.uniform(1.5, 2.5, Bd), rng.uniform(1.5, 2.5, Bd)], 1)
d0 = np.zeros((Bd, 2))
n_blocks = Bd // psolve._TRAJ_BLOCK
scal, planes = psolve._build_planes(f0, d0, np.asarray(args), False, 2,
                                    n_blocks)
planes = tuple(planes)


def launch(row_unroll, block_mult, fused_out):
    return psolve._launch_solver(
        scal, planes, artifact, steps, n_blocks, False, 1e-6,
        per_traj=False, row_unroll=row_unroll, block_mult=block_mult,
        fused_out=fused_out,
    )


def timed(row_unroll, block_mult, fused_out, reps=3, K1=1, K2=5):
    """Amortized K-chained launches (ADVICE r4: single launches through the
    tunnel fold ~26-48 ms of dispatch into every sample, understating
    variant deltas).  A probe of launch K's output feeds launch K+1's
    scalars, so XLA cannot overlap or elide the chain; device seconds per
    launch = (t(K2) - t(K1)) / (K2 - K1)."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def chain(s, K):
        def body(_, carry):
            ss, acc = carry
            outs = psolve._launch_solver(
                ss, planes, artifact, steps, n_blocks, False, 1e-6,
                per_traj=False, row_unroll=row_unroll,
                block_mult=block_mult, fused_out=fused_out,
            )
            probe = outs[0][(0,) * outs[0].ndim]
            return (ss.at[-1].add(probe * 0.0), acc + probe)

        from jax import lax

        _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
        return acc

    def one(K):
        t0 = time.perf_counter()
        out = chain(scal, jnp.int32(K))
        jax.block_until_ready(out)
        float(out)
        return time.perf_counter() - t0

    t_compile0 = time.perf_counter()
    one(K1)
    t_compile = time.perf_counter() - t_compile0
    t1 = min(one(K1) for _ in range(reps))
    t2 = min(one(K2) for _ in range(reps))
    return (t2 - t1) / (K2 - K1), t_compile


def words(row_unroll, block_mult, fused_out):
    """Launch -> list of 12 np word planes in canonical layout.  The fold
    must match _launch_solver's (incl. the VMEM-budget term, which shrinks
    bm for fused layouts) or the split shuffles blocks across words."""
    outs = launch(row_unroll, block_mult, fused_out)
    if fused_out:
        S = psolve._fold_bm(n_blocks, block_mult, n_words=12,
                            fused=True) * psolve._SUB
        return [np.asarray(w) for w in
                psolve._split_fused(np.asarray(outs[0]), 5, S)]
    return [np.asarray(o) for o in outs]


VARIANTS = [(1, 1, True), (2, 1, True), (4, 1, True),
            (2, 2, True), (4, 2, True), (2, 2, False),
            (4, 4, True), (8, 4, True), (8, 1, True)]
if len(sys.argv) > 1:  # e.g. "0:3" to run a slice of the variant list
    lo, hi = (int(v) for v in sys.argv[1].split(":"))
    VARIANTS = VARIANTS[lo:hi]

print("variant                         best_ms   compile_s", flush=True)
base_ms, _ = timed(2, 1, False)
print(f"baseline u2 bm1 sep           {base_ms * 1e3:9.1f}", flush=True)
ref_words = words(2, 1, False)

results = {}
for (u, bm, f) in VARIANTS:
    try:
        ms, tc = timed(u, bm, f)
        tag = f"u{u} bm{bm} {'fused' if f else 'sep'}"
        speed = base_ms / ms
        got = words(u, bm, f)
        bit = all(np.array_equal(a, b) for a, b in zip(ref_words, got))
        print(f"{tag:28s}  {ms * 1e3:9.1f}  {tc:8.1f}  x{speed:.2f}  "
              f"bit_identical={bit}", flush=True)
        results[tag] = (ms, bit)
    except Exception as e:
        print(f"u{u} bm{bm} f{f} FAILED: {type(e).__name__}: {e}",
              flush=True)

print("\nbaseline", base_ms * 1e3, "ms ;", Bd / base_ms, "traj/s",
      flush=True)
if results:
    best = min(results.items(), key=lambda kv: kv[1][0])
    print("best:", best[0], best[1][0] * 1e3, "ms =",
          Bd / best[1][0], "traj/s", flush=True)
