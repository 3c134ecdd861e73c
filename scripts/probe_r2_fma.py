"""Round-2 hardware probes (run on the attached TPU).

1. FMA probe: does Mosaic fuse `a*b - p` (p = a*b) into a single-rounding
   FMA?  If yes, the Dekker split in df32 two_prod (~15 flops) collapses to
   2 flops — the single biggest lever on the df64 kernel's compute cost.
2. Same probe under plain XLA jit (eager fallback safety).
3. Combine-pass cost: (hi, lo) f32 planes -> f64, 6 quantities at 4096².
4. Tile sweep for the df64 complete_analysis kernel.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import inflatox_tpu as inflatox

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("backend:", jax.default_backend(), jax.devices(), flush=True)


# ------------------------------------------------------------------ #
# 1+2. FMA probes
# ------------------------------------------------------------------ #
def fma_kernel(a_ref, b_ref, p_ref, e_ref):
    a = a_ref[:, :]
    b = b_ref[:, :]
    p = a * b
    e = a * b - p  # if fused to FMA: exact residual; else exactly 0
    p_ref[:, :] = p
    e_ref[:, :] = e


def probe_fma_pallas():
    rng = np.random.default_rng(0)
    a = rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32)
    b = rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32)
    p, e = pl.pallas_call(
        fma_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
    )(jnp.asarray(a), jnp.asarray(b))
    p = np.asarray(p)
    e = np.asarray(e)
    exact = a.astype(np.float64) * b.astype(np.float64) - p.astype(np.float64)
    n_zero = int((e == 0).sum())
    n_exact = int((e.astype(np.float64) == exact).sum())
    print(f"PALLAS FMA probe: e==0 count {n_zero}/1024, "
          f"e==exact-residual count {n_exact}/1024", flush=True)
    print("  sample e:", e.ravel()[:4], " exact:", exact.ravel()[:4], flush=True)


def probe_fma_xla():
    rng = np.random.default_rng(1)
    a = rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32)
    b = rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32)

    @jax.jit
    def f(a, b):
        p = a * b
        return p, a * b - p

    p, e = f(jnp.asarray(a), jnp.asarray(b))
    p = np.asarray(p)
    e = np.asarray(e)
    exact = a.astype(np.float64) * b.astype(np.float64) - p.astype(np.float64)
    print(f"XLA-jit FMA probe: e==0 count {int((e == 0).sum())}/1024, "
          f"e==exact count {int((e.astype(np.float64) == exact).sum())}/1024",
          flush=True)


# eager (op-by-op): p and e computed in separate dispatches -> no fusion
def probe_fma_eager():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32))
    p = a * b
    e = a * b - p
    print(f"eager FMA probe: e==0 count {int((np.asarray(e) == 0).sum())}/1024",
          flush=True)


probe_fma_pallas()
probe_fma_xla()
probe_fma_eager()


# ------------------------------------------------------------------ #
# 3. combine-pass cost at 4096² x 6 quantities
# ------------------------------------------------------------------ #
def _fetch(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf if getattr(leaf, "ndim", 0) == 0 else leaf[(0,) * leaf.ndim])


def amortized(run, init, K1=2, K2=12, reps=3):
    def timed(K):
        t0 = time.perf_counter()
        _fetch(run(*init, jnp.int32(K)))
        return time.perf_counter() - t0

    timed(K1)
    t1 = min(timed(K1) for _ in range(reps))
    timed(K2)
    t2 = min(timed(K2) for _ in range(reps))
    return (t2 - t1) / (K2 - K1)


def probe_combine():
    N = 4096
    planes = [jnp.ones((N, N), jnp.float32) * (i + 1) for i in range(12)]

    @jax.jit
    def run(*args):
        *ps, K = args

        def body(_, carry):
            ps, acc = carry
            outs = [ps[2 * k].astype(jnp.float64) + ps[2 * k + 1].astype(jnp.float64)
                    for k in range(6)]
            probe = sum(jnp.sum(o) for o in outs)
            newps = tuple(p + (probe * 0).astype(jnp.float32) for p in ps)
            return (newps, acc + probe)

        _, acc = lax.fori_loop(0, K, body, (tuple(ps), jnp.float64(0.0)))
        return acc

    t = amortized(run, planes, K1=2, K2=12)
    gb = 12 * N * N * 4 / 1e9 + 6 * N * N * 8 / 1e9
    print(f"combine pass (12xf32 read + 6xf64 write, {gb:.2f} GB): "
          f"{t*1e3:.3f} ms -> {gb/t:.0f} GB/s", flush=True)


probe_combine()


# ------------------------------------------------------------------ #
# 4. tile sweep for the df64 kernel (hyperinflation, 4096²)
# ------------------------------------------------------------------ #
sys.path.insert(0, "/root/repo")
from bench import amortized as bench_amortized, make_pallas_chain  # noqa: E402

from inflatox_tpu.models import hyperinflation  # noqa: E402

model, _ = hyperinflation()
artifact = inflatox.Compiler(model, silent=True).compile()
N = 4096
extent = (0.5, 2.5, 0.25, 3.0)
args = np.array([1.0])

for tile in [(8, 128), (8, 256), (8, 512), (8, 1024), (16, 256), (16, 512),
             (32, 256), (64, 256)]:
    try:
        run, ia = make_pallas_chain(artifact, "complete_analysis", args,
                                    extent, (N, N), df64=True, tile=tile)
        t = bench_amortized(run, ia, K1=2, K2=12)
        print(f"df64 tile {tile}: {t*1e3:.3f} ms  "
              f"({N*N/t/1e9:.2f} Gpts/s)", flush=True)
    except Exception as e:
        print(f"df64 tile {tile}: FAILED {type(e).__name__}: {e}", flush=True)


# full-op (kernel + combine) honest cost at the best tile
def probe_full_op(tile):
    from inflatox_tpu.ops import pallas_kernels as pk

    scalars = pk._df_scalars(args, extent, (N, N))

    @jax.jit
    def run(s, K):
        def body(_, carry):
            ss, acc = carry
            outs = pk._launch_df(ss, artifact, (N, N), tile, False,
                                 "complete_analysis")
            probe = sum(jnp.sum(o) for o in outs)  # forces every combine
            return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

        _, acc = lax.fori_loop(0, K, body, (s, jnp.float64(0.0)))
        return acc

    t = amortized(run, (scalars,), K1=2, K2=12)
    print(f"df64 FULL op (kernel+combine+reduce) tile {tile}: {t*1e3:.3f} ms "
          f"({N*N/t/1e9:.2f} Gpts/s)", flush=True)


probe_full_op((32, 256))
print("done", flush=True)
