"""Strip-mined df64 kernel probe: large output blocks (few DMAs), small
compute strips (low register pressure)."""

import sys
import time
from functools import partial

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

from inflatox_tpu.lowering.df32 import DF  # noqa: E402
from inflatox_tpu.models import hyperinflation  # noqa: E402
from inflatox_tpu.ops import pallas_kernels as pk  # noqa: E402
from inflatox_tpu.ops.pallas_kernels import _core_df_stream  # noqa: E402

model, _ = hyperinflation()
artifact = inflatox.Compiler(model, silent=True).compile()
N = 4096
extent = (0.5, 2.5, 0.25, 3.0)
args_np = np.array([1.0])


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


def kernel_strip(scal_ref, *out_refs, model=None, tile=None, strip=None,
                 n_params=None, kind=None):
    tm, tn = tile
    i = pl.program_id(0)
    j = pl.program_id(1)

    def scal_df(t):
        return DF(scal_ref[2 * t], scal_ref[2 * t + 1])

    args = tuple(scal_df(t) for t in range(n_params))
    x0a, dx0 = scal_df(n_params + 0), scal_df(n_params + 1)
    x1a, dx1 = scal_df(n_params + 2), scal_df(n_params + 3)

    _, core = _core_df_stream(kind)
    for c in range(tn // strip):
        rows = lax.broadcasted_iota(jnp.int32, (tm, strip), 0).astype(jnp.float32)
        cols = lax.broadcasted_iota(jnp.int32, (tm, strip), 1).astype(jnp.float32)
        gi = DF(i.astype(jnp.float32) * float(tm) + rows)
        gj = DF(j.astype(jnp.float32) * float(tn) + float(c * strip) + cols)
        x0 = x0a + gi * dx0
        x1 = x1a + gj * dx1
        sl = slice(c * strip, (c + 1) * strip)

        def emit(k, val, _sl=sl):
            out_refs[2 * k][:, _sl] = val.hi
            out_refs[2 * k + 1][:, _sl] = val.lo

        core(model.df32_fns(), (x0, x1), args, emit)


@partial(jax.jit, static_argnames=("tile", "strip"))
def launch_strip(scalars, tile, strip):
    tm, tn = tile
    grid = (N // tm, N // tn)
    out_shape = tuple(jax.ShapeDtypeStruct((N, N), jnp.float32) for _ in range(12))
    kernel = partial(kernel_strip, model=artifact, tile=tile, strip=strip,
                     n_params=artifact.n_parameters, kind="complete_analysis")
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=[],
        out_specs=tuple(pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
                        for _ in range(12)),
    )
    return pl.pallas_call(kernel, out_shape=out_shape, grid_spec=gs)(scalars)


scalars = pk._df_scalars(args_np, extent, (N, N))

for tile, strip in [((8, 512), 128), ((8, 512), 256), ((8, 1024), 128),
                    ((8, 1024), 256), ((16, 512), 128), ((8, 2048), 256),
                    ((16, 1024), 256), ((8, 512), 512)]:
    @jax.jit
    def run(s, K, _t=tile, _s=strip):
        def body(_, carry):
            ss, acc = carry
            outs = launch_strip(ss, _t, _s)
            probe = outs[0][0, 0]
            return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

        _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
        return acc

    try:
        t = amortized(run, (scalars,), K1=2, K2=12)
        print(f"strip tile {tile} strip {strip}: {t*1e3:7.3f} ms "
              f"({N*N/t/1e9:.2f} Gpts/s)", flush=True)
    except Exception as e:
        print(f"strip tile {tile} strip {strip}: FAILED {type(e).__name__}: {e}",
              flush=True)
print("done")
