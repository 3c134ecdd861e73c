"""Per-piece attribution of the df64 kernel tail cost on hardware.

Runs the model eval + ONE tail piece at a time (always writing 12 planes so
write volume is constant) and compares against model-only and full-tail.
"""

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

from inflatox_tpu.lowering import df32 as dfm  # noqa: E402
from inflatox_tpu.lowering.df32 import DF  # noqa: E402
from inflatox_tpu.models import hyperinflation  # noqa: E402
from inflatox_tpu.ops import pallas_kernels as pk  # noqa: E402

model, _ = hyperinflation()
artifact = inflatox.Compiler(model, silent=True).compile()
N = 4096
TILE = (8, 512)
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


def tail_piece(which, v, v00, v10, v11, gs):
    one = dfm.NUM.const(1.0)
    if which == "none":
        return (v,)
    if which == "consistency":
        zero_div = dfm.is_zero(v) | dfm.is_zero(v00) | dfm.is_zero(v10)
        v, v00, v10, v11, gs = dfm.normalize_homogeneous(v, v00, v10, v11, gs)
        v10s = v10.sq()
        w = v00 * v10s
        u = v00 * v00.sq()
        L = v11 * w
        R = (v * w + v * u) * 3.0 + v10s.sq()
        num = dfm.abs_(L - R)
        den = dfm.abs_(L) + dfm.abs_(R)
        return (dfm.where(zero_div, dfm.nan_like(v), dfm.minimum(num / den, one)),)
    if which == "norm_only":
        v, v00, v10, v11, gs = dfm.normalize_homogeneous(v, v00, v10, v11, gs)
        return (v + v00 + v10 + v11 + gs,)
    if which == "eps_v":
        return (gs / v.sq(),)
    if which == "eps_h":
        a_eh = gs * v00.sq()
        wtt = v11 * v00.sq() - v00 * v10.sq()
        d_eh = a_eh + dfm.abs_(wtt) * v
        return (a_eh * 3.0 / d_eh,)
    if which == "omega":
        v00s = v00.sq()
        v10s = v10.sq()
        a_eh = gs * v00s
        wtt = v11 * v00s - v00 * v10s
        d_eh = a_eh + dfm.abs_(wtt) * v
        return (dfm.sqrt((wtt * dfm.abs_(wtt)) * 3.0 / ((v00s + v10s) * d_eh)),)
    if which == "tandelta":
        return (dfm.abs_(v10 / v00),)
    if which == "delta":
        return (dfm.atan(dfm.abs_(v10 / v00)),)
    if which == "div_only":
        return (v / v00,)
    if which == "sqrt_only":
        return (dfm.sqrt(dfm.abs_(v)),)
    raise ValueError(which)


def make_kernel(which):
    def kern(scal_ref, *out_refs, model=None, tile=None, n_params=None):
        tm, tn = tile
        i = pl.program_id(0)
        j = pl.program_id(1)

        def scal_df(t):
            return DF(scal_ref[2 * t], scal_ref[2 * t + 1])

        a = tuple(scal_df(t) for t in range(n_params))
        x0a, dx0 = scal_df(n_params + 0), scal_df(n_params + 1)
        x1a, dx1 = scal_df(n_params + 2), scal_df(n_params + 3)
        rows = lax.broadcasted_iota(jnp.int32, (tm, tn), 0).astype(jnp.float32)
        cols = lax.broadcasted_iota(jnp.int32, (tm, tn), 1).astype(jnp.float32)
        gi = DF(i.astype(jnp.float32) * float(tm) + rows)
        gj = DF(j.astype(jnp.float32) * float(tn) + cols)
        x0 = x0a + gi * dx0
        x1 = x1a + gj * dx1
        fns = model.df32_fns()
        xs = (x0, x1)
        v = fns["potential"](xs, a)
        v00, _, v10, v11 = fns["hesse"](xs, a)
        gs = fns["grad_square"](xs, a)
        outs = tail_piece(which, v, v00, v10, v11, gs)
        full = list(outs) + [v, v00, v10, v11, gs]
        full = (full * 6)[:6]
        for k, val in enumerate(full):
            out_refs[2 * k][:, :] = val.hi
            out_refs[2 * k + 1][:, :] = val.lo

    return kern


@partial(jax.jit, static_argnames=("which",))
def launch(scalars, which):
    tm, tn = TILE
    grid = (N // tm, N // tn)
    out_shape = tuple(jax.ShapeDtypeStruct((N, N), jnp.float32) for _ in range(12))
    kernel = partial(make_kernel(which), model=artifact, tile=TILE,
                     n_params=artifact.n_parameters)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=[],
        out_specs=tuple(pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
                        for _ in range(12)),
    )
    return pl.pallas_call(kernel, out_shape=out_shape, grid_spec=gs)(scalars)


scalars = pk._df_scalars(args_np, extent, (N, N))

for which in ["none", "norm_only", "eps_v", "div_only", "sqrt_only",
              "tandelta", "consistency", "eps_h", "omega", "delta"]:
    @partial(jax.jit, static_argnames=())
    def run(s, K, _w=which):
        def body(_, carry):
            ss, acc = carry
            outs = launch(ss, _w)
            probe = outs[0][0, 0]
            return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

        _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
        return acc

    t = amortized(run, (scalars,), K1=2, K2=12)
    print(f"model + {which:12s}: {t*1e3:7.3f} ms", flush=True)
print("done")
