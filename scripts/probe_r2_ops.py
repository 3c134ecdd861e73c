"""Probe 2: VPU op throughput inside Mosaic + df64 kernel flop breakdown.

a) peak f32 mul/add rate (chained, register-resident)
b) f32 divide / rsqrt / sqrt / select / int-ops relative cost
c) model-eval-only df kernel vs full condition kernel (where do flops go?)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

import inflatox_tpu as inflatox

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("backend:", jax.default_backend(), flush=True)


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


# ---------------------------------------------------------------- #
# a/b: op-throughput kernels. Grid of tiles; each tile does OPS
# dependent ops per element so the chain can't be DCE'd or reordered.
# ---------------------------------------------------------------- #
TM, TN = 16, 512
GRID = (32, 8)  # 32*16 x 8*512 = 512 x 4096 grid = 2M elements
NELEM = GRID[0] * TM * GRID[1] * TN
OPS = 256


def make_op_kernel(opname):
    def kernel(x_ref, o_ref):
        x = x_ref[:, :]
        acc = x
        if opname == "mul_add":
            for i in range(OPS // 2):
                acc = acc * np.float32(1.0000001)
                acc = acc + np.float32(1e-7)
        elif opname == "mul":
            for i in range(OPS):
                acc = acc * np.float32(1.0000001)
        elif opname == "add":
            for i in range(OPS):
                acc = acc + np.float32(1e-7)
        elif opname == "div":
            for i in range(OPS // 8):
                acc = np.float32(1.000001) / acc
        elif opname == "rsqrt":
            for i in range(OPS // 8):
                acc = lax.rsqrt(acc)
        elif opname == "sqrt":
            for i in range(OPS // 8):
                acc = jnp.sqrt(acc) + np.float32(0.5)
        elif opname == "select":
            for i in range(OPS // 2):
                acc = jnp.where(acc > np.float32(0.5), acc * np.float32(0.999999), acc)
        o_ref[:, :] = acc

    return kernel


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("kernel",))
def run_op(x, K, *, kernel):
    def body(_, carry):
        xx, acc = carry
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((GRID[0] * TM, GRID[1] * TN), jnp.float32),
            grid=GRID,
            in_specs=[pl.BlockSpec((TM, TN), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
        )(xx)
        probe = out[0, 0]
        return (xx + probe * 0, acc + probe)

    _, acc = lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))
    return acc


x0 = jnp.full((GRID[0] * TM, GRID[1] * TN), 0.7, jnp.float32)
for op, nops in [("mul_add", OPS), ("mul", OPS), ("add", OPS),
                 ("div", OPS // 8), ("rsqrt", OPS // 8), ("sqrt", OPS // 8),
                 ("select", OPS // 2)]:
    kern = make_op_kernel(op)
    runner = _partial(run_op, kernel=kern)
    t = amortized(runner, (x0,), K1=2, K2=12)
    rate = NELEM * nops / t
    print(f"op {op:8s}: {t*1e3:7.3f} ms for {nops:4d} ops/elem "
          f"-> {rate/1e12:6.2f} Top/s  ({t/NELEM/nops*1e12:.2f} ps/op)",
          flush=True)


# ---------------------------------------------------------------- #
# c: model-eval-only df kernel vs full kernel (hyperinflation 4096²)
# ---------------------------------------------------------------- #
from functools import partial  # noqa: E402

from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from inflatox_tpu.lowering.df32 import DF  # noqa: E402
from inflatox_tpu.models import hyperinflation  # noqa: E402
from inflatox_tpu.ops import pallas_kernels as pk  # noqa: E402

model, _ = hyperinflation()
artifact = inflatox.Compiler(model, silent=True).compile()
N = 4096
extent = (0.5, 2.5, 0.25, 3.0)
args = np.array([1.0])


def _kernel_model_only(scal_ref, *out_refs, model=None, tile=None, n_params=None):
    tm, tn = tile
    i = pl.program_id(0)
    j = pl.program_id(1)

    def scal_df(t):
        return DF(scal_ref[2 * t], scal_ref[2 * t + 1])

    args_df = tuple(scal_df(t) for t in range(n_params))
    x0a = scal_df(n_params + 0)
    dx0 = scal_df(n_params + 1)
    x1a = scal_df(n_params + 2)
    dx1 = scal_df(n_params + 3)
    rows = lax.broadcasted_iota(jnp.int32, (tm, tn), 0).astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, (tm, tn), 1).astype(jnp.float32)
    gi = DF(i.astype(jnp.float32) * float(tm) + rows)
    gj = DF(j.astype(jnp.float32) * float(tn) + cols)
    x0 = x0a + gi * dx0
    x1 = x1a + gj * dx1
    fns = model.df32_fns()
    xs = (x0, x1)
    v = fns["potential"](xs, args_df)
    v00, _, v10, v11 = fns["hesse"](xs, args_df)
    gs = fns["grad_square"](xs, args_df)
    outs = (v, v00, v10, v11, gs, v + v00)
    for k, val in enumerate(outs):
        out_refs[2 * k][:, :] = val.hi
        out_refs[2 * k + 1][:, :] = val.lo


@partial(jax.jit, static_argnames=("tile",))
def launch_model_only(scalars, tile):
    tm, tn = tile
    grid = (N // tm, N // tn)
    out_shape = tuple(jax.ShapeDtypeStruct((N, N), jnp.float32) for _ in range(12))
    kernel = partial(_kernel_model_only, model=artifact, tile=tile,
                     n_params=artifact.n_parameters)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=[],
        out_specs=tuple(pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
                        for _ in range(12)),
    )
    return pl.pallas_call(kernel, out_shape=out_shape, grid_spec=gs)(scalars)


scalars = pk._df_scalars(args, extent, (N, N))


@jax.jit
def run_model_only(s, K):
    def body(_, carry):
        ss, acc = carry
        outs = launch_model_only(ss, (16, 512))
        probe = outs[0][0, 0]
        return (ss + (probe * 0.0).astype(ss.dtype), acc + probe)

    _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
    return acc


t = amortized(run_model_only, (scalars,), K1=2, K2=12)
print(f"df64 MODEL-EVAL-ONLY kernel (16,512): {t*1e3:.3f} ms "
      f"({N*N/t/1e9:.2f} Gpts/s)", flush=True)

print("done", flush=True)
