#!/usr/bin/env python
"""Probe 3: df64 kernel variants — where does the time go?

Variants (all tile (32,256), 4096², hyperinflation):
  full      — current complete_analysis_op_df
  noatan    — delta := tan_delta (skip df atan)
  modelonly — just evaluate V, hesse, grad² and write them
  recip     — reciprocal-shared rewrite of the condition math
  recipnoat — recip + no atan
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import inflatox_tpu as inflatox
    from inflatox_tpu.lowering import df32 as dfm
    from inflatox_tpu.lowering.df32 import DF
    from inflatox_tpu.models import hyperinflation
    from inflatox_tpu.ops import pallas_kernels as pk

    model, _ = hyperinflation()
    artifact = inflatox.Compiler(model, silent=True).compile()

    N = 4096
    extent = (0.5, 2.5, 0.25, 3.0)
    args = np.array([1.0])
    shape = (N, N)
    pts = N * N
    tile = (32, 256)

    def cond_full(v, v00, v10, v11, gs):
        from inflatox_tpu.ops.anguelova import complete_analysis_op_df
        return complete_analysis_op_df(v, v00, v10, v11, gs)

    def cond_noatan(v, v00, v10, v11, gs):
        lhs = v11 / v
        rhs = 3.0 + (v00 / v10) ** 2 * 3.0 + (v00 / v) * (v10 / v00) ** 2
        num = dfm.abs_(lhs - rhs)
        den = dfm.abs_(lhs) + dfm.abs_(rhs)
        consistency = dfm.minimum(num / den, DF.const(1.0))
        epsilon_v = gs / v**2
        vtt = (v00 * v10**2 + v11 * v00**2 - v00 * v10**2 * 2.0) / (
            v00**2 + v10**2)
        vt2 = epsilon_v / ((v00 / v10) ** 2 + 1.0)
        epsilon_h = (epsilon_v - vt2) * 3.0 / (epsilon_v + dfm.abs_(vtt) / v - vt2)
        tan_delta = dfm.abs_(v10 / v00)
        delta = tan_delta  # skip atan
        omega = dfm.sqrt((vtt / v) * (-epsilon_h + 3.0))
        eta_parallel = omega * tan_delta - 3.0
        return consistency, epsilon_v, epsilon_h, eta_parallel, delta, omega

    def cond_modelonly(v, v00, v10, v11, gs):
        return v, v00, v10, v11, gs, v + gs

    def _recip_core(v, v00, v10, v11, gs, with_atan):
        one = DF.const(1.0)
        rv = one / v
        rv00 = one / v00
        rv10 = one / v10
        lhs = v11 * rv
        a = v00 * rv10          # v00/v10
        b = v10 * rv00          # v10/v00
        rhs = a * a * 3.0 + (v00 * rv) * (b * b) + 3.0
        num = dfm.abs_(lhs - rhs)
        den = dfm.abs_(lhs) + dfm.abs_(rhs)
        consistency = dfm.minimum(num / den, one)
        epsilon_v = gs * (rv * rv)
        v00s = v00 * v00
        v10s = v10 * v10
        rden = one / (v00s + v10s)
        vtt = (v00 * v10s + v11 * v00s - v00 * v10s * 2.0) * rden
        vt2 = epsilon_v * (v10s * rden)
        epsilon_h = (epsilon_v - vt2) * 3.0 / (epsilon_v + dfm.abs_(vtt) * rv - vt2)
        tan_delta = dfm.abs_(b)
        delta = dfm.atan(tan_delta) if with_atan else tan_delta
        omega = dfm.sqrt((vtt * rv) * (-epsilon_h + 3.0))
        eta_parallel = omega * tan_delta - 3.0
        return consistency, epsilon_v, epsilon_h, eta_parallel, delta, omega

    def cond_recip(v, v00, v10, v11, gs):
        return _recip_core(v, v00, v10, v11, gs, True)

    def cond_recipnoat(v, v00, v10, v11, gs):
        return _recip_core(v, v00, v10, v11, gs, False)

    def make_kernel(cond):
        def kern(scal_ref, *out_refs, tile=None, n_params=None):
            tm, tn = tile
            i = pl.program_id(0)
            j = pl.program_id(1)

            def scal_df(t):
                return DF(scal_ref[2 * t], scal_ref[2 * t + 1])

            a = tuple(scal_df(t) for t in range(n_params))
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
            fns = artifact.df32_fns()
            v = fns["potential"]((x0, x1), a)
            v00, _, v10, v11 = fns["hesse"]((x0, x1), a)
            gs = fns["grad_square"]((x0, x1), a)
            outs = cond(v, v00, v10, v11, gs)
            for k, val in enumerate(outs):
                out_refs[2 * k][:, :] = val.hi
                out_refs[2 * k + 1][:, :] = val.lo
        return kern

    def chain(cond, K):
        scalars = pk._df_scalars(args, extent, shape)
        tm, tn = tile
        n0p = -(-shape[0] // tm) * tm
        n1p = -(-shape[1] // tn) * tn
        grid = (n0p // tm, n1p // tn)
        kern = functools.partial(make_kernel(cond), tile=tile,
                                 n_params=artifact.n_parameters)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=[],
            out_specs=tuple(pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
                            for _ in range(12)))

        @jax.jit
        def run(s):
            def body(_, carry):
                ss, acc = carry
                outs = pl.pallas_call(
                    kern,
                    out_shape=tuple(jax.ShapeDtypeStruct((n0p, n1p), jnp.float32)
                                    for _ in range(12)),
                    grid_spec=grid_spec)(ss)
                probe = outs[0][0, 0]
                return (ss + probe * 0.0, acc + probe)

            _, acc = lax.fori_loop(0, K, body, (s, jnp.float32(0.0)))
            return acc

        return run, scalars

    def timeit(fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        float(out)
        return time.perf_counter() - t0

    def measure(name, cond, K1=1, K2=11):
        try:
            run1, s = chain(cond, K1)
            run2, _ = chain(cond, K2)
            timeit(run1, s)
            t1 = min(timeit(run1, s), timeit(run1, s))
            timeit(run2, s)
            t2 = min(timeit(run2, s), timeit(run2, s))
            per = (t2 - t1) / (K2 - K1)
            print(f"{name:12s}: {per*1e3:8.3f} ms/iter  {pts/per/1e9:8.3f} Gpts/s",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)

    measure("full", cond_full)
    measure("noatan", cond_noatan)
    measure("modelonly", cond_modelonly)
    measure("recip", cond_recip)
    measure("recipnoat", cond_recipnoat)


if __name__ == "__main__":
    main()
