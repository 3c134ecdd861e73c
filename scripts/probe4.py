#!/usr/bin/env python
"""Probe 4: A/B the df32 primitive variants (div, sqrt) on the modelonly
kernel to find which lowers badly in Mosaic."""

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
    from inflatox_tpu.lowering.df32 import DF, _quick_two_sum
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

    def div_old(self, other):
        o = DF.of(other)
        q1 = self.hi / o.hi
        r = self + (-(o * q1))
        q2 = (r.hi + r.lo) / o.hi
        hi, lo = _quick_two_sum(q1, q2)
        return DF(hi, lo)

    def div_new(self, other):
        o = DF.of(other)
        y = 1.0 / o.hi
        q1 = self.hi * y
        r = self + (-(o * q1))
        q2 = (r.hi + r.lo) * y
        hi, lo = _quick_two_sum(q1, q2)
        return DF(hi, lo)

    def sqrt_old(x):
        x = DF.of(x)
        s = jnp.sqrt(x.hi)
        s_safe = jnp.where(s > 0, s, np.float32(1.0))
        sd = DF(s_safe)
        diff = x + (-(sd * sd))
        corr = (diff.hi + diff.lo) / (2.0 * s_safe)
        hi, lo = _quick_two_sum(s_safe, corr)
        out = DF(hi, lo)
        zero = x.hi == 0.0
        bad = x.hi < 0.0
        hi = jnp.where(zero, np.float32(0.0), jnp.where(bad, np.float32(np.nan), out.hi))
        lo = jnp.where(zero | bad, np.float32(0.0), out.lo)
        return DF(hi, lo)

    sqrt_new = dfm.sqrt

    def cond_modelonly(v, v00, v10, v11, gs):
        return v, v00, v10, v11, gs, v + gs

    def make_kernel():
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
            outs = cond_modelonly(v, v00, v10, v11, gs)
            for k, val in enumerate(outs):
                out_refs[2 * k][:, :] = val.hi
                out_refs[2 * k + 1][:, :] = val.lo
        return kern

    def chain(K):
        scalars = pk._df_scalars(args, extent, shape)
        tm, tn = tile
        n0p = -(-shape[0] // tm) * tm
        n1p = -(-shape[1] // tn) * tn
        grid = (n0p // tm, n1p // tn)
        kern = functools.partial(make_kernel(), tile=tile,
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

    def measure(name, K1=1, K2=11):
        try:
            run1, s = chain(K1)
            run2, _ = chain(K2)
            timeit(run1, s)
            t1 = min(timeit(run1, s), timeit(run1, s))
            timeit(run2, s)
            t2 = min(timeit(run2, s), timeit(run2, s))
            per = (t2 - t1) / (K2 - K1)
            print(f"{name:26s}: {per*1e3:8.3f} ms/iter  {pts/per/1e9:8.3f} Gpts/s",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)

    for divname, divfn in [("divnew", div_new), ("divold", div_old)]:
        for sqname, sqfn in [("sqrtnew", sqrt_new), ("sqrtold", sqrt_old)]:
            DF.__truediv__ = divfn
            dfm.sqrt = sqfn
            # rebuild the df32 fns so the namespace picks up dfm.sqrt
            artifact._df32_fns = None
            ns = dfm._jnp_like()
            measure(f"model {divname}+{sqname}")


if __name__ == "__main__":
    main()
