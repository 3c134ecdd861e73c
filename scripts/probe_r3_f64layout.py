"""Round-3 probe: what IS f64 on this TPU, how is it laid out, and what do
clean (in-place-carry) conversion passes cost?

Facts needed to design single-pass f64 delivery (VERDICT r2 item 1):
  1. representation: double-float (f32 pair, f32 range) vs IEEE64 emulation
     -> does f64 hold 1e300?  does 1 + 2^-60 survive?
  2. compiled layout strings for f64/i64/f32 buffers (HLO as_text)
  3. clean pass costs at 6x4096x4096 with an in-place .at[].add carry:
     astype+add, bitcast i32(N,2)->f64, bitcast f64->i32(N,2),
     i64-construct+bitcast, f64 elementwise (r/w bandwidth), i32 copy,
     f32->f64 astype
  4. can pallas_call emit f64/s64 out_shape on TPU at all?
"""
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices())

    # --- 1. representation -------------------------------------------------
    big = jax.device_put(np.float64(1e300))
    print("f64(1e300) on device ->", float(big * 1.0))
    probe = jax.device_put(np.float64(1.0)) + jax.device_put(np.float64(2.0**-60))
    print("1 + 2^-60 ->", repr(float(probe)), "(exact iff pair repr or true f64)")
    # distinguishes pair from IEEE64: pair keeps 1 + 2^-60 + 2^-80 exactly
    # (lo absorbs it); IEEE64 rounds it away
    p3 = (
        jax.device_put(np.float64(1.0))
        + jax.device_put(np.float64(2.0**-60))
        + jax.device_put(np.float64(2.0**-80))
    )
    v = float(p3)
    print("1 + 2^-60 + 2^-80 ->", v - 1.0, "(2^-60+2^-80 iff pair; 2^-60 iff IEEE64)")

    # --- 2. layouts --------------------------------------------------------
    for dt in (jnp.float32, jnp.float64, jnp.int32, jnp.int64):
        try:
            txt = (
                jax.jit(lambda x: x * x)
                .lower(jax.ShapeDtypeStruct((256, 256), dt))
                .compile()
                .as_text()
            )
            lines = [
                ln.strip()
                for ln in txt.splitlines()
                if ("entry_computation_layout" in ln)
            ]
            print(f"layout {np.dtype(dt).name}:", lines[:1])
        except Exception as e:  # noqa: BLE001
            print(f"layout {np.dtype(dt).name}: FAILED {type(e).__name__}: {e}")

    # --- 3. clean pass costs ----------------------------------------------
    N = 4096
    S = 6
    rng = np.random.default_rng(1)
    hi_d = jnp.asarray(rng.standard_normal((S, N, N)).astype(np.float32))
    lo_d = hi_d * 1e-8
    w_d = jnp.asarray(rng.integers(1, 2**20, (S, N, N, 2)).astype(np.int32))
    f64_d = hi_d.astype(jnp.float64)
    i32_d = jnp.asarray(rng.integers(1, 2**20, (S, N, N)).astype(np.int32))

    def chain(fn, carry_update):
        @jax.jit
        def run(x, K):
            def body(_, c):
                xx, acc = c
                o = fn(xx)
                p = o.reshape(-1)[0]
                return (carry_update(xx, p), acc + p.astype(jnp.float64))

            _, acc = lax.fori_loop(0, K, body, (x, jnp.float64(0.0)))
            return acc

        return run

    def upd_inplace(xx, p):
        z = (p * 0).astype(xx.dtype)
        return xx.at[(0,) * xx.ndim].add(z)

    def amort(run, x, K1=2, K2=10, reps=3):
        def timed(K):
            t0 = time.perf_counter()
            out = run(x, jnp.int32(K))
            jax.block_until_ready(out)
            float(out)
            return time.perf_counter() - t0

        timed(K1)
        t1 = min(timed(K1) for _ in range(reps))
        timed(K2)
        t2 = min(timed(K2) for _ in range(reps))
        return (t2 - t1) / (K2 - K1) * 1e3

    cases = [
        ("astype+add (pair->f64)",
         lambda hl: hl[0].astype(jnp.float64) + hl[1].astype(jnp.float64),
         (hi_d, lo_d)),
        ("bitcast i32(...,2)->f64",
         lambda w: lax.bitcast_convert_type(w, jnp.float64), w_d),
        ("bitcast f64->i32(...,2)",
         lambda v: lax.bitcast_convert_type(v, jnp.int32), f64_d),
        ("f64 elementwise (x*1.000001)",
         lambda v: v * jnp.float64(1.000001), f64_d),
        ("i32 copy (x+1)", lambda v: v + jnp.int32(1), i32_d),
        ("f32->f64 astype", lambda v: v.astype(jnp.float64), hi_d),
        ("f64->f32 astype", lambda v: v.astype(jnp.float32), f64_d),
        ("i64 construct+bitcast",
         lambda w: lax.bitcast_convert_type(
             (w[..., 1].astype(jnp.int64) << 32)
             | w[..., 0].astype(jnp.uint32).astype(jnp.int64),
             jnp.float64,
         ),
         w_d),
    ]
    for name, fn, arg in cases:
        try:
            if isinstance(arg, tuple):
                # tuple input: close over the second operand
                a0, a1 = arg
                run = chain(lambda x, _a1=a1: fn((x, _a1)), upd_inplace)
                ms = amort(run, a0)
            else:
                run = chain(fn, upd_inplace)
                ms = amort(run, arg)
            print(f"{name}: {ms:.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}")

    # --- 4. pallas f64/s64 out --------------------------------------------
    from jax.experimental import pallas as pl

    for dt in (jnp.float64, jnp.int64):
        try:
            def k(o_ref):
                o_ref[...] = jnp.zeros_like(o_ref)

            out = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), dt)
            )()
            jax.block_until_ready(out)
            print(f"pallas out {np.dtype(dt).name}: OK")
        except Exception as e:  # noqa: BLE001
            print(f"pallas out {np.dtype(dt).name}: FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
