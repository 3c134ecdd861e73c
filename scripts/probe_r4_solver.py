"""Round-4 probe: where does the Pallas DF solver (cfg5d) spend its time?

BENCH_r03 cfg5d: 4096 traj x 2000 rows in 0.062 s device time = 65.7k
traj/s = 2.58x the 32-core C solver per chip — the thinnest margin in the
matrix (VERDICT r3 next-item 5).  Known-but-unprofiled costs: ~1.3 masked
adaptive attempts/row, DF controller state, the defect error estimate, the
all-lanes min-reduce per while iteration.  This probe times kernel variants
with each mechanism ablated, on the real chip, at the bench shape:

  full        — ops.pallas_solver._launch_solver as shipped
  one_att     — single unconditional attempt/row: no while_loop, no masking,
                no min-reduce, accept always (controller still updates dt)
  no_ctrl     — one_att with dt frozen (no controller log/exp/clip)
  no_err      — no_ctrl without the defect error estimate
  axpy_raw    — no_err with stage combinations in PLAIN f32 hi-only
                (derivatives still DF via the model fns) — upper bound for
                any DF-axpy algebra optimization
  write_only  — carry the state untouched, write rows: memory/loop floor

Gap(full, one_att)   = adaptive machinery cost (while + mask + reduce)
Gap(one_att, no_ctrl)= controller transcendentals
Gap(no_ctrl, no_err) = defect estimate
Gap(no_err, axpy_raw)= DF tax of the tableau axpys
axpy_raw - write_only= derivative evals + residual algebra

Run:  cd /root/repo && python scripts/probe_r4_solver.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import inflatox_tpu as inflatox
from inflatox_tpu.background import _DT_INIT, _RKF_A, _RKF_B4, _RKF_B5
from inflatox_tpu.models import hyperinflation
from inflatox_tpu.ops import pallas_solver as psolve

_SUB, _LANES = psolve._SUB, psolve._LANES
_ROW_CHUNK = psolve._ROW_CHUNK


def _variant_kernel(scal_ref, *refs, model=None, n_params=None, steps=None,
                    max_err=None, nf=2, mode="one_att"):
    from inflatox_tpu.lowering.df32 import DF

    ns = 2 * nf + 1
    n_init = 4 * nf
    in_refs = refs[:n_init]
    out_refs = refs[n_init:n_init + 2 * (ns + 1)]
    scr = refs[n_init + 2 * (ns + 1):]
    rc = pl.program_id(1)

    args = tuple(DF(scal_ref[2 * t], scal_ref[2 * t + 1])
                 for t in range(n_params))
    fns = model.solver_df32_fns()

    xs = [DF(in_refs[2 * a][...], in_refs[2 * a + 1][...]) for a in range(nf)]
    chis = [DF(in_refs[2 * (nf + a)][...], in_refs[2 * (nf + a) + 1][...])
            for a in range(nf)]
    h0 = fns["eom_h"](tuple(xs), tuple(chis), args)
    first = rc == jnp.int32(0)

    def pick(init_df, hi_ref, lo_ref):
        return DF(jnp.where(first, init_df.hi, hi_ref[...]),
                  jnp.where(first, init_df.lo, lo_ref[...]))

    y = [pick(v, scr[2 * k], scr[2 * k + 1])
         for k, v in enumerate([*xs, *chis, h0])]
    t = DF(jnp.where(first, np.float32(0.0), scr[2 * ns][...]),
           jnp.where(first, np.float32(0.0), scr[2 * ns + 1][...]))
    dt = jnp.where(first, np.float32(_DT_INIT), scr[2 * ns + 2][...])

    def unpack_state(flat):
        ys = [DF(flat[2 * k], flat[2 * k + 1]) for k in range(ns)]
        return ys, DF(flat[2 * ns], flat[2 * ns + 1]), flat[2 * ns + 2]

    def attempt_df(ya, adt, want_err):
        """Unconditional RKF45 attempt in DF; optionally skip the defect."""
        dtd = DF(adt)
        dks = []
        for n in range(6):
            yn = ya
            for mm in range(n):
                a = float(_RKF_A[n, mm])
                if a != 0.0:
                    yn = [yn[c] + dks[mm][c] * a for c in range(ns)]
            k = psolve._deriv(fns, yn, args, nf)
            dks.append([dtd * k[c] for c in range(ns)])
        hi = list(ya)
        for n in range(6):
            b5 = float(_RKF_B5[n])
            if b5 != 0.0:
                hi = [hi[c] + dks[n][c] * b5 for c in range(ns)]
        if not want_err:
            return hi, jnp.zeros_like(adt)
        err2 = jnp.zeros_like(adt)
        for c in range(ns):
            d = None
            for n in range(6):
                db = float(_RKF_B5[n] - _RKF_B4[n])
                if db != 0.0:
                    term = dks[n][c] * db
                    d = term if d is None else d + term
            err2 = err2 + d.hi * d.hi
        return hi, jnp.sqrt(err2)

    def attempt_f32(ya, adt):
        """Stage axpys in plain f32 (hi words); derivatives still DF."""
        dks = []
        for n in range(6):
            yn = [c.hi for c in ya]
            for mm in range(n):
                a = np.float32(_RKF_A[n, mm])
                if a != 0.0:
                    yn = [yn[c] + dks[mm][c] * a for c in range(ns)]
            k = psolve._deriv(fns, [DF(v) for v in yn], args, nf)
            dks.append([adt * k[c].hi for c in range(ns)])
        hi = [c.hi for c in ya]
        for n in range(6):
            b5 = np.float32(_RKF_B5[n])
            if b5 != 0.0:
                hi = [hi[c] + dks[n][c] * b5 for c in range(ns)]
        return [DF(v) for v in hi]

    def row_body(local, carry):
        y_, t_, dt_ = unpack_state(carry)
        grow = rc * jnp.int32(_ROW_CHUNK) + local
        stepping = (grow > jnp.int32(0)) & (grow < jnp.int32(steps))

        if mode == "write_only":
            pass
        elif mode == "axpy_raw":
            cand = attempt_f32(y_, dt_)
            y_ = [DF(jnp.where(stepping, n_.hi, o.hi),
                     jnp.where(stepping, n_.lo, o.lo))
                  for o, n_ in zip(y_, cand)]
            t_ = DF(jnp.where(stepping, (t_ + DF(dt_)).hi, t_.hi),
                    jnp.where(stepping, (t_ + DF(dt_)).lo, t_.lo))
        else:
            want_err = mode in ("one_att", "no_ctrl")
            cand, err = attempt_df(y_, dt_, want_err)
            newt = t_ + DF(dt_)
            y_ = [DF(jnp.where(stepping, n_.hi, o.hi),
                     jnp.where(stepping, n_.lo, o.lo))
                  for o, n_ in zip(y_, cand)]
            t_ = DF(jnp.where(stepping, newt.hi, t_.hi),
                    jnp.where(stepping, newt.lo, t_.lo))
            if mode == "one_att":
                dt_ = jnp.where(stepping,
                                psolve._controller(dt_, err, max_err), dt_)
            elif mode == "no_ctrl":
                # consume err so XLA can't DCE the defect computation
                dt_ = jnp.where(err < np.float32(-1.0), err, dt_)

        vals = [*y_, t_]
        for k, v in enumerate(vals):
            out_refs[2 * k][pl.ds(local, 1), :, :] = v.hi[None]
            out_refs[2 * k + 1][pl.ds(local, 1), :, :] = v.lo[None]
        return psolve._pack([*y_, t_], (dt_,))

    carry0 = psolve._pack([*y, t], (dt,))
    out = lax.fori_loop(jnp.int32(0), jnp.int32(_ROW_CHUNK), row_body, carry0)
    for i in range(2 * ns + 3):
        scr[i][...] = out[i]


@functools.partial(jax.jit,
                   static_argnames=("model", "steps", "n_blocks", "max_err",
                                    "mode"))
def _launch_variant(scalars, planes, model, steps, n_blocks, max_err, mode):
    nf = model.n_fields
    ns = 2 * nf + 1
    n_chunks = -(-steps // _ROW_CHUNK)
    rows_pad = n_chunks * _ROW_CHUNK
    kernel = functools.partial(
        _variant_kernel, model=model, n_params=model.n_parameters,
        steps=steps, max_err=float(max_err), nf=nf, mode=mode)
    in_specs = [pl.BlockSpec((_SUB, _LANES), lambda b, rcc, *_: (b, b * 0))
                for _ in range(4 * nf)]
    out_specs = tuple(
        pl.BlockSpec((_ROW_CHUNK, _SUB, _LANES),
                     lambda b, rcc, *_: (rcc, b, b * 0))
        for _ in range(2 * (ns + 1)))
    out_shape = tuple(
        jax.ShapeDtypeStruct((rows_pad, n_blocks * _SUB, _LANES), jnp.float32)
        for _ in range(2 * (ns + 1)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_blocks, n_chunks),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((_SUB, _LANES), jnp.float32)]
        * (2 * ns + 3))
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(scalars, *planes)


def main():
    model, _ = hyperinflation()
    artifact = inflatox.Compiler(model, silent=True).compile()
    args = np.array([1.0])
    Bd, steps = 4096, 2000
    rng = np.random.default_rng(0)
    f0 = np.stack([rng.uniform(1.5, 2.5, Bd), rng.uniform(1.5, 2.5, Bd)], 1)
    n_blocks = Bd // psolve._TRAJ_BLOCK
    cols = [f0[:, 0], f0[:, 1], np.zeros(Bd), np.zeros(Bd)]
    planes = []
    for c in cols:
        hi_p, lo_p = psolve._split_planes(np.asarray(c, np.float64), n_blocks)
        planes.append(jnp.asarray(hi_p))
        planes.append(jnp.asarray(lo_p))
    prs = []
    for v in args:
        h = float(np.float32(v))
        prs.extend([h, float(v) - h])
    scal = jnp.asarray(prs + [0.0], jnp.float32)

    def timed(fn):
        t0 = time.perf_counter()
        outs = fn()
        jax.block_until_ready(outs)
        float(outs[0][0, 0, 0])
        return time.perf_counter() - t0

    results = {}

    def full():
        return psolve._launch_solver(scal, tuple(planes), artifact, steps,
                                     n_blocks, False, 1e-6)

    timed(full)
    results["full"] = min(timed(full) for _ in range(3))
    print(json.dumps({"variant": "full", "s": round(results['full'], 4),
                      "traj_per_s": round(Bd / results['full'])}),
          flush=True)

    for mode in ("one_att", "no_ctrl", "no_err", "axpy_raw", "write_only"):
        def run(mode=mode):
            return _launch_variant(scal, tuple(planes), artifact, steps,
                                   n_blocks, 1e-6, mode)
        timed(run)
        tbest = min(timed(run) for _ in range(3))
        results[mode] = tbest
        print(json.dumps({"variant": mode, "s": round(tbest, 4),
                          "traj_per_s": round(Bd / tbest)}), flush=True)

    f = results
    print(json.dumps({
        "adaptive_machinery_s": round(f["full"] - f["one_att"], 4),
        "controller_s": round(f["one_att"] - f["no_ctrl"], 4),
        "defect_s": round(f["no_ctrl"] - f["no_err"], 4),
        "df_axpy_tax_s": round(f["no_err"] - f["axpy_raw"], 4),
        "deriv_plus_floor_s": round(f["axpy_raw"], 4),
        "write_floor_s": round(f["write_only"], 4),
    }, indent=None), flush=True)


if __name__ == "__main__":
    main()
