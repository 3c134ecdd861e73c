"""Batched background-EoM solver as a Pallas TPU kernel (round 3).

Why: the ``lax.while_loop``-based batch solver (background.py) advances the
state in TPU's emulated f64 — measured round 3 at ~143 trajectories/s for
256×2000 rows on one chip, while a reference-style C solver does the same
trivial-model work at ~35k traj/s on 32 cores: per-step loop overhead plus
the ~30× emulated-f64 tax swamp the VPU.  This kernel keeps the state in
double-f32 (DF) pairs inside compiled Mosaic — the only EFT-safe compiled
context (lowering/df32.py) — and replaces the per-row ``while_loop`` with
masked adaptive attempts under an all-lanes-accepted early exit, so every
lane of a (8, 128) trajectory block advances in lock-step vector code and
a row costs only as many attempts as its slowest lane needs (measured ~1.3
on smooth backgrounds).

Semantics follow :mod:`inflatox_tpu.background` (same RKF45 tableau, same
accept/step-control constants, row 0 = initial state with H from the
Friedmann constraint).  One deliberate divergence: a row is given at most
``_MAX_ATTEMPTS`` embedded attempts (dt shrinks up to 10× per reject —
eight decades of headroom); if none is accepted the state carries over
unchanged and the next row retries from the shrunken dt.  The while-loop
solver would keep iterating inside the row instead; on smooth backgrounds
the paths are identical (tests assert row-for-row agreement).

Trajectory-block layout: lanes×sublanes = (8, 128) = 1024 trajectories per
grid step along the batch axis; output rows stream in chunks of
``_ROW_CHUNK`` along a sequential ("arbitrary") grid axis with the solver
state carried in VMEM scratch between chunks.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..background import _DT_INIT, _RKF_A, _RKF_B4, _RKF_B5

__all__ = ["solve_eom_batch_pallas"]

_SUB, _LANES = 8, 128
_TRAJ_BLOCK = _SUB * _LANES  # 1024 trajectories per grid step
_ROW_CHUNK = 64              # output rows per sequential grid step
_MAX_ATTEMPTS = 8
#: default kernel-shape knobs (see _launch_solver).  Folded to what the
#: launch shape supports; per-lane results are bit-identical across them.
#: Round-5 defaults from the hardware sweep (scripts/probe_r5_solver.py,
#: amortized K-chain): block_mult=2 + fused_out at row_unroll=2 measured
#: 10.8-11.6 ms vs 12.7-13.2 ms for the round-4 shape at cfg5d — wider
#: blocks amortize the sequential row loop's per-iteration cost, the fused
#: ref turns 12 single-row dynamic stores into one; bm=4 exceeds the 16 MB
#: scoped-VMEM limit.
_BLOCK_MULT = 2
_FUSED_OUT = True
#: scoped-VMEM budget for the double-buffered fused output block; beyond it
#: Mosaic refuses to compile (measured: bm4 fused = 24.3 MB > 16 MB limit)
_FUSED_VMEM_BUDGET = 13 << 20


def _fold_bm(n_traj_blocks, block_mult=None, n_words=None,
             fused=None):
    """The block_mult actually used for a launch: the largest value ≤ the
    knob that divides ``n_traj_blocks`` AND (for the fused layout, whose
    output block grows with field count) keeps the double-buffered output
    block inside the scoped-VMEM budget — mirrored by _launch_solver."""
    bm = max(1, int(_BLOCK_MULT if block_mult is None else block_mult))
    fused = _FUSED_OUT if fused is None else fused

    def fits(b):
        if not fused or n_words is None:
            return True
        blk = _ROW_CHUNK * n_words * b * _SUB * _LANES * 4
        return 2 * blk <= _FUSED_VMEM_BUDGET

    while bm > 1 and (n_traj_blocks % bm or not fits(bm)):
        bm -= 1
    return bm


def _fused_fits(n_words) -> bool:
    """Whether the fused single-ref layout fits VMEM at all (bm = 1) for
    this field count; very wide states fall back to separate refs."""
    return 2 * _ROW_CHUNK * n_words * _SUB * _LANES * 4 <= _FUSED_VMEM_BUDGET


def _resolved_layout(n_traj_blocks, nf):
    """(block_mult, fused_out, S, n_words) the default-knob launch will
    actually use — callers that reshape the outputs must agree with
    _launch_solver on this."""
    n_words = 2 * (2 * nf + 2)
    fused = _FUSED_OUT and _fused_fits(n_words)
    bm = _fold_bm(n_traj_blocks, None, n_words=n_words, fused=fused)
    return bm, fused, bm * _SUB, n_words


def _deriv(fns, y, args, nf):
    """RHS over the DF state y = [φ_0..φ_{n-1}, χ_0..χ_{n-1}, H]."""
    x = tuple(y[:nf])
    chi = tuple(y[nf:2 * nf])
    h = y[2 * nf]
    eoms = fns["eom"](x, chi, args)
    acc = [-(eoms[a]) - h * chi[a] * 3.0 for a in range(nf)]
    hdot = fns["eom_hdot"](x, chi, args)
    return [*chi, *acc, hdot]


def _rkf_attempt(fns, y, dt_f32, args, nf):
    """One embedded RKF45 step over DF state; returns (y5, err_f32).

    ``dt·k_n`` is formed once per stage and reused by every later stage row
    and the 5th-order sum; the embedded error is the defect
    ``Σ (b5−b4)·dt·k`` accumulated in DF (the defect is ~1e-10 of its
    terms — an f32 accumulation is pure cancellation noise, measured to
    collapse dt to the floor; DF resolves it to ~1e-4 relative, ample for
    step control) — this replaces the full 4th-order DF state chain."""
    from ..lowering.df32 import DF  # noqa: PLC0415

    ns = 2 * nf + 1
    dt = DF(dt_f32)
    dks = []
    for n in range(6):
        yn = y
        for mm in range(n):
            a = float(_RKF_A[n, mm])
            if a != 0.0:
                yn = [yn[c] + dks[mm][c] * a for c in range(ns)]
        k = _deriv(fns, yn, args, nf)
        dks.append([dt * k[c] for c in range(ns)])
    hi = list(y)
    for n in range(6):
        b5 = float(_RKF_B5[n])
        if b5 != 0.0:
            hi = [hi[c] + dks[n][c] * b5 for c in range(ns)]
    err2 = jnp.zeros_like(dt_f32)
    for c in range(ns):
        d = None
        for n in range(6):
            db = float(_RKF_B5[n] - _RKF_B4[n])
            if db != 0.0:
                term = dks[n][c] * db
                d = term if d is None else d + term
        err2 = err2 + d.hi * d.hi
    return hi, jnp.sqrt(err2)


def _controller(dt, err, max_err):
    """Step-size factor matching background.py's while-loop body: q =
    clip((max_err/err)^(1/7), 0.1, 5), growth cap on zero error, shrink on
    non-finite error."""
    tiny = np.float32(1e-30)
    ratio = jnp.log(np.float32(max_err) / jnp.maximum(err, tiny))
    q = jnp.exp(ratio * np.float32(1.0 / 7.0))
    q = jnp.clip(q, np.float32(0.1), np.float32(5.0))
    q = jnp.where(err > 0, q, np.float32(5.0))
    q = jnp.where(jnp.isfinite(err), q, np.float32(0.1))
    return dt * q


def _pack(dfs, tail):
    """Flatten [DF, ...] + tail into a while/fori carry tuple."""
    flat = []
    for v in dfs:
        flat += [v.hi, v.lo]
    return (*flat, *tail)


def _solver_kernel(scal_ref, *refs, model=None, n_params=None, steps=None,
                   n_chunks=None, max_err=None, per_traj=False, nf=2,
                   row_unroll=1, fused_out=False):
    """refs = 4·nf init planes [+ 2·n_params per-trajectory parameter planes
    when ``per_traj``], then the output planes — 2·(2nf+2) separate refs
    ((state comps + t) × hi/lo), or ONE fused ref with all 2·(2nf+2)
    component words stacked along sublanes when ``fused_out`` — then
    2·(2nf+1)+3 scratch planes (state × hi/lo + t hi/lo + dt).
    ``nf`` = number of fields; the state is [φ_a..., χ_a..., H]."""
    from ..lowering.df32 import DF  # noqa: PLC0415

    ns = 2 * nf + 1
    n_init = 4 * nf
    n_par_planes = 2 * n_params if per_traj else 0
    n_out = 1 if fused_out else 2 * (ns + 1)
    in_refs = refs[:n_init]
    par_refs = refs[n_init:n_init + n_par_planes]
    out_refs = refs[n_init + n_par_planes:
                    n_init + n_par_planes + n_out]
    scr = refs[n_init + n_par_planes + n_out:]
    # NB: literal python ints trace as i64 under x64, which Mosaic
    # cannot legalize — keep index arithmetic in explicit i32
    rc = pl.program_id(1)

    if per_traj:
        # per-lane (hi, lo) parameter planes — DF arithmetic is
        # elementwise, so plane-valued args broadcast against the state
        args = tuple(
            DF(par_refs[2 * t][...], par_refs[2 * t + 1][...])
            for t in range(n_params)
        )
    else:
        args = tuple(
            DF(scal_ref[2 * t], scal_ref[2 * t + 1])
            for t in range(n_params)
        )
    fns = model.solver_df32_fns()

    # ---- load state (or initialize on the first row chunk) --------------- #
    xs = [DF(in_refs[2 * a][...], in_refs[2 * a + 1][...])
          for a in range(nf)]
    chis = [DF(in_refs[2 * (nf + a)][...], in_refs[2 * (nf + a) + 1][...])
            for a in range(nf)]
    h0 = fns["eom_h"](tuple(xs), tuple(chis), args)
    first = rc == jnp.int32(0)

    def pick(init_df, hi_ref, lo_ref):
        return DF(
            jnp.where(first, init_df.hi, hi_ref[...]),
            jnp.where(first, init_df.lo, lo_ref[...]),
        )

    y = [
        pick(v, scr[2 * k], scr[2 * k + 1])
        for k, v in enumerate([*xs, *chis, h0])
    ]
    t = DF(
        jnp.where(first, np.float32(0.0), scr[2 * ns][...]),
        jnp.where(first, np.float32(0.0), scr[2 * ns + 1][...]),
    )
    dt = jnp.where(first, np.float32(_DT_INIT), scr[2 * ns + 2][...])

    def unpack_state(flat):
        """carry tail = (..., th, tl, dt) after 2·ns state words."""
        ys = [DF(flat[2 * k], flat[2 * k + 1]) for k in range(ns)]
        return ys, DF(flat[2 * ns], flat[2 * ns + 1]), flat[2 * ns + 2]

    # ---- row loop -------------------------------------------------------- #
    def row_body(local, carry):
        y_, t_, dt_ = unpack_state(carry)
        grow = rc * jnp.int32(_ROW_CHUNK) + local  # global row index
        # row 0 records the initial state; rows >= steps are _ROW_CHUNK
        # padding that _combine_outputs slices away — don't burn adaptive
        # attempts (possibly on a diverging state) producing them
        stepping = (grow > jnp.int32(0)) & (grow < jnp.int32(steps))

        # masked adaptive attempts with an all-lanes-accepted early exit:
        # every update below is already masked to not-yet-accepted lanes, so
        # once the whole (8, 128) block has accepted, further attempts are
        # pure no-ops — the while_loop skips them (the unrolled form paid
        # all _MAX_ATTEMPTS every row; smooth backgrounds accept on the
        # first try, so this is a multi-x throughput lever, bit-identical)
        # (the accepted mask is carried as an f32 plane — a bool any-reduce
        # lowers through an f64 scalar conversion Mosaic rejects)
        def att_cond(carry):
            it = carry[0]
            acc_f = carry[1]
            return ((it < jnp.int32(_MAX_ATTEMPTS))
                    & stepping
                    & (jnp.min(acc_f) < np.float32(0.5)))

        def att_body(carry):
            it, acc_f = carry[0], carry[1]
            ya, ta, adt = unpack_state(carry[2:])
            accepted = acc_f > np.float32(0.5)
            cand, err = _rkf_attempt(fns, ya, adt, args, nf)
            # NB: background.py's _DT_FLOOR (1e-250) underflows to 0.0 in
            # f32, which would make this force-accept dead and let a
            # stalled lane freeze at dt = 0 forever — use the smallest
            # f32-representable positive floor instead
            ok = jnp.logical_or(
                err / np.float32(max_err) <= np.float32(1.1),
                adt <= np.float32(1e-30),
            )
            take = ok & jnp.logical_not(accepted)

            def sel(old, new):
                return DF(jnp.where(take, new.hi, old.hi),
                          jnp.where(take, new.lo, old.lo))

            ya = [sel(o, n_) for o, n_ in zip(ya, cand)]
            ta = sel(ta, ta + DF(adt))
            adt = jnp.where(
                jnp.logical_not(accepted),
                _controller(adt, err, max_err),
                adt,
            )
            acc_f = jnp.where(ok, np.float32(1.0), acc_f)
            return (it + jnp.int32(1), acc_f,
                    *_pack([*ya, ta], (adt,)))

        att0 = (jnp.int32(0), jnp.zeros_like(dt_),
                *_pack([*y_, t_], (dt_,)))
        out_att = lax.while_loop(att_cond, att_body, att0)
        y_, t_, dt_ = unpack_state(out_att[2:])

        # this row's output (hi, lo planes per component + time)
        vals = [*y_, t_]
        if fused_out:
            # one (2·(ns+1)·S, L) sublane-stacked row — stored by the
            # caller, either per row or as a staged multi-row slab (the
            # round-4 ablation measured the 12 separate single-row dynamic
            # stores as part of the row-loop floor)
            row = jnp.concatenate(
                [w for v in vals for w in (v.hi, v.lo)], axis=0)
            return _pack([*y_, t_], (dt_,)), row
        for k, v in enumerate(vals):
            out_refs[2 * k][pl.ds(local, 1), :, :] = v.hi[None]
            out_refs[2 * k + 1][pl.ds(local, 1), :, :] = v.lo[None]
        return _pack([*y_, t_], (dt_,)), None

    carry0 = _pack([*y, t], (dt,))
    # i32 bounds: python-int bounds make the loop counter i64 under
    # x64, which Mosaic cannot legalize (which also rules out
    # ``fori_loop(unroll=)`` — it requires static bounds).  Manual
    # unrolling instead amortizes part of the per-iteration loop cost the
    # round-4 ablation probe measured as ~78% of the kernel's runtime
    # (scripts/probe_r4_solver.py: the write_only floor was 56 of 72 ms —
    # the row loop + its 12 per-row stores, not bandwidth or DF flops,
    # bound the solver).  Measured sweet spot is unroll=2 (~+10%,
    # probe_r4_unroll.py); deeper unrolls regress on register pressure.
    # Outputs are bit-identical across unroll factors.  When the requested
    # factor does not divide the row chunk (e.g. tests shrink _ROW_CHUNK to
    # an odd value), fold it to the largest divisor instead of crashing —
    # unroll is a pure loop-shape knob.
    row_unroll = math.gcd(int(row_unroll), int(_ROW_CHUNK)) or 1

    def unrolled_body(j, carry):
        base = j * jnp.int32(row_unroll)
        if fused_out:
            # staged multi-row store: accumulate the unrolled rows and
            # write them as ONE dynamic-slice slab — with the fused output
            # ref this folds row_unroll × 12 single-row stores into a
            # single (row_unroll, C, L) store per unrolled group
            rows = []
            for u in range(row_unroll):
                carry, row = row_body(base + jnp.int32(u), carry)
                rows.append(row)
            slab = (rows[0][None] if row_unroll == 1
                    else jnp.stack(rows, axis=0))
            out_refs[0][pl.ds(base, row_unroll), :, :] = slab
        else:
            for u in range(row_unroll):
                carry, _ = row_body(base + jnp.int32(u), carry)
        return carry

    out = lax.fori_loop(jnp.int32(0), jnp.int32(_ROW_CHUNK // row_unroll),
                        unrolled_body, carry0)

    # ---- save state for the next chunk ----------------------------------- #
    for i in range(2 * ns + 3):
        scr[i][...] = out[i]


@functools.partial(
    jax.jit,
    static_argnames=("model", "steps", "n_traj_blocks", "interpret",
                     "max_err", "per_traj", "row_unroll", "block_mult",
                     "fused_out"),
)
def _launch_solver(scalars, init_planes, model, steps, n_traj_blocks,
                   interpret, max_err, per_traj=False, row_unroll=2,
                   block_mult=None, fused_out=None):
    """``block_mult`` fuses that many (8, 128) trajectory blocks into one
    kernel instance (amortizing the sequential row loop's per-iteration
    cost over block_mult× trajectories; folded to a divisor of
    ``n_traj_blocks`` that fits VMEM); ``fused_out`` stacks all 2·(ns+1)
    output words along sublanes in ONE ref so each row (or unrolled row
    group) costs a single dynamic store.  ``None`` knobs take the
    measured module defaults.  Per-lane results are bit-identical across
    both knobs (all update logic is lane-masked)."""
    nf = model.n_fields
    ns = 2 * nf + 1
    n_chunks = -(-steps // _ROW_CHUNK)
    rows_pad = n_chunks * _ROW_CHUNK
    n_words = 2 * (ns + 1)
    fused_out = _FUSED_OUT if fused_out is None else fused_out
    fused_out = fused_out and _fused_fits(n_words)
    bm = _fold_bm(n_traj_blocks, block_mult, n_words=n_words,
                  fused=fused_out)
    S = bm * _SUB
    grid = (n_traj_blocks // bm, n_chunks)
    kernel = functools.partial(
        _solver_kernel, model=model, n_params=model.n_parameters,
        steps=steps, n_chunks=n_chunks, max_err=float(max_err),
        per_traj=per_traj, nf=nf, row_unroll=row_unroll,
        fused_out=fused_out,
    )
    n_in = 4 * nf + (2 * model.n_parameters if per_traj else 0)
    in_specs = [
        pl.BlockSpec((S, _LANES), lambda b, rc, *_: (b, b * 0))
        for _ in range(n_in)
    ]
    if fused_out:
        out_specs = (
            pl.BlockSpec((_ROW_CHUNK, n_words * S, _LANES),
                         lambda b, rc, *_: (rc, b, b * 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct(
                (rows_pad, (n_traj_blocks // bm) * n_words * S, _LANES),
                jnp.float32),
        )
    else:
        out_specs = tuple(
            pl.BlockSpec((_ROW_CHUNK, S, _LANES),
                         lambda b, rc, *_: (rc, b, b * 0))
            for _ in range(n_words)
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct((rows_pad, n_traj_blocks * _SUB, _LANES),
                                 jnp.float32)
            for _ in range(n_words)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((S, _LANES), jnp.float32)] * (2 * ns + 3)
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(scalars, *init_planes)


def _split_fused(out, ns, S):
    """Fused-output array → list of 2·(ns+1) per-word arrays with the SAME
    (rows, B_padded, lanes) layout the separate-ref path produces (the
    sublane-stacking order is word-major inside each grid block)."""
    n_words = 2 * (ns + 1)
    rows, total, lanes = out.shape
    a = out.reshape(rows, total // (n_words * S), n_words, S, lanes)
    return [a[:, :, w].reshape(rows, -1, lanes) for w in range(n_words)]


def _split_planes(v, n_blocks):
    """(Bp,) f64 → ((n_blocks·_SUB, _LANES) hi, lo) f32 planes."""
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    shape = (n_blocks * _SUB, _LANES)
    return hi.reshape(shape), lo.reshape(shape)


def _build_planes(fields_init, derivs_init, pars, per_traj, nf, n_blocks):
    """Initial-condition (and per-trajectory parameter) columns → (hi, lo)
    DF plane pairs, batch padded to ``n_blocks`` whole trajectory blocks by
    repeating the last row.  Shared with the mesh-sharded launcher
    (parallel/solve.py) so the plane layout has one owner."""
    bp = n_blocks * _TRAJ_BLOCK
    pad = bp - fields_init.shape[0]

    def padded(col):
        col = np.asarray(col, dtype=np.float64)
        if pad:
            col = np.concatenate([col, np.repeat(col[-1:], pad)])
        return col

    cols = [fields_init[:, a] for a in range(nf)]
    cols += [derivs_init[:, a] for a in range(nf)]
    if per_traj:
        cols += [pars[:, t] for t in range(pars.shape[1])]
    planes = []
    for c in cols:
        hi, lo = _split_planes(padded(c), n_blocks)
        planes.extend([jnp.asarray(hi), jnp.asarray(lo)])

    # parameter scalars as exact (hi, lo) pairs (unused when per_traj —
    # the kernel reads the parameter planes instead)
    pairs = []
    if not per_traj:
        for v in pars:
            h = float(np.float32(v))
            pairs.extend([h, float(v) - h])
    scalars = jnp.asarray(pairs + [0.0], dtype=jnp.float32)  # pad ≥1
    return scalars, planes


def _combine_outputs(outs, nf, steps, B, return_time):
    """Kernel output pair planes → (B, steps, 2n+1) rows [+ (B, steps) t]:
    the (hi, lo) pairs ARE TPU-f64 information content — combining during
    the host fetch is exact IEEE f64 (docs/numerics.md §3)."""
    ns = 2 * nf + 1
    comps = []
    for k in range(ns + 1):
        # single buffered pass: f32 planes promote to f64 inside the ufunc
        # (exact; avoids two materialized f64 temporaries per component)
        v = np.add(np.asarray(outs[2 * k]), np.asarray(outs[2 * k + 1]),
                   dtype=np.float64)
        v = v.reshape(v.shape[0], -1)[: steps, : B]  # rows, traj
        comps.append(v.T)  # (B, steps)
    rows = np.stack(comps[:ns], axis=2)
    if return_time:
        return rows, comps[ns]
    return rows


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _combine_outputs_device(outs, nf, steps, B):
    """Device-resident variant of :func:`_combine_outputs` for pipelines
    that reduce the trajectories on device (e.g.
    :func:`~inflatox_tpu.background.survey_initial_conditions`) — the
    (B, steps) maps never cross the tunnel.  Each (hi, lo) f32 pair sums
    exactly into the TPU's double-word f64 (|lo| ≤ ulp(hi)/2, so the pair
    IS the result's representation)."""
    ns = 2 * nf + 1
    comps = []
    for k in range(ns + 1):
        v = (outs[2 * k].astype(jnp.float64)
             + outs[2 * k + 1].astype(jnp.float64))
        v = v.reshape(v.shape[0], -1)[: steps, : B]
        comps.append(v.T)
    return jnp.stack(comps[:ns], axis=2), comps[ns]


def solve_eom_batch_pallas(
    artifact,
    pars,
    steps: int,
    fields_init,
    derivatives_init,
    max_err: float = 1e-6,
    return_time: bool = False,
    interpret: bool | None = None,
    combine: str = "host",
):
    """Batched RKF45 background solves on the Pallas DF engine (any field
    count — the state [φ_a..., χ_a..., H] rides 2n+1 DF plane pairs).
    ``pars`` is (k,) (shared) or (B, k) (per-trajectory — the
    parameters ride (8, 128) DF planes alongside the state, so a parameter
    sweep of background evolutions is one kernel launch).  Same output
    contract as :func:`inflatox_tpu.background.solve_eom_batch`:
    (B, steps, 2n+1) [+ (B, steps) times].

    ``combine="device"`` keeps the combined rows on device (jnp arrays,
    always with times) for pipelines that reduce there — the off-TPU
    fallback returns the while-loop solver's host arrays, which feed the
    same jitted reductions."""
    from ..utils.errors import ShapeError  # noqa: PLC0415

    fields_init = np.asarray(fields_init, dtype=float)
    derivs_init = np.asarray(derivatives_init, dtype=float)
    pars = np.asarray(pars, dtype=float)
    nf = artifact.n_fields
    if fields_init.ndim != 2 or fields_init.shape[1] != nf:
        raise ShapeError((-1, nf), fields_init.shape,
                         "batched initial conditions must be (B, n_fields)")
    if derivs_init.shape != fields_init.shape:
        raise ShapeError(fields_init.shape, derivs_init.shape,
                         "derivatives_init must match fields_init (B, n_fields)")
    per_traj = pars.ndim == 2
    if per_traj and pars.shape != (fields_init.shape[0],
                                   artifact.n_parameters):
        raise ShapeError(
            (fields_init.shape[0], artifact.n_parameters), pars.shape,
            "per-trajectory parameters must be (B, n_parameters)",
        )
    if not per_traj and pars.shape != (artifact.n_parameters,):
        raise ShapeError(
            (artifact.n_parameters,), pars.shape,
            "shared parameters must be (n_parameters,)",
        )
    B = fields_init.shape[0]
    n_blocks = -(-B // _TRAJ_BLOCK)
    scalars, planes = _build_planes(fields_init, derivs_init, pars,
                                    per_traj, nf, n_blocks)

    on_tpu = jax.default_backend() == "tpu"
    if interpret is None and not on_tpu:
        # the Pallas interpreter destroys compensated arithmetic (see
        # pallas_kernels._df64_eager) — run the while-loop solver instead;
        # an EXPLICIT interpret=True still runs the interpreter (plumbing
        # tests, reduced accuracy)
        from .. import background  # noqa: PLC0415

        return background.solve_eom_batch(
            artifact, pars, steps, fields_init, derivs_init,
            max_err=max_err, solver="rkf",
            return_time=return_time or combine == "device",
        )
    if interpret is None:
        interpret = False

    outs = _launch_solver(scalars, tuple(planes), artifact, int(steps),
                          n_blocks, bool(interpret), float(max_err),
                          per_traj=per_traj)
    ns = 2 * nf + 1
    _, fused, S, _ = _resolved_layout(n_blocks, nf)
    if fused:
        if combine == "device":
            outs = tuple(_split_fused(outs[0], ns, S))
        else:
            # ONE host fetch for the whole fused array, then numpy views
            outs = _split_fused(np.asarray(outs[0]), ns, S)
    if combine == "device":
        return _combine_outputs_device(tuple(outs), nf, int(steps), int(B))
    return _combine_outputs(outs, nf, steps, B, return_time)
