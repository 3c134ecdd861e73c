"""Fused Pallas TPU kernel for the complete-analysis grid scan.

This is the hand-scheduled counterpart of the XLA-fused scan in
consistency_conditions.py — SURVEY.md §7.2 step 6.  One kernel launch
computes all six analysis quantities tile-by-tile:

* the grid is blocked (TILE_M, TILE_N); each program instance derives its
  field-space coordinates from ``program_id`` + ``broadcasted_iota`` — the
  kernel reads **zero** tensor input from HBM;
* model parameters and grid geometry ride in as scalar-prefetch operands
  (SMEM), available before the body runs;
* all six outputs are written once per tile: the scan is a pure
  write-bandwidth workload, the theoretical floor for this computation.

Precision: Mosaic/TPU has no f64.  Four kernel families exist:

* the **fp32 fast path** (`scan_pallas`, ``dtype=jnp.float32``),
* the **double-f32 parity path** (`scan_pallas_df64`): compensated
  float-float arithmetic (lowering/df32.py) with f64 outputs — ~1e-13
  relative, ~3.5× the fp32 kernel cost, ~7× faster than XLA's emulated f64
  (BENCH_MATRIX.json has the measured matrix),
* the **range-extended path** (`scan_pallas_edf64`): df32 mantissa + a
  per-element int32 exponent (lowering/edf32.py) — the only TPU engine for
  models whose intermediates leave the f32 dynamic range (even XLA's
  emulated f64 has f32 range), and
* the **extended-precision path** (`scan_pallas_tf64`): triple-f32
  (~71-bit) model evaluation + df32 analysis tail (lowering/tf32.py) — for
  cancellation-heavy models where every 48-bit format, and the reference's
  own f64, loses 7-8 digits (docs/numerics.md §8).

On non-TPU backends the fp32 kernels run in interpreter mode (tests); the
df32 path falls back to eager evaluation instead — the interpreter evaluates
with excess precision, which silently destroys compensated error terms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .anguelova import (
    complete_analysis_op,
    consistency_only_op,
    consistency_rapidturn_only_op,
    epsilon_v_only_op,
)

__all__ = [
    "complete_analysis_pallas",
    "complete_analysis_pallas_df64",
    "scan_pallas",
    "scan_pallas_df64",
    "scan_pallas_edf64",
    "scan_pallas_tf64",
]


def _core_f32(kind):
    """(n_outputs, fn(model, xs, args) -> tuple) for the f32 kernels."""
    if kind == "complete_analysis":

        def run(model, xs, args):
            v = model.potential(xs, args)
            v00, _, v10, v11 = model.hesse_tuple(xs, args)
            gs = model.grad_square(xs, args)
            return complete_analysis_op(v, v00, v10, v11, gs)

        return 6, run
    if kind == "consistency":

        def run(model, xs, args):
            v = model.potential(xs, args)
            v00, _, v10, v11 = model.hesse_tuple(xs, args)
            return (consistency_only_op(v, v00, v10, v11),)

        return 1, run
    if kind == "consistency_rapidturn":

        def run(model, xs, args):
            v = model.potential(xs, args)
            v00, _, v10, v11 = model.hesse_tuple(xs, args)
            return (consistency_rapidturn_only_op(v, v00, v10, v11),)

        return 1, run
    if kind == "epsilon_v":

        def run(model, xs, args):
            v = model.potential(xs, args)
            gs = model.grad_square(xs, args)
            return (epsilon_v_only_op(v, gs),)

        return 1, run
    if kind == "potential":

        def run(model, xs, args):
            return (model.potential(xs, args),)

        return 1, run
    if kind == "hesse":

        def run(model, xs, args):
            return tuple(model.hesse_tuple(xs, args))

        return 4, run
    if kind == "gradient":

        def run(model, xs, args):
            return tuple(model._grad(xs, args))

        return 2, run
    raise ValueError(f"unknown scan kind {kind!r}")


def _with_special_memo(run):
    """Wrap a core's point-evaluation pass in a df32_special call-memo scope:
    duplicate special-function calls (same function, order, argument
    objects) across V/Hesse/|∇V|² then trace ONCE per pass — without this,
    fractional-Bessel kernels multiply their Miller/CF2 chains per call site
    and Mosaic compile time explodes (measured >1 h; seconds with the memo +
    source-level CSE)."""
    import functools as _ft

    from ..lowering.df32_special import special_call_memo

    @_ft.wraps(run)
    def wrapped(*a, **k):
        with special_call_memo():
            return run(*a, **k)

    return wrapped


def _core_df(kind):
    """(n_outputs, fn(df_fns, xs, args) -> tuple of DF) for the df32 path."""
    from .anguelova import (  # noqa: PLC0415
        complete_analysis_op_df,
        consistency_only_op_df,
        consistency_rapidturn_only_op_df,
        epsilon_v_only_op_df,
    )

    if kind == "complete_analysis":

        def run(fns, xs, args):
            v = fns["potential"](xs, args)
            v00, _, v10, v11 = fns["hesse"](xs, args)
            gs = fns["grad_square"](xs, args)
            return complete_analysis_op_df(v, v00, v10, v11, gs)

        return 6, _with_special_memo(run)
    if kind == "consistency":

        def run(fns, xs, args):
            v = fns["potential"](xs, args)
            v00, _, v10, v11 = fns["hesse"](xs, args)
            return (consistency_only_op_df(v, v00, v10, v11),)

        return 1, _with_special_memo(run)
    if kind == "consistency_rapidturn":

        def run(fns, xs, args):
            v = fns["potential"](xs, args)
            v00, _, v10, v11 = fns["hesse"](xs, args)
            return (consistency_rapidturn_only_op_df(v, v00, v10, v11),)

        return 1, _with_special_memo(run)
    if kind == "epsilon_v":

        def run(fns, xs, args):
            v = fns["potential"](xs, args)
            gs = fns["grad_square"](xs, args)
            return (epsilon_v_only_op_df(v, gs),)

        return 1, _with_special_memo(run)
    if kind == "potential":

        def run(fns, xs, args):
            return (fns["potential"](xs, args),)

        return 1, _with_special_memo(run)
    if kind == "hesse":

        def run(fns, xs, args):
            return tuple(fns["hesse"](xs, args))

        return 4, _with_special_memo(run)
    if kind == "gradient":

        def run(fns, xs, args):
            return tuple(fns["grad"](xs, args))

        return 2, _with_special_memo(run)
    raise ValueError(f"unknown scan kind {kind!r}")


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _core_df_stream(kind, nm=None):
    """(n_outputs, fn(fns, xs, args, emit)) — like :func:`_core_df` but
    emitting each output as soon as it is complete (register-liveness
    control inside the Mosaic kernel; see
    anguelova.complete_analysis_op_df_stream)."""
    from .anguelova import complete_analysis_op_df_stream  # noqa: PLC0415

    if kind == "complete_analysis":

        def run(fns, xs, args, emit):
            v = fns["potential"](xs, args)
            v00, _, v10, v11 = fns["hesse"](xs, args)
            gs = fns["grad_square"](xs, args)
            complete_analysis_op_df_stream(v, v00, v10, v11, gs, emit, nm=nm)

        return 6, _with_special_memo(run)

    n_out, core = (_core_df if nm is None else _core_edf)(kind)

    def run(fns, xs, args, emit):
        for k, val in enumerate(core(fns, xs, args)):
            emit(k, val)

    return n_out, run


def _kernel(scal_ref, *out_refs, model=None, tile=None, n_params=None, kind=None):
    tm, tn = tile
    i = pl.program_id(0)
    j = pl.program_id(1)
    dtype = out_refs[0].dtype
    # geometry scalars live after the parameters in the prefetch vector
    x0a = scal_ref[n_params + 0]
    dx0 = scal_ref[n_params + 1]
    x1a = scal_ref[n_params + 2]
    dx1 = scal_ref[n_params + 3]
    # Mosaic's iota is integer-only; cast after
    rows = lax.broadcasted_iota(jnp.int32, (tm, tn), 0).astype(dtype)
    cols = lax.broadcasted_iota(jnp.int32, (tm, tn), 1).astype(dtype)
    x0 = x0a + (i.astype(dtype) * tm + rows) * dx0
    x1 = x1a + (j.astype(dtype) * tn + cols) * dx1

    _, core = _core_f32(kind)
    outs = core(model, (x0, x1), tuple(scal_ref[t] for t in range(n_params)))
    for ref, val in zip(out_refs, outs):
        ref[:, :] = val.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("model", "shape", "tile", "interpret", "dtype", "kind"),
)
def _launch(scalars, model, shape, tile, interpret, dtype, kind):
    tm, tn = tile
    n_out, _ = _core_f32(kind)
    n0p, n1p = _ceil_to(shape[0], tm), _ceil_to(shape[1], tn)
    grid = (n0p // tm, n1p // tn)
    out_shape = tuple(
        jax.ShapeDtypeStruct((n0p, n1p), dtype) for _ in range(n_out)
    )
    kernel = functools.partial(
        _kernel, model=model, tile=(tm, tn), n_params=model.n_parameters,
        kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=tuple(
            # index_map also receives the scalar-prefetch ref — ignore it
            pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
            for _ in range(n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars)
    return tuple(o[: shape[0], : shape[1]] for o in outs)


#: Compute-strip width inside the df kernels.  The output BLOCK (``tile``)
#: sets DMA granularity; the computation runs strip-by-strip over it so the
#: live double-f32 intermediates fit the VPU register file.  Measured round
#: 2 (hyperinflation 4096²): monolithic (8,512) tiles 6.0 ms vs (8,1024)
#: blocks in 256-wide strips 4.4 ms — the whole analysis tail held ~25 DF
#: values live and Mosaic spilled.
_DF_STRIP = 256

#: Lowered-source size above which the narrower 128-lane strip is used: big
#: models hold more live intermediates per strip, and at 256 lanes they
#: spill again (angular 1024²: strip 256 = 1.84 ms vs strip 128 = 0.61 ms,
#: while tiny-model hyperinflation prefers 256: 4.4 ms vs 5.1 ms at 4096²).
_DF_STRIP_NARROW_SRC = 2000


def _model_src_chars(model) -> int:
    try:
        return sum(
            len(f.source)
            for f in (model.potential, model._hesse, model.grad_square)
        )
    except Exception:
        return 0


#: estimated trace weight above which the df kernels drop to a single
#: compute strip per pallas block (tile = (tm, strip)): the kernel body
#: traces the whole point pass once PER STRIP, so a fractional-Bessel model
#: (~120k jaxpr eqns per pass) in an 8-strip block explodes to ~1M eqns and
#: Mosaic never finishes.  One strip per block trades DMA granularity —
#: irrelevant for such compute-bound kernels — for a bounded trace.
_ONE_STRIP_WEIGHT = 60_000


def _model_trace_weight(model) -> int:
    """Crude jaxpr-size estimate of the SPECIAL-FUNCTION expansion only
    (integer orders unroll fixed series ~500 eqns; fractional orders unroll
    Miller/CF2 chains ~8000 eqns).  Raw source size is deliberately
    excluded: large-but-special-free models (angular, D5) compile fine
    multi-strip and LOSE runtime under the one-strip clamp (measured: the
    angular df64 scan slowed 2× when chars counted toward the clamp)."""
    import re  # noqa: PLC0415

    w = 0
    try:
        srcs = (model.potential.source, model._hesse.source,
                model.grad_square.source)
    except Exception:
        return w
    # the round-4 hypergeometric/error/gamma family unrolls 60-420-term
    # compensated series per distinct call (df32_special.py:831-1253) —
    # leaving them uncounted let a 1F1+2F1+erf+gamma model trace its
    # chains once per 128-wide strip at a 1024-wide tile, blowing a
    # ~4-minute build out past 25 minutes (round-5 cfg4b incident)
    # per-chain jaxpr sizes: the 2F1 series runs 700 compensated
    # iterations (~10 DF ops each), 1F1 420 — heavier than a Miller chain
    _HYP_WEIGHTS = {
        "hyp1f1": 8000, "hyp2f1": 12000, "hyp2f0": 1500, "hyp0f1": 800,
        "erf": 1000, "erfc": 1000, "gamma": 1500, "lgamma": 1500,
        "digamma": 2000, "trigamma": 2000, "polygamma": 2500,
    }
    seen_frac = set()
    for src in srcs:
        for m in re.finditer(r"_special\.(\w+)\(\s*([^,)]+)[,)]", src):
            hw = _HYP_WEIGHTS.get(m.group(1))
            if hw is not None:
                # per OCCURRENCE: the call memo only dedups identical DF
                # argument objects, so distinct call sites (the Hesse's
                # derivative arguments) each trace their own chain
                w += hw
                continue
            first = m.group(2).strip()
            try:
                from fractions import Fraction  # noqa: PLC0415

                v = float(Fraction(first))
                frac = v != int(v)
            except (ValueError, ZeroDivisionError):
                frac = False
            if frac:
                # distinct orders cost their chains (the trace-scoped call
                # memo dedups repeats); negative-J and Y orders carry the
                # double-reflection (≈3 Miller chains), I is series-only
                name = m.group(1)
                key = (name, first)
                if key in seen_frac:
                    w += 200
                else:
                    seen_frac.add(key)
                    if name == "besseli":
                        w += 1500
                    elif name == "bessely" or (name == "besselj" and v < 0):
                        w += 24000
                    else:
                        w += 8000
            else:
                w += 500
    return w


def _kernel_df(scal_ref, *out_refs, model=None, tile=None, strip=None,
               n_params=None, kind=None):
    """Double-f32 kernel body: every value is a DF pair; outputs are written
    as (hi, lo) pairs per quantity and recombined to f64 outside the kernel.
    The block is processed in ``strip``-wide column strips (register
    liveness control — see :data:`_DF_STRIP`)."""
    from ..lowering.df32 import DF  # noqa: PLC0415

    tm, tn = tile
    i = pl.program_id(0)
    j = pl.program_id(1)

    def scal_df(t):
        return DF(scal_ref[2 * t], scal_ref[2 * t + 1])

    args = tuple(scal_df(t) for t in range(n_params))
    x0a = scal_df(n_params + 0)
    dx0 = scal_df(n_params + 1)
    x1a = scal_df(n_params + 2)
    dx1 = scal_df(n_params + 3)

    _, core = _core_df_stream(kind)
    fns = model.df32_fns()
    for c in range(tn // strip):
        rows = lax.broadcasted_iota(jnp.int32, (tm, strip), 0).astype(jnp.float32)
        cols = lax.broadcasted_iota(jnp.int32, (tm, strip), 1).astype(jnp.float32)
        # global indices ≤ a few 10⁵: exact in f32
        gi = DF(i.astype(jnp.float32) * float(tm) + rows)
        gj = DF(j.astype(jnp.float32) * float(tn) + float(c * strip) + cols)
        x0 = x0a + gi * dx0
        x1 = x1a + gj * dx1
        sl = slice(c * strip, (c + 1) * strip)

        def emit(k, val, _sl=sl):
            out_refs[2 * k][:, _sl] = val.hi
            out_refs[2 * k + 1][:, _sl] = val.lo

        core(fns, (x0, x1), args, emit)


def _auto_tile(shape, model=None) -> tuple:
    """Default DMA-block shape for the df64 2-D scan launchers.

    Measured round 3 (scripts/probe_r3_tilesweep*.py, amortized K-loop on
    hardware): 16-row blocks beat the round-2 8-row default at equal width
    — hyperinflation 4096² 4.94 → 4.79 ms ((16, 2048): 4.66 ms), angular
    1024² 0.76 → 0.51 ms, EGNO 2048² 3.47 → 3.05 ms — and the widest of
    (2048 … 128) that minimizes column padding wins on wide grids.  The
    compute strip (see :func:`_pick_strip`) is unchanged; a wider/taller
    block only changes DMA granularity and how many strips one kernel
    invocation traces.  Big models (the narrow-strip class,
    :data:`_DF_STRIP_NARROW_SRC`) cap the width at 1024: the kernel body
    traces the whole point pass once per strip, so a 2048-wide block
    doubles their already-minutes-scale Mosaic build for no measured
    runtime win.

    Rows pad to the block height, so 16-row blocks are only taken when
    their extra row padding over 8-row blocks stays under ~6% of the
    grid (the measured 16-row win is 3-33% depending on the model);
    short or odd row counts — 24-row grids, 4-row sharded blocks —
    fall back to 8-row blocks rather than paying up to 2× padded rows."""
    n0, n1 = shape
    pad16 = _ceil_to(n0, 16) - n0
    pad8 = _ceil_to(n0, 8) - n0
    tm = 16 if pad16 - pad8 <= n0 // 16 else 8
    widths = (2048, 1024, 512, 256, 128)
    if model is not None and _model_src_chars(model) > _DF_STRIP_NARROW_SRC:
        widths = (1024, 512, 256, 128)
    best = None
    tile_n = 128
    for tn in widths:
        padded = -(-n1 // tn) * tn
        cand = (padded, -tn)
        if best is None or cand < best:
            best, tile_n = cand, tn
    return (tm, tile_n)


def _pick_strip(tn: int, strip, model=None) -> int:
    if strip is not None:
        strip = int(strip)
        if tn % strip != 0:
            raise ValueError(
                f"strip ({strip}) must divide the tile's lane width ({tn}) "
                "— a non-dividing strip would leave remainder columns of "
                "every output block unwritten"
            )
        return strip
    want = _DF_STRIP
    if model is not None and _model_src_chars(model) > _DF_STRIP_NARROW_SRC:
        want = 128
    if tn <= want:
        return tn
    for s in (want, 128):
        if tn % s == 0:
            return s
    return tn


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "shape", "tile", "interpret", "kind", "strip", "combine",
    ),
)
def _launch_df(scalars, model, shape, tile, interpret, kind, strip=None,
               combine=True):
    tm, tn = tile
    strip = _pick_strip(tn, strip, model)
    if tn > strip and _model_trace_weight(model) > _ONE_STRIP_WEIGHT:
        tn = strip  # one compute strip per block (see _ONE_STRIP_WEIGHT)
    n_out, _ = _core_df(kind)
    n0p, n1p = _ceil_to(shape[0], tm), _ceil_to(shape[1], tn)
    grid = (n0p // tm, n1p // tn)
    out_shape = tuple(
        jax.ShapeDtypeStruct((n0p, n1p), jnp.float32) for _ in range(2 * n_out)
    )
    kernel = functools.partial(
        _kernel_df, model=model, tile=(tm, tn), strip=strip,
        n_params=model.n_parameters, kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=tuple(
            pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
            for _ in range(2 * n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars)
    if not combine:
        # raw (hi, lo) planes — callers that keep results on-device (or
        # benchmark the kernel itself) skip the pair→f64 materialization pass
        return tuple(o[: shape[0], : shape[1]] for o in outs)
    combined = []
    for k in range(n_out):
        hi = outs[2 * k][: shape[0], : shape[1]]
        lo = outs[2 * k + 1][: shape[0], : shape[1]]
        combined.append(hi.astype(jnp.float64) + lo.astype(jnp.float64))
    return tuple(combined)


def _kernel_df_batch(scal_ref, *out_refs, model=None, tile=None, strip=None,
                     n_params=None, kind=None):
    """Batched df32 kernel: leading grid dimension indexes the parameter
    set — ``scal_ref`` is (S, n_scalars) and each program instance reads its
    own row.  Used by ``parameter_sweep`` so a whole batch of parameter sets
    runs in ONE kernel launch (BASELINE config 5)."""
    from ..lowering.df32 import DF  # noqa: PLC0415

    tm, tn = tile
    s = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    def scal_df(t):
        return DF(scal_ref[s, 2 * t], scal_ref[s, 2 * t + 1])

    args = tuple(scal_df(t) for t in range(n_params))
    x0a = scal_df(n_params + 0)
    dx0 = scal_df(n_params + 1)
    x1a = scal_df(n_params + 2)
    dx1 = scal_df(n_params + 3)

    _, core = _core_df_stream(kind)
    fns = model.df32_fns()
    for c in range(tn // strip):
        rows = lax.broadcasted_iota(jnp.int32, (tm, strip), 0).astype(jnp.float32)
        cols = lax.broadcasted_iota(jnp.int32, (tm, strip), 1).astype(jnp.float32)
        gi = DF(i.astype(jnp.float32) * float(tm) + rows)
        gj = DF(j.astype(jnp.float32) * float(tn) + float(c * strip) + cols)
        x0 = x0a + gi * dx0
        x1 = x1a + gj * dx1
        sl = slice(c * strip, (c + 1) * strip)

        def emit(k, val, _sl=sl):
            out_refs[2 * k][0, :, _sl] = val.hi
            out_refs[2 * k + 1][0, :, _sl] = val.lo

        core(fns, (x0, x1), args, emit)


@functools.partial(
    jax.jit, static_argnames=("model", "shape", "tile", "interpret", "kind")
)
def _launch_df_batch(scalars, model, shape, tile, interpret, kind):
    """Batched df32 launch: ``scalars`` is (S, n_scalars); returns a tuple of
    (S, N0, N1) f64 arrays."""
    S = scalars.shape[0]
    tm, tn = tile
    _w_strip = _pick_strip(tn, None, model)
    if tn > _w_strip and _model_trace_weight(model) > _ONE_STRIP_WEIGHT:
        tn = _w_strip
    n_out, _ = _core_df(kind)
    n0p, n1p = _ceil_to(shape[0], tm), _ceil_to(shape[1], tn)
    grid = (S, n0p // tm, n1p // tn)
    out_shape = tuple(
        jax.ShapeDtypeStruct((S, n0p, n1p), jnp.float32)
        for _ in range(2 * n_out)
    )
    kernel = functools.partial(
        _kernel_df_batch, model=model, tile=(tm, tn),
        strip=_pick_strip(tn, None, model), n_params=model.n_parameters, kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=tuple(
            pl.BlockSpec((1, tm, tn), lambda s, i, j, *_: (s, i, j))
            for _ in range(2 * n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars)
    combined = []
    for k in range(n_out):
        hi = outs[2 * k][:, : shape[0], : shape[1]]
        lo = outs[2 * k + 1][:, : shape[0], : shape[1]]
        combined.append(hi.astype(jnp.float64) + lo.astype(jnp.float64))
    return tuple(combined)


def _kernel_f32_batch(scal_ref, *out_refs, model=None, tile=None,
                      n_params=None, kind=None):
    """Batched fp32 kernel (see :func:`_kernel_df_batch`)."""
    tm, tn = tile
    s = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dtype = out_refs[0].dtype
    x0a = scal_ref[s, n_params + 0]
    dx0 = scal_ref[s, n_params + 1]
    x1a = scal_ref[s, n_params + 2]
    dx1 = scal_ref[s, n_params + 3]
    rows = lax.broadcasted_iota(jnp.int32, (tm, tn), 0).astype(dtype)
    cols = lax.broadcasted_iota(jnp.int32, (tm, tn), 1).astype(dtype)
    x0 = x0a + (i.astype(dtype) * tm + rows) * dx0
    x1 = x1a + (j.astype(dtype) * tn + cols) * dx1
    _, core = _core_f32(kind)
    outs = core(model, (x0, x1), tuple(scal_ref[s, t] for t in range(n_params)))
    for ref, val in zip(out_refs, outs):
        ref[0, :, :] = val.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("model", "shape", "tile", "interpret", "dtype", "kind"),
)
def _launch_f32_batch(scalars, model, shape, tile, interpret, dtype, kind):
    S = scalars.shape[0]
    tm, tn = tile
    n_out, _ = _core_f32(kind)
    n0p, n1p = _ceil_to(shape[0], tm), _ceil_to(shape[1], tn)
    grid = (S, n0p // tm, n1p // tn)
    out_shape = tuple(
        jax.ShapeDtypeStruct((S, n0p, n1p), dtype) for _ in range(n_out)
    )
    kernel = functools.partial(
        _kernel_f32_batch, model=model, tile=(tm, tn),
        n_params=model.n_parameters, kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=tuple(
            pl.BlockSpec((1, tm, tn), lambda s, i, j, *_: (s, i, j))
            for _ in range(n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars)
    return tuple(o[:, : shape[0], : shape[1]] for o in outs)


def _kernel_edf_batch(scal_ref, *out_refs, model=None, tile=None, strip=None,
                      n_params=None, kind=None):
    """Batched range-extended kernel (see :func:`_kernel_df_batch`)."""
    from ..lowering.df32 import DF  # noqa: PLC0415
    from ..lowering.edf32 import EDF  # noqa: PLC0415

    tm, tn = tile
    s = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    def scal_edf(t):
        return EDF(
            scal_ref[s, 3 * t],
            scal_ref[s, 3 * t + 1],
            scal_ref[s, 3 * t + 2].astype(jnp.int32),
            _raw=True,
        )

    args = tuple(scal_edf(t) for t in range(n_params))
    x0a = scal_edf(n_params + 0)
    dx0 = scal_edf(n_params + 1)
    x1a = scal_edf(n_params + 2)
    dx1 = scal_edf(n_params + 3)
    from ..lowering import edf32 as enm  # noqa: PLC0415

    _, core = _core_df_stream(kind, nm=enm)
    fns = model.edf_fns()
    for c in range(tn // strip):
        rows = lax.broadcasted_iota(jnp.int32, (tm, strip), 0).astype(jnp.float32)
        cols = lax.broadcasted_iota(jnp.int32, (tm, strip), 1).astype(jnp.float32)
        gi = EDF.from_df(DF(i.astype(jnp.float32) * float(tm) + rows))
        gj = EDF.from_df(
            DF(j.astype(jnp.float32) * float(tn) + float(c * strip) + cols)
        )
        x0 = x0a + gi * dx0
        x1 = x1a + gj * dx1
        sl = slice(c * strip, (c + 1) * strip)

        def emit(k, val, _sl=sl):
            d = val.to_df()
            out_refs[2 * k][0, :, _sl] = d.hi
            out_refs[2 * k + 1][0, :, _sl] = d.lo

        core(fns, (x0, x1), args, emit)


@functools.partial(
    jax.jit, static_argnames=("model", "shape", "tile", "interpret", "kind")
)
def _launch_edf_batch(scalars, model, shape, tile, interpret, kind):
    S = scalars.shape[0]
    tm, tn = tile
    _w_strip = _pick_strip(tn, None, model)
    if tn > _w_strip and _model_trace_weight(model) > _ONE_STRIP_WEIGHT:
        tn = _w_strip
    n_out, _ = _core_edf(kind)
    n0p, n1p = _ceil_to(shape[0], tm), _ceil_to(shape[1], tn)
    grid = (S, n0p // tm, n1p // tn)
    out_shape = tuple(
        jax.ShapeDtypeStruct((S, n0p, n1p), jnp.float32)
        for _ in range(2 * n_out)
    )
    kernel = functools.partial(
        _kernel_edf_batch, model=model, tile=(tm, tn),
        strip=_pick_strip(tn, None, model), n_params=model.n_parameters, kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=tuple(
            pl.BlockSpec((1, tm, tn), lambda s, i, j, *_: (s, i, j))
            for _ in range(2 * n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars)
    combined = []
    for k in range(n_out):
        hi = outs[2 * k][:, : shape[0], : shape[1]]
        lo = outs[2 * k + 1][:, : shape[0], : shape[1]]
        combined.append(hi.astype(jnp.float64) + lo.astype(jnp.float64))
    return tuple(combined)


def _core_edf(kind):
    """(n_outputs, fn(edf_fns, xs, args) -> tuple of EDF) for the
    range-extended engine — same condition math as :func:`_core_df` with the
    edf32 numerics module."""
    from ..lowering import edf32 as enm  # noqa: PLC0415

    from .anguelova import (  # noqa: PLC0415
        complete_analysis_op_df,
        consistency_only_op_df,
        consistency_rapidturn_only_op_df,
        epsilon_v_only_op_df,
    )

    if kind == "complete_analysis":

        def run(fns, xs, args):
            v = fns["potential"](xs, args)
            v00, _, v10, v11 = fns["hesse"](xs, args)
            gs = fns["grad_square"](xs, args)
            return complete_analysis_op_df(v, v00, v10, v11, gs, nm=enm)

        return 6, _with_special_memo(run)
    if kind == "consistency":

        def run(fns, xs, args):
            v = fns["potential"](xs, args)
            v00, _, v10, v11 = fns["hesse"](xs, args)
            return (consistency_only_op_df(v, v00, v10, v11, nm=enm),)

        return 1, _with_special_memo(run)
    if kind == "consistency_rapidturn":

        def run(fns, xs, args):
            v = fns["potential"](xs, args)
            v00, _, v10, v11 = fns["hesse"](xs, args)
            return (consistency_rapidturn_only_op_df(v, v00, v10, v11, nm=enm),)

        return 1, _with_special_memo(run)
    if kind == "epsilon_v":

        def run(fns, xs, args):
            v = fns["potential"](xs, args)
            gs = fns["grad_square"](xs, args)
            return (epsilon_v_only_op_df(v, gs, nm=enm),)

        return 1, _with_special_memo(run)
    if kind == "potential":

        def run(fns, xs, args):
            return (fns["potential"](xs, args),)

        return 1, _with_special_memo(run)
    if kind == "hesse":

        def run(fns, xs, args):
            return tuple(fns["hesse"](xs, args))

        return 4, _with_special_memo(run)
    if kind == "gradient":

        def run(fns, xs, args):
            return tuple(fns["grad"](xs, args))

        return 2, _with_special_memo(run)
    raise ValueError(f"unknown scan kind {kind!r}")


def _kernel_edf(scal_ref, *out_refs, model=None, tile=None, strip=None,
                n_params=None, kind=None):
    """Range-extended kernel body: scalars ride in as (hi, lo, e) triples;
    the model evaluates in EDF; final outputs are materialized to df32
    pairs (the analysis quantities are O(1) physics — in f32 range even
    when the model's internals are not) and recombined to f64 outside.
    Strip-mined like :func:`_kernel_df` (EDF liveness is 1.5× DF's)."""
    from ..lowering import edf32 as enm  # noqa: PLC0415
    from ..lowering.df32 import DF  # noqa: PLC0415
    from ..lowering.edf32 import EDF  # noqa: PLC0415

    tm, tn = tile
    i = pl.program_id(0)
    j = pl.program_id(1)

    def scal_edf(t):
        return EDF(
            scal_ref[3 * t],
            scal_ref[3 * t + 1],
            scal_ref[3 * t + 2].astype(jnp.int32),
            _raw=True,
        )

    args = tuple(scal_edf(t) for t in range(n_params))
    x0a = scal_edf(n_params + 0)
    dx0 = scal_edf(n_params + 1)
    x1a = scal_edf(n_params + 2)
    dx1 = scal_edf(n_params + 3)

    _, core = _core_df_stream(kind, nm=enm)
    fns = model.edf_fns()
    for c in range(tn // strip):
        rows = lax.broadcasted_iota(jnp.int32, (tm, strip), 0).astype(jnp.float32)
        cols = lax.broadcasted_iota(jnp.int32, (tm, strip), 1).astype(jnp.float32)
        gi = EDF.from_df(DF(i.astype(jnp.float32) * float(tm) + rows))
        gj = EDF.from_df(
            DF(j.astype(jnp.float32) * float(tn) + float(c * strip) + cols)
        )
        x0 = x0a + gi * dx0
        x1 = x1a + gj * dx1
        sl = slice(c * strip, (c + 1) * strip)

        def emit(k, val, _sl=sl):
            d = val.to_df()
            out_refs[2 * k][:, _sl] = d.hi
            out_refs[2 * k + 1][:, _sl] = d.lo

        core(fns, (x0, x1), args, emit)


@functools.partial(
    jax.jit,
    static_argnames=("model", "shape", "tile", "interpret", "kind", "combine"),
)
def _launch_edf(scalars, model, shape, tile, interpret, kind, combine=True):
    tm, tn = tile
    _w_strip = _pick_strip(tn, None, model)
    if tn > _w_strip and _model_trace_weight(model) > _ONE_STRIP_WEIGHT:
        tn = _w_strip
    n_out, _ = _core_edf(kind)
    n0p, n1p = _ceil_to(shape[0], tm), _ceil_to(shape[1], tn)
    grid = (n0p // tm, n1p // tn)
    out_shape = tuple(
        jax.ShapeDtypeStruct((n0p, n1p), jnp.float32) for _ in range(2 * n_out)
    )
    kernel = functools.partial(
        _kernel_edf, model=model, tile=(tm, tn),
        strip=_pick_strip(tn, None, model), n_params=model.n_parameters,
        kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=tuple(
            pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
            for _ in range(2 * n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars)
    if not combine:
        return tuple(o[: shape[0], : shape[1]] for o in outs)
    combined = []
    for k in range(n_out):
        hi = outs[2 * k][: shape[0], : shape[1]]
        lo = outs[2 * k + 1][: shape[0], : shape[1]]
        combined.append(hi.astype(jnp.float64) + lo.astype(jnp.float64))
    return tuple(combined)


def _edf_eager(scalars, model, shape, kind="complete_analysis"):
    """Eager (op-by-op) EDF evaluation: the non-TPU fallback, for the same
    EFT-preservation reason as :func:`_df64_eager`."""
    from ..lowering.df32 import DF  # noqa: PLC0415
    from ..lowering.edf32 import EDF  # noqa: PLC0415

    n_params = model.n_parameters

    def scal_edf(t):
        return EDF(
            scalars[3 * t],
            scalars[3 * t + 1],
            scalars[3 * t + 2].astype(jnp.int32),
            _raw=True,
        )

    args = tuple(scal_edf(t) for t in range(n_params))
    x0a, dx0 = scal_edf(n_params + 0), scal_edf(n_params + 1)
    x1a, dx1 = scal_edf(n_params + 2), scal_edf(n_params + 3)
    rows = lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    x0 = x0a + EDF.from_df(DF(rows)) * dx0
    x1 = x1a + EDF.from_df(DF(cols)) * dx1
    _, core = _core_edf(kind)
    outs = core(model.edf_fns(), (x0, x1), args)
    return tuple(o.to_df().to_f64() for o in outs)


def _edf_scalars(args, extent, shape):
    """(hi, lo, e) f32 triples for parameters + grid geometry — exact for
    any f64 magnitude (frexp first; an f32 cast of 1e300 would overflow)."""
    import math as _math

    x0a, x0b, x1a, x1b = (float(v) for v in extent)
    n0, n1 = shape
    vals = [float(v) for v in args] + [
        x0a,
        (x0b - x0a) / n0,
        x1a,
        (x1b - x1a) / n1,
    ]
    import numpy as _np

    triples = []
    for v in vals:
        m, ee = _math.frexp(v)
        hi = float(_np.float32(m))
        triples.extend([hi, m - hi, float(ee)])
    return jnp.asarray(triples, dtype=jnp.float32)


def scan_pallas_edf64(
    artifact,
    kind,
    args,
    extent,
    shape,
    tile=None,  # None → _auto_tile(shape, artifact); D5 1024² measured
    # (16, 1024) 4.38 ms vs (8, 1024) 4.59 ms (probe_r3_tilesweep3.py)
    interpret: bool | None = None,
    output: str = "f64",
):
    """Any grid scan kind on the range-extended double-f32 engine (f64
    outputs).  Use for models whose expression intermediates leave the f32
    dynamic range (D5-class): both the df32 engine and TPU's emulated f64
    NaN out there; this engine carries the magnitude in a per-element
    exponent (lowering/edf32.py).  Kinds and ``output`` semantics as in
    :func:`scan_pallas_df64` ("f64" = host-combined numpy, the single-pass
    delivery; "pair"; "f64_device")."""
    if output not in ("f64", "pair", "f64_device"):
        raise ValueError(
            f"output must be 'f64', 'pair' or 'f64_device', got {output!r}"
        )
    scalars = _edf_scalars(args, extent, shape)
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None and not on_tpu:
        outs = _edf_eager(scalars, artifact, tuple(shape), kind)
        if output == "pair":
            return tuple(
                (o.astype(jnp.float32),
                 (o - o.astype(jnp.float32).astype(jnp.float64)).astype(jnp.float32))
                for o in outs
            )
        if output == "f64":
            import numpy as _np  # noqa: PLC0415

            return tuple(_np.asarray(o) for o in outs)
        return outs
    tile = _auto_tile(shape, artifact) if tile is None else tuple(tile)
    outs = _launch_edf(
        scalars, artifact, tuple(shape), tile, bool(interpret or False),
        kind, combine=(output == "f64_device"),
    )
    if output == "pair":
        return tuple((outs[2 * k], outs[2 * k + 1]) for k in range(len(outs) // 2))
    if output == "f64":
        return _host_combine_pairs(outs)
    return outs


# ---------------------------------------------------------------------- #
# on-trajectory kernels: the same point ops over a user-supplied (n, 2)  #
# trajectory (anguelova.rs:633-977) — 1-D tiling reshaped to TPU-native  #
# (rows, 128) blocks                                                     #
# ---------------------------------------------------------------------- #

_OT_LANES = 128
_OT_ROWS = 32  # block = (32, 128) f32


def _traj_pad_2d(col):
    """(n,) f64 column → ((R, 128) hi, lo f32 arrays, n_pad) padded with 1.0
    (a benign value — padded outputs are sliced away)."""
    import numpy as _np

    n = col.shape[0]
    npad = _ceil_to(max(n, 1), _OT_ROWS * _OT_LANES)
    full = _np.full(npad, 1.0, dtype=_np.float64)
    full[:n] = col
    hi = full.astype(_np.float32)
    lo = (full - hi.astype(_np.float64)).astype(_np.float32)
    R = npad // _OT_LANES
    return hi.reshape(R, _OT_LANES), lo.reshape(R, _OT_LANES), npad


def _kernel_df_ot(scal_ref, x0h, x0l, x1h, x1l, *out_refs, model=None,
                  n_params=None, kind=None):
    from ..lowering.df32 import DF  # noqa: PLC0415

    def scal_df(t):
        return DF(scal_ref[2 * t], scal_ref[2 * t + 1])

    args = tuple(scal_df(t) for t in range(n_params))
    x0 = DF(x0h[:, :], x0l[:, :])
    x1 = DF(x1h[:, :], x1l[:, :])

    def emit(k, val):
        out_refs[2 * k][:, :] = val.hi
        out_refs[2 * k + 1][:, :] = val.lo

    _, core = _core_df_stream(kind)
    core(model.df32_fns(), (x0, x1), args, emit)


def _kernel_edf_ot(scal_ref, x0h, x0l, x1h, x1l, *out_refs, model=None,
                   n_params=None, kind=None):
    from ..lowering.df32 import DF  # noqa: PLC0415
    from ..lowering.edf32 import EDF  # noqa: PLC0415

    def scal_edf(t):
        return EDF(
            scal_ref[3 * t],
            scal_ref[3 * t + 1],
            scal_ref[3 * t + 2].astype(jnp.int32),
            _raw=True,
        )

    args = tuple(scal_edf(t) for t in range(n_params))
    x0 = EDF.from_df(DF(x0h[:, :], x0l[:, :]))
    x1 = EDF.from_df(DF(x1h[:, :], x1l[:, :]))
    from ..lowering import edf32 as enm  # noqa: PLC0415

    def emit(k, val):
        d = val.to_df()
        out_refs[2 * k][:, :] = d.hi
        out_refs[2 * k + 1][:, :] = d.lo

    _, core = _core_df_stream(kind, nm=enm)
    core(model.edf_fns(), (x0, x1), args, emit)


def _kernel_tf_ot(scal_ref, x0h, x0l, x1h, x1l, *out_refs, model=None,
                  n_params=None, kind=None):
    from ..lowering.tf32 import TF  # noqa: PLC0415

    def scal_tf(t):
        return TF(scal_ref[3 * t], scal_ref[3 * t + 1], scal_ref[3 * t + 2])

    args = tuple(scal_tf(t) for t in range(n_params))
    # trajectory coordinates are f64 inputs: a (hi, lo) f32 pair carries the
    # full payload only to ~48 bits; the last ~5 bits of the f64 mantissa
    # are below every trajectory's own accuracy, so the pair is sufficient
    x0 = TF(x0h[:, :], x0l[:, :])
    x1 = TF(x1h[:, :], x1l[:, :])

    def emit(k, val):
        out_refs[2 * k][:, :] = val.hi
        out_refs[2 * k + 1][:, :] = val.lo

    _, core = _core_df_stream(kind)
    core(_tf_fns_as_df(model), (x0, x1), args, emit)


@functools.partial(
    jax.jit,
    static_argnames=("model", "R", "interpret", "kind", "engine"),
)
def _launch_ot(scalars, x0h, x0l, x1h, x1l, model, R, interpret, kind, engine):
    n_out, _ = _core_df(kind)
    grid = (R // _OT_ROWS,)
    # NB: index maps must not contain literal ints — under x64 a literal 0
    # traces as i64, which Mosaic cannot legalize; i*0 stays i32
    in_spec = pl.BlockSpec((_OT_ROWS, _OT_LANES), lambda i, *_: (i, i * 0))
    kern = {
        "pallas_edf64": _kernel_edf_ot,
        "pallas_tf64": _kernel_tf_ot,
    }.get(engine, _kernel_df_ot)
    kernel = functools.partial(
        kern, model=model, n_params=model.n_parameters, kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=tuple(
            pl.BlockSpec((_OT_ROWS, _OT_LANES), lambda i, *_: (i, i * 0))
            for _ in range(2 * n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, _OT_LANES), jnp.float32)
            for _ in range(2 * n_out)
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, x0h, x0l, x1h, x1l)
    return tuple(
        outs[2 * k].astype(jnp.float64) + outs[2 * k + 1].astype(jnp.float64)
        for k in range(n_out)
    )


def scan_pallas_ot(artifact, kind, args, x, engine="pallas_df64"):
    """On-trajectory scan on the compensated Pallas engines.

    ``x`` is the (n, 2) trajectory; ``kind`` is a grid-scan kind
    (complete_analysis / consistency / consistency_rapidturn / epsilon_v).
    Returns a tuple of (n,) f64 arrays.  Off-TPU this runs the EFT-safe
    eager fallback (see :func:`_df64_eager`)."""
    import numpy as _np

    from ..lowering.df32 import DF  # noqa: PLC0415
    from ..lowering.edf32 import EDF  # noqa: PLC0415

    x = _np.asarray(x, dtype=_np.float64)
    n = x.shape[0]
    on_tpu = jax.default_backend() == "tpu"

    if engine == "pallas_edf64":
        scalars = _edf_scalars(args, (0.0, 1.0, 0.0, 1.0), (1, 1))[: 3 * len(args)]
    elif engine == "pallas_tf64":
        scalars = _tf_scalars(args, (0.0, 1.0, 0.0, 1.0), (1, 1))[: 3 * len(args)]
    else:
        scalars = _df_scalars(args, (0.0, 1.0, 0.0, 1.0), (1, 1))[: 2 * len(args)]

    if not on_tpu:
        # eager fallback, coordinates fed as exact (hi, lo) pairs
        return _eager_points_eval(artifact, kind, scalars, len(args), x, engine)

    x0h, x0l, npad = _traj_pad_2d(x[:, 0])
    x1h, x1l, _ = _traj_pad_2d(x[:, 1])
    R = npad // _OT_LANES
    outs = _launch_ot(
        scalars,
        jnp.asarray(x0h), jnp.asarray(x0l), jnp.asarray(x1h), jnp.asarray(x1l),
        artifact, R, False, kind, engine,
    )
    return tuple(o.reshape(-1)[:n] for o in outs)


def _eager_points_eval(artifact, kind, scalars, n_args, x, engine):
    """Eager (op-by-op) engine evaluation at explicit (n, 2) f64 points.

    Shared by the OT scans' non-TPU fallback and ``eager_engine_probe`` —
    eager execution is the only EFT-safe path off-Mosaic (see
    :func:`_df64_eager`).  Returns a tuple of (n,) f64 arrays."""
    import numpy as _np

    from ..lowering.df32 import DF  # noqa: PLC0415
    from ..lowering.edf32 import EDF  # noqa: PLC0415

    x = _np.asarray(x, dtype=_np.float64)
    _, core = (_core_edf if engine == "pallas_edf64" else _core_df)(kind)
    cols = []
    for i in range(2):
        hi = x[:, i].astype(_np.float32)
        lo = (x[:, i] - hi.astype(_np.float64)).astype(_np.float32)
        d = DF(jnp.asarray(hi), jnp.asarray(lo))
        cols.append(EDF.from_df(d) if engine == "pallas_edf64" else d)
    if engine == "pallas_edf64":
        a = tuple(
            EDF(scalars[3 * t], scalars[3 * t + 1],
                scalars[3 * t + 2].astype(jnp.int32), _raw=True)
            for t in range(n_args)
        )
        fns = artifact.edf_fns()
        outs = core(fns, tuple(cols), a)
        return tuple(o.to_df().to_f64() for o in outs)
    if engine == "pallas_tf64":
        from ..lowering.tf32 import TF  # noqa: PLC0415

        a = tuple(
            TF(scalars[3 * t], scalars[3 * t + 1], scalars[3 * t + 2])
            for t in range(n_args)
        )
        outs = core(_tf_fns_as_df(artifact),
                    tuple(TF(c.hi, c.lo) for c in cols), a)
        return tuple(o.to_f64() for o in outs)
    a = tuple(
        DF(scalars[2 * t], scalars[2 * t + 1]) for t in range(n_args)
    )
    outs = core(artifact.df32_fns(), tuple(cols), a)
    return tuple(o.to_f64() for o in outs)


def eager_engine_probe(artifact, kind, args, pts, engine="pallas_df64"):
    """Minimum finite fraction over the outputs of ``engine`` evaluated
    eagerly on the host at sample points ``pts`` ((n, 2) float64).

    Engine auto-selection calls this to detect f32-dynamic-range overflow
    before committing to the df32 default (VERDICT r2: D5-class models
    silently NaN'd under ``engine=None``).  Eager op-by-op execution is
    EFT-safe, needs no Mosaic compile, and has the same overflow/NaN
    behavior as the compiled kernel; forcing the host CPU device keeps the
    per-op dispatch off the TPU tunnel (~30 ms/op there)."""
    import numpy as _np

    from ..lowering.special import suppress_domain_warnings  # noqa: PLC0415

    pts = _np.asarray(pts, dtype=_np.float64)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), suppress_domain_warnings():
        dummy_extent = (0.0, 1.0, 0.0, 1.0)
        if engine == "pallas_edf64":
            scalars = _edf_scalars(args, dummy_extent, (1, 1))[: 3 * len(args)]
        else:
            scalars = _df_scalars(args, dummy_extent, (1, 1))[: 2 * len(args)]
        outs = _eager_points_eval(
            artifact, kind, scalars, len(args), pts, engine
        )
        fracs = [
            float(jnp.mean(jnp.isfinite(o).astype(jnp.float32))) for o in outs
        ]
    return min(fracs) if fracs else 1.0


def _df64_eager(scalars, model, shape, kind="complete_analysis"):
    """Eager (op-by-op) df32 evaluation: the fallback for non-TPU backends.

    Neither the Pallas interpreter nor a fused XLA:CPU jit may be used for
    df32 — both evaluate with fast-math/excess-precision freedoms that
    silently destroy the compensated error terms (measured: results collapse
    to f32 accuracy).  Eager execution compiles each op separately, leaving
    no scope for cross-op reassociation; the compiled TPU Mosaic kernel is
    measured EFT-safe (tests + hardware runs)."""
    from ..lowering.df32 import DF  # noqa: PLC0415

    n_params = model.n_parameters

    def scal_df(t):
        return DF(scalars[2 * t], scalars[2 * t + 1])

    args = tuple(scal_df(t) for t in range(n_params))
    x0a, dx0 = scal_df(n_params + 0), scal_df(n_params + 1)
    x1a, dx1 = scal_df(n_params + 2), scal_df(n_params + 3)
    rows = lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    x0 = x0a + DF(rows) * dx0
    x1 = x1a + DF(cols) * dx1
    _, core = _core_df(kind)
    outs = core(model.df32_fns(), (x0, x1), args)
    return tuple(o.to_f64() for o in outs)


def _df_scalars(args, extent, shape):
    """Exact (hi, lo) f32 pairs for parameters + grid geometry."""
    import numpy as _np

    x0a, x0b, x1a, x1b = (float(v) for v in extent)
    n0, n1 = shape
    vals = [float(v) for v in args] + [
        x0a,
        (x0b - x0a) / n0,
        x1a,
        (x1b - x1a) / n1,
    ]
    pairs = []
    for v in vals:
        hi = float(_np.float32(v))
        pairs.extend([hi, v - hi])
    return jnp.asarray(pairs, dtype=jnp.float32)


def complete_analysis_pallas_df64(
    artifact,
    args,
    extent,
    shape,
    tile=None,  # None → _auto_tile(shape); compute is strip-mined inside
    # the kernel (see _DF_STRIP / _pick_strip) — round-2/3 measurements in
    # scripts/probe_r2_*.py and probe_r3_tilesweep*.py
    interpret: bool | None = None,
):
    """High-precision fused scan: double-f32 arithmetic internally
    (~1e-13 relative, see lowering/df32.py), f64 outputs.

    This is the TPU-native answer to the fp64 parity requirement: XLA's
    emulated f64 runs this scan ~2000× slower (docs/numerics.md); df32 in a
    Pallas kernel delivers parity-grade accuracy at near-f32 speed.  On
    non-TPU backends the same df32 computation runs under plain ``jax.jit``
    (never the Pallas interpreter — see :func:`_df64_xla`).
    """
    return scan_pallas_df64(
        artifact, "complete_analysis", args, extent, shape, tile=tile,
        interpret=interpret,
    )


def scan_pallas_df64(
    artifact,
    kind,
    args,
    extent,
    shape,
    tile=None,  # None → _auto_tile(shape) (16-row blocks, padding-min width)
    interpret: bool | None = None,
    output: str = "f64",
):
    """Any grid scan kind on the double-f32 engine.  Kinds:
    complete_analysis, consistency, consistency_rapidturn, epsilon_v,
    potential, hesse (the raw V/H_ab grid surfaces, 2-field).

    ``output`` selects the result format:

    * ``"f64"`` (default): per-quantity **numpy** float64 arrays — the
      drop-in parity format (the reference's only output format,
      anguelova.rs:527-539).  On TPU the (hi, lo) planes ride the
      device→host fetch and are combined on host into true IEEE f64:
      measured round 3, XLA:TPU's own f64 is a (hi, lo) f32 double-word
      (f32 dynamic range, 1e300 → inf; sub-2⁻⁴⁹ addends dropped), so an
      on-device pair→f64 "conversion" is a pointless repack of the same
      two words — it cost 2.8× the kernel in round 2.  The host combine
      is exact and the device cost of f64 delivery equals the kernel
      itself.
    * ``"pair"``: the kernel's native output — a tuple of ``(hi, lo)``
      f32-array pairs per quantity (value = hi + lo, |lo| ≤ ulp(hi)/2).
      Zero extra passes; ideal when results stay on-device (reductions,
      masking, follow-up kernels).  On TPU this carries bit-for-bit the
      same information as an XLA f64 array.
    * ``"f64_device"``: device-resident ``jnp`` float64 arrays (the
      emulated double-word format), materialized on device with an extra
      HBM pass — for pipelines that feed the maps into further on-device
      f64 math.
    """
    if output not in ("f64", "pair", "f64_device"):
        raise ValueError(
            f"output must be 'f64', 'pair' or 'f64_device', got {output!r}"
        )
    scalars = _df_scalars(args, extent, shape)
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None and not on_tpu:
        outs = _df64_eager(scalars, artifact, tuple(shape), kind)
        if output == "pair":
            return tuple(
                (o.astype(jnp.float32), (o - o.astype(jnp.float32).astype(jnp.float64)).astype(jnp.float32))
                for o in outs
            )
        if output == "f64":
            import numpy as _np  # noqa: PLC0415

            return tuple(_np.asarray(o) for o in outs)
        return outs
    tile = _auto_tile(shape, artifact) if tile is None else tuple(tile)
    outs = _launch_df(
        scalars, artifact, tuple(shape), tile, bool(interpret or False),
        kind, combine=(output == "f64_device"),
    )
    if output == "pair":
        return tuple((outs[2 * k], outs[2 * k + 1]) for k in range(len(outs) // 2))
    if output == "f64":
        return _host_combine_pairs(outs)
    return outs


def _host_combine_pairs(outs):
    """Fetch (hi, lo) f32 planes and combine on host into IEEE f64.

    This is the single-pass f64 delivery path (VERDICT r2 item 1): the
    fetch is mandatory for a numpy result anyway, and host ``hi + lo`` in
    true f64 is exact — strictly more accurate than the on-device emulated
    add, whose double-word format drops sub-2⁻⁴⁹ addends."""
    import numpy as _np  # noqa: PLC0415

    combined = []
    for k in range(len(outs) // 2):
        # one buffered pass: both f32 planes promote to f64 inside the
        # ufunc (exact, same result as materializing two f64 temporaries
        # first — measured ~14x faster on the 1-core host)
        combined.append(_np.add(_np.asarray(outs[2 * k]),
                                _np.asarray(outs[2 * k + 1]),
                                dtype=_np.float64))
    return tuple(combined)


def scan_pallas(
    artifact,
    kind,
    args,
    extent,
    shape,
    dtype=jnp.float32,
    tile=(8, 2048),  # measured round 2: 16.1 Gpts/s at 4096² vs 12.3 for
    # the round-1 (256, 256) default — wide shallow blocks stream better
    interpret: bool | None = None,
):
    """Any grid scan kind on the fp32 Pallas kernel.  Kinds as in
    :func:`scan_pallas_df64`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x0a, x0b, x1a, x1b = (float(v) for v in extent)
    n0, n1 = shape
    geom = [x0a, (x0b - x0a) / n0, x1a, (x1b - x1a) / n1]
    scalars = jnp.asarray(
        [float(v) for v in args] + geom, dtype=jnp.dtype(dtype)
    )
    return _launch(
        scalars, artifact, tuple(shape), tuple(tile), bool(interpret),
        jnp.dtype(dtype), kind,
    )


def complete_analysis_pallas(
    artifact,
    args,
    extent,
    shape,
    dtype=jnp.float32,
    tile=(8, 2048),
    interpret: bool | None = None,
):
    """Run the fused Pallas complete-analysis scan.

    Args
    ----
    artifact: a :class:`~inflatox_tpu.compiler.CompiledModel` (2-field).
    args: (n_parameters,) parameter values.
    extent: (x0_start, x0_stop, x1_start, x1_stop).
    shape: (N0, N1) grid size (padded internally to the tile size).
    dtype: computation/output dtype — float32 on TPU (no f64 in Mosaic).
    tile: (TILE_M, TILE_N) block shape; multiples of (8, 128) for f32.
    interpret: force interpreter mode; default auto (True off-TPU).

    Returns six (N0, N1) arrays in the complete_analysis order.
    """
    return scan_pallas(
        artifact, "complete_analysis", args, extent, shape, dtype=dtype,
        tile=tile, interpret=interpret,
    )

# ---------------------------------------------------------------------- #
# triple-f32 extended-precision engine (~71-bit model evaluation)        #
# ---------------------------------------------------------------------- #


def _tf_fns_as_df(model):
    """Model functions evaluated in triple-f32, demoted to DF for the
    analysis tail (the tail's conditioning is mild once its inputs are
    accurate — docs/numerics.md §8)."""
    tfns = model.tf_fns()

    def wrap(name):
        def f(xs, args):
            out = tfns[name](xs, args)
            if isinstance(out, tuple):
                return tuple(o.to_df() for o in out)
            return out.to_df()

        return f

    return {k: wrap(k) for k in ("potential", "hesse", "grad_square", "grad")}


def _tf_scalars(args, extent, shape):
    """Three exact f32 words per scalar (full f64 payloads + headroom)."""
    x0a, x0b, x1a, x1b = (float(v) for v in extent)
    n0, n1 = shape
    vals = [float(v) for v in args] + [
        x0a,
        (x0b - x0a) / n0,
        x1a,
        (x1b - x1a) / n1,
    ]
    import numpy as _np

    words = []
    for v in vals:
        w0 = float(_np.float32(v))
        r = v - w0
        w1 = float(_np.float32(r))
        w2 = float(_np.float32(r - w1))
        words.extend([w0, w1, w2])
    return jnp.asarray(words, dtype=jnp.float32)


def _kernel_tf(scal_ref, *out_refs, model=None, tile=None, strip=None,
               n_params=None, kind=None):
    """Triple-f32 kernel body: coordinates and model evaluation in TF,
    analysis tail in DF (strip-mined like :func:`_kernel_df`)."""
    from ..lowering.tf32 import TF  # noqa: PLC0415

    tm, tn = tile
    i = pl.program_id(0)
    j = pl.program_id(1)

    def scal_tf(t):
        return TF(scal_ref[3 * t], scal_ref[3 * t + 1], scal_ref[3 * t + 2])

    args = tuple(scal_tf(t) for t in range(n_params))
    x0a = scal_tf(n_params + 0)
    dx0 = scal_tf(n_params + 1)
    x1a = scal_tf(n_params + 2)
    dx1 = scal_tf(n_params + 3)

    _, core = _core_df_stream(kind)
    fns = _tf_fns_as_df(model)
    for c in range(tn // strip):
        rows = lax.broadcasted_iota(jnp.int32, (tm, strip), 0).astype(jnp.float32)
        cols = lax.broadcasted_iota(jnp.int32, (tm, strip), 1).astype(jnp.float32)
        gi = TF(i.astype(jnp.float32) * float(tm) + rows)
        gj = TF(j.astype(jnp.float32) * float(tn) + float(c * strip) + cols)
        x0 = x0a + gi * dx0
        x1 = x1a + gj * dx1
        sl = slice(c * strip, (c + 1) * strip)

        def emit(k, val, _sl=sl):
            out_refs[2 * k][:, _sl] = val.hi
            out_refs[2 * k + 1][:, _sl] = val.lo

        core(fns, (x0, x1), args, emit)


@functools.partial(
    jax.jit,
    static_argnames=("model", "shape", "tile", "interpret", "kind", "combine"),
)
def _launch_tf(scalars, model, shape, tile, interpret, kind, combine=True):
    tm, tn = tile
    _w_strip = _pick_strip(tn, None, model)
    if tn > _w_strip and _model_trace_weight(model) > _ONE_STRIP_WEIGHT:
        tn = _w_strip
    n_out, _ = _core_df(kind)
    n0p, n1p = _ceil_to(shape[0], tm), _ceil_to(shape[1], tn)
    grid = (n0p // tm, n1p // tn)
    out_shape = tuple(
        jax.ShapeDtypeStruct((n0p, n1p), jnp.float32) for _ in range(2 * n_out)
    )
    kernel = functools.partial(
        _kernel_tf, model=model, tile=(tm, tn),
        strip=_pick_strip(tn, None, model), n_params=model.n_parameters,
        kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=tuple(
            pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j))
            for _ in range(2 * n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars)
    if not combine:
        return tuple(o[: shape[0], : shape[1]] for o in outs)
    combined = []
    for k in range(n_out):
        hi = outs[2 * k][: shape[0], : shape[1]]
        lo = outs[2 * k + 1][: shape[0], : shape[1]]
        combined.append(hi.astype(jnp.float64) + lo.astype(jnp.float64))
    return tuple(combined)


def _tf_eager(scalars, model, shape, kind="complete_analysis"):
    """Eager TF fallback off-TPU (same EFT-preservation reasoning as
    :func:`_df64_eager`)."""
    from ..lowering.tf32 import TF  # noqa: PLC0415

    n_params = model.n_parameters

    def scal_tf(t):
        return TF(scalars[3 * t], scalars[3 * t + 1], scalars[3 * t + 2])

    args = tuple(scal_tf(t) for t in range(n_params))
    x0a, dx0 = scal_tf(n_params + 0), scal_tf(n_params + 1)
    x1a, dx1 = scal_tf(n_params + 2), scal_tf(n_params + 3)
    rows = lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    x0 = x0a + TF(rows) * dx0
    x1 = x1a + TF(cols) * dx1
    _, core = _core_df(kind)
    outs = core(_tf_fns_as_df(model), (x0, x1), args)
    return tuple(o.to_f64() for o in outs)


def scan_pallas_tf64(
    artifact,
    kind,
    args,
    extent,
    shape,
    tile=None,  # None → _auto_tile(shape, artifact); EGNO 2048² measured
    # (16, 1024) 15.2 ms vs the old (8, 512) 17.3 ms (probe_r3_tilesweep_tf)
    interpret: bool | None = None,
    output: str = "f64",
):
    """Any grid scan kind on the triple-f32 extended-precision engine:
    ~71-bit model evaluation + df32 analysis tail, f64 outputs.

    For cancellation-heavy models (EGNO-class): measured EGNO Hesse accuracy
    ~1e-13 vs 40-digit ground truth — ~400× beyond the reference's own f64
    evaluation (docs/numerics.md §8).  Costs ~3-5× the df32 engine; special
    functions are not available on this engine.  ``output`` semantics as
    in :func:`scan_pallas_df64`."""
    if output not in ("f64", "pair", "f64_device"):
        raise ValueError(
            f"output must be 'f64', 'pair' or 'f64_device', got {output!r}"
        )
    scalars = _tf_scalars(args, extent, shape)
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None and not on_tpu:
        outs = _tf_eager(scalars, artifact, tuple(shape), kind)
        if output == "pair":
            return tuple(
                (o.astype(jnp.float32),
                 (o - o.astype(jnp.float32).astype(jnp.float64)).astype(jnp.float32))
                for o in outs
            )
        if output == "f64":
            import numpy as _np  # noqa: PLC0415

            return tuple(_np.asarray(o) for o in outs)
        return outs
    tile = _auto_tile(shape, artifact) if tile is None else tuple(tile)
    outs = _launch_tf(
        scalars, artifact, tuple(shape), tile, bool(interpret or False),
        kind, combine=(output == "f64_device"),
    )
    if output == "pair":
        return tuple((outs[2 * k], outs[2 * k + 1]) for k in range(len(outs) // 2))
    if output == "f64":
        return _host_combine_pairs(outs)
    return outs

def _kernel_tf_batch(scal_ref, *out_refs, model=None, tile=None, strip=None,
                     n_params=None, kind=None):
    """Batched triple-f32 kernel (see :func:`_kernel_df_batch`)."""
    from ..lowering.tf32 import TF  # noqa: PLC0415

    tm, tn = tile
    sgrid = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    def scal_tf(t):
        return TF(scal_ref[sgrid, 3 * t], scal_ref[sgrid, 3 * t + 1],
                  scal_ref[sgrid, 3 * t + 2])

    args = tuple(scal_tf(t) for t in range(n_params))
    x0a = scal_tf(n_params + 0)
    dx0 = scal_tf(n_params + 1)
    x1a = scal_tf(n_params + 2)
    dx1 = scal_tf(n_params + 3)
    _, core = _core_df_stream(kind)
    fns = _tf_fns_as_df(model)
    for c in range(tn // strip):
        rows = lax.broadcasted_iota(jnp.int32, (tm, strip), 0).astype(jnp.float32)
        cols = lax.broadcasted_iota(jnp.int32, (tm, strip), 1).astype(jnp.float32)
        gi = TF(i.astype(jnp.float32) * float(tm) + rows)
        gj = TF(j.astype(jnp.float32) * float(tn) + float(c * strip) + cols)
        x0 = x0a + gi * dx0
        x1 = x1a + gj * dx1
        sl = slice(c * strip, (c + 1) * strip)

        def emit(k, val, _sl=sl):
            out_refs[2 * k][0, :, _sl] = val.hi
            out_refs[2 * k + 1][0, :, _sl] = val.lo

        core(fns, (x0, x1), args, emit)


@functools.partial(
    jax.jit, static_argnames=("model", "shape", "tile", "interpret", "kind")
)
def _launch_tf_batch(scalars, model, shape, tile, interpret, kind):
    """Batched tf32 launch: ``scalars`` is (S, n_scalars·3); returns a tuple
    of (S, N0, N1) f64 arrays."""
    S = scalars.shape[0]
    tm, tn = tile
    _w_strip = _pick_strip(tn, None, model)
    if tn > _w_strip and _model_trace_weight(model) > _ONE_STRIP_WEIGHT:
        tn = _w_strip
    n_out, _ = _core_df(kind)
    n0p, n1p = _ceil_to(shape[0], tm), _ceil_to(shape[1], tn)
    grid = (S, n0p // tm, n1p // tn)
    out_shape = tuple(
        jax.ShapeDtypeStruct((S, n0p, n1p), jnp.float32)
        for _ in range(2 * n_out)
    )
    kernel = functools.partial(
        _kernel_tf_batch, model=model, tile=(tm, tn),
        strip=_pick_strip(tn, None, model), n_params=model.n_parameters,
        kind=kind,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[],
        out_specs=tuple(
            pl.BlockSpec((1, tm, tn), lambda s, i, j, *_: (s, i, j))
            for _ in range(2 * n_out)
        ),
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars)
    combined = []
    for k in range(n_out):
        hi = outs[2 * k][:, : shape[0], : shape[1]]
        lo = outs[2 * k + 1][:, : shape[0], : shape[1]]
        combined.append(hi.astype(jnp.float64) + lo.astype(jnp.float64))
    return tuple(combined)

