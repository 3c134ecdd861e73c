"""Multi-chip grid scans and parameter sweeps.

The reference has no sweep machinery — users hand-loop over parameter sets,
each call scanning the grid on the CPU thread pool (SURVEY.md §2.3).  Here
sweeps are first-class:

* :func:`sharded_scan` — one parameter set, the field-space grid tiled
  across chips along mesh axis ``"grid"``.  Implemented with ``shard_map``:
  each chip computes its own coordinate window from its axis index; there is
  no input to shard and no collective — ICI is only touched if the caller
  reassembles the result.
* :func:`parameter_sweep` — a batch of parameter sets sharded along mesh
  axis ``"sweep"``; on the Pallas engines the whole per-device batch runs in
  ONE kernel launch (the parameter set is a third grid dimension);
  optionally checkpointed per chunk so pod-scale sweeps (BASELINE.json
  config 5: 10⁶ combos × 512² grid) can resume after preemption.

Engine semantics off-TPU: the compensated (df64/edf64) engines may only run
eagerly or in compiled TPU Mosaic — the Pallas interpreter and fused XLA:CPU
destroy the error-free transforms (ops/pallas_kernels._df64_eager).  The
sharded/swept df64 paths therefore compute shard contents EAGERLY on the
host when no TPU is present and device_put the result with the requested
sharding — bit-identical to the single-device eager engine, just not fast
(it is a test/CI path; the production target is the TPU mesh).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.anguelova import complete_analysis_op
from ..ops.grid import grid_coords
from ..utils.logging import Progress, log_warn

__all__ = ["sharded_scan", "parameter_sweep"]

_PALLAS_ENGINES = ("pallas", "pallas_df64", "pallas_edf64", "pallas_tf64")


def _analysis_fn(model, shape, dtype):
    """(args, extent) → stacked (6, *shape) complete-analysis outputs."""

    def run(args, flat_extent):
        pairs = [
            (flat_extent[2 * i], flat_extent[2 * i + 1]) for i in range(len(shape))
        ]
        xs = grid_coords(pairs, shape, dtype)
        v = model.potential(xs, args)
        v00, _, v10, v11 = model.hesse_tuple(xs, args)
        gs = model.grad_square(xs, args)
        return jnp.stack(complete_analysis_op(v, v00, v10, v11, gs))

    return run


def _scalars_for(engine, args, extent, shape, dtype):
    """Host-side scalar-prefetch row for one (args, extent) pair."""
    from ..ops.pallas_kernels import _df_scalars, _edf_scalars, _tf_scalars

    if engine == "pallas_df64":
        return np.asarray(_df_scalars(args, extent, shape))
    if engine == "pallas_edf64":
        return np.asarray(_edf_scalars(args, extent, shape))
    if engine == "pallas_tf64":
        return np.asarray(_tf_scalars(args, extent, shape))
    x0a, x0b, x1a, x1b = (float(v) for v in extent)
    geom = [x0a, (x0b - x0a) / shape[0], x1a, (x1b - x1a) / shape[1]]
    return np.asarray([float(v) for v in args] + geom, dtype=np.dtype(dtype))


def _eager_compensated(engine, scalars_row, model, shape, kind):
    """Run one shard's scan on the EFT-safe eager fallback (host)."""
    from ..ops.pallas_kernels import _df64_eager, _edf_eager, _tf_eager

    fn = {"pallas_edf64": _edf_eager, "pallas_tf64": _tf_eager}.get(
        engine, _df64_eager
    )
    return fn(jnp.asarray(scalars_row), model, shape, kind)


def sharded_scan(
    condition,
    args,
    extent,
    shape,
    mesh,
    grid_axis: str = "grid",
    dtype=jnp.float64,
    engine: str = "xla",
):
    """Complete analysis for one parameter set, grid tiled across ``mesh``.

    Each device owns a contiguous block of rows (first grid axis) and
    generates its own coordinates — zero bytes of input are communicated.

    ``engine``: "xla" (any dtype), "pallas" (fp32 kernel per shard),
    "pallas_df64" (double-f32 kernel, f64 outputs — the parity-grade pod
    path, BASELINE.md) or "pallas_edf64" (range-extended, D5-class models).

    Returns the assembled (6, N0, N1) array (sharded on device; converting
    to numpy gathers it).
    """
    model = condition.artifact
    n_dev = mesh.shape[grid_axis]
    n0, n1 = shape
    if n0 % n_dev != 0:
        raise ValueError(
            f"grid rows ({n0}) must be divisible by mesh axis "
            f"'{grid_axis}' size ({n_dev})"
        )
    local_rows = n0 // n_dev

    x0a, x0b, x1a, x1b = (float(v) for v in extent)
    dx0 = (x0b - x0a) / n0

    if engine in _PALLAS_ENGINES:
        return _sharded_scan_pallas(
            model, args, (x0a, x0b, x1a, x1b), (n0, n1), mesh, grid_axis,
            local_rows, dx0, engine, dtype,
        )
    if engine != "xla":
        raise ValueError(f"unknown engine {engine!r}")

    local_fn = _analysis_fn(model, (local_rows, n1), dtype)

    def shard_fn(args, flat_extent):
        idx = jax.lax.axis_index(grid_axis)
        # this chip's coordinate window along axis 0
        lo = flat_extent[0] + idx.astype(dtype) * (local_rows * dx0)
        local_extent = jnp.stack(
            [lo, lo + local_rows * dx0, flat_extent[2], flat_extent[3]]
        )
        return local_fn(args, local_extent)

    spec_in = P()  # args replicated
    spec_out = P(None, grid_axis, None)
    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(spec_in, spec_in),
            out_specs=spec_out,
        )
    )
    flat = jnp.asarray([x0a, x0b, x1a, x1b], dtype)
    return fn(jnp.asarray(args, dtype), flat)


def _local_extents(extent, n_dev, local_rows, dx0):
    x0a, x0b, x1a, x1b = extent
    outs = []
    for d in range(n_dev):
        lo = x0a + d * local_rows * dx0
        outs.append((lo, lo + local_rows * dx0, x1a, x1b))
    return outs


def _sharded_scan_pallas(
    model, args, extent, shape, mesh, grid_axis, local_rows, dx0, engine, dtype
):
    """Pallas kernels under shard_map: each device runs the fused kernel on
    its own row-block.  Per-device scalar operands (parameters + local grid
    geometry) are precomputed host-side as one (n_dev, S) array sharded along
    the grid axis — exact f32 splitting for the df64/edf64 engines happens on
    host where f64 is cheap."""
    from ..ops.pallas_kernels import (
        _launch,
        _launch_df,
        _launch_edf,
        _launch_tf,
    )

    n0, n1 = shape
    n_dev = mesh.shape[grid_axis]
    local_shape = (local_rows, n1)
    on_tpu = jax.default_backend() == "tpu"
    out_sharding = NamedSharding(mesh, P(None, grid_axis, None))

    if not on_tpu and engine in ("pallas_df64", "pallas_edf64", "pallas_tf64"):
        # EFT-safe fallback: neither the Pallas interpreter nor fused
        # XLA:CPU may run compensated arithmetic — compute each shard
        # eagerly on host (bit-identical to the single-device engine) and
        # place the assembled result with the requested sharding.
        blocks = []
        for loc_ext in _local_extents(extent, n_dev, local_rows, dx0):
            row = _scalars_for(engine, args, loc_ext, local_shape, dtype)
            outs = _eager_compensated(engine, row, model, local_shape,
                                      "complete_analysis")
            blocks.append(np.stack([np.asarray(o) for o in outs]))
        full = np.concatenate(blocks, axis=1)  # (6, n0, n1)
        return jax.device_put(full, out_sharding)

    rows_of = [
        _scalars_for(engine, args, loc_ext, local_shape, dtype)
        for loc_ext in _local_extents(extent, n_dev, local_rows, dx0)
    ]
    scal = jnp.asarray(np.stack(rows_of))

    tile = (min(8, local_rows), min(1024, n1))
    interpret = not on_tpu  # fp32 kernel only — compensated paths returned above

    def shard_fn(scal_block):
        local = scal_block[0]
        if engine == "pallas_df64":
            outs = _launch_df(local, model, local_shape, tile, interpret,
                              "complete_analysis")
        elif engine == "pallas_edf64":
            outs = _launch_edf(local, model, local_shape, tile, interpret,
                               "complete_analysis")
        elif engine == "pallas_tf64":
            outs = _launch_tf(local, model, local_shape, tile, interpret,
                              "complete_analysis")
        else:
            outs = _launch(local, model, local_shape, tile, interpret,
                           jnp.dtype(dtype), "complete_analysis")
        return jnp.stack(outs)

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(grid_axis, None),),
            out_specs=P(None, grid_axis, None),
            # pallas_call's out_shape carries no varying-mesh-axes info
            check_vma=False,
        )
    )
    return fn(scal)


def _reduce_fingerprint(reduce_fn):
    """Identify *which* reduction wrote a checkpoint, not just whether one
    did — resuming with a different same-shape reduce_fn must not silently
    mix chunks (ADVICE/review round 2).  Uses the function's qualname plus a
    hash of its bytecode and constants; falls back to repr for callables
    without __code__ (e.g. jitted wrappers)."""
    if reduce_fn is None:
        return None
    code = getattr(reduce_fn, "__code__", None)
    if code is not None:
        h = hashlib.sha256(code.co_code)
        h.update(repr(code.co_consts).encode())
        return f"{getattr(reduce_fn, '__qualname__', '?')}:{h.hexdigest()[:16]}"
    return repr(reduce_fn)


def _sweep_manifest(args_batch, extent, shape, chunk_size, engine, reduce_fn):
    """Fingerprint of everything that shapes chunk contents — resuming a
    checkpoint directory written under different inputs silently mixes
    results otherwise."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(args_batch, dtype=np.float64).tobytes())
    meta = {
        "extent": [float(v) for v in extent],
        "shape": [int(v) for v in shape],
        "chunk_size": int(chunk_size),
        "engine": engine or "xla",
        "reduced": _reduce_fingerprint(reduce_fn),
    }
    h.update(json.dumps(meta, sort_keys=True).encode())
    return {"sha256": h.hexdigest(), **meta}


def parameter_sweep(
    condition,
    args_batch,
    extent,
    shape,
    mesh=None,
    sweep_axis: str = "sweep",
    chunk_size: int | None = None,
    checkpoint_dir: str | None = None,
    progress: bool = True,
    dtype=jnp.float64,
    reduce_fn=None,
    engine: str | None = None,
):
    """Complete analysis over a batch of parameter sets.

    Args
    ----
    condition: a :class:`~inflatox_tpu.consistency_conditions.GeneralisedAL`.
    args_batch: (S, k) array of parameter sets.
    extent: (x0_start, x0_stop, x1_start, x1_stop).
    shape: (N0, N1) grid resolution per parameter set.
    mesh: optional mesh with a ``sweep_axis``; the batch is sharded across it
        (padded to a multiple of its size).  ``None`` → single-device.
    chunk_size: host-side chunking of the batch (bounds HBM for large S and
        enables checkpointing).  Default: whole batch in one launch.
    checkpoint_dir: if set, each chunk's result is written to
        ``chunk_{i:06d}.npy`` and existing files are skipped on resume —
        the failure-recovery story for long sweeps (the reference has none;
        SURVEY.md §5 checkpoint/resume).  A ``manifest.json`` fingerprints
        the sweep inputs; resuming with different inputs raises.
    reduce_fn: optional ``(6, N0, N1) → pytree`` applied per parameter set
        *on device* (e.g. extract min consistency + argmin) so that huge
        sweeps don't materialize full maps.
    engine: None (auto: "pallas_df64" on TPU, "xla" elsewhere), "xla",
        "pallas", "pallas_df64", "pallas_edf64" or "pallas_tf64".  On the
        Pallas engines
        each device scans its whole sub-batch in one kernel launch (the
        parameter set is a grid dimension).

    Returns the stacked results: (S, 6, N0, N1) array, or the stacked
    ``reduce_fn`` outputs.
    """
    model = condition.artifact
    args_batch = np.asarray(args_batch, dtype=float)
    if args_batch.ndim != 2:
        raise ValueError("args_batch must be (S, n_parameters)")
    S = args_batch.shape[0]
    chunk_size = chunk_size or S

    on_tpu = jax.default_backend() == "tpu"
    if engine is None:
        engine = "pallas_df64" if (on_tpu and model.n_fields == 2) else "xla"
    if engine not in ("xla", *_PALLAS_ENGINES):
        raise ValueError(f"unknown engine {engine!r}")

    if mesh is not None:
        n_dev = mesh.shape[sweep_axis]
        sharding = NamedSharding(mesh, P(sweep_axis))
        replicated = NamedSharding(mesh, P())
    else:
        n_dev = 1

    # ---- per-chunk launcher ------------------------------------------- #
    if engine == "xla":
        base = _analysis_fn(model, tuple(shape), dtype)
        if reduce_fn is not None:
            single = lambda a, e: reduce_fn(base(a, e))  # noqa: E731
        else:
            single = base
        batched = jax.vmap(single, in_axes=(0, None))
        if mesh is not None:
            fn = jax.jit(
                batched,
                in_shardings=(sharding, replicated),
                out_shardings=sharding,
            )
        else:
            fn = jax.jit(batched)
        flat = jnp.asarray([float(v) for v in extent], dtype)

        def run_chunk(part):
            return np.asarray(fn(jnp.asarray(part, dtype), flat))

    else:
        run_chunk = _pallas_chunk_runner(
            model, extent, tuple(shape), mesh, sweep_axis, dtype, reduce_fn,
            engine, on_tpu,
        )

    chunks = []
    n_chunks = (S + chunk_size - 1) // chunk_size

    if checkpoint_dir:
        manifest = _sweep_manifest(args_batch, extent, shape, chunk_size,
                                   engine, reduce_fn)
        os.makedirs(checkpoint_dir, exist_ok=True)
        mpath = os.path.join(checkpoint_dir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                found = json.load(f)
            if found.get("sha256") != manifest["sha256"]:
                raise ValueError(
                    f"checkpoint_dir {checkpoint_dir!r} was written by a "
                    "different sweep (args/extent/shape/chunk_size/engine/"
                    "reduce mismatch) — refusing to resume; use a fresh "
                    "directory or delete the stale checkpoints"
                )
        else:
            with open(mpath, "w") as f:
                json.dump(manifest, f)

    with Progress("Parameter sweep", enabled=progress) as prog:
        for ci in range(n_chunks):
            path = (
                os.path.join(checkpoint_dir, f"chunk_{ci:06d}.npy")
                if checkpoint_dir
                else None
            )
            if path and os.path.exists(path):
                chunks.append(np.load(path, allow_pickle=False))
                prog.tick(ci + 1, n_chunks)
                continue
            part = args_batch[ci * chunk_size : (ci + 1) * chunk_size]
            # pad to a multiple of the sweep-axis size
            pad = (-len(part)) % n_dev
            if pad:
                part = np.concatenate([part, np.repeat(part[-1:], pad, 0)], 0)
            out = run_chunk(part)
            if pad:
                out = out[: len(out) - pad]
            if path:
                np.save(path, out)
            chunks.append(out)
            prog.tick(ci + 1, n_chunks)
    return np.concatenate(chunks, axis=0)


def _pallas_chunk_runner(model, extent, shape, mesh, sweep_axis, dtype,
                         reduce_fn, engine, on_tpu):
    """Chunk launcher for the Pallas engines: per parameter set the fused
    kernel scans the grid; the whole per-device sub-batch is one launch."""
    from ..ops.pallas_kernels import (
        _launch_df_batch,
        _launch_edf_batch,
        _launch_f32_batch,
        _launch_tf_batch,
    )

    tile = (min(8, shape[0]), min(1024, shape[1]))

    if not on_tpu and engine in ("pallas_df64", "pallas_edf64", "pallas_tf64"):
        # EFT-safe eager fallback, one parameter set at a time (host path —
        # correctness/CI only; production sweeps run on the TPU mesh)
        log_warn(
            "parameter_sweep: no TPU present — the compensated engine runs "
            "eagerly per parameter set (slow, bit-identical)."
        )

        def run_chunk(part):
            outs = []
            for a in part:
                row = _scalars_for(engine, a, extent, shape, dtype)
                o = _eager_compensated(engine, row, model, shape,
                                       "complete_analysis")
                stacked = jnp.stack([jnp.asarray(v) for v in o])
                outs.append(np.asarray(
                    reduce_fn(stacked) if reduce_fn is not None else stacked
                ))
            return np.stack(outs)

        return run_chunk

    def launch(scal_block):
        if engine == "pallas_df64":
            outs = _launch_df_batch(scal_block, model, shape, tile,
                                    not on_tpu, "complete_analysis")
        elif engine == "pallas_edf64":
            outs = _launch_edf_batch(scal_block, model, shape, tile,
                                     not on_tpu, "complete_analysis")
        elif engine == "pallas_tf64":
            outs = _launch_tf_batch(scal_block, model, shape, tile,
                                    not on_tpu, "complete_analysis")
        else:
            outs = _launch_f32_batch(scal_block, model, shape, tile,
                                     not on_tpu, jnp.dtype(dtype),
                                     "complete_analysis")
        stacked = jnp.stack(outs, axis=1)  # (S_local, 6, N0, N1)
        if reduce_fn is not None:
            return jax.vmap(reduce_fn)(stacked)
        return stacked

    if mesh is not None:
        fn = jax.jit(
            jax.shard_map(
                launch,
                mesh=mesh,
                in_specs=(P(sweep_axis, None),),
                out_specs=P(sweep_axis),
                check_vma=False,
            )
        )
    else:
        fn = jax.jit(launch)

    def run_chunk(part):
        rows = np.stack([
            _scalars_for(engine, a, extent, shape, dtype) for a in part
        ])
        return np.asarray(fn(jnp.asarray(rows)))

    return run_chunk
