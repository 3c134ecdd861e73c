"""Multi-chip grid scans and parameter sweeps.

The reference has no sweep machinery — users hand-loop over parameter sets,
each call scanning the grid on the CPU thread pool (SURVEY.md §2.3).  Here
sweeps are first-class:

* :func:`sharded_scan` — one parameter set, the field-space grid tiled
  across chips along mesh axis ``"grid"``.  Implemented with ``shard_map``:
  each chip computes its own coordinate window from its axis index; there is
  no input to shard and no collective — ICI is only touched if the caller
  reassembles the result.
* :func:`parameter_sweep` — a batch of parameter sets vmapped on device and
  sharded along mesh axis ``"sweep"``; optionally checkpointed per chunk so
  pod-scale sweeps (BASELINE.json config 5: 10⁶ combos × 512² grid) can
  resume after preemption.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.anguelova import complete_analysis_op
from ..ops.grid import grid_coords
from ..utils.logging import Progress

__all__ = ["sharded_scan", "parameter_sweep"]


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

    ``engine``: "xla" (any dtype), "pallas" (fp32 kernel per shard) or
    "pallas_df64" (double-f32 kernel, f64 outputs) — on TPU pods the df64
    engine is the recommended parity-grade path (BASELINE.md).

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

    if engine in ("pallas", "pallas_df64"):
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


def _sharded_scan_pallas(
    model, args, extent, shape, mesh, grid_axis, local_rows, dx0, engine, dtype
):
    """Pallas kernels under shard_map: each device runs the fused kernel on
    its own row-block.  Per-device scalar operands (parameters + local grid
    geometry) are precomputed host-side as one (n_dev, S) array sharded along
    the grid axis — exact f32 splitting for the df64 engine happens on host
    where f64 is cheap."""
    import numpy as _np

    from ..ops.pallas_kernels import _df_scalars, _launch, _launch_df

    x0a, x0b, x1a, x1b = extent
    n0, n1 = shape
    n_dev = mesh.shape[grid_axis]
    local_shape = (local_rows, n1)
    interpret = jax.default_backend() != "tpu"

    rows_of = []
    for d in range(n_dev):
        lo = x0a + d * local_rows * dx0
        local_extent = (lo, lo + local_rows * dx0, x1a, x1b)
        if engine == "pallas_df64":
            rows_of.append(_np.asarray(_df_scalars(args, local_extent, local_shape)))
        else:
            geom = [lo, dx0, x1a, (x1b - x1a) / n1]
            rows_of.append(
                _np.asarray([float(v) for v in args] + geom, dtype=_np.dtype(dtype))
            )
    scal = jnp.asarray(_np.stack(rows_of))

    tile = (min(64, local_rows), min(256, n1))

    def shard_fn(scal_block):
        local = scal_block[0]
        if engine == "pallas_df64":
            outs = _launch_df(local, model, local_shape, tile, interpret,
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
):
    """Complete analysis over a batch of parameter sets.

    Args
    ----
    condition: a :class:`~inflatox_tpu.consistency_conditions.GeneralisedAL`.
    args_batch: (S, k) array of parameter sets.
    extent: (x0_start, x0_stop, x1_start, x1_stop).
    shape: (N0, N1) grid resolution per parameter set.
    mesh: optional mesh with a ``sweep_axis``; the batch is sharded across it
        (padded to a multiple of its size).  ``None`` → single-device vmap.
    chunk_size: host-side chunking of the batch (bounds HBM for large S and
        enables checkpointing).  Default: whole batch in one launch.
    checkpoint_dir: if set, each chunk's result is written to
        ``chunk_{i:06d}.npy`` and existing files are skipped on resume —
        the failure-recovery story for long sweeps (the reference has none;
        SURVEY.md §5 checkpoint/resume).
    reduce_fn: optional ``(6, N0, N1) → pytree`` applied per parameter set
        *on device* (e.g. extract min consistency + argmin) so that huge
        sweeps don't materialize full maps.

    Returns the stacked results: (S, 6, N0, N1) array, or the stacked
    ``reduce_fn`` outputs.
    """
    model = condition.artifact
    args_batch = np.asarray(args_batch, dtype=float)
    if args_batch.ndim != 2:
        raise ValueError("args_batch must be (S, n_parameters)")
    S = args_batch.shape[0]
    chunk_size = chunk_size or S

    base = _analysis_fn(model, tuple(shape), dtype)
    if reduce_fn is not None:
        single = lambda a, e: reduce_fn(base(a, e))  # noqa: E731
    else:
        single = base
    batched = jax.vmap(single, in_axes=(0, None))

    if mesh is not None:
        n_dev = mesh.shape[sweep_axis]
        sharding = NamedSharding(mesh, P(sweep_axis))
        replicated = NamedSharding(mesh, P())
        fn = jax.jit(
            batched,
            in_shardings=(sharding, replicated),
            out_shardings=sharding,
        )
    else:
        n_dev = 1
        fn = jax.jit(batched)

    flat = jnp.asarray([float(v) for v in extent], dtype)
    chunks = []
    n_chunks = (S + chunk_size - 1) // chunk_size
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
            out = np.asarray(fn(jnp.asarray(part, dtype), flat))
            if pad:
                out = out[: len(out) - pad]
            if path:
                os.makedirs(checkpoint_dir, exist_ok=True)
                np.save(path, out)
            chunks.append(out)
            prog.tick(ci + 1, n_chunks)
    return np.concatenate(chunks, axis=0)
