"""Mesh-sharded batched background solves.

Trajectories are independent (the reference integrates them strictly
sequentially, background_solver.rs:263-336), so a batch shards across the
mesh with **zero collectives**: each device integrates its own slice of the
initial-condition batch.  This is the multi-chip surface behind the Pallas
DF solver's ×N-chip scaling claim (BASELINE.md cfg5d) — same recipe as
:func:`inflatox_tpu.parallel.sharded_scan` (contiguous ownership, no halo,
results concatenated on fetch).

Two engines, mirroring :func:`inflatox_tpu.background.solve_eom_batch`:

* ``solver="rkf"/"rk4"`` — the while-loop f64 integrator vmapped per shard.
* ``solver="rkf_pallas"`` — the Pallas DF kernel per shard; trajectory
  *blocks* (``_TRAJ_BLOCK`` lanes each) are divided across devices, so the
  padded block count must split evenly.  Off-TPU this falls back to the
  sharded while-loop path (the Pallas interpreter destroys compensated
  arithmetic) unless ``interpret=True`` is explicit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["sharded_solve_eom_batch"]


def _pad_batch(arr, bp):
    """Pad a batch-leading array to ``bp`` rows by repeating the last row."""
    pad = bp - arr.shape[0]
    if pad == 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])


def sharded_solve_eom_batch(
    artifact,
    pars,
    steps: int,
    fields_init,
    derivatives_init,
    mesh,
    solve_axis: str = "solve",
    max_err: float = 1e-6,
    solver: str = "rkf",
    return_time: bool = False,
    interpret: bool | None = None,
    combine: str = "host",
):
    """Integrate a trajectory batch sharded over ``mesh``.

    Same contract as :func:`inflatox_tpu.background.solve_eom_batch`
    ((B, steps, 2n+1) rows [+ (B, steps) times]; ``pars`` shared (k,) or
    per-trajectory (B, k)); the batch is padded up to the mesh divisibility
    requirement internally and trimmed on return.

    ``combine="device"`` returns device-resident (rows, times) jnp arrays
    (always both) for pipelines that reduce on device — e.g.
    :func:`inflatox_tpu.background.survey_initial_conditions`'s mesh
    branch, whose (B,)-summary design requires that the (B, steps, 2n+1)
    trajectories never cross the host↔device link (round 4, ADVICE r3:
    the default host fetch was silently defeating exactly that in the
    multi-chip case the chunking targets).
    """
    if combine not in ("host", "device"):
        raise ValueError(
            f"combine must be 'host' or 'device', got {combine!r}"
        )
    from .. import background  # noqa: PLC0415 — avoid import cycle
    from ..utils.errors import ShapeError  # noqa: PLC0415

    nf = artifact.n_fields
    fields_init = np.asarray(fields_init, dtype=float)
    derivs_init = np.asarray(derivatives_init, dtype=float)
    pars = np.asarray(pars, dtype=float)
    if fields_init.ndim != 2 or fields_init.shape[1] != nf:
        raise ShapeError((-1, nf), fields_init.shape,
                         "batched initial conditions must be (B, n_fields)")
    if derivs_init.shape != fields_init.shape:
        raise ShapeError(fields_init.shape, derivs_init.shape,
                         "field derivatives must match the field batch")
    B = fields_init.shape[0]
    per_traj = pars.ndim == 2
    if per_traj and pars.shape != (B, artifact.n_parameters):
        raise ShapeError((B, artifact.n_parameters), pars.shape,
                         "per-trajectory parameters must be (B, n_parameters)")
    if not per_traj and pars.shape != (artifact.n_parameters,):
        raise ShapeError((artifact.n_parameters,), pars.shape,
                         "shared parameters must be (n_parameters,)")
    n_dev = mesh.shape[solve_axis]

    if solver == "rkf_pallas":
        on_tpu = jax.default_backend() == "tpu"
        if interpret is None and not on_tpu:
            solver = "rkf"  # EFT-safe fallback, same as the unsharded path
        else:
            return _sharded_solve_pallas(
                artifact, pars, steps, fields_init, derivs_init, mesh,
                solve_axis, max_err, return_time,
                bool(interpret) if interpret is not None else False,
                combine,
            )

    # ---- while-loop engine: vmap per shard ------------------------------- #
    bp = -(-B // n_dev) * n_dev
    f0 = _pad_batch(fields_init, bp)
    d0 = _pad_batch(derivs_init, bp)
    p_in = _pad_batch(pars, bp) if per_traj else pars
    run, _ = background._get_solver(artifact, solver, int(steps),
                                    jnp.float64, max_err)

    def shard_fn(f, d, p):
        batched = jax.vmap(run, in_axes=(0, 0, 0 if per_traj else None))
        return batched(f, d, p)

    spec_b = P(solve_axis, None)
    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(spec_b, spec_b, spec_b if per_traj else P()),
            out_specs=P(solve_axis, None, None),
            # the solver's while_loop carries start from unvarying
            # constants (dt=1e-10, t=0) that the body makes axis-varying —
            # a false positive for the varying-manual-axes check
            check_vma=False,
        )
    )
    res = fn(jnp.asarray(f0), jnp.asarray(d0), jnp.asarray(p_in))
    if combine == "device":
        # stay on device: the ≤ n_dev−1 padding rows trim as a lazy slice
        return res[:B, :, :-1], res[:B, :, -1]
    rows = np.asarray(res)[:B]
    out, times = rows[:, :, :-1], rows[:, :, -1]
    if return_time:
        return out, times
    return out


def _sharded_solve_pallas(
    artifact, pars, steps, fields_init, derivs_init, mesh, solve_axis,
    max_err, return_time, interpret, combine="host",
):
    """Pallas DF solver under shard_map: trajectory blocks divided across
    the mesh axis.  Each device launches the kernel on its local blocks —
    the (hi, lo) plane layout shards contiguously along the block axis."""
    from ..ops import pallas_solver as ps  # noqa: PLC0415

    nf = artifact.n_fields
    B = fields_init.shape[0]
    per_traj = pars.ndim == 2
    n_dev = mesh.shape[solve_axis]
    # pad the block count to the mesh size, then to whole blocks
    n_blocks = -(-B // ps._TRAJ_BLOCK)
    n_blocks = -(-n_blocks // n_dev) * n_dev
    scalars, planes = ps._build_planes(fields_init, derivs_init, pars,
                                       per_traj, nf, n_blocks)

    blocks_local = n_blocks // n_dev

    def shard_fn(scal, *local_planes):
        return ps._launch_solver(scal, local_planes, artifact, int(steps),
                                 blocks_local, interpret, float(max_err),
                                 per_traj=per_traj)

    spec_plane = P(solve_axis, None)  # (n_blocks·_SUB, _LANES) block rows
    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), *([spec_plane] * len(planes))),
            out_specs=P(None, solve_axis, None),
            # pallas_call's out_shape carries no varying-mesh-axes info
            check_vma=False,
        )
    )
    outs = fn(scalars, *planes)
    # fused-layout launches return ONE sublane-stacked array per device;
    # concatenation along the sharded axis keeps the block-major layout, so
    # the per-device split geometry applies globally
    ns = 2 * nf + 1
    _, fused, S, _ = ps._resolved_layout(blocks_local, nf)
    if fused:
        if combine == "device":
            outs = tuple(ps._split_fused(outs[0], ns, S))
        else:
            outs = ps._split_fused(np.asarray(outs[0]), ns, S)
    if combine == "device":
        return ps._combine_outputs_device(tuple(outs), nf, int(steps),
                                          int(B))
    return ps._combine_outputs(outs, nf, steps, B, return_time)
