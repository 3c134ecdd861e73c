"""Multi-host initialization.

The reference has no distributed backend at all (SURVEY.md §2.3); the
TPU-native equivalent is ``jax.distributed`` + XLA collectives over ICI
within a slice and DCN across slices.  For this workload no collectives are
needed during a scan — tiles are independent — so "distributed" reduces to:
initialize the runtime, build a global mesh, and let
:func:`~inflatox_tpu.parallel.sharded_scan` /
:func:`~inflatox_tpu.parallel.parameter_sweep` place work.

Typical pod-scale launcher::

    import inflatox_tpu
    from inflatox_tpu.parallel import distributed, make_mesh, parameter_sweep

    distributed.initialize()          # no-op on single host
    mesh = make_mesh(("sweep", "grid"), shape=(n_slices, chips_per_slice))
    parameter_sweep(al, combos, extent, (512, 512), mesh=mesh,
                    checkpoint_dir="gs://.../sweep")  # DCN rides the sweep axis
"""

from __future__ import annotations

import os

import jax

from ..utils.logging import log_info, log_warn

__all__ = ["initialize", "is_multi_host"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize ``jax.distributed`` when running multi-host.

    With no arguments, auto-detects from the standard TPU environment
    (``jax.distributed.initialize`` reads the TPU metadata / env vars); a
    plain single-host session is left untouched.  Safe to call twice.
    """
    # NOT jax.process_count(): that would initialize the XLA backend, after
    # which jax.distributed.initialize refuses to run (caught by the
    # 2-process test this module gained in round 4)
    if jax.distributed.is_initialized():
        return  # already initialized
    try:
        if coordinator_address or os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            log_info(
                f"jax.distributed initialized: process "
                f"{jax.process_index()}/{jax.process_count()}, "
                f"{jax.device_count()} global devices"
            )
    except Exception as exc:  # single-host or misconfigured launcher
        log_warn(f"jax.distributed initialization skipped: {exc}")


def is_multi_host() -> bool:
    return jax.process_count() > 1
