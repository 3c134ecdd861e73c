"""Profiling helpers.

The reference's only observability is wall-clock + a progress bar
(anguelova.rs:42-50, 205; SURVEY.md §5).  On TPU the right tool is a
``jax.profiler`` trace viewed in TensorBoard/Perfetto; this module wraps it
with the same ergonomics as :class:`~inflatox_tpu.utils.logging.Progress`.
"""

from __future__ import annotations

import contextlib
import time

from .logging import log_info

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, label: str = "inflatox"):
    """Capture a device profile for the enclosed block::

        with profiling.trace("/tmp/inflatox-profile"):
            al.complete_analysis(...)

    Open the directory with TensorBoard (or upload the .pb to Perfetto)."""
    import jax

    log_info(f"profiling '{label}' → {log_dir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(log_dir):
        yield
    log_info(
        f"profile captured ({time.perf_counter() - t0:.2f}s wall) — "
        f"inspect with: tensorboard --logdir {log_dir}"
    )


def annotate(name: str):
    """Decorator/context manager adding a named region to profiles."""
    import jax

    return jax.profiler.TraceAnnotation(name)
