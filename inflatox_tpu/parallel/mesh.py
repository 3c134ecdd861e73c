"""Device-mesh helpers.

The reference's only parallelism is a rayon CPU thread pool over grid pixels
(anguelova.rs:185, 527-539; SURVEY.md §2.3).  The TPU-native equivalent is a
``jax.sharding.Mesh``:

* axis ``"grid"`` tiles field-space grids across chips over ICI — the scan is
  pointwise, so no halo exchange or collectives are required, only the final
  gather when results are pulled to host;
* axis ``"sweep"`` spreads parameter-sweep batches (and batched background
  solves) across chips; for pod-scale runs this is the axis to map onto DCN
  between slices.

``jax.distributed.initialize()`` should be called by multi-host launchers
before building a mesh; single-host usage needs nothing.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "default_mesh"]


def make_mesh(
    axis_names: tuple = ("sweep", "grid"),
    shape: tuple | None = None,
    devices=None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all addressable devices).

    With ``shape=None`` a reasonable default is chosen: all devices on the
    last axis (grid tiling), size 1 for the leading axes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(
            f"mesh shape {shape} does not match device count {n}"
        )
    return Mesh(np.array(devices).reshape(shape), axis_names)


def default_mesh(devices=None) -> Mesh:
    """1-D ``("grid",)`` mesh over all devices — the right default for
    single-model grid scans."""
    return make_mesh(axis_names=("grid",), shape=None, devices=devices)
