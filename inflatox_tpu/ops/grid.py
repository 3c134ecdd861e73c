"""Field-space grid coordinate generation.

Grid convention (parity with the reference, anguelova.rs:84-94 and
hesse_bindings.rs:72-76): along each axis, ``N`` samples at

    x_i = start + i * (stop - start) / N        for i = 0 .. N-1

i.e. an *endpoint-exclusive* linspace (the reference divides by ``N``, not
``N-1``).  Coordinates are generated on device via ``broadcasted_iota`` —
never materialized on the host and fused by XLA straight into the consuming
elementwise computation, so a grid scan reads zero bytes from HBM.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["grid_coords", "axis_coords"]


def axis_coords(start, stop, n: int, dtype=jnp.float64):
    """1-D endpoint-exclusive axis: start + i*(stop-start)/n, i = 0..n-1."""
    spacing = (jnp.asarray(stop, dtype) - jnp.asarray(start, dtype)) / n
    i = lax.broadcasted_iota(dtype, (n, 1), 0).reshape(n)
    return jnp.asarray(start, dtype) + i * spacing


def grid_coords(start_stop, shape, dtype=jnp.float64):
    """Per-field coordinate arrays for an n-D grid.

    Args
    ----
    start_stop: sequence of (start, stop) pairs, one per field (may contain
        traced scalars — the grid *extent* does not trigger recompilation,
        only its *shape* does).
    shape: number of samples per axis (static ints).

    Returns a tuple of ``len(shape)`` arrays, each of shape ``shape``, giving
    the field-space coordinate of every grid point.  Built from iota so XLA
    fuses them into consumers with no HBM traffic.
    """
    ndim = len(shape)
    coords = []
    for axis, ((start, stop), n) in enumerate(zip(start_stop, shape)):
        start = jnp.asarray(start, dtype)
        stop = jnp.asarray(stop, dtype)
        spacing = (stop - start) / n
        idx = lax.broadcasted_iota(dtype, tuple(shape), axis)
        coords.append(start + idx * spacing)
    assert len(coords) == ndim
    return tuple(coords)
