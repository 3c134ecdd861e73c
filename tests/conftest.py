"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding code
paths (mesh scans, parameter sweeps) are exercised without TPU hardware;
the driver separately dry-run-compiles the multi-chip path and benches on a
real chip.  Environment must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize pins jax_platforms to "axon,cpu" at interpreter
# start; override it (backends initialize lazily, so this is safe as long as
# no array has been created yet)
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the giant EGNO/D5 graphs dominate suite runtime
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/inflatox_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import numpy as np
import pytest
import sympy

import inflatox_tpu as inflatox


@pytest.fixture(scope="session")
def doc_model_artifact():
    """The README/doc-example ("hyperinflation") model — the golden-value
    anchor (reference tests/test_doc.py:25-51)."""
    r, theta, m = sympy.symbols("r θ m")
    V = sympy.Rational(1, 2) * m**2 * (theta**2 - sympy.Rational(2, 3) / r**2)
    g = [[sympy.Rational(1, 2), 0], [0, sympy.Rational(1, 2) * r**2]]
    model = inflatox.InflationModelBuilder.new([r, theta], g, V, silent=True).build()
    return inflatox.Compiler(model, silent=True).compile()


@pytest.fixture(scope="session")
def trivial_artifact():
    """Flat metric, quadratic potential — analytically checkable."""
    f1, f2 = sympy.symbols("phi_1 phi_2")
    m1, m2 = sympy.symbols("m_1 m_2")
    V = (m1 * f1) ** 2 + (m2 * f2) ** 2
    metric = [[1, 0], [0, 1]]
    model = inflatox.InflationModelBuilder.new(
        [f1, f2], metric, V, "trivial", silent=True
    ).build()
    return inflatox.Compiler(model, silent=True).compile()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
