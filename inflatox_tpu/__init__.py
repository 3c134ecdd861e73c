"""inflatox-tpu: TPU-native framework for multi-field inflation analysis.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of smups/inflatox
(reference layout documented in SURVEY.md): symbolic derivation of the
projected covariant Hesse matrix and equations of motion (sympy, host-side),
sympy→JAX lowering (replacing the reference's C transpiler + dlopen'd Rust
runtime), fused on-device evaluation of rapid-turn consistency conditions
over field-space grids, batched on-device background-trajectory integration,
and mesh-sharded parameter sweeps.

Public surface mirrors the reference package (__init__.py:20-40):

>>> import inflatox_tpu as inflatox
>>> model = inflatox.InflationModelBuilder.new(fields, metric, V).build()
>>> artifact = inflatox.Compiler(model).compile()
>>> al = inflatox.consistency_conditions.GeneralisedAL(artifact)
>>> maps = al.complete_analysis(args, x0a, x0b, x1a, x1b)

Precision: the reference pipeline is fp64 throughout; importing this package
enables ``jax_enable_x64`` unless ``INFLATOX_TPU_NO_X64`` is set.  Individual
scan APIs accept ``dtype=jnp.float32`` for the fast path.
"""

import os as _os
import sys as _sys

import jax as _jax

if not _os.environ.get("INFLATOX_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

# Deeply-nested model expressions (EGNO/D5-class) exceed the default Python
# recursion limit during jax tracing and Mosaic jaxpr lowering; sympy
# printing needs headroom too.  Frames are heap-allocated in CPython ≥3.11,
# so a high limit is safe.
if _sys.getrecursionlimit() < 100_000:
    _sys.setrecursionlimit(100_000)

from .compiler import CompilationArtifact, CompiledModel, Compiler
from .symbolic import InflationModel, InflationModelBuilder
from .utils.logging import log_info, log_warn
from .version import __version__

from . import background
from . import consistency_conditions
from . import geometry
from . import inference
from . import models
from . import observables
from . import parallel
from . import perturbations

__all__ = [
    "CompilationArtifact",
    "CompiledModel",
    "Compiler",
    "InflationModel",
    "InflationModelBuilder",
    "consistency_conditions",
    "background",
    "geometry",
    "inference",
    "models",
    "observables",
    "parallel",
    "perturbations",
    "log_info",
    "log_warn",
    "__version__",
]
