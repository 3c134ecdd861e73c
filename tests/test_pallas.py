"""Pallas fused-kernel parity vs the XLA scan (interpreter mode on CPU; the
driver/bench exercise the compiled kernel on real TPU hardware)."""

import numpy as np
import pytest

import jax.numpy as jnp

from inflatox_tpu.consistency_conditions import GeneralisedAL
from inflatox_tpu.ops.pallas_kernels import complete_analysis_pallas

PARAMS = np.array([1.0])
EXTENT = (0.5, 2.5, 0.25, 3.0)


@pytest.fixture(scope="module")
def al(doc_model_artifact):
    return GeneralisedAL(doc_model_artifact, validate_basis=False)


def test_pallas_matches_xla_f32(al, doc_model_artifact):
    shape = (48, 160)  # not tile-aligned: exercises padding + slicing
    pk = complete_analysis_pallas(
        doc_model_artifact, PARAMS, EXTENT, shape, tile=(16, 128)
    )
    ref = al.complete_analysis(
        PARAMS, *EXTENT, *shape, progress=False, dtype=jnp.float32
    )
    for k in range(6):
        np.testing.assert_allclose(
            np.asarray(pk[k]), ref[k], rtol=2e-5, atol=1e-6, equal_nan=True
        )


def test_pallas_engine_kwarg(al):
    shape = (16, 128)
    via_engine = al.complete_analysis(
        PARAMS, *EXTENT, *shape, progress=False, engine="pallas"
    )
    assert via_engine[0].shape == shape
    assert via_engine[0].dtype == np.float32
    with pytest.raises(ValueError):
        al.complete_analysis(PARAMS, *EXTENT, 8, 8, progress=False, engine="cuda")
