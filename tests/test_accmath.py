"""Accurate-f64 elementary functions (lowering/accmath.py) vs mpmath.

These run on CPU true-f64 (conftest pins the platform), which validates the
algebra — the range reductions, series, and branch thresholds.  The
TPU-specific motivation is measured on hardware and recorded in the module
docstring: XLA:TPU's emulated-f64 ``expm1`` is only ~2e-8 for x ≈ 0.5-2.5,
which silently broke the original expm1-based ``sinh``/``tanh`` right in
the physically common argument range (found round 3 via a Riemann-tensor
check on a sinh²-metric field space)."""

import mpmath
import numpy as np
import pytest

import jax.numpy as jnp

from inflatox_tpu.lowering import accmath

mpmath.mp.dps = 40

SWEEP = np.concatenate([
    np.linspace(1e-10, 0.349, 23),   # series branch of sinh
    np.linspace(0.35, 6.0, 57),      # exp branch, incl. the TPU-bad window
    [10.0, 19.0, 25.0, 80.0],
])


@pytest.mark.parametrize(
    "fn,ref",
    [
        (accmath.sinh, mpmath.sinh),
        (accmath.cosh, mpmath.cosh),
        (accmath.tanh, mpmath.tanh),
        (accmath.exp, mpmath.exp),
    ],
)
def test_dense_sweep_vs_mpmath(fn, ref):
    worst = 0.0
    for x in SWEEP:
        for s in (x, -x):
            got = float(fn(jnp.float64(s)))
            want = float(ref(mpmath.mpf(float(s))))
            worst = max(worst, abs(got / want - 1.0))
    assert worst < 5e-14, worst


def test_edge_cases():
    assert float(accmath.sinh(jnp.float64(0.0))) == 0.0
    assert float(accmath.tanh(jnp.float64(0.0))) == 0.0
    assert float(accmath.cosh(jnp.float64(0.0))) == 1.0
    # oddness: exact on the series branch, 1-ulp on the exp branch
    # (exp(−x) and 1/exp(x) may differ in the last place)
    assert float(accmath.sinh(jnp.float64(-0.1))) == -float(
        accmath.sinh(jnp.float64(0.1))
    )
    for x in (0.35, 0.9):
        np.testing.assert_allclose(
            float(accmath.sinh(jnp.float64(-x))),
            -float(accmath.sinh(jnp.float64(x))), rtol=1e-15,
        )
    assert np.isnan(float(accmath.tanh(jnp.float64(np.nan))))
    assert float(accmath.tanh(jnp.float64(500.0))) == pytest.approx(1.0)
    assert float(accmath.tanh(jnp.float64(-500.0))) == pytest.approx(-1.0)
