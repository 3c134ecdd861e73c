"""Triple-f32 extended-precision engine (lowering/tf32.py).

Validates the arithmetic against 40-digit mpmath (the f64 conversion of a
TF value caps visible error at ~1e-16, so residuals are measured on the
three words directly) and the flagship property: on the EGNO model the
tf64 engine lands closer to ground truth than the reference's own f64
evaluation (docs/numerics.md §8)."""

import numpy as np
import pytest

import jax.numpy as jnp

from inflatox_tpu.lowering.tf32 import TF, exp, log, pow, sqrt  # noqa: A004

mp = pytest.importorskip("mpmath")
mp.mp.dps = 40


def _mp_rel(tf_val, want_fn, xs, ys=None, stride=37):
    g0, g1, g2 = (np.asarray(v, np.float64) for v in (tf_val.x0, tf_val.x1, tf_val.x2))
    worst = 0.0
    for i in range(0, len(xs), stride):
        got = mp.mpf(float(g0[i])) + mp.mpf(float(g1[i])) + mp.mpf(float(g2[i]))
        want = want_fn(mp.mpf(xs[i])) if ys is None else want_fn(
            mp.mpf(xs[i]), mp.mpf(ys[i])
        )
        worst = max(worst, abs(float((got - want) / want)))
    return worst


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(11)
    xs = rng.uniform(0.1, 10.0, 800)
    ys = rng.uniform(0.1, 10.0, 800)
    return xs, ys, TF.of(jnp.asarray(xs)), TF.of(jnp.asarray(ys))


def test_tf_ring_ops(samples):
    xs, ys, X, Y = samples
    assert _mp_rel(X * Y, lambda a, b: a * b, xs, ys) < 1e-20
    assert _mp_rel(X + Y, lambda a, b: a + b, xs, ys) < 1e-20
    assert _mp_rel(X - Y, lambda a, b: a - b, xs, ys) < 1e-19
    assert _mp_rel(X / Y, lambda a, b: a / b, xs, ys) < 1e-20
    assert _mp_rel(X**7, lambda a: a**7, xs) < 1e-20


def test_tf_elementary(samples):
    xs, ys, X, Y = samples
    assert _mp_rel(sqrt(X), mp.sqrt, xs) < 1e-20
    assert _mp_rel(log(X), mp.log, xs) < 1e-18
    zs = xs * 2 - 10
    assert _mp_rel(exp(TF.of(jnp.asarray(zs))), mp.exp, zs) < 1e-18
    assert _mp_rel(
        pow(X, TF.of(jnp.asarray(ys * 0.3))),
        lambda a, b: a**b, xs, ys * 0.3,
    ) < 1e-17


def test_tf_const_three_words():
    c = TF.const(1.0 / 3.0)
    got = mp.mpf(float(c.x0)) + mp.mpf(float(c.x1)) + mp.mpf(float(c.x2))
    # const() carries the full f64 payload exactly
    assert abs(float(got - mp.mpf(1.0 / 3.0))) == 0.0


def test_egno_tf_engine_beats_df(egno_artifact_and_args):
    """On the EGNO window the tf64 engine's deviation from the C-f64 oracle
    drops ~10-30× vs df64 — to the oracle's own noise floor (the oracle
    itself is ~5e-8 from ground truth, numerics.md §8)."""
    art, args = egno_artifact_and_args
    from inflatox_tpu.consistency_conditions import GeneralisedAL
    from inflatox_tpu.native import NativeModel, native_available

    if not native_available():
        pytest.skip("native backend unavailable")
    al = GeneralisedAL(art, validate_basis=False)
    ext = (0.46, 0.50, 0.0, np.pi)
    df = al.complete_analysis(args, *ext, 16, 16, progress=False,
                              engine="pallas_df64")
    tf = al.complete_analysis(args, *ext, 16, 16, progress=False,
                              engine="pallas_tf64")
    ref = np.asarray(NativeModel(art.model).complete_analysis(
        args, *ext, 16, 16, threads=0
    ))
    # ε_V is the cleanest cancellation probe
    r, d, t = ref[1], np.asarray(df[1]), np.asarray(tf[1])
    med_df = np.median(np.abs(d - r) / np.abs(r))
    med_tf = np.median(np.abs(t - r) / np.abs(r))
    assert med_tf < med_df / 5
    assert med_tf < 5e-8


@pytest.fixture(scope="module")
def egno_artifact_and_args():
    import os

    from inflatox_tpu.compiler import CompiledModel
    from inflatox_tpu.models import _args_by_symbol

    bundle = os.path.join(os.path.dirname(__file__), "fixtures",
                          "egno_bundle.json")
    art = CompiledModel.load(bundle)
    args = _args_by_symbol(
        art.model, {"m": 1e-3, "a": 0.5, "c": 1000.0, "alpha": 1.0}
    )
    return art, args


def test_tf64_on_trajectory(egno_artifact_and_args):
    """OT scans run on the extended-precision engine too."""
    art, args = egno_artifact_and_args
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    al = GeneralisedAL(art, validate_basis=False)
    rng = np.random.default_rng(5)
    traj = np.stack([rng.uniform(0.46, 0.50, 64), rng.uniform(0.1, 3.0, 64)], 1)
    tf = al.complete_analysis_ot(args, traj, engine="pallas_tf64")
    df = al.complete_analysis_ot(args, traj, engine="pallas_df64")
    for t, d in zip(tf, df):
        both = np.isfinite(t) & np.isfinite(d)
        assert both.mean() > 0.9
        # agreement at the df engine's own EGNO envelope
        np.testing.assert_allclose(
            np.asarray(t)[both], np.asarray(d)[both], rtol=1e-4
        )
