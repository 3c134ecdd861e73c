"""Range-extended double-f32 (EDF) engine tests — lowering/edf32.py.

EDF exists because NO plain TPU float survives f32-range overflow: both the
df32 engine and XLA's emulated f64 carry f32 dynamic range (measured:
float64(1e30)**2 is NaN on TPU).  These tests certify the arithmetic across
~±280 decades and the D5 model (the range-heavy fixture) end to end on the
eager engine — the compiled Mosaic kernel is certified on hardware
(BASELINE.md) because the Pallas interpreter destroys compensated
arithmetic (see ops/pallas_kernels._df64_eager).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from inflatox_tpu.lowering import edf32 as em
from inflatox_tpu.lowering.edf32 import EDF

np.seterr(all="ignore")


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    # compare only where f64 itself is a trustworthy reference (normal range)
    m = np.isfinite(b) & (np.abs(b) > 2.3e-308)
    assert m.any()
    return np.max(np.abs(a[m] - b[m]) / np.abs(b[m]))


@pytest.fixture(scope="module")
def wide():
    rng = np.random.default_rng(7)
    n = 3000
    x = rng.uniform(1, 2, n) * 10.0 ** rng.uniform(-280, 280, n)
    x *= rng.choice([-1.0, 1.0], n)
    y = rng.uniform(1, 2, n) * 10.0 ** rng.uniform(-280, 280, n)
    return x, y


def test_edf_ring_ops_wide_range(wide):
    x, y = wide
    ex, ey = EDF.of(jnp.asarray(x)), EDF.of(jnp.asarray(y))
    assert _rel(ex.to_f64(), x) < 1e-13
    assert _rel((ex * ey).to_f64(), x * y) < 1e-13
    assert _rel((ex / ey).to_f64(), x / y) < 1e-13
    assert _rel((ex + ey).to_f64(), x + y) < 1e-13
    assert _rel((ex - ey).to_f64(), x - y) < 1e-12
    assert _rel(ex.sq().to_f64(), x * x) < 1e-13
    assert _rel((ex**7).to_f64(), x**7) < 1e-12


def test_edf_beyond_f64_range():
    """The whole point: values far outside f64 survive internally."""
    big = EDF.const(2.0) ** 2000  # 2^2000 ≈ 1e602
    assert float(em.log(big).to_f64()) == pytest.approx(
        2000 * np.log(2.0), rel=1e-12
    )
    root = em.sqrt(big)  # 2^1000
    assert int(np.asarray(root.e)) == 1000
    ratio = big / (EDF.const(2.0) ** 1999)
    assert float(ratio.to_f64()) == pytest.approx(2.0, rel=1e-13)
    # and the honest saturation at materialization time
    assert np.isinf(float(big.to_f64()))


def test_edf_elementary_functions(wide):
    x, _ = wide
    xp = np.abs(x)
    exp_ = EDF.of(jnp.asarray(xp))
    assert _rel(em.sqrt(exp_).to_f64(), np.sqrt(xp)) < 1e-13
    assert _rel(em.log(exp_).to_f64(), np.log(xp)) < 1e-13
    z = np.linspace(-700, 700, 1500)
    assert _rel(em.exp(EDF.of(jnp.asarray(z))).to_f64(), np.exp(z)) < 5e-12
    t = np.linspace(-10, 10, 1001)
    assert _rel(em.cos(EDF.of(jnp.asarray(t))).to_f64(), np.cos(t)) < 1e-10
    assert _rel(em.atan(EDF.of(jnp.asarray(x))).to_f64(), np.arctan(x)) < 1e-13
    w = np.linspace(0.1, 50, 500)
    p = np.linspace(-3, 3, 500)
    assert _rel(
        em.pow(EDF.of(jnp.asarray(w)), EDF.of(jnp.asarray(p))).to_f64(), w**p
    ) < 1e-12


def test_edf_edge_cases():
    zero = EDF.const(0.0)
    one = EDF.const(1.0)
    assert float((zero * EDF.const(1e300)).to_f64()) == 0.0
    assert float((zero + one).to_f64()) == 1.0
    assert bool(EDF.const(1e-200) < EDF.const(1e200))
    assert bool(EDF.const(-1e200) < EDF.const(1e-300))
    assert np.isnan(float(em.sqrt(EDF.const(-1.0)).to_f64()))
    assert np.isinf(float(em.exp(EDF.const(1e8)).to_f64()))
    assert float(em.exp(EDF.const(-1e8)).to_f64()) == 0.0
    # pow edge cases mirror C pow via df32 semantics
    assert float(em.pow(zero, one).to_f64()) == 0.0
    assert float(em.pow(zero, zero).to_f64()) == 1.0


@pytest.fixture(scope="module")
def d5():
    import os

    from inflatox_tpu.compiler import CompiledModel
    from inflatox_tpu.models import _args_by_symbol

    bundle = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "d5_bundle.json"
    )
    art = CompiledModel.load(bundle)
    args = _args_by_symbol(art.model, {
        "V0": -1.17e-8, "N": 1000.0, "g_s": 0.01, "l_s": 501.961,
        "u": 50 * 501.961, "q": 1.0, "p": 5.0,
        "a0": 0.001, "a1": 0.0005, "b1": 0.001,
    })
    return art, args


def test_d5_edf_model_eval_parity(d5):
    """D5 model functions on EDF vs the native C f64 oracle.  V, |∇V|² and
    the diagonal Hesse entries are well-conditioned → ~1e-13; the
    off-diagonal v10 is cancellation-limited at 48 bits (docs/numerics.md §5)
    and is certified at its measured envelope."""
    from inflatox_tpu.native import NativeModel, native_available

    if not native_available():
        pytest.skip("no C compiler")
    art, args = d5
    fns = art.edf_fns()
    nm = NativeModel(art.model)
    for (r, th) in [(5.0, 1.0), (20.0, 2.5), (30.0, 0.3), (12.0, 9.0)]:
        xs = (EDF.const(r), EDF.const(th))
        a = tuple(EDF.const(v) for v in args)
        v = float(fns["potential"](xs, a).to_df().to_f64())
        gs = float(fns["grad_square"](xs, a).to_df().to_f64())
        h = [float(c.to_df().to_f64()) for c in fns["hesse"](xs, a)]
        ref = nm.point_eval(np.array([r, th]), args)
        assert v == pytest.approx(ref[0], rel=1e-12)
        assert gs == pytest.approx(ref[5], rel=5e-12)
        assert h[0] == pytest.approx(ref[1], rel=1e-11)
        assert h[3] == pytest.approx(ref[4], rel=5e-12)
        # v10: conditioning-limited on any ~48-bit format
        assert h[1] == pytest.approx(ref[2], rel=2e-4)


def test_d5_edf_scan_finite(d5):
    """The headline capability: the D5 scan runs NaN-free on the EDF engine
    (ε_V overflows f32 range → NaN on every other TPU-feasible engine)."""
    from inflatox_tpu.ops.pallas_kernels import scan_pallas_edf64

    art, args = d5
    outs = scan_pallas_edf64(
        art, "complete_analysis", args, (0.1, 36.0, 0.0, 4 * np.pi), (24, 24)
    )
    eps_v = np.asarray(outs[1])
    assert np.isfinite(eps_v).all()
    assert (eps_v > 0).all()


def test_engine_dispatch_and_auto(d5):
    """engine="pallas_edf64" through the user API + auto-resolution."""
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    art, args = d5
    al = GeneralisedAL(art, validate_basis=False)
    maps = al.complete_analysis(
        args, 0.1, 36.0, 0.0, 4 * np.pi, 16, 16, progress=False,
        engine="pallas_edf64",
    )
    assert np.isfinite(maps[1]).all()
    # off-TPU the auto engine resolves to the fused XLA scan
    assert al._resolve_engine(None) == "xla"
    assert al._resolve_engine("pallas") == "pallas"
    with pytest.raises(ValueError, match="unknown engine"):
        al.consistency(args, 0.1, 1.0, 0.0, 1.0, 8, 8, progress=False,
                       engine="nope")


def test_edf_special_functions():
    """Bessel models run on the range-extended engine (round 2: the edf32
    special stub became a DF-demoting implementation — arguments to the
    Bessel family are physical scales inside f32 range even when a model's
    other intermediates are not)."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    x, y, a = sympy.symbols("x y a")
    V = a * sympy.besselj(0, x) ** 2 + sympy.besselk(1, x + 2) * y**2 + 2
    model = inflatox.InflationModelBuilder.new(
        [x, y], [[1, 0], [0, 1]], V, silent=True, simplify=False,
        assertions=False,
    ).build()
    al = GeneralisedAL(inflatox.Compiler(model, silent=True).compile(),
                       validate_basis=False)
    args = np.array([2.0])
    ext = (0.5, 3.0, 0.2, 1.5)
    ref = al.complete_analysis(args, *ext, 12, 12, progress=False,
                               engine="xla")
    got = al.complete_analysis(args, *ext, 12, 12, progress=False,
                               engine="pallas_edf64")
    both = np.isfinite(ref[1]) & np.isfinite(got[1])
    np.testing.assert_allclose(got[1][both], ref[1][both], rtol=1e-10)


def test_range_aware_auto_selection(d5, monkeypatch):
    """VERDICT r2 item 2: engine=None on TPU must route range-heavy
    (D5-class) models to the range-extended engine instead of silently
    returning all-NaN maps.  The TPU check is monkeypatched; the probe
    itself is the host-eager engine evaluation, backend-independent."""
    from inflatox_tpu import consistency_conditions as cc
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    art, args = d5
    al = GeneralisedAL(art, validate_basis=False)
    monkeypatch.setattr(cc, "_default_backend_is_tpu", lambda: True)
    assert art.df32_compatible  # D5 is ln/sqrt-only: the static check passes
    ext = (0.1, 36.0, 0.0, 4 * np.pi)
    eng = al._resolve_engine(
        None, kind="complete_analysis", args=args, extent=ext
    )
    assert eng == "pallas_edf64"
    # cached second resolution
    assert al._resolve_engine(
        None, kind="complete_analysis", args=args, extent=ext
    ) == "pallas_edf64"
    # without scan context the static default stands
    assert al._resolve_engine(None) == "pallas_df64"


def test_range_aware_auto_keeps_df64_in_range(doc_model_artifact, monkeypatch):
    """A model comfortably inside f32 range keeps the fast df64 default."""
    from inflatox_tpu import consistency_conditions as cc
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    al = GeneralisedAL(doc_model_artifact, validate_basis=False)
    monkeypatch.setattr(cc, "_default_backend_is_tpu", lambda: True)
    eng = al._resolve_engine(
        None, kind="complete_analysis", args=np.array([1.0]),
        extent=(0.5, 2.0, -1.0, 1.0),
    )
    assert eng == "pallas_df64"


def test_nan_guard_warns_on_overflowing_scan(d5, capsys):
    """An explicit df64 run on an overflowing model must warn (VERDICT r2:
    'even an explicit pallas_df64 run returns all-NaN grids with no
    warning')."""
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    art, args = d5
    al = GeneralisedAL(art, validate_basis=False)
    maps = al.complete_analysis(
        args, 0.1, 36.0, 0.0, 4 * np.pi, 8, 8, progress=False,
        engine="pallas_df64",
    )
    err = capsys.readouterr().err
    assert "finite" in err and "pallas_edf64" in err
    assert hasattr(al, "last_finite_fractions")
    assert min(al.last_finite_fractions) < 0.05
    del maps
