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


def test_df64_engine_parity(al, doc_model_artifact):
    """Double-f32 engine vs true-f64 XLA (CPU: runs the jit fallback — the
    Pallas interpreter is excess-precision-unsafe for compensated
    arithmetic, see ops/pallas_kernels._df64_xla)."""
    shape = (64, 64)
    dfm = al.complete_analysis(
        PARAMS, *EXTENT, *shape, progress=False, engine="pallas_df64"
    )
    ref = al.complete_analysis(PARAMS, *EXTENT, *shape, progress=False)
    assert dfm[0].dtype == np.float64
    # consistency / eps_v / delta are well-conditioned: expect ~1e-12
    for k in (0, 1, 4):
        np.testing.assert_allclose(dfm[k], ref[k], rtol=5e-11, equal_nan=True)
    # eps_h / eta / omega amplify through near-cancellations: compare away
    # from the epsilon_h pole
    denom_ok = np.abs(ref[2]) < 1e3
    for k in (2, 3, 5):
        a, b = dfm[k][denom_ok], ref[k][denom_ok]
        mask = np.isfinite(b)
        np.testing.assert_allclose(a[mask], b[mask], rtol=1e-6)


def test_df32_arithmetic_survives_jit():
    """Regression guard: plain jit must preserve two_sum error terms (the
    Pallas interpreter does not — why _df64_xla exists)."""
    import jax

    from inflatox_tpu.lowering.df32 import DF

    x = jnp.asarray(np.linspace(0.9, 1.1, 257, dtype=np.float32))

    def chain(x):
        d = DF(x) * DF(x) - DF.const(1.0)
        return d.hi, d.lo

    h1, l1 = chain(x)
    h2, l2 = jax.jit(chain)(x)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    got = np.asarray(h2, np.float64) + np.asarray(l2, np.float64)
    want = np.asarray(x, np.float64) ** 2 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-14)


@pytest.mark.parametrize("kind_method", ["consistency", "consistency_rapidturn", "epsilon_v"])
def test_single_output_scan_engines(al, kind_method):
    """Every scan kind runs on all three engines and they agree."""
    shape = (16, 128)
    method = getattr(al, kind_method)
    ref = method(PARAMS, *EXTENT, *shape, progress=False)
    p32 = method(PARAMS, *EXTENT, *shape, progress=False, engine="pallas")
    d64 = method(PARAMS, *EXTENT, *shape, progress=False, engine="pallas_df64")
    assert p32.dtype == np.float32 and d64.dtype == np.float64
    # fp32 carries 24 bits; isolated pixels near the V→0 line amplify
    np.testing.assert_allclose(p32, ref, rtol=5e-4, atol=1e-6, equal_nan=True)
    np.testing.assert_allclose(d64, ref, rtol=1e-9, equal_nan=True)


def test_trajectory_pallas_df64(doc_model_artifact):
    """On-trajectory scans on the compensated engine (VERDICT round-1 item
    8): f64-grade agreement with the XLA path, all four kinds."""
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    al = GeneralisedAL(doc_model_artifact, validate_basis=False)
    rng = np.random.default_rng(3)
    traj = np.column_stack([
        rng.uniform(0.6, 2.4, 1000), rng.uniform(0.3, 2.9, 1000)
    ])
    args = np.array([1.0])
    ref = al.complete_analysis_ot(args, traj, progress=False)
    got = al.complete_analysis_ot(args, traj, progress=False,
                                  engine="pallas_df64")
    assert got[0].shape == ref[0].shape == (1000, 1)
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-10)  # eps_v
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-9, atol=1e-11)

    for meth in ("consistency_ot", "consistency_rapidturn_ot", "epsilon_v_ot"):
        r = getattr(al, meth)(args, traj, progress=False)
        g = getattr(al, meth)(args, traj, progress=False, engine="pallas_df64")
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-11)


def test_trajectory_pallas_edf64(doc_model_artifact):
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    al = GeneralisedAL(doc_model_artifact, validate_basis=False)
    traj = np.column_stack([
        np.linspace(0.6, 2.4, 100), np.linspace(0.3, 2.9, 100)
    ])
    args = np.array([1.0])
    ref = al.epsilon_v_ot(args, traj, progress=False)
    got = al.epsilon_v_ot(args, traj, progress=False, engine="pallas_edf64")
    np.testing.assert_allclose(got, ref, rtol=1e-11)


def test_engines_parameterless_model():
    """A model with zero free parameters runs on every engine (the scalar
    prefetch vector then carries only grid geometry)."""
    import sympy

    import inflatox_tpu as inflatox
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    x, y = sympy.symbols("x y")
    V = x**2 * y**2 + x**2 + y**2 + 1
    model = inflatox.InflationModelBuilder.new(
        [x, y], [[1, 0], [0, 1]], V, silent=True
    ).build()
    al = GeneralisedAL(inflatox.Compiler(model, silent=True).compile(),
                       validate_basis=False)
    args = np.array([])
    ref = al.complete_analysis(args, 0.5, 2.0, 0.5, 2.0, 16, 16,
                               progress=False, engine="xla")
    for engine in ("pallas", "pallas_df64", "pallas_edf64", "pallas_tf64"):
        got = al.complete_analysis(args, 0.5, 2.0, 0.5, 2.0, 16, 16,
                                   progress=False, engine=engine)
        both = np.isfinite(ref[1]) & np.isfinite(got[1])
        assert both.mean() > 0.9, engine
        rtol = 1e-4 if engine == "pallas" else 1e-10
        np.testing.assert_allclose(got[1][both], ref[1][both], rtol=rtol,
                                   err_msg=engine)


def test_pair_output_cpu_fallback(doc_model_artifact):
    """output='pair' works on the eager (non-TPU) path and recombines to
    the f64 result exactly."""
    from inflatox_tpu.ops.pallas_kernels import scan_pallas_df64

    args = np.array([1.0])
    extent = (0.5, 2.5, 0.25, 3.0)
    f64 = scan_pallas_df64(doc_model_artifact, "complete_analysis", args,
                           extent, (16, 16), output="f64")
    pairs = scan_pallas_df64(doc_model_artifact, "complete_analysis", args,
                             extent, (16, 16), output="pair")
    for (hi, lo), o in zip(pairs, f64):
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        np.testing.assert_allclose(got, np.asarray(o), rtol=1e-7,
                                   equal_nan=True)


def test_unknown_engine_raises(doc_model_artifact):
    from inflatox_tpu.consistency_conditions import GeneralisedAL

    al = GeneralisedAL(doc_model_artifact, validate_basis=False)
    with pytest.raises(ValueError, match="engine"):
        al.complete_analysis(np.array([1.0]), 0.0, 1.0, 0.0, 1.0, 8, 8,
                             progress=False, engine="bogus")
    with pytest.raises(ValueError, match="pair"):
        from inflatox_tpu.ops.pallas_kernels import scan_pallas_df64

        scan_pallas_df64(doc_model_artifact, "epsilon_v", np.array([1.0]),
                         (0.0, 1.0, 0.0, 1.0), (8, 8), output="planar")


def test_f64_output_is_host_numpy(doc_model_artifact):
    """Round 3: output='f64' is host-combined IEEE f64 (numpy) — on TPU the
    pair rides the mandatory fetch and the device cost of f64 delivery is
    the kernel alone (XLA:TPU f64 is itself a (hi, lo) double-word, so an
    on-device conversion is a repack of the same two words)."""
    from inflatox_tpu.ops.pallas_kernels import scan_pallas_df64

    args = np.array([1.0])
    extent = (0.5, 2.5, 0.25, 3.0)
    for output in ("f64",):
        outs = scan_pallas_df64(doc_model_artifact, "complete_analysis",
                                args, extent, (16, 16), output=output)
        assert all(isinstance(o, np.ndarray) for o in outs)
        assert all(o.dtype == np.float64 for o in outs)
    dev = scan_pallas_df64(doc_model_artifact, "complete_analysis", args,
                           extent, (16, 16), output="f64_device")
    assert all(hasattr(o, "block_until_ready") for o in dev)
    for a, b in zip(outs, dev):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-13,
                                   equal_nan=True)


def test_auto_tile_choices():
    """_auto_tile: 16-row blocks, widest column width minimizing padding
    (measured round 3, scripts/probe_r3_tilesweep*.py)."""
    from inflatox_tpu.ops.pallas_kernels import _auto_tile

    assert _auto_tile((4096, 4096)) == (16, 2048)
    assert _auto_tile((1024, 1024)) == (16, 1024)
    # 1000 rows: 16-row blocks pad 8 rows (0.8% — under the ~6% budget)
    assert _auto_tile((1000, 1000)) == (16, 1024)   # 1024 pads less than 2048
    assert _auto_tile((2048, 2048)) == (16, 2048)
    # 100 rows: 16-row blocks pad 12 rows vs 4 (8 extra > 100//16) → 8 rows
    assert _auto_tile((100, 100)) == (8, 128)
    assert _auto_tile((8, 4096)) == (8, 2048)       # short grids keep 8 rows
    assert _auto_tile((24, 4096)) == (8, 2048)      # 16 would pad 33% of rows
    assert _auto_tile((4, 1024)) == (8, 1024)       # sharded 4-row blocks
    assert _auto_tile((16, 512)) == (16, 512)
    # a 1536-wide grid: 512 divides exactly; 1024/2048 would pad
    assert _auto_tile((512, 1536)) == (16, 512)


def test_auto_tile_big_model_caps_width():
    """Big (narrow-strip) models cap the block width at 1024: the kernel
    traces the point pass once per strip, and a 2048-wide block doubles
    their minutes-scale Mosaic build for no measured win."""
    import os

    from inflatox_tpu.compiler import CompiledModel
    from inflatox_tpu.ops.pallas_kernels import _auto_tile

    bundle = os.path.join(os.path.dirname(__file__), "fixtures",
                          "egno_bundle.json")
    egno_artifact = CompiledModel.load(bundle)
    assert _auto_tile((4096, 4096), egno_artifact) == (16, 1024)
    assert _auto_tile((2048, 2048), egno_artifact) == (16, 1024)
