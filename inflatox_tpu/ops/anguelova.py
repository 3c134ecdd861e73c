"""Point math for the (generalised) Anguelova-Lazaroiu consistency condition.

These are the TPU equivalents of the reference's ``ops`` module
(anguelova.rs:99-171) — the single source of truth for the formulas, shared
by grid scans, on-trajectory scans, and the Pallas kernels.  All functions
are elementwise over broadcastable arrays.

Numerical-parity notes (deliberately replicated from the reference):

* ``complete_analysis_op`` computes ε_V **without** the ½ factor
  (anguelova.rs:119), while ``epsilon_v_only_op`` **includes** it
  (anguelova.rs:138-140).  The discrepancy is the reference's shipped
  behavior and is part of the parity contract.
* ``complete_analysis_op``'s consistency uses |lhs − rhs| in the numerator
  (anguelova.rs:115) whereas the standalone conditions use ||lhs| − |rhs||
  (anguelova.rs:153,162).
* ``V_tt`` is the expression exactly as written at anguelova.rs:121-122
  (the first and third numerator terms partially cancel; kept verbatim).

Deliberate divergence:

* ``flag_quantum_diff_op`` implements the *documented* intent
  (consistency_conditions.py:489-495): flag where **|∂_a V| < accuracy** for
  every raw gradient component.  The reference as shipped evaluates the
  metric-normalized gradient basis vector with a signed comparison
  (anguelova.rs:166-170, ``out.iter().all(|&x| x <= accuracy)``), which its
  own docstring contradicts on both counts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lowering import accmath as _amath

__all__ = [
    "complete_analysis_op",
    "consistency_only_op",
    "consistency_rapidturn_only_op",
    "epsilon_v_only_op",
    "flag_quantum_diff_op",
]


def _ratio_metric(num, lhs, rhs):
    """|num| / (|lhs| + |rhs|), clamped to the mathematical bound ≤ 1.

    XLA's f64 division is faithfully rounded (≤3 ulp), so x/x can land a hair
    above 1.0 where C's correctly-rounded division returns exactly 1.0 (the
    reference relies on that: tests/test_doc.py:58 asserts nanmax ≤ 1).  The
    clamp restores the invariant without changing any in-range value beyond
    the division's own rounding.  NaNs propagate unchanged."""
    return jnp.minimum(jnp.abs(num) / (jnp.abs(lhs) + jnp.abs(rhs)), 1.0)


def complete_analysis_op(v, v00, v10, v11, grad_sq):
    """All six AL-analysis quantities from one set of model evaluations.

    Mirrors ops::complete_analysis (anguelova.rs:103-135).  Inputs are the
    potential V, projected Hesse components V_vv, V_vw, V_ww and |∇V|², all
    broadcastable arrays.  Returns (consistency, ε_V, ε_H, η_∥, δ, ω).
    """
    lhs = v11 / v
    rhs = 3.0 + 3.0 * (v00 / v10) ** 2 + (v00 / v) * (v10 / v00) ** 2
    consistency = _ratio_metric(lhs - rhs, lhs, rhs)

    epsilon_v = grad_sq / v**2  # no ½ here — anguelova.rs:119

    vtt = (v00 * v10**2 + v11 * v00**2 - 2.0 * v00 * v10**2) / (v00**2 + v10**2)
    vt2 = epsilon_v / (1.0 + (v00 / v10) ** 2)
    epsilon_h = 3.0 * (epsilon_v - vt2) / (epsilon_v + jnp.abs(vtt) / v - vt2)
    tan_delta = jnp.abs(v10 / v00)
    delta = _amath.atan(tan_delta)  # native f64 arctan is ~2e-8
    omega = jnp.sqrt((vtt / v) * (3.0 - epsilon_h))
    # the reference computes ω·tan(δ) − 3 with δ = atan(tan_delta)
    # (anguelova.rs:128-132); tan(atan(x)) ≡ x, so use x directly — equal to
    # within rounding, and avoids tan (absent from the Pallas TPU primitive
    # set)
    eta_parallel = omega * tan_delta - 3.0
    return consistency, epsilon_v, epsilon_h, eta_parallel, delta, omega


def epsilon_v_only_op(v, grad_sq):
    """ε_V = ½|∇V|²/V² (anguelova.rs:138-140 — the ½ IS present here)."""
    return 0.5 * grad_sq / v**2


def consistency_rapidturn_only_op(v, v00, v10, v11):
    """Original AL rapid-turn condition (anguelova.rs:143-154):
    lhs = V_ww/V, rhs = 3 (V_vw/V_vv)², out = ||lhs|−|rhs||/(|lhs|+|rhs|)."""
    lhs = v11 / v
    rhs = 3.0 * (v10 / v00) ** 2
    return _ratio_metric(jnp.abs(lhs) - jnp.abs(rhs), lhs, rhs)


def consistency_only_op(v, v00, v10, v11):
    """Generalised condition (anguelova.rs:157-163):
    lhs = V_ww/V − 3, rhs = 3 (V_vv/V_vw)² + (V_vv/V)(V_vw/V_vv)²."""
    lhs = v11 / v - 3.0
    rhs = 3.0 * (v00 / v10) ** 2 + (v00 / v) * (v10 / v00) ** 2
    return _ratio_metric(jnp.abs(lhs) - jnp.abs(rhs), lhs, rhs)


def flag_quantum_diff_op(grad_components, accuracy):
    """Saddle-point mask: True where every |∂_a V| ≤ accuracy.

    ``grad_components`` is a sequence of broadcastable arrays (one per field).
    See module docstring for the divergence from anguelova.rs:166-170."""
    mask = None
    for g in grad_components:
        m = jnp.abs(g) <= accuracy
        mask = m if mask is None else jnp.logical_and(mask, m)
    return mask


def complete_analysis_op_df(v, v00, v10, v11, grad_sq, nm=None):
    """Double-f32 variant of :func:`complete_analysis_op` — the same
    quantities over :class:`~inflatox_tpu.lowering.df32.DF` values (used by
    the high-precision Pallas kernel).  Returns six DF values.

    ``nm`` selects the numerics module: :mod:`~inflatox_tpu.lowering.df32`
    (default) or :mod:`~inflatox_tpu.lowering.edf32` (range-extended) — both
    expose the same NUM/abs_/minimum/atan/sqrt/normalize surface.

    Scale-invariant restructuring (df divides are the kernel's costliest op;
    all forms agree with anguelova.rs:103-135 algebraically, diverge only at
    the ~2^-46 rounding level — far inside the ≤1e-10 parity budget):

    * the ratio metric |L−R|/(|L|+|R|) is invariant under any common nonzero
      factor, so lhs = v11/v and rhs = 3 + 3(v00/v10)² + (v00/v)(v10/v00)²
      are scaled by F = v·v00·v10² into *division-free* quartics
      L = v11·v00·v10², R = 3v·v00·v10² + 3v·v00³ + v10⁴.  The reference's
      exact-zero division NaNs (v, v00 or v10 ≡ 0) are reproduced with an
      explicit mask.
    * ε_H: multiplying numerator and denominator by s·v² (s = v00²+v10² > 0)
      collapses 3(ε_V−vt2)/(ε_V+|vtt|/v−vt2) to 3A/(A+|W|·v) with
      A = |∇V|²·v00² and W = v11·v00² − v00·v10² (the Vtt numerator — the
      reference's first/third terms cancel algebraically).
    * ω² = (vtt/v)(3−ε_H) = 3·W·|W| / (s·(A+|W|·v)) — v cancels exactly.

    The quartics would underflow f32 for ~1e-13-scale model quantities
    (angular class), so inputs go through ``nm.normalize_homogeneous`` — an
    error-free common power-of-two rescaling all six outputs are invariant
    under."""
    outs = [None] * 6

    def emit(k, val):
        outs[k] = val

    complete_analysis_op_df_stream(v, v00, v10, v11, grad_sq, emit, nm=nm)
    return tuple(outs)


def complete_analysis_op_df_stream(v, v00, v10, v11, grad_sq, emit, nm=None):
    """Streaming form of :func:`complete_analysis_op_df`: calls
    ``emit(index, DF)`` for each output the moment it is complete, in a
    liveness-minimizing order.

    Why: inside the Pallas kernel the whole tail would otherwise hold ~25
    double-f32 intermediates live at once — far beyond the VPU register
    file — and Mosaic spills; measured round 2, the six outputs computed
    together cost ~4× the sum of the pieces.  Emitting each output as soon
    as it exists lets the scheduler retire its registers against the output
    store.  Output indices follow the complete_analysis order
    (consistency, ε_V, ε_H, η_∥, δ, ω)."""
    from ..lowering import df32

    dfm = nm or df32
    one = dfm.NUM.const(1.0)

    zero_div = dfm.is_zero(v) | dfm.is_zero(v00) | dfm.is_zero(v10)
    v, v00, v10, v11, grad_sq = dfm.normalize_homogeneous(
        v, v00, v10, v11, grad_sq
    )

    v00s = v00.sq()
    v10s = v10.sq()
    a_eh = grad_sq * v00s
    emit(1, grad_sq / v.sq())  # ε_V, no ½ — anguelova.rs:119; frees grad_sq

    w = v00 * v10s  # v00·v10²  (shared by L, R and the Vtt numerator)
    wtt = v11 * v00s - w  # Vtt numerator
    L = v11 * w
    R = (v * w + v * (v00 * v00s)) * 3.0 + v10s.sq()
    num = dfm.abs_(L - R)
    den = dfm.abs_(L) + dfm.abs_(R)
    emit(0, dfm.where(zero_div, dfm.nan_like(v), dfm.minimum(num / den, one)))

    d_eh = a_eh + dfm.abs_(wtt) * v  # |vtt|/v keeps v's sign — abs on W only
    emit(2, a_eh * 3.0 / d_eh)  # ε_H

    s2 = v00s + v10s
    omega = dfm.sqrt((wtt * dfm.abs_(wtt)) * 3.0 / (s2 * d_eh))
    emit(5, omega)

    tan_delta = dfm.abs_(v10 / v00)
    emit(3, omega * tan_delta - 3.0)  # η_∥
    # at exact v00 ≡ 0 the df division NaNs where the reference's C computes
    # atan(inf) = π/2 — restore that limit (η stays NaN vs the reference's
    # ±inf there; docs/divergences.md)
    delta = dfm.atan(tan_delta)
    v00_zero = dfm.is_zero(v00) & ~dfm.is_zero(v10)
    emit(4, dfm.where(v00_zero, dfm.NUM.const(1.5707963267948966), delta))  # δ


def consistency_only_op_df(v, v00, v10, v11, nm=None):
    """df32 variant of :func:`consistency_only_op` (``nm`` as in
    :func:`complete_analysis_op_df`).  Scale-invariant form with
    F = v·v00·v10²: L = (v11 − 3v)·v00·v10², R = 3v·v00³ + v10⁴ — one divide
    instead of four (see :func:`complete_analysis_op_df`)."""
    from ..lowering import df32

    dfm = nm or df32
    zero_div = dfm.is_zero(v) | dfm.is_zero(v00) | dfm.is_zero(v10)
    zero = dfm.NUM.const(0.0)
    v, v00, v10, v11, _ = dfm.normalize_homogeneous(v, v00, v10, v11, zero)
    v10s = v10.sq()
    w = v00 * v10s
    L = (v11 - v * 3.0) * w
    R = (v * (v00 * v00.sq())) * 3.0 + v10s.sq()
    num = dfm.abs_(dfm.abs_(L) - dfm.abs_(R))
    out = dfm.minimum(num / (dfm.abs_(L) + dfm.abs_(R)), dfm.NUM.const(1.0))
    return dfm.where(zero_div, dfm.nan_like(v), out)


def consistency_rapidturn_only_op_df(v, v00, v10, v11, nm=None):
    """df32 variant of :func:`consistency_rapidturn_only_op` (``nm`` as in
    :func:`complete_analysis_op_df`).  Scale-invariant form with F = v·v00²:
    L = v11·v00², R = 3v·v10²."""
    from ..lowering import df32

    dfm = nm or df32
    zero_div = dfm.is_zero(v) | dfm.is_zero(v00)
    zero = dfm.NUM.const(0.0)
    v, v00, v10, v11, _ = dfm.normalize_homogeneous(v, v00, v10, v11, zero)
    L = v11 * v00.sq()
    R = v * v10.sq() * 3.0
    num = dfm.abs_(dfm.abs_(L) - dfm.abs_(R))
    out = dfm.minimum(num / (dfm.abs_(L) + dfm.abs_(R)), dfm.NUM.const(1.0))
    return dfm.where(zero_div, dfm.nan_like(v), out)


def epsilon_v_only_op_df(v, grad_sq, nm=None):
    """df32 variant of :func:`epsilon_v_only_op` (the ½ IS present)."""
    del nm  # pure operator arithmetic — works for DF and EDF alike
    return grad_sq * 0.5 / v**2
