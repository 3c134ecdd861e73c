"""Model zoo: the four model families shipped with the reference test suite.

Each function returns ``(InflationModel, default_args)`` where
``default_args`` is ordered by the compiled symbol dictionary (the same
physical parameter values the reference tests use).  These are the standard
fixtures for benchmarks, examples and parity work:

* :func:`hyperinflation` — the README/doc example (reference tests/test_doc.py)
* :func:`angular` — angular inflation, JCAP11(2019)002 (tests/test_angular.py)
* :func:`egno` — EGNO supergravity, JCAP08(2014)044 (tests/test_egno.py)
* :func:`d5` — D5-brane model, JCAP02(2015)127 (tests/test_d5.py)
"""

from __future__ import annotations

import numpy as np
import sympy

from ..symbolic import InflationModel, InflationModelBuilder

__all__ = ["hyperinflation", "angular", "egno", "d5"]


def hyperinflation(silent: bool = True):
    """Doc-example model: V = ½m²(θ² − 2/(3r²)), diagonal metric ½·diag(1, r²).

    Golden values (reference tests/test_doc.py:50-51): V(2,−2; m=1) = 23/12,
    and the projected Hesse matrix [[0.41206897, −1.05517241], …]."""
    r, theta, m = sympy.symbols("r θ m")
    V = sympy.Rational(1, 2) * m**2 * (theta**2 - sympy.Rational(2, 3) / r**2)
    g = [[sympy.Rational(1, 2), 0], [0, sympy.Rational(1, 2) * r**2]]
    model = InflationModelBuilder.new(
        [r, theta], g, V, model_name="hyperinflation", silent=silent
    ).build()
    return model, np.array([1.0])


def angular(silent: bool = True):
    """Angular inflation: quadratic potential on a hyperbolic disc."""
    p, x = sympy.symbols("phi chi")
    mp, mx, a = sympy.symbols("m_phi m_chi alpha")
    potential = (a / 2 * ((mp * p) ** 2 + (mx * x) ** 2)).nsimplify()
    diag = 6 * a / (1 - p**2 - x**2) ** 2
    metric = [[diag, 0], [0, diag]]
    model = InflationModelBuilder.new(
        [p, x], metric, potential, model_name="angular", silent=silent
    ).build()
    # reference parameter point (tests/test_angular.py:63-66): α, m_χ, m_φ
    alpha_v = 1 / 600
    m_phi = 2e-5
    return model, np.array([alpha_v, m_phi * 3.0, m_phi])


def egno(silent: bool = True):
    """EGNO supergravity: metric from a Kähler potential."""
    alpha, m, c, a = sympy.symbols("alpha m c a")
    r, th = sympy.symbols("r θ")
    Phi, Phi_b, S, S_b = sympy.symbols("Phi Phi_B S S_B")
    K = (
        -3 * alpha * sympy.ln(Phi + Phi_b - c * (Phi + Phi_b - 1) ** 4)
        + (S * S_b) / (Phi + Phi_b) ** 3
    ).nsimplify()
    g00 = sympy.diff(sympy.diff(K, Phi), Phi_b)
    g00 = g00.subs({Phi: r + sympy.I * th, Phi_b: r - sympy.I * th})
    g00 = g00.subs({S: 0, S_b: 0}).nsimplify().simplify()
    metric = [[g00, 0], [0, g00]]
    potential = (
        (6 * m**2 * r**3 * ((a - r) ** 2 + th**2))
        / (a**2 * (2 * r - c * (1 - 2 * r) ** 4) ** (3 * alpha))
    ).nsimplify()
    model = InflationModelBuilder.new(
        [r, th],
        metric,
        potential,
        model_name="egno",
        silent=silent,
        simplify=False,
        assertions=False,
    ).build([[0, 1]])
    by_name = {"m": 1e-3, "a": 0.5, "c": 1000.0, "alpha": 1.0}
    return model, _args_by_symbol(model, by_name)


def d5(silent: bool = True):
    """D5-brane model: ln/sqrt-heavy, 10 parameters."""
    from sympy.simplify.radsimp import collect_sqrt

    r, th = sympy.symbols("r θ2")
    gs, ls, N = sympy.symbols("g_s l_s N")
    mu5 = 1 / ((2 * sympy.pi) ** 5 * ls**6)
    T5 = mu5 / gs
    u = sympy.symbols("u")
    rho = r / (3 * u)
    H = (
        (
            (sympy.pi * N * gs * ls**4)
            / (12 * u**4)
            * (2 / rho**2 - 2 * sympy.ln(1 / rho**2 + 1))
        )
        .nsimplify()
        .collect([u, r])
        .expand()
        .powsimp(force=True)
    )
    p, q = sympy.symbols("p q")
    F = (
        (H / 9 * (r**2 + 3 * u**2) ** 2 + (sympy.pi * q * ls**2) ** 2)
        .nsimplify()
        .collect([r, u])
        .expand()
        .powsimp()
    )
    gamma = 4 * sympy.pi**2 * ls**2 * p * q * T5 * gs
    sqrtF = sympy.sqrt(F)
    g00 = (
        collect_sqrt(
            4 * sympy.pi * p * T5 * sqrtF * ((r**2 + 6 * u**2) / (r**2 + p * u**2)),
            evaluate=True,
        )
        .expand()
        .powsimp()
    )
    g11 = (
        collect_sqrt(
            sympy.Rational(4, 6) * sympy.pi * p * T5 * sqrtF * (r**2 + 6 * u**2),
            evaluate=True,
        )
        .nsimplify()
        .collect([r, u])
        .expand()
        .powsimp()
    )
    metric = [[g00, 0], [0, g11]]
    Phi_min = (
        (
            sympy.Rational(5, 72)
            * (
                81 * (9 * rho**2 - 2) * rho**2
                + 162 * sympy.ln(9 * (rho**2 + 1))
                - 9
                - 160 * sympy.ln(10)
            )
        )
        .nsimplify()
        .collect([u])
        .expand()
        .powsimp()
    )
    a0, a1, b1 = sympy.symbols("a0 a1 b1")
    Phi_h = (
        (
            a0 * (2 / rho**2 - 2 * sympy.ln(1 / rho**2 + 1))
            + 2
            * a1
            * (6 + 1 / rho**2 - 2 * (2 + 3 * rho**2) * sympy.ln(1 + 1 / rho**2))
            * sympy.cos(th)
            + (b1 / 2) * (2 + 3 * rho**2) * sympy.cos(th)
        )
        .nsimplify()
        .collect([u, r])
        .expand()
        .powsimp()
    )
    V0 = sympy.symbols("V0")
    potential = (
        V0
        + (4 * sympy.pi * p * T5 / H) * (sympy.sqrt(F) - (ls**2) * sympy.pi * q * gs)
        + gamma * (Phi_min + Phi_h)
    )
    potential = potential.nsimplify().collect([ls, gs]).expand().powsimp()
    model = InflationModelBuilder.new(
        [r, th],
        metric,
        potential,
        model_name="d5",
        assertions=False,
        silent=silent,
        simplify=False,
    ).build([[1, 0]])
    by_name = {
        "V0": -1.17e-8,
        "N": 1000.0,
        "g_s": 0.01,
        "l_s": 501.961,
        "u": 50 * 501.961,
        "q": 1.0,
        "p": 5.0,
        "a0": 0.001,
        "a1": 0.0005,
        "b1": 0.001,
    }
    return model, _args_by_symbol(model, by_name)


def _args_by_symbol(model: InflationModel, by_name: dict) -> np.ndarray:
    """Order parameter values by the model's compiled symbol dictionary."""
    from ..lowering.registry import SymbolRegistry

    registry = SymbolRegistry.from_model(model)
    args = np.zeros(registry.n_parameters)
    for name, slot in registry.symbol_dictionary.items():
        if slot.startswith("args["):
            args[int(slot[5:-1])] = by_name[name]
    return args
