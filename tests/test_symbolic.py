"""Unit tests for the symbolic engine.

Coverage mirrors reference tests/test_symbolic.py:25-79 (inner product,
normalization, Christoffel symbols on flat/curved metrics, Gram-Schmidt) and
adds builder/end-to-end checks the reference lacks."""

import pytest
import sympy

from inflatox_tpu import InflationModelBuilder


@pytest.fixture
def angular_model():
    f1, f2 = sympy.symbols("phi_1 phi_2")
    m1, m2, alpha = sympy.symbols("m_1 m_2 alpha")
    v = (alpha / 2) * ((m1 * f1) ** 2 + (m2 * f2) ** 2)
    diag = 6 * alpha / ((1 - f1**2 - f2**2) ** 2)
    metric = [[diag, 0], [0, diag]]
    return InflationModelBuilder.new(
        [f1, f2], metric, v, "[test] angular inflation model", silent=True
    )


@pytest.fixture
def trivial_model():
    f1, f2 = sympy.symbols("phi_1 phi_2")
    m1, m2 = sympy.symbols("m_1 m_2")
    v = (m1 * f1) ** 2 + (m2 * f2) ** 2
    metric = [[1, 0], [0, 1]]
    return InflationModelBuilder.new(
        [f1, f2], metric, v, "[test] trivial inflation model", silent=True
    )


def test_inner_prod_orthogonal_units(trivial_model):
    """Euclidean metric: e₀·e₁ = 0 (reference test coverage, different style)."""
    assert trivial_model.inner_prod([1, 0], [0, 1]) == 0
    assert trivial_model.inner_prod([1, 0], [1, 0]) == 1


def test_normalize_unit_norm(trivial_model):
    a = sympy.symbols("a")
    vnorm = trivial_model.normalize([1, a**2])
    norm_sq = trivial_model.inner_prod(vnorm, vnorm)
    assert sympy.simplify(norm_sq - 1) == 0


@pytest.mark.parametrize("idx", [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)])
def test_trivial_christoffels_vanish(trivial_model, idx):
    a, b, c = idx
    gamma = trivial_model.christoffels()
    assert sympy.simplify(gamma[a][b][c]) == 0


def test_angular_christoffels_symmetric(angular_model):
    gamma = angular_model.christoffels()
    asym = [
        sympy.simplify(gamma[a][b][c] - gamma[a][c][b])
        for a in range(2)
        for b in range(2)
        for c in range(b + 1, 2)
    ]
    assert all(v == 0 for v in asym)


def test_gramm_schmidt_orthonormalizes(trivial_model):
    a, b = sympy.symbols("a b")
    basis0 = trivial_model.normalize([1, a**2])
    candidate = [sympy.sqrt(b), sympy.sin(a)]
    new_vec = trivial_model.gramm_schmidt([basis0], candidate)
    assert sympy.simplify(trivial_model.inner_prod(new_vec, new_vec) - 1) == 0
    assert sympy.simplify(trivial_model.inner_prod(basis0, new_vec)) == 0


# ---- beyond reference coverage -------------------------------------------- #


def test_build_produces_orthonormal_basis(angular_model):
    model = angular_model.build()
    assert model.dim == 2
    # v must be G-normalized: check symbolically via the builder helpers
    ip = angular_model.inner_prod(model.basis[0], model.basis[0])
    assert sympy.simplify(ip - 1) == 0


def test_build_hesse_is_symmetric_for_trivial(trivial_model):
    model = trivial_model.build()
    # flat metric, diagonal potential: projected Hesse must be symmetric
    diff = sympy.simplify(model.hesse_cmp[0][1] - model.hesse_cmp[1][0])
    assert diff == 0


def test_eom_h_contains_half_kinetic_term(trivial_model):
    """Textbook Friedmann constraint (documented divergence from the
    reference, which drops the ½ — reference symbolic.py:707-711)."""
    model = trivial_model.build()
    chi = model.coordinate_tangents
    expected = sympy.sqrt(
        (model.potential + (chi[0] ** 2 + chi[1] ** 2) / 2) / 3
    )
    assert sympy.simplify(model.eom_h**2 - expected**2) == 0


def test_guesses_dimension_check(trivial_model):
    with pytest.raises(ValueError):
        trivial_model.build(guesses=[[1, 0], [0, 1]])  # must be dim-1 vectors


def test_model_serialization_roundtrip(trivial_model):
    from inflatox_tpu.symbolic import InflationModel

    model = trivial_model.build()
    restored = InflationModel.from_dict(model.to_dict())
    assert restored.model_name == model.model_name
    assert sympy.simplify(restored.potential - model.potential) == 0
    assert sympy.simplify(restored.eom_h - model.eom_h) == 0
    for a in range(2):
        for b in range(2):
            assert (
                sympy.simplify(restored.hesse_cmp[a][b] - model.hesse_cmp[a][b]) == 0
            )
