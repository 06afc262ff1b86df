import numpy as np
import pytest

from mimsem_tpu.basis import gll, lagrange_eval, lagrange_deriv, edge_eval, make_basis

pytestmark = pytest.mark.smoke        # pure-numpy exactness checks, seconds


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7])
def test_gll_weights_sum(n):
    x, w = gll(n)
    assert abs(w.sum() - 2.0) < 1e-13
    assert abs(x[0] + 1) < 1e-15 and abs(x[-1] - 1) < 1e-15
    assert np.all(np.diff(x) > 0)


def test_gll_matches_reference_hardcoded():
    # src/Basis.cpp:39-45 order 3 and 4
    x3, w3 = gll(3)
    np.testing.assert_allclose(x3, [-1, -np.sqrt(0.2), np.sqrt(0.2), 1], atol=1e-14)
    np.testing.assert_allclose(w3, [1 / 6, 5 / 6, 5 / 6, 1 / 6], atol=1e-14)
    x4, w4 = gll(4)
    np.testing.assert_allclose(x4, [-1, -np.sqrt(3 / 7), 0, np.sqrt(3 / 7), 1], atol=1e-14)
    np.testing.assert_allclose(w4, [0.1, 49 / 90, 64 / 90, 49 / 90, 0.1], atol=1e-14)


@pytest.mark.parametrize("n", [2, 3, 5])
def test_gll_quadrature_exactness(n):
    # exact for degree 2n-1
    x, w = gll(n)
    for d in range(2 * n):
        exact = (1 - (-1) ** (d + 1)) / (d + 1)
        assert abs(np.sum(w * x ** d) - exact) < 1e-12, d


def test_lagrange_cardinality_and_partition():
    nodes, _ = gll(4)
    L = lagrange_eval(nodes, nodes)
    np.testing.assert_allclose(L, np.eye(5), atol=1e-13)
    xs = np.linspace(-1, 1, 11)
    np.testing.assert_allclose(lagrange_eval(nodes, xs).sum(1), 1.0, atol=1e-12)


def test_lagrange_deriv_exact_for_polys():
    nodes, _ = gll(4)
    xs = np.linspace(-1, 1, 7)
    coeffs = nodes ** 3  # interpolate f(x) = x^3
    D = lagrange_deriv(nodes, xs)
    np.testing.assert_allclose(D @ coeffs, 3 * xs ** 2, atol=1e-11)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_edge_histopolation_property(n):
    """Integral of e_j over node interval k equals delta_jk (exact conservation
    root property, src/Basis.cpp:277-286)."""
    nodes, _ = gll(n)
    # integrate with a fine Gauss rule per interval
    from numpy.polynomial.legendre import leggauss
    gx, gw = leggauss(20)
    for k in range(n):
        a, b = nodes[k], nodes[k + 1]
        xs = 0.5 * (b - a) * gx + 0.5 * (a + b)
        E = edge_eval(nodes, xs)  # (20, n)
        integ = 0.5 * (b - a) * gw @ E
        expect = np.zeros(n)
        expect[k] = 1.0
        np.testing.assert_allclose(integ, expect, atol=1e-12)


def test_edge_basis_spans_constants():
    """sum_j e_j(x) reproduces d/dx of sum of -l_k cumulative = 1 expansion:
    the constant function 1 has edge coefficients equal to interval lengths...
    here just check: derivative relation c_j = psi_{j+1}-psi_j maps linear psi=x
    to constant 1."""
    n = 4
    nodes, _ = gll(n)
    xs = np.linspace(-1, 1, 9)
    E = edge_eval(nodes, xs)
    c = np.diff(nodes)  # psi = x -> c_j = x_{j+1}-x_j
    np.testing.assert_allclose(E @ (c / c * np.diff(nodes)), np.ones_like(xs), atol=1e-12)


def test_make_basis_colocated_identity():
    b = make_basis(3)
    assert b.q == 3
    np.testing.assert_allclose(b.l_at_q, np.eye(4), atol=1e-13)
    assert b.B0.shape == (16, 16)
    np.testing.assert_allclose(b.B0, np.eye(16), atol=1e-13)
    assert b.B1x.shape == (16, 12)
    assert b.B2.shape == (16, 9)
    np.testing.assert_allclose(b.W.sum(), 4.0, atol=1e-13)
