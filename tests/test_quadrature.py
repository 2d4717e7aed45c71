"""Quadrature rules vs scipy oracles and polynomial-exactness properties
(reference C3, Utilities/GaussJacobiQuadRule_V3.py:38-61)."""

import numpy as np
import pytest
import scipy.special as sps

from hpvpinns_tpu.spectral.quadrature import gauss_jacobi, gauss_lobatto_jacobi


def _jacobi_weight_moment(k, a, b):
    """Integral of x^k (1-x)^a (1+x)^b over [-1, 1] (adaptive-quadrature
    oracle, independent of the Golub-Welsch construction under test)."""
    from scipy.integrate import quad

    val, err = quad(
        lambda x: x**k * (1 - x) ** a * (1 + x) ** b, -1, 1, epsabs=1e-13, epsrel=1e-13
    )
    assert err < 1e-10
    return val


@pytest.mark.parametrize("a,b", [(0.0, 0.0), (1.0, 1.0), (0.5, 1.5)])
@pytest.mark.parametrize("Q", [2, 5, 10, 40])
def test_gauss_jacobi_matches_scipy(Q, a, b):
    x, w = gauss_jacobi(Q, a, b)
    xs, ws = sps.roots_jacobi(Q, a, b)
    np.testing.assert_allclose(x, xs, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(w, ws, rtol=1e-10, atol=1e-13)


@pytest.mark.parametrize("a,b", [(0.0, 0.0), (1.0, 1.0), (0.5, 1.5)])
@pytest.mark.parametrize("Q", [3, 6, 11])
def test_gauss_jacobi_polynomial_exactness(Q, a, b):
    """Exact for degree <= 2Q-1 against the Jacobi weight."""
    x, w = gauss_jacobi(Q, a, b)
    for k in range(2 * Q):
        np.testing.assert_allclose(
            np.sum(w * x**k),
            _jacobi_weight_moment(k, a, b),
            rtol=1e-9,
            atol=1e-12,
            err_msg=f"degree {k}",
        )


@pytest.mark.parametrize("Q", [2, 3, 5, 10, 80])
def test_lobatto_legendre_basics(Q):
    x, w = gauss_lobatto_jacobi(Q, 0.0, 0.0)
    assert x[0] == -1.0 and x[-1] == 1.0
    assert np.all(np.diff(x) > 0)
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-12)


@pytest.mark.parametrize("Q", [3, 5, 10, 20])
def test_lobatto_legendre_polynomial_exactness(Q):
    """GLL with Q points is exact for degree <= 2Q-3."""
    x, w = gauss_lobatto_jacobi(Q, 0.0, 0.0)
    for k in range(2 * Q - 2):
        exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
        np.testing.assert_allclose(np.sum(w * x**k), exact, rtol=1e-9, atol=1e-12)


def test_lobatto_interior_nodes_are_jacobi_roots():
    """Interior GLL nodes are roots of P'_{Q-1} = Gauss-Jacobi(Q-2, 1, 1)
    nodes, exactly as the reference constructs them
    (GaussJacobiQuadRule_V3.py:48)."""
    Q = 7
    x, _ = gauss_lobatto_jacobi(Q, 0.0, 0.0)
    roots, _ = sps.roots_jacobi(Q - 2, 1.0, 1.0)
    np.testing.assert_allclose(x[1:-1], roots, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("a,b", [(1.0, 1.0), (0.5, 1.5), (2.0, 0.0)])
@pytest.mark.parametrize("Q", [3, 5, 9])
def test_lobatto_general_ab_polynomial_exactness(Q, a, b):
    """General (alpha, beta) Lobatto rule: exact for degree <= 2Q-3."""
    x, w = gauss_lobatto_jacobi(Q, a, b)
    assert x[0] == -1.0 and x[-1] == 1.0
    for k in range(2 * Q - 2):
        np.testing.assert_allclose(
            np.sum(w * x**k),
            _jacobi_weight_moment(k, a, b),
            rtol=1e-9,
            atol=1e-12,
            err_msg=f"degree {k}",
        )
