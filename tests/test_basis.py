"""Test-function basis phi_n = P_{n+1} - P_{n-1} and its analytic derivatives
(reference C6, Poisson-1D.py:157-183)."""

import numpy as np
import pytest
import scipy.special as sps

from hpvpinns_tpu.spectral.basis import make_test_basis

X = np.linspace(-1, 1, 201)


def test_phi_matches_legendre_difference():
    tb = make_test_basis(12, X)
    for n in range(1, 13):
        expected = sps.jacobi(n + 1, 0, 0)(X) - sps.jacobi(n - 1, 0, 0)(X)
        np.testing.assert_allclose(tb.phi[n - 1], expected, rtol=1e-12, atol=1e-12)


def test_phi_vanishes_at_endpoints():
    tb = make_test_basis(30, np.array([-1.0, 1.0]))
    np.testing.assert_allclose(tb.phi, 0.0, atol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 10])
def test_dphi_matches_polynomial_derivative(n):
    tb = make_test_basis(n, X)
    poly = np.polysub(sps.jacobi(n + 1, 0, 0), sps.jacobi(n - 1, 0, 0))
    np.testing.assert_allclose(tb.dphi[n - 1], np.polyder(poly, 1)(X), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(tb.d2phi[n - 1], np.polyder(poly, 2)(X), rtol=1e-9, atol=1e-9)


def test_reference_special_cases_n1_n2():
    """The reference special-cases n = 1, 2 (dropping the P_{m<0} terms,
    Poisson-1D.py:168-177); the uniform shift-identity here must agree."""
    tb = make_test_basis(2, X)
    d1_n1 = (1 + 2) / 2 * sps.jacobi(1, 1, 1)(X)
    d2_n1 = (1 + 2) * (1 + 3) / 4 * sps.jacobi(0, 2, 2)(X)
    np.testing.assert_allclose(tb.dphi[0], d1_n1, rtol=1e-12)
    np.testing.assert_allclose(tb.d2phi[0], d2_n1, rtol=1e-12)
    d1_n2 = (2 + 2) / 2 * sps.jacobi(2, 1, 1)(X) - 2 / 2 * sps.jacobi(0, 1, 1)(X)
    d2_n2 = (2 + 2) * (2 + 3) / 4 * sps.jacobi(1, 2, 2)(X)
    np.testing.assert_allclose(tb.dphi[1], d1_n2, rtol=1e-12)
    np.testing.assert_allclose(tb.d2phi[1], d2_n2, rtol=1e-12, atol=1e-12)


def test_boundary_tensors_shapes():
    tb = make_test_basis(7, np.linspace(-1, 1, 10))
    assert tb.phi.shape == (7, 10)
    assert tb.phi_b.shape == (7, 2)
    assert tb.dphi_b.shape == (7, 2)
    np.testing.assert_allclose(tb.phi_b, 0.0, atol=1e-10)
