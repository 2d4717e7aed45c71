"""Jacobi recurrence vs scipy oracles (reference C1/C2,
Utilities/GaussJacobiQuadRule_V3.py:24-33)."""

import numpy as np
import pytest
import scipy.special as sps

from hpvpinns_tpu.spectral.jacobi import djacobi, jacobi, jacobi_all

X = np.linspace(-1, 1, 41)


@pytest.mark.parametrize("a,b", [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.5, 1.5)])
@pytest.mark.parametrize("n", [0, 1, 2, 3, 7, 15])
def test_jacobi_matches_scipy(n, a, b):
    expected = sps.jacobi(n, a, b)(X)
    np.testing.assert_allclose(jacobi(n, a, b, X), expected, rtol=1e-12, atol=1e-12)


def test_jacobi_all_stacks_orders():
    out = jacobi_all(10, 0.0, 0.0, X)
    assert out.shape == (11, len(X))
    for n in range(11):
        np.testing.assert_allclose(out[n], sps.jacobi(n, 0, 0)(X), rtol=1e-12, atol=1e-12)


def test_jacobi_negative_order_is_zero():
    np.testing.assert_array_equal(jacobi(-1, 0.0, 0.0, X), np.zeros_like(X))


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("n", [1, 2, 3, 8])
def test_djacobi_matches_polynomial_derivative(n, k):
    # Oracle: differentiate scipy's explicit polynomial coefficients.
    poly = np.polyder(sps.jacobi(n, 0.0, 0.0), k)
    np.testing.assert_allclose(djacobi(n, 0.0, 0.0, X, k), poly(X), rtol=1e-10, atol=1e-10)


def test_djacobi_underflow_order_is_zero():
    np.testing.assert_array_equal(djacobi(1, 0.0, 0.0, X, k=2), np.zeros_like(X))


def test_jacobi_works_under_jit():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jacobi(5, 0.0, 0.0, x))
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(X))), sps.jacobi(5, 0, 0)(X), rtol=1e-12
    )
