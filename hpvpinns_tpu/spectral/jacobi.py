"""Jacobi polynomial evaluation via the three-term recurrence.

Replaces the reference's scipy-backed `Jacobi`/`DJacobi`
(Utilities/GaussJacobiQuadRule_V3.py:24-33) with a jittable recurrence that
works on host (numpy) and device (jax.numpy) alike.  The k-th derivative uses
the same Gamma-coefficient shift identity the reference uses:

    d^k/dx^k P_n^{(a,b)}(x) = Gamma(a+b+n+1+k) / (2^k Gamma(a+b+n+1))
                              * P_{n-k}^{(a+k,b+k)}(x)

with the convention P_m = 0 for m < 0 (the reference encodes this convention
by special-casing n=1,2 in its dTest_fcn, Poisson-1D.py:164-183).
"""

from __future__ import annotations

import math

import numpy as np


def _recurrence_coeffs(n: int, a: float, b: float):
    """Coefficients (A, B, C) of  P_n = (A x + B) P_{n-1} - C P_{n-2}."""
    n2ab = 2 * n + a + b
    denom = 2 * n * (n + a + b) * (n2ab - 2)
    A = n2ab * (n2ab - 1) * (n2ab - 2) / denom
    B = (n2ab - 1) * (a * a - b * b) / denom
    C = 2 * (n + a - 1) * (n + b - 1) * n2ab / denom
    return A, B, C


def jacobi_all(nmax: int, a: float, b: float, x):
    """All Jacobi polynomials P_0..P_nmax at x, stacked on a new leading axis.

    Works with numpy or jax arrays (pure arithmetic, jit/vmap-safe; nmax is a
    static Python int so the loop unrolls at trace time).
    Returns an array of shape (nmax+1,) + x.shape.
    """
    xp = _array_module(x)
    x = xp.asarray(x)
    out = [xp.ones_like(x)]
    if nmax >= 1:
        out.append((a - b) / 2 + (a + b + 2) / 2 * x)
    for n in range(2, nmax + 1):
        A, B, C = _recurrence_coeffs(n, a, b)
        out.append((A * x + B) * out[n - 1] - C * out[n - 2])
    return xp.stack(out)


def jacobi(n: int, a: float, b: float, x):
    """P_n^{(a,b)}(x); returns zeros for n < 0 (reference convention)."""
    xp = _array_module(x)
    if n < 0:
        return xp.zeros_like(xp.asarray(x))
    return jacobi_all(n, a, b, x)[n]


def djacobi(n: int, a: float, b: float, x, k: int = 1):
    """k-th derivative of P_n^{(a,b)} via the Gamma shift identity
    (Utilities/GaussJacobiQuadRule_V3.py:30-33)."""
    if n - k < 0:
        xp = _array_module(x)
        return xp.zeros_like(xp.asarray(x))
    c = math.exp(math.lgamma(a + b + n + 1 + k) - math.lgamma(a + b + n + 1))
    c /= 2.0**k
    return c * jacobi(n - k, a + k, b + k, x)


def _array_module(x):
    """numpy for numpy/python inputs, jax.numpy for jax tracers/arrays."""
    if isinstance(x, (np.ndarray, float, int, list, tuple)):
        return np
    try:  # pragma: no cover - exercised only with jax inputs
        import jax.numpy as jnp

        return jnp
    except ImportError:  # pragma: no cover
        return np
