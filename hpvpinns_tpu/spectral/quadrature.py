"""Gauss–Jacobi and Gauss–Lobatto–Jacobi quadrature rules.

Covers the reference's `GaussJacobiWeights` / `GaussLobattoJacobiWeights`
(Utilities/GaussJacobiQuadRule_V3.py:38-61) without scipy: nodes come from the
Golub–Welsch eigenvalue method on the symmetric Jacobi tridiagonal matrix,
computed once on host in float64 (quadrature rules are offline constants in
this framework — they are baked into precomputed basis tensors, never traced).

The Lobatto rule includes both endpoints ±1; its interior nodes are the roots
of P'_{Q-1}^{(a,b)}, i.e. the Gauss–Jacobi nodes of order Q-2 with parameters
(a+1, b+1), exactly as the reference constructs them
(GaussJacobiQuadRule_V3.py:48).
"""

from __future__ import annotations

import math

import numpy as np


def _jacobi_mu0(a: float, b: float) -> float:
    """mu0 = integral of the Jacobi weight (1-x)^a (1+x)^b over [-1, 1]."""
    return math.exp(
        (a + b + 1) * math.log(2.0)
        + math.lgamma(a + 1)
        + math.lgamma(b + 1)
        - math.lgamma(a + b + 2)
    )


def gauss_jacobi(Q: int, a: float, b: float):
    """Gauss–Jacobi rule: Q nodes/weights exact for degree <= 2Q-1.

    Golub–Welsch: nodes are eigenvalues of the symmetric tridiagonal matrix of
    the monic Jacobi three-term recurrence; weights are mu0 * v[0]^2.
    Returns (x, w) as float64 numpy arrays, nodes ascending.
    """
    if Q < 1:
        raise ValueError(f"Q must be >= 1, got {Q}")
    alpha = np.zeros(Q)
    beta = np.zeros(Q)  # beta[k] used for offdiagonal sqrt(beta[k]), k>=1
    alpha[0] = (b - a) / (a + b + 2.0)
    for n in range(1, Q):
        s = 2 * n + a + b
        alpha[n] = (b * b - a * a) / (s * (s + 2.0))
        beta[n] = (
            4.0 * n * (n + a) * (n + b) * (n + a + b)
            / (s * s * (s + 1.0) * (s - 1.0))
        )
    T = np.diag(alpha)
    if Q > 1:
        off = np.sqrt(beta[1:])
        T += np.diag(off, 1) + np.diag(off, -1)
    eigval, eigvec = np.linalg.eigh(T)
    w = _jacobi_mu0(a, b) * eigvec[0, :] ** 2
    return eigval, w


def gauss_lobatto_jacobi(Q: int, a: float, b: float):
    """Gauss–Lobatto–Jacobi rule with Q nodes including both endpoints ±1.

    Weight formulas follow the classical GLJ identities used by the reference
    (GaussJacobiQuadRule_V3.py:49-56); the Legendre case (a=b=0) is
        w_i = 2 / (Q (Q-1) P_{Q-1}(x_i)^2),
    with the same expression at the endpoints.
    Returns (x, w) as float64 numpy arrays, nodes ascending, endpoints exact.
    """
    if Q < 2:
        raise ValueError(f"Lobatto rule needs Q >= 2, got {Q}")
    from hpvpinns_tpu.spectral.jacobi import jacobi

    if Q == 2:
        interior = np.array([])
    else:
        interior, _ = gauss_jacobi(Q - 2, a + 1.0, b + 1.0)
    x = np.concatenate([[-1.0], interior, [1.0]])

    PQm1 = jacobi(Q - 1, a, b, x)
    if a == 0.0 and b == 0.0:
        w = 2.0 / (Q * (Q - 1) * PQm1**2)
    else:
        cg = math.exp(
            (a + b + 1) * math.log(2.0)
            + math.lgamma(a + Q)
            + math.lgamma(b + Q)
            - math.lgamma(Q)  # (Q-1)!
            - math.lgamma(a + b + Q + 1)
        ) / (Q - 1)
        w = cg / PQm1**2
        w[0] *= b + 1.0
        w[-1] *= a + 1.0
    return x, w
