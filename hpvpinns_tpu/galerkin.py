"""Classical Galerkin spectral-element direct solver (1D Poisson).

The deterministic companion to the VPINN: the same weak form the network is
trained on —  a(u, v) = ∫ u'v' = ∫ f v  — solved exactly (to quadrature
precision) by assembling and inverting the stiffness system on a C0
spectral-element space built from this framework's own spectral layer:

  * per element: linear hat modes N0 = (1-xi)/2, N1 = (1+xi)/2 for C0
    continuity + the same boundary-vanishing bubble modes
    phi_n = P_{n+1} - P_{n-1} the VPINN tests against (spectral/basis.py);
  * Gauss-Lobatto-Jacobi quadrature (spectral/quadrature.py) for all
    integrals.

Use cases: minting machine-precision reference solutions for problems with
no closed form, quantifying the VPINN optimization gap (how far training is
from the best function the discrete weak form determines), and validating
the spectral layer end to end.  Host-side float64 numpy — these systems are
tiny and solved once (offline tier, like all other precomputation).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hpvpinns_tpu.geometry.mesh import Interval1D
from hpvpinns_tpu.spectral.basis import make_test_basis
from hpvpinns_tpu.spectral.quadrature import gauss_lobatto_jacobi


@dataclass(frozen=True)
class SpectralElementSolution1D:
    """u_h in the C0 spectral-element space: nodal values at element
    boundaries + per-element bubble coefficients."""

    mesh: Interval1D
    p: int  # bubbles per element = p - 1
    nodal: np.ndarray  # [E+1]
    bubble: np.ndarray  # [E, p-1]

    def __call__(self, x):
        x = np.asarray(x, dtype=np.float64)
        flat = x.reshape(-1)
        e = self.mesh.locate(flat)
        lo = self.mesh.grid[e]
        hi = self.mesh.grid[e + 1]
        xi = 2.0 * (flat - lo) / (hi - lo) - 1.0
        n_b = self.p - 1
        u = self.nodal[e] * (1 - xi) / 2 + self.nodal[e + 1] * (1 + xi) / 2
        if n_b > 0:
            tb = make_test_basis(n_b, xi)  # phi: [n_b, P]
            # per point: sum_n bubble[e_point, n] * phi_n(xi_point)
            u = u + np.sum(self.bubble[e] * tb.phi.T, axis=1)
        return u.reshape(x.shape)


def solve_poisson1d(
    mesh: Interval1D,
    p: int,
    f_fn,
    bc: tuple,
    n_quad: int | None = None,
) -> SpectralElementSolution1D:
    """Solve -u'' = f on the mesh with Dirichlet bc = (u(a), u(b)) using
    degree-p elements (1 linear + p-1 bubble modes per element).

    Returns the discrete solution; accuracy is spectral in p for smooth f.
    """
    if p < 1:
        raise ValueError(f"polynomial degree p must be >= 1, got {p}")
    E = mesh.n_elem
    n_b = p - 1
    Q = n_quad or max(2 * p + 2, 10)
    xi, w = gauss_lobatto_jacobi(Q, 0.0, 0.0)

    # Reference-element basis values/derivatives: rows = [N0, N1, bubbles].
    tb = make_test_basis(max(n_b, 1), xi)
    B_val = np.vstack([(1 - xi) / 2, (1 + xi) / 2] + ([tb.phi[:n_b]] if n_b else []))
    B_der = np.vstack([np.full_like(xi, -0.5), np.full_like(xi, 0.5)] + ([tb.dphi[:n_b]] if n_b else []))
    nb_local = 2 + n_b

    # Element stiffness on the reference element: K_ref[i,j] = sum w B'_i B'_j
    K_ref = (B_der * w) @ B_der.T  # scaled by 1/jac per element below

    # Global DOF numbering: nodes 0..E, then bubbles element-major.
    n_nodes = E + 1
    n_dof = n_nodes + E * n_b
    K = np.zeros((n_dof, n_dof))
    F = np.zeros(n_dof)
    jac = mesh.jacobians
    x_elem = mesh.map_points(xi)  # [E, Q]
    f_vals = np.asarray(f_fn(x_elem), dtype=np.float64).reshape(E, len(xi))

    for e in range(E):
        dofs = [e, e + 1] + [n_nodes + e * n_b + i for i in range(n_b)]
        Ke = K_ref / jac[e]
        Fe = jac[e] * (B_val * w) @ f_vals[e]
        K[np.ix_(dofs, dofs)] += Ke
        F[dofs] += Fe

    # Dirichlet elimination at the two end nodes.
    ua, ub = bc
    fixed = {0: float(ua), E: float(ub)}
    free = np.asarray([i for i in range(n_dof) if i not in fixed], dtype=np.int64)
    F_free = F[free] - K[np.ix_(free, list(fixed))] @ np.asarray(list(fixed.values()))
    u_free = np.linalg.solve(K[np.ix_(free, free)], F_free)

    u = np.zeros(n_dof)
    u[free] = u_free
    for i, v in fixed.items():
        u[i] = v
    nodal = u[:n_nodes]
    bubble = u[n_nodes:].reshape(E, n_b) if n_b else np.zeros((E, 0))
    return SpectralElementSolution1D(mesh=mesh, p=p, nodal=nodal, bubble=bubble)


def vpinn_gap_1d(problem, params, p: int = 40, n_points: int = 2001) -> dict:
    """Quantify the VPINN's distance from (a) the exact solution and (b) the
    direct spectral-element solution of the same weak form on the same mesh.

    Returns rel-L2 of the network vs exact, of the direct solve vs exact,
    and of the network vs the direct solve (the pure optimization gap)."""
    from hpvpinns_tpu.evaluate import predict, rel_l2

    mesh = problem.extras["mesh"]
    if not isinstance(mesh, Interval1D):
        raise TypeError("vpinn_gap_1d supports 1D problems")
    f_fn = problem.extras.get("f_rhs")
    if f_fn is None:
        raise ValueError("problem.extras['f_rhs'] missing — vpinn_gap_1d needs the problem's forcing")

    cfg = problem.config
    u_dir = solve_poisson1d(
        mesh, p, f_fn, (float(problem.exact(np.array(cfg.domain[0]))), float(problem.exact(np.array(cfg.domain[1]))))
    )
    x = np.linspace(cfg.domain[0], cfg.domain[1], n_points)[:, None]
    u_net = predict(problem, params, x).reshape(-1)
    u_g = u_dir(x).reshape(-1)
    u_ex = np.asarray(problem.exact(x)).reshape(-1)
    return {
        "rel_l2_net_vs_exact": rel_l2(u_net, u_ex),
        "rel_l2_galerkin_vs_exact": rel_l2(u_g, u_ex),
        "rel_l2_net_vs_galerkin": rel_l2(u_net, u_g),
    }
