"""Direct variational coefficient recovery: two-phase field identification.

Joint optimization of (solution, coefficient field) is ill-posed — the
network absorbs field error within its own fit (measured plateau ~12-14%
field rel-L2 for the neural eps(x) model, benchmarks/MEASUREMENTS.md).  This
module exploits the structure the weak form exposes instead: **with the
solution u FROZEN, the var_form-1 weak residual is AFFINE in eps(x)**

    Res[e, n](eps) = b[e, n] - sum_j c_j A[e, n, j],
    eps(x) = sum_j c_j P_j(xi(x))                (Legendre expansion)

because eps enters the AdvDiff form-1 assembly linearly through
eps * u_x tested against phi' and eps_x * u_x tested against phi
(ops/assembly.py::advdiff_residual, reference formula AdvDiff.py:169-174
extended to variable eps).  Identification then reduces to ONE dense
least-squares solve — no optimizer, no initialization, and Tikhonov
regularization with an exact derivative-energy penalty.

No reference analog (the reference trains a single scalar by Adam,
AdvDiff.py:63); this is the spectral-method counterpart enabled by the
offline/online split.
"""

from __future__ import annotations

import numpy as np

from hpvpinns_tpu.spectral.jacobi import djacobi, jacobi_all


def legendre_field(coef: np.ndarray, domain=(-1.0, 1.0)):
    """eps(x) callable from Legendre coefficients on `domain` (generic ops —
    works with numpy and jax arrays)."""
    coef = np.asarray(coef, dtype=np.float64)
    a, b = domain
    half = (b - a) / 2.0

    def eps_fn(x):
        xi = (x - (a + b) / 2.0) / half
        P = jacobi_all(len(coef) - 1, 0.0, 0.0, xi)
        out = 0.0
        for j in range(len(coef)):
            out = out + coef[j] * P[j]
        return out

    return eps_fn


def fit_epsilon_field(problem, params, order: int = 8, reg: float = 0.0, u_fn=None):
    """Recover a space-dependent diffusion field eps(x) by linear least
    squares against the frozen trained solution.

    problem: a built advdiff Problem (1D space-time); params: trained
    parameters (u and, if trainable, the velocity are FROZEN — only eps is
    solved for).  order: number of Legendre modes; reg: Tikhonov weight on
    the exact derivative energy  int eps'(x)^2 dx (scale-matched to the
    residual rows).  u_fn overrides the frozen ansatz (oracle/analytic
    solutions in tests).

    Returns (coef [order], eps_fn, info) where info carries the per-row
    residual norms before/after.
    """
    import jax
    import jax.numpy as jnp

    from hpvpinns_tpu.ops.contract import contract_2d
    from hpvpinns_tpu.ops.fields import scalar_fields_2d

    if problem.name != "advdiff":
        raise ValueError(f"fit_epsilon_field supports advdiff problems, got {problem.name!r}")
    cfg = problem.config
    el = problem.data["elements"]
    bx, bt = problem.data["basis_x"], problem.data["basis_t"]

    if u_fn is None:
        u_fn = lambda X: problem.apply(params, X)
    flds = jax.jit(lambda x, y: scalar_fields_2d(u_fn, x, y, first_y_only=True))(el.x, el.y)
    ut = np.asarray(flds["uy"], dtype=np.float64)
    ux = np.asarray(flds["ux"], dtype=np.float64)

    v_of = problem.extras.get("v_of")
    V = np.asarray(v_of(params, el.x), dtype=np.float64) if v_of else cfg.velocity

    x = np.asarray(el.x, dtype=np.float64)  # [E, Qt, Qx]
    a_dom, b_dom = cfg.domain_x
    half = (b_dom - a_dom) / 2.0
    xi = (x - (a_dom + b_dom) / 2.0) / half
    P = jacobi_all(order - 1, 0.0, 0.0, xi)  # [J, E, Qt, Qx]
    dP = np.stack(
        [djacobi(j, 0.0, 0.0, xi, 1) / half for j in range(order)]
    )  # d/dx

    jac = (np.asarray(el.jac_x) * np.asarray(el.jac_y)).astype(np.float64)[:, None, None]
    jt = np.asarray(el.jac_y, dtype=np.float64)[:, None, None]
    wphi_x = np.asarray(bx.wphi, dtype=np.float64)
    wdphi_x = np.asarray(bx.wdphi, dtype=np.float64)
    wphi_t = np.asarray(bt.wphi, dtype=np.float64)
    mask = np.asarray(el.mask, dtype=np.float64)

    def C(bxm, btm, g):
        return np.asarray(contract_2d(jnp.asarray(bxm), jnp.asarray(btm), jnp.asarray(g)))

    # rhs: the eps-free part of the form-1 residual (= f_proj - advection part)
    b_vec = (np.asarray(el.f_proj, dtype=np.float64) - jac * C(wphi_x, wphi_t, ut + V * ux)) * mask
    # columns: the eps-dependent part per Legendre mode
    cols = []
    for j in range(order):
        Aj = jac * C(wphi_x, wphi_t, dP[j] * ux) + jt * C(wdphi_x, wphi_t, P[j] * ux)
        cols.append((Aj * mask).reshape(-1))
    A = np.stack(cols, axis=1)  # [rows, J]
    b_flat = b_vec.reshape(-1)

    if reg > 0:
        # Exact derivative-energy Gram matrix of the mapped Legendre basis:
        # int_a^b P'_j P'_k dx.  Computed by Gauss-Legendre quadrature once.
        from hpvpinns_tpu.spectral.quadrature import gauss_lobatto_jacobi

        xq, wq = gauss_lobatto_jacobi(2 * order + 2, 0.0, 0.0)
        dPq = np.stack([djacobi(j, 0.0, 0.0, xq, 1) / half for j in range(order)])
        G = np.einsum("q,jq,kq->jk", wq * half, dPq, dPq)
        # scale-match the penalty to the residual rows (mean row energy)
        lam = reg * (A * A).sum() / max(A.shape[0], 1)
        # Cholesky-ish augmentation: solve [A; sqrt(lam) L] c = [b; 0]
        w, Vg = np.linalg.eigh(G)
        L = (Vg * np.sqrt(np.maximum(w, 0.0))) @ Vg.T
        A_aug = np.vstack([A, np.sqrt(lam) * L])
        b_aug = np.concatenate([b_flat, np.zeros(order)])
    else:
        A_aug, b_aug = A, b_flat

    coef, *_ = np.linalg.lstsq(A_aug, b_aug, rcond=None)
    res_before = float(np.linalg.norm(b_flat))
    res_after = float(np.linalg.norm(A @ coef - b_flat))
    return (
        coef,
        legendre_field(coef, cfg.domain_x),
        {"residual_before": res_before, "residual_after": res_after, "order": order},
    )
