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


def _weak_fit_arrays(problem):
    """Shared float64 host views of an advdiff problem's weak-form tensors
    plus the sum-factorized contraction closure — the common substrate of
    the linear-fit/ALS machinery."""
    import jax.numpy as jnp

    from hpvpinns_tpu.ops.contract import contract_2d

    el = problem.data["elements"]
    bx, bt = problem.data["basis_x"], problem.data["basis_t"]

    def C(bxm, btm, g):
        return np.asarray(contract_2d(jnp.asarray(bxm), jnp.asarray(btm), jnp.asarray(g)))

    return {
        "el": el,
        "x": np.asarray(el.x, dtype=np.float64),
        "jac": (np.asarray(el.jac_x) * np.asarray(el.jac_y)).astype(np.float64)[:, None, None],
        "jt": np.asarray(el.jac_y, dtype=np.float64)[:, None, None],
        "wphi_x": np.asarray(bx.wphi, dtype=np.float64),
        "wdphi_x": np.asarray(bx.wdphi, dtype=np.float64),
        "wphi_t": np.asarray(bt.wphi, dtype=np.float64),
        "mask": np.asarray(el.mask, dtype=np.float64),
        "f_proj": np.asarray(el.f_proj, dtype=np.float64),
        "C": C,
    }


def _u_fields(problem, params, u_fn=None):
    """(u_t, u_x) of the frozen ansatz (or an override) on the quadrature
    grid, host float64."""
    import jax

    from hpvpinns_tpu.ops.fields import scalar_fields_2d

    el = problem.data["elements"]
    if u_fn is None:
        u_fn = lambda X: problem.apply(params, X)  # noqa: E731
    flds = jax.jit(lambda x, y: scalar_fields_2d(u_fn, x, y, first_y_only=True))(el.x, el.y)
    return (
        np.asarray(flds["uy"], dtype=np.float64),
        np.asarray(flds["ux"], dtype=np.float64),
    )


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
    if problem.name != "advdiff":
        raise ValueError(f"fit_epsilon_field supports advdiff problems, got {problem.name!r}")
    cfg = problem.config
    el = problem.data["elements"]
    ut, ux = _u_fields(problem, params, u_fn)

    v_of = problem.extras.get("v_of")
    V = np.asarray(v_of(params, el.x), dtype=np.float64) if v_of else cfg.velocity

    W = _weak_fit_arrays(problem)
    jac, jt, mask, C = W["jac"], W["jt"], W["mask"], W["C"]
    wphi_x, wdphi_x, wphi_t = W["wphi_x"], W["wdphi_x"], W["wphi_t"]
    a_dom, b_dom = cfg.domain_x
    half = (b_dom - a_dom) / 2.0
    xi = (W["x"] - (a_dom + b_dom) / 2.0) / half
    P = jacobi_all(order - 1, 0.0, 0.0, xi)  # [J, E, Qt, Qx]
    dP = np.stack(
        [djacobi(j, 0.0, 0.0, xi, 1) / half for j in range(order)]
    )  # d/dx

    # rhs: the eps-free part of the form-1 residual (= f_proj - advection part)
    b_vec = (W["f_proj"] - jac * C(wphi_x, wphi_t, ut + V * ux)) * mask
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
    info = {
        "residual_before": res_before, "residual_after": res_after, "order": order,
        # the raw linear system, for the closed-form covariance of the
        # estimate (uncertainty.lstsq_covariance)
        "A": A, "b": b_flat,
        "reg_gram": (lam * (L.T @ L)) if reg > 0 else None,
    }
    return coef, legendre_field(coef, cfg.domain_x), info


def fit_coefficient_fields(
    problem, params, eps_order: int = 6, vel_order: int = 0,
    reg: float = 0.0, u_fn=None,
):
    """Jointly recover eps(x) AND V(x) by ONE linear least-squares solve.

    With u frozen, the form-1 weak residual is affine in BOTH coefficient
    fields (eps enters through the diffusion IBP pair, V through the
    advection term) — so simultaneous identification of the two Legendre
    expansions is still a single lstsq, something the joint-optimization
    route cannot decouple.  `vel_order=0` freezes the velocity at the
    problem's own (trainable or true) field and reduces to
    fit_epsilon_field's problem.

    IDENTIFIABILITY CAP (measured, tests/test_manufactured_advdiff.py): the
    non-divergence weak form aliases V(x) against -d(eps)/dx — both multiply
    phi * u_x; only the ∫ eps phi' u_x term separates them.  Joint recovery
    is accurate for LOW-order velocity blocks (vel_order <= 2, i.e. constant
    / linear shear — oracle-u errors 7e-3/9e-5 at (8,2) with reg ~1e-6) and
    degrades sharply for vel_order >= 3, where whole eps-mode directions
    become near-null.  For richer velocity fields, identify V first (the
    manufactured-forcing optimization route) and pass vel_order=0.

    Returns (eps_coef, eps_fn, vel_coef, vel_fn, info); vel_coef/vel_fn are
    None when vel_order=0.  Tikhonov `reg` penalizes the derivative energy
    of BOTH fields (scale-matched per block).
    """
    import jax
    import jax.numpy as jnp

    if problem.name != "advdiff":
        raise ValueError(f"fit_coefficient_fields supports advdiff problems, got {problem.name!r}")
    cfg = problem.config
    el = problem.data["elements"]
    ut, ux = _u_fields(problem, params, u_fn)

    W = _weak_fit_arrays(problem)
    jac, jt, mask, C = W["jac"], W["jt"], W["mask"], W["C"]
    wphi_x, wdphi_x, wphi_t = W["wphi_x"], W["wdphi_x"], W["wphi_t"]
    a_dom, b_dom = cfg.domain_x
    half = (b_dom - a_dom) / 2.0
    xi = (W["x"] - (a_dom + b_dom) / 2.0) / half
    n_modes = max(eps_order, vel_order)
    P = jacobi_all(n_modes - 1, 0.0, 0.0, xi)
    dP = np.stack([djacobi(j, 0.0, 0.0, xi, 1) / half for j in range(n_modes)])

    if vel_order > 0:
        # rhs holds only the coefficient-free physics (time derivative)
        b_vec = (W["f_proj"] - jac * C(wphi_x, wphi_t, ut)) * mask
    else:
        v_of = problem.extras.get("v_of")
        V = np.asarray(v_of(params, el.x), dtype=np.float64) if v_of else cfg.velocity
        b_vec = (W["f_proj"] - jac * C(wphi_x, wphi_t, ut + V * ux)) * mask

    cols, blocks = [], []
    for j in range(eps_order):  # diffusion block (IBP pair)
        Aj = jac * C(wphi_x, wphi_t, dP[j] * ux) + jt * C(wdphi_x, wphi_t, P[j] * ux)
        cols.append((Aj * mask).reshape(-1))
    blocks.append(("eps", eps_order))
    for j in range(vel_order):  # advection block
        Aj = jac * C(wphi_x, wphi_t, P[j] * ux)
        cols.append((Aj * mask).reshape(-1))
    if vel_order:
        blocks.append(("vel", vel_order))
    A = np.stack(cols, axis=1)
    b_flat = b_vec.reshape(-1)

    # Column equilibration: the eps block's columns are O(eps/V) ~ 30x
    # smaller than the velocity block's (the coefficient SCALES differ), so
    # raw lstsq + any uniform penalty crushes the diffusion signal.  Solve
    # in unit-column scaling, then unscale.
    col_scale = np.linalg.norm(A, axis=0)
    col_scale[col_scale == 0] = 1.0
    A_s = A / col_scale[None, :]

    if reg > 0:
        lam = reg * (A_s * A_s).sum() / max(A.shape[0], 1)
        L = np.sqrt(lam) * np.eye(A.shape[1])
        A_aug = np.vstack([A_s, L])
        b_aug = np.concatenate([b_flat, np.zeros(A.shape[1])])
    else:
        A_aug, b_aug = A_s, b_flat

    coef, *_ = np.linalg.lstsq(A_aug, b_aug, rcond=None)
    coef = coef / col_scale
    eps_coef = coef[:eps_order]
    info = {
        "residual_before": float(np.linalg.norm(b_flat)),
        "residual_after": float(np.linalg.norm(A @ coef - b_flat)),
        "eps_order": eps_order,
        "vel_order": vel_order,
    }
    vel_coef = coef[eps_order:] if vel_order else None
    vel_fn = legendre_field(vel_coef, cfg.domain_x) if vel_order else None
    return eps_coef, legendre_field(eps_coef, cfg.domain_x), vel_coef, vel_fn, info


def als_identify(
    problem,
    space_order: int = 16,
    time_order: int = 12,
    eps_order: int = 8,
    w_data: float = 10.0,
    eps_reg: float = 1e-8,
    iters: int = 6,
    eps_init: float = 0.1,
):
    """NETWORK-FREE inverse identification by alternating linear least
    squares: the weak residual is BILINEAR in (u, eps), so alternating

        eps fixed  ->  u = argmin ||weak rows||^2 + w_data^2 ||data rows||^2
                       (u in a global spectral tensor basis: boundary-
                        vanishing bubbles in x, Legendre in t — LINEAR)
        u fixed    ->  eps(x) by the direct Legendre fit (LINEAR)

    converges in 2-3 rounds with no optimizer, no initialization art, and
    no network.  Measured (f64 CPU, MEASUREMENTS.md): clean dense data
    recovers the sin eps(x) truth to 4e-4 field rel-L2 (vs 6.5e-2 for the
    neural route — 150x) with u at 2e-9; the flip side is data hunger —
    sparse sensing (<= 7 stations) or strong noise degrade it faster than
    the compactly-parameterized neural field.  No reference analog (the
    reference trains a scalar by Adam, AdvDiff.py:63).

    Requires: 1D space-time advdiff problem with homogeneous side walls
    (the bubble basis vanishes there by construction — the benchmark's BC,
    AdvDiff.py:351-353).  The velocity is treated as KNOWN: it is read from
    the problem's initial parameters, so on a `velocity_trainable=True`
    problem that is `velocity_init`, NOT the truth — ALS then identifies
    eps against the wrong advection field (warned).  Use
    `fit_coefficient_fields` / `reduced_identify` for joint (eps, V).

    Returns (u_fn, eps_coef, eps_fn, info): u_fn(X [P,2]) -> [P,1] evaluates
    the recovered solution; info carries the per-round trajectories.
    """
    from hpvpinns_tpu.spectral.basis import make_test_basis

    if getattr(problem.config, "velocity_trainable", False):
        import warnings

        warnings.warn(
            "als_identify treats the velocity as KNOWN but this problem has "
            "velocity_trainable=True: the value used is velocity_init "
            f"({problem.config.velocity_init}), not the truth. Identify "
            "(eps, V) jointly with fit_coefficient_fields/reduced_identify "
            "instead.",
            stacklevel=2,
        )

    if problem.name != "advdiff":
        raise ValueError(f"als_identify supports advdiff problems, got {problem.name!r}")
    cfg = problem.config
    el = problem.data["elements"]
    bx, bt = problem.data["basis_x"], problem.data["basis_t"]
    T = cfg.t_final
    a_dom, b_dom = cfg.domain_x
    half = (b_dom - a_dom) / 2.0

    x_g = np.asarray(el.x, dtype=np.float64)  # [E, Qt, Qx]
    t_g = np.asarray(el.y, dtype=np.float64)

    def space_basis(x):
        """phi_i, phi_i' at arbitrary points (mapped bubbles; vanish at the
        walls)."""
        xi = (np.asarray(x, dtype=np.float64).reshape(-1) - (a_dom + b_dom) / 2.0) / half
        tb = make_test_basis(space_order, xi)
        return np.asarray(tb.phi), np.asarray(tb.dphi) / half  # [S, P]

    def time_basis(t):
        tau = 2.0 * np.asarray(t, dtype=np.float64).reshape(-1) / T - 1.0
        P = np.asarray(jacobi_all(time_order - 1, 0.0, 0.0, tau))
        dP = np.stack(
            [djacobi(m, 0.0, 0.0, tau, 1) * 2.0 / T for m in range(time_order)]
        )
        return P, dP  # [M, P]

    shape = x_g.shape
    PHI, dPHI = space_basis(x_g)      # [S, E*Qt*Qx]
    PSI, dPSI = time_basis(t_g)       # [M, E*Qt*Qx]
    PHI = PHI.reshape((space_order,) + shape)
    dPHI = dPHI.reshape((space_order,) + shape)
    PSI = PSI.reshape((time_order,) + shape)
    dPSI = dPSI.reshape((time_order,) + shape)

    W = _weak_fit_arrays(problem)
    jac, jt, mask, C = W["jac"], W["jt"], W["mask"], W["C"]
    wphi_x, wdphi_x, wphi_t = W["wphi_x"], W["wdphi_x"], W["wphi_t"]

    v_of = problem.extras.get("v_of")
    params0 = problem.init_params(__import__("jax").random.key(0))
    V = np.asarray(v_of(params0, el.x), dtype=np.float64) if v_of else cfg.velocity
    V = np.broadcast_to(np.asarray(V, dtype=np.float64), shape)

    b_weak = (W["f_proj"] * mask).reshape(-1)
    n_c = space_order * time_order

    # Data rows from the problem's own sampled data (boundary + IC + sensors).
    Xb = np.asarray(problem.data["xb"], dtype=np.float64)
    ub = np.asarray(problem.data["ub"], dtype=np.float64).reshape(-1)
    Ps_d, _ = space_basis(Xb[:, 0])
    Pt_d, _ = time_basis(Xb[:, 1])
    B_data = (Ps_d[:, None, :] * Pt_d[None, :, :]).reshape(n_c, -1).T  # [n_data, n_c]

    def u_solve(eps_q, epsx_q):
        A = np.empty((mask.size, n_c))
        k = 0
        for i in range(space_order):
            for m in range(time_order):
                ut_im = dPSI[m] * PHI[i]
                ux_im = PSI[m] * dPHI[i]
                r = jac * C(wphi_x, wphi_t, ut_im + (V + epsx_q) * ux_im) + jt * C(
                    wdphi_x, wphi_t, eps_q * ux_im
                )
                A[:, k] = (r * mask).reshape(-1)
                k += 1
        A_full = np.vstack([A, w_data * B_data])
        b_full = np.concatenate([b_weak, w_data * ub])
        c, *_ = np.linalg.lstsq(A_full, b_full, rcond=None)
        return c

    def eps_solve(c):
        cm = c.reshape(space_order, time_order)
        ut = np.einsum("im,m...,i...->...", cm, dPSI, PHI)
        ux = np.einsum("im,m...,i...->...", cm, PSI, dPHI)
        xi = (x_g - (a_dom + b_dom) / 2.0) / half
        P_leg = jacobi_all(eps_order - 1, 0.0, 0.0, xi)
        dP_leg = np.stack(
            [djacobi(j, 0.0, 0.0, xi, 1) / half for j in range(eps_order)]
        )
        b_vec = (W["f_proj"] - jac * C(wphi_x, wphi_t, ut + V * ux)) * mask
        cols = []
        for j in range(eps_order):
            Aj = jac * C(wphi_x, wphi_t, dP_leg[j] * ux) + jt * C(
                wdphi_x, wphi_t, P_leg[j] * ux
            )
            cols.append((Aj * mask).reshape(-1))
        A = np.stack(cols, axis=1)
        cs = np.linalg.norm(A, axis=0)
        cs[cs == 0] = 1.0
        A_s = A / cs
        lam = eps_reg * (A_s * A_s).sum() / max(A.shape[0], 1)
        A_aug = np.vstack([A_s, np.sqrt(lam) * np.eye(eps_order)])
        b_aug = np.concatenate([b_vec.reshape(-1), np.zeros(eps_order)])
        coef, *_ = np.linalg.lstsq(A_aug, b_aug, rcond=None)
        return coef / cs

    eps_coef = np.zeros(eps_order)
    eps_coef[0] = eps_init
    history = []
    c = None
    for it in range(iters):
        eps_fn_k = legendre_field(eps_coef, cfg.domain_x)
        eps_q = np.asarray(eps_fn_k(x_g))
        h = 1e-6
        epsx_q = (np.asarray(eps_fn_k(x_g + h)) - np.asarray(eps_fn_k(x_g - h))) / (2 * h)
        c = u_solve(eps_q, epsx_q)
        eps_coef = eps_solve(c)
        history.append([float(v) for v in eps_coef])

    eps_fn = legendre_field(eps_coef, cfg.domain_x)
    cm = c.reshape(space_order, time_order)

    def u_fn(X):
        X = np.asarray(X, dtype=np.float64)
        Ps, _ = space_basis(X[:, 0])
        Pt, _ = time_basis(X[:, 1])
        return np.einsum("im,ip,mp->p", cm, Ps, Pt).reshape(-1, 1)

    info = {
        "eps_coef_history": history,
        "space_order": space_order,
        "time_order": time_order,
        "eps_order": eps_order,
    }
    return u_fn, eps_coef, eps_fn, info


def reduced_identify(
    problem,
    eps_order: int = 1,
    bounds=(1e-4, 1.5),
    p: int = 40,
    xatol: float = 1e-12,
    x0=None,
    maxiter: int = 400,
    identify_velocity: bool = False,
):
    """Reduced-formulation identification: eliminate u entirely by solving
    the FORWARD problem exactly per candidate coefficient and minimizing the
    sensor-data misfit

        eps* = argmin_eps  sum_s ( u_galerkin(eps)(x_s, t_s) - d_s )^2

    with galerkin.solve_advdiff (spectral in x, expm-exact in t) as the
    inner solver.  For a SCALAR coefficient (eps_order=1) the outer problem
    is 1-D and Brent-bounded search identifies it to the data's information
    limit: measured 1.3e-8 relative error from the reference's own
    15-sensor layout in 0.7 s / 16 forward solves (the reference's Adam
    route reaches ~2e-2 after 15000 iterations — AdvDiff.py:63,194).
    For Legendre FIELDS (eps_order >= 2) a Nelder-Mead outer loop exists
    but is NOT recommended: measured (7x5 sensors, orders 3-4, 1600-1900
    solves) the derivative-free search stalls near ~0.33 field rel-L2 even
    though each inner solve is exact — the sensor misfit is flat in the
    higher field modes and the coefficient scales are disparate.  For
    fields use als_identify (dense data) or the neural route (sparse).

    Uses the problem's interior sensors as data and the problem's exact
    initial condition (the IC is GIVEN data in this problem class,
    AdvDiff.py:351-353).  Homogeneous side walls required (solve_advdiff).

    `identify_velocity=True` ALSO identifies the scalar advection velocity
    jointly (Nelder-Mead over (eps, V); scalar eps only): measured
    (eps, V) to (3.6e-8, 1.5e-10) in 183 solves / ~11 s from the
    benchmark's own 15 sensors — vs the joint-optimization route's
    (7.5e-2, 5e-3) at record budgets.

    Returns (coef, eps_fn, info) with info = {misfit, n_solves, method};
    with identify_velocity the recovered V is info["velocity"].
    """
    from hpvpinns_tpu.galerkin import solve_advdiff

    if problem.name != "advdiff":
        raise ValueError(f"reduced_identify supports advdiff problems, got {problem.name!r}")
    cfg = problem.config
    mesh = problem.extras["mesh"]
    exact = problem.exact
    vfn = problem.extras.get("velocity_fn")
    vel = vfn if vfn is not None else cfg.velocity
    f_fn = problem.extras.get("f_rhs")
    u0 = lambda x: np.asarray(  # noqa: E731
        exact(x.reshape(-1, 1), np.zeros((x.size, 1)))
    ).reshape(x.shape)

    Xb = np.asarray(problem.data["xb"], dtype=np.float64)
    ub = np.asarray(problem.data["ub"], dtype=np.float64).reshape(-1)
    a_dom, b_dom = cfg.domain_x
    # interior sensors only: boundary/IC rows carry no eps information
    sel = (Xb[:, 1] > 1e-12) & (Xb[:, 0] > a_dom + 1e-12) & (Xb[:, 0] < b_dom - 1e-12)
    Xs, ds = Xb[sel], ub[sel]
    if Xs.shape[0] == 0:
        raise ValueError("problem has no interior sensors — nothing to identify from")

    n_solves = [0]
    _xchk = np.linspace(a_dom, b_dom, 129)
    _d0 = float(np.sum(ds**2)) + 1.0  # penalty scale for infeasible candidates

    def misfit(coef):
        coef = np.atleast_1d(np.asarray(coef, dtype=np.float64))
        if len(coef) == 1:
            eps = float(coef[0])
            emin = eps
        else:
            eps = legendre_field(coef, cfg.domain_x)
            emin = float(np.min(np.asarray(eps(_xchk))))
        if emin <= 0:
            # anti-diffusion blows the forward solve up (expm overflow):
            # smooth infeasibility penalty instead of a solve
            return _d0 * (1.0 + abs(emin))
        sol = solve_advdiff(mesh.axis_x, p, u0, eps, vel, f_fn=f_fn)
        n_solves[0] += 1
        return float(np.sum((sol(Xs[:, 0], Xs[:, 1]) - ds) ** 2))

    if identify_velocity:
        if eps_order != 1:
            raise ValueError("identify_velocity requires eps_order=1 (scalar eps)")
        from scipy.optimize import minimize

        def misfit_ev(z):
            eps_c, V_c = float(z[0]), float(z[1])
            if eps_c <= 0:
                return _d0 * (1.0 + abs(eps_c))
            sol = solve_advdiff(mesh.axis_x, p, u0, eps_c, V_c, f_fn=f_fn)
            n_solves[0] += 1
            return float(np.sum((sol(Xs[:, 0], Xs[:, 1]) - ds) ** 2))

        z0 = [0.5 * (bounds[0] + bounds[1]), 0.5] if x0 is None else list(x0)
        res = minimize(
            misfit_ev, np.asarray(z0, dtype=np.float64), method="Nelder-Mead",
            options={"xatol": xatol, "fatol": 1e-20, "maxiter": maxiter},
        )
        coef = np.array([res.x[0]])
        eps_fn = legendre_field(coef, cfg.domain_x)
        return coef, eps_fn, {
            "misfit": float(res.fun), "n_solves": n_solves[0],
            "method": "nelder-mead (eps, V)", "velocity": float(res.x[1]),
        }

    if eps_order == 1:
        from scipy.optimize import minimize_scalar

        res = minimize_scalar(
            misfit, bounds=bounds, method="bounded", options={"xatol": xatol}
        )
        coef = np.array([res.x])
        mis = float(res.fun)
        method = "brent-bounded"
    else:
        from scipy.optimize import minimize

        if x0 is None:
            x0 = np.zeros(eps_order)
            x0[0] = 0.5 * (bounds[0] + bounds[1])
        res = minimize(
            misfit, np.asarray(x0, dtype=np.float64), method="Nelder-Mead",
            options={"xatol": xatol, "fatol": 1e-18, "maxiter": maxiter},
        )
        coef = np.asarray(res.x)
        mis = float(res.fun)
        method = "nelder-mead"

    eps_fn = legendre_field(coef, cfg.domain_x)
    return coef, eps_fn, {"misfit": mis, "n_solves": n_solves[0], "method": method}


def reduced_identify2d(
    problem,
    p: int = 12,
    x0=None,
    xatol: float = 1e-10,
    maxiter: int = 400,
):
    """Reduced-formulation identification for the 2D space-time family:
    Nelder-Mead over (eps, vx, vy) with the exact tensor-product forward
    solver (galerkin.solve_advdiff2d) in the inner loop, minimizing the
    interior-sensor misfit.  The 3-scalar outer problem stays derivative-
    free-tractable (a few hundred exact solves).

    Returns (coef [eps, vx, vy], info).  Requires homogeneous side walls
    (the advdiff2d family's manufactured problem satisfies them).
    """
    from hpvpinns_tpu.galerkin import solve_advdiff2d

    if problem.name != "advdiff2d":
        raise ValueError(f"reduced_identify2d supports advdiff2d problems, got {problem.name!r}")
    cfg = problem.config
    mesh = problem.extras["mesh"]
    f_fn = problem.extras["f_rhs"]
    exact = problem.exact
    u0 = lambda X, Y: np.asarray(exact(X, Y, np.zeros_like(X)))  # noqa: E731

    Xb = np.asarray(problem.data["xb"], dtype=np.float64)
    ub = np.asarray(problem.data["ub"], dtype=np.float64).reshape(-1)
    (ax, bx_), (ay, by_) = cfg.domain_x, cfg.domain_y
    sel = (
        (Xb[:, 2] > 1e-12)
        & (Xb[:, 0] > ax + 1e-12) & (Xb[:, 0] < bx_ - 1e-12)
        & (Xb[:, 1] > ay + 1e-12) & (Xb[:, 1] < by_ - 1e-12)
    )
    Xs, ds = Xb[sel], ub[sel]
    if Xs.shape[0] == 0:
        raise ValueError("problem has no interior sensors — nothing to identify from")

    n_solves = [0]
    _d0 = float(np.sum(ds**2)) + 1.0

    def misfit(z):
        eps_c, vx_c, vy_c = (float(v) for v in z)
        if eps_c <= 0:
            return _d0 * (1.0 + abs(eps_c))
        sol = solve_advdiff2d(
            mesh.axis_x, mesh.axis_y, p, u0, eps_c, vx_c, vy_c, f_fn=f_fn
        )
        n_solves[0] += 1
        return float(np.sum((sol(Xs[:, 0], Xs[:, 1], Xs[:, 2]) - ds) ** 2))

    from scipy.optimize import minimize

    if x0 is None:
        x0 = [0.5, 0.5, 0.5]
    res = minimize(
        misfit, np.asarray(x0, dtype=np.float64), method="Nelder-Mead",
        options={"xatol": xatol, "fatol": 1e-20, "maxiter": maxiter},
    )
    return np.asarray(res.x), {
        "misfit": float(res.fun), "n_solves": n_solves[0], "method": "nelder-mead"
    }


def reduced_identify_field(
    problem,
    eps_order: int = 8,
    p: int = 24,
    eps_init: float = 0.1,
    maxiter: int = 300,
    smooth_reg: float = 0.0,
):
    """Differentiable reduced-formulation FIELD identification: eps(x) by
    gradient-based optimization THROUGH the exact forward solver.

    The semi-discrete operator is rebuilt in jax from fixed basis tensors,
    propagated with jax.scipy.linalg.expm (differentiable), and the sensor
    misfit minimized by L-BFGS-B with EXACT jax gradients — the adjoint the
    derivative-free outer loop lacked.  eps is LOG-parameterized
    (eps = exp(sum_j s_j P_j)): positive by construction, so no infeasible
    forward solves.

    Measured regime map (f64 CPU, MEASUREMENTS.md) — this route is the
    SPARSE- and NOISY-data field champion:

      clean sparse (7x5 sensors):  2.4e-2   (ALS diverges; neural ~0.12)
      noisy 1e-3, dense (19x20):   9.6e-2   (ALS 0.26)
      noisy 1e-3, SPARSE (7x5):    0.11 with smooth_reg ~1e-5 (0.58
                                   unregularized — the penalty int s'(x)^2
                                   on the LOG field is the sparse+noisy
                                   lever)
      clean dense:                 ~1e-2    (ALS wins there: 4e-4 — its
                                   weak-form rows act as dense physics
                                   sensors; the reduced misfit only sees
                                   the real sensors)

    Requires: homogeneous side walls and forcing that is absent or
    separable f = e^{-rt} g(x) (auto-detected — all manufactured problems
    qualify; non-separable forcing raises).

    Returns (s_coef, eps_fn, info); eps_fn evaluates exp(P s) on numpy/jnp
    arrays.
    """
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import expm as jexpm

    from hpvpinns_tpu.galerkin import _axis_h0_quadrature, _detect_exp_decay

    if problem.name != "advdiff":
        raise ValueError(
            f"reduced_identify_field supports advdiff problems, got {problem.name!r}"
        )
    cfg = problem.config
    mesh = problem.extras["mesh"]
    exact = problem.exact
    vfn = problem.extras.get("velocity_fn")
    f_fn = problem.extras.get("f_rhs")
    a_dom, b_dom = cfg.domain_x
    half = (b_dom - a_dom) / 2.0

    B, Bx, wq, x_g, point_eval, M = _axis_h0_quadrature(mesh.axis_x, p, 2 * p + 2)
    V_g = np.asarray(vfn(x_g) if vfn is not None else cfg.velocity, dtype=np.float64)
    V_g = np.broadcast_to(V_g, x_g.shape)

    xi_g = (x_g - (a_dom + b_dom) / 2.0) / half
    P_leg = np.asarray(jacobi_all(eps_order - 1, 0.0, 0.0, xi_g))
    dP_leg = np.stack(
        [djacobi(j, 0.0, 0.0, xi_g, 1) / half for j in range(eps_order)]
    )
    T_adv = (B * (wq * V_g)) @ Bx.T
    T1 = np.einsum("aq,q,bq->abq", B, wq, Bx)   # eps_x term
    T2 = np.einsum("aq,q,bq->abq", Bx, wq, Bx)  # eps term

    u0_g = np.asarray(
        exact(x_g.reshape(-1, 1), np.zeros((x_g.size, 1)))
    ).reshape(-1)
    c0 = np.linalg.solve(M, (B * wq) @ u0_g)
    M_inv = np.linalg.inv(M)

    rate, b_sep = 0.0, np.zeros_like(c0)
    has_f = f_fn is not None
    if has_f:
        rate = _detect_exp_decay(f_fn, (x_g[:, None],))
        if rate is None:
            raise ValueError(
                "reduced_identify_field requires separable forcing "
                "f = e^{-rt} g(x) (detection failed)"
            )
        g0 = np.asarray(f_fn(x_g[:, None], np.zeros((len(x_g), 1)))).reshape(-1)
        b_sep = np.linalg.solve(M, (B * wq) @ g0)

    Xb = np.asarray(problem.data["xb"], dtype=np.float64)
    ub = np.asarray(problem.data["ub"], dtype=np.float64).reshape(-1)
    sel = (Xb[:, 1] > 1e-12) & (Xb[:, 0] > a_dom + 1e-12) & (Xb[:, 0] < b_dom - 1e-12)
    Xs, ds = Xb[sel], ub[sel]
    if Xs.shape[0] == 0:
        raise ValueError("problem has no interior sensors — nothing to identify from")
    ts_u, ts_inv = np.unique(Xs[:, 1], return_inverse=True)
    B_s = point_eval(Xs[:, 0])

    J = {k: jnp.asarray(v) for k, v in dict(
        T_adv=T_adv, T1=T1, T2=T2, Minv=M_inv, c0=c0, b=b_sep,
        P=P_leg, dP=dP_leg, Bs=B_s, ds=ds, ts=ts_u,
    ).items()}
    I = jnp.eye(T_adv.shape[0])

    def predict(s):
        """Sensor predictions [n_sensors] for log-Legendre coefficients s —
        the differentiable forward map (exposed via info["predict"] for the
        Fisher/CRLB analysis in uncertainty.py)."""
        eps_q = jnp.exp(J["P"].T @ s)
        epsx_q = eps_q * (J["dP"].T @ s)
        Op = (
            J["T_adv"]
            + jnp.einsum("abq,q->ab", J["T1"], epsx_q)
            + jnp.einsum("abq,q->ab", J["T2"], eps_q)
        )
        A = -(J["Minv"] @ Op)
        if has_f:
            inv_ArI = jnp.linalg.solve(A + rate * I, I)

            def one(t):
                E_t = jexpm(A * t)
                return E_t @ J["c0"] + inv_ArI @ (
                    E_t @ J["b"] - jnp.exp(-rate * t) * J["b"]
                )
        else:

            def one(t):
                return jexpm(A * t) @ J["c0"]

        C = jax.lax.map(one, J["ts"])
        return jnp.einsum("tn,ns->ts", C, J["Bs"])[ts_inv, jnp.arange(len(ds))]

    def misfit(s):
        pred = predict(s)
        m = jnp.sum((pred - J["ds"]) ** 2)
        if smooth_reg > 0:
            # Tikhonov smoothness on the LOG field (mean s'(x)^2 over the
            # quadrature grid) — the measured sparse+noisy lever
            m = m + smooth_reg * jnp.mean((J["dP"].T @ s) ** 2)
        return m

    mis_grad = jax.jit(jax.value_and_grad(misfit))
    from scipy.optimize import minimize

    n_evals = [0]

    def fun(z):
        v, g = mis_grad(jnp.asarray(z))
        n_evals[0] += 1
        return float(v), np.asarray(g)

    x0 = np.zeros(eps_order)
    x0[0] = np.log(eps_init)
    res = minimize(
        fun, x0, jac=True, method="L-BFGS-B",
        options={"maxiter": maxiter, "ftol": 1e-18, "gtol": 1e-14},
    )
    s_coef = np.asarray(res.x)

    def eps_fn(x):
        xi = (np.asarray(x, dtype=np.float64) - (a_dom + b_dom) / 2.0) / half
        Pv = np.asarray(jacobi_all(eps_order - 1, 0.0, 0.0, xi.reshape(-1)))
        return np.exp(Pv.T @ s_coef).reshape(np.shape(x))

    return s_coef, eps_fn, {
        "misfit": float(res.fun), "n_evals": n_evals[0], "method": "lbfgsb-adjoint",
        "predict": predict, "sensor_values": ds, "n_sensors": int(len(ds)),
    }


def reduced_identify_burgers(
    problem,
    stations=(-0.75, -0.5, -0.25, 0.25, 0.5, 0.75),
    n_per_station: int = 5,
    noise: float = 0.0,
    seed: int = 0,
    bounds=(1e-4, 0.1),
    p: int = 20,
    n_steps: int = 600,
    xatol: float = 1e-12,
):
    """VISCOSITY identification for the nonlinear family: Brent-search nu
    with the spectral-element Burgers solver (galerkin.solve_burgers) in
    the loop, minimizing the misfit against sensor readings of the
    Cole-Hopf exact solution (+ optional Gaussian noise) — the nonlinear
    twin of reduced_identify.  The burgers family is forward-only in the
    reference-parity sense, so sensors are sampled here (LHS times per
    station, seeded) rather than read from problem.data.

    Returns (nu_hat, info).
    """
    from hpvpinns_tpu.galerkin import BURGERS_SOLVER_GRID, solve_burgers
    from hpvpinns_tpu.geometry.mesh import Interval1D
    from hpvpinns_tpu.utils.sampling import lhs_interval

    if problem.name != "burgers":
        raise ValueError(f"reduced_identify_burgers supports burgers problems, got {problem.name!r}")
    cfg = problem.config
    rng = np.random.default_rng(seed)
    pts, vals = [], []
    for st in stations:
        ts = cfg.t_final * lhs_interval(0, 1, n_per_station, rng).reshape(-1)
        xs = np.full_like(ts, st)
        pts.append(np.stack([xs, ts], axis=-1))
        vals.append(np.asarray(problem.exact(xs[:, None], ts[:, None])).reshape(-1))
    Xs = np.concatenate(pts)
    ds = np.concatenate(vals)
    if noise > 0:
        ds = ds + rng.normal(0.0, noise, ds.shape)

    axis = Interval1D(np.asarray(BURGERS_SOLVER_GRID, dtype=np.float64))
    n_solves = [0]

    def misfit(nu):
        sol = solve_burgers(
            axis, p, lambda x: -np.sin(np.pi * x), float(nu), cfg.t_final, n_steps
        )
        n_solves[0] += 1
        return float(np.sum((sol(Xs[:, 0], Xs[:, 1]) - ds) ** 2))

    from scipy.optimize import minimize_scalar

    res = minimize_scalar(misfit, bounds=bounds, method="bounded", options={"xatol": xatol})
    return float(res.x), {
        "misfit": float(res.fun), "n_solves": n_solves[0],
        "n_sensors": len(ds), "method": "brent-bounded",
    }


def fit_epsilon_field2d(
    problem, params, order_x: int = 5, order_y: int = 5,
    reg: float = 1e-8, u_fn=None,
):
    """2D diffusivity-MAP recovery: the advdiff2d form-1 weak residual is
    AFFINE in eps(x, y), so a tensor-Legendre expansion
    eps = sum_jk c_jk P_j(x) P_k(y) is one column-equilibrated lstsq at the
    frozen solution — the 2-space-dimension twin of fit_epsilon_field
    (beyond the reference, whose coefficient is a single scalar).

    Returns (coef [order_x, order_y], eps_fn(x, y), info).
    """
    import jax
    import jax.numpy as jnp

    from hpvpinns_tpu.ops.contract import contract_3d
    from hpvpinns_tpu.ops.fields import scalar_fields_3d

    if problem.name != "advdiff2d":
        raise ValueError(
            f"fit_epsilon_field2d supports advdiff2d problems, got {problem.name!r}"
        )
    cfg = problem.config
    el = problem.data["elements"]
    bx, by, bt = problem.data["basis_x"], problem.data["basis_y"], problem.data["basis_t"]

    if u_fn is None:
        u_fn = lambda X: problem.apply(params, X)  # noqa: E731
    flds = jax.jit(
        lambda x, y, z: scalar_fields_3d(u_fn, x, y, z, second=False)
    )(el.x, el.y, el.z)
    ut = np.asarray(flds["uz"], dtype=np.float64)
    ux = np.asarray(flds["ux"], dtype=np.float64)
    uy = np.asarray(flds["uy"], dtype=np.float64)

    vx, vy = problem.extras["v_of"](params)
    vx, vy = float(np.asarray(vx)), float(np.asarray(vy))

    x = np.asarray(el.x, dtype=np.float64)
    y = np.asarray(el.y, dtype=np.float64)
    (ax_, bx_), (ay_, by_) = cfg.domain_x, cfg.domain_y
    hx, hy = (bx_ - ax_) / 2.0, (by_ - ay_) / 2.0
    xi = (x - (ax_ + bx_) / 2.0) / hx
    et = (y - (ay_ + by_) / 2.0) / hy
    Px = jacobi_all(order_x - 1, 0.0, 0.0, xi)
    dPx = np.stack([djacobi(j, 0.0, 0.0, xi, 1) / hx for j in range(order_x)])
    Py = jacobi_all(order_y - 1, 0.0, 0.0, et)
    dPy = np.stack([djacobi(k, 0.0, 0.0, et, 1) / hy for k in range(order_y)])

    jac = (np.asarray(el.jac_x) * np.asarray(el.jac_y) * np.asarray(el.jac_z)).astype(
        np.float64
    )[:, None, None, None]
    jx = (np.asarray(el.jac_y) * np.asarray(el.jac_z)).astype(np.float64)[:, None, None, None]
    jy = (np.asarray(el.jac_x) * np.asarray(el.jac_z)).astype(np.float64)[:, None, None, None]
    wphi_x = np.asarray(bx.wphi, dtype=np.float64)
    wdphi_x = np.asarray(bx.wdphi, dtype=np.float64)
    wphi_y = np.asarray(by.wphi, dtype=np.float64)
    wdphi_y = np.asarray(by.wdphi, dtype=np.float64)
    wphi_t = np.asarray(bt.wphi, dtype=np.float64)
    mask = np.asarray(el.mask, dtype=np.float64)

    def C(bxm, bym, btm, g):
        return np.asarray(
            contract_3d(jnp.asarray(bxm), jnp.asarray(bym), jnp.asarray(btm), jnp.asarray(g))
        )

    b_vec = (
        np.asarray(el.f_proj, dtype=np.float64)
        - jac * C(wphi_x, wphi_y, wphi_t, ut + vx * ux + vy * uy)
    ) * mask
    cols = []
    for j in range(order_x):
        for k in range(order_y):
            P = Px[j] * Py[k]
            A_jk = (
                jac * C(wphi_x, wphi_y, wphi_t, (dPx[j] * Py[k]) * ux + (Px[j] * dPy[k]) * uy)
                + jx * C(wdphi_x, wphi_y, wphi_t, P * ux)
                + jy * C(wphi_x, wdphi_y, wphi_t, P * uy)
            )
            cols.append((A_jk * mask).reshape(-1))
    A = np.stack(cols, axis=1)
    b_flat = b_vec.reshape(-1)

    cs = np.linalg.norm(A, axis=0)
    cs[cs == 0] = 1.0
    A_s = A / cs
    lam = reg * (A_s * A_s).sum() / max(A.shape[0], 1)
    A_aug = np.vstack([A_s, np.sqrt(lam) * np.eye(A.shape[1])])
    b_aug = np.concatenate([b_flat, np.zeros(A.shape[1])])
    coef, *_ = np.linalg.lstsq(A_aug, b_aug, rcond=None)
    coef = (coef / cs).reshape(order_x, order_y)

    def eps_fn(X, Y):
        xi_p = (np.asarray(X, dtype=np.float64) - (ax_ + bx_) / 2.0) / hx
        et_p = (np.asarray(Y, dtype=np.float64) - (ay_ + by_) / 2.0) / hy
        Pj = np.asarray(jacobi_all(order_x - 1, 0.0, 0.0, xi_p.reshape(-1)))
        Pk = np.asarray(jacobi_all(order_y - 1, 0.0, 0.0, et_p.reshape(-1)))
        return np.einsum("jk,jp,kp->p", coef, Pj, Pk).reshape(np.shape(X))

    info = {
        "residual_before": float(np.linalg.norm(b_flat)),
        "residual_after": float(np.linalg.norm(A @ coef.reshape(-1) - b_flat)),
        "order_x": order_x,
        "order_y": order_y,
    }
    return coef, eps_fn, info


def als_identify2d(
    problem,
    space_order: int = 10,
    time_order: int = 8,
    eps_order: int = 5,
    w_data: float = 10.0,
    eps_reg: float = 1e-8,
    iters: int = 6,
    eps_init: float = 0.1,
):
    """Network-free alternating-linear identification of a 2D diffusivity
    MAP eps(x, y): u in a global spectral tensor basis (boundary-vanishing
    bubbles in x and y, Legendre in t) is LINEAR given the map; the map's
    tensor-Legendre coefficients are LINEAR given u (fit_epsilon_field2d's
    system).  Two alternating lstsq solves per round — the 2-space-
    dimension twin of als_identify, for the clean dense-data regime.

    SIZE RULE (measured): the problem's test orders must EXCEED the u-basis
    orders (n_test_* > space_order/time_order) or the u-solve is rank-
    deficient and the iteration diverges; with q16 / 12x12x10 tests over a
    10x10x8 basis the u-solve at true eps reaches 7e-7.  End-to-end from a
    flat start the iteration plateaus at ~4% map rel-L2 / ~5e-4 u (6-15
    rounds, 980 clean sensors) — bounded by the manufactured sin-profile's
    observability (u_xx + u_yy vanishes on its nodal lines), the same
    limiter as the trained-u two-phase fit (4.4%), at ~2x less wall time
    and with no network.

    Returns (u_fn, coef [eps_order, eps_order], eps_fn(x, y), info).
    """
    import jax.numpy as jnp

    from hpvpinns_tpu.ops.contract import contract_3d
    from hpvpinns_tpu.spectral.basis import make_test_basis

    if problem.name != "advdiff2d":
        raise ValueError(f"als_identify2d supports advdiff2d problems, got {problem.name!r}")
    if getattr(problem.config, "velocity_trainable", False):
        import warnings

        warnings.warn(
            "als_identify2d treats (vx, vy) as KNOWN but this problem has "
            "velocity_trainable=True: the values used are velocity_init "
            f"({problem.config.velocity_init}), not the truth. Identify "
            "coefficients jointly with reduced_identify2d instead.",
            stacklevel=2,
        )
    cfg = problem.config
    el = problem.data["elements"]
    bx, by, bt = problem.data["basis_x"], problem.data["basis_y"], problem.data["basis_t"]
    T = cfg.t_final
    (ax_, bx_d), (ay_, by_d) = cfg.domain_x, cfg.domain_y
    hx, hy = (bx_d - ax_) / 2.0, (by_d - ay_) / 2.0

    x_g = np.asarray(el.x, dtype=np.float64)  # [E, Qt, Qy, Qx]
    y_g = np.asarray(el.y, dtype=np.float64)
    t_g = np.asarray(el.z, dtype=np.float64)
    shape = x_g.shape

    def sb(v, h, center):
        xi = (np.asarray(v, dtype=np.float64).reshape(-1) - center) / h
        tb = make_test_basis(space_order, xi)
        return np.asarray(tb.phi), np.asarray(tb.dphi) / h

    def tb_(t):
        tau = 2.0 * np.asarray(t, dtype=np.float64).reshape(-1) / T - 1.0
        P = np.asarray(jacobi_all(time_order - 1, 0.0, 0.0, tau))
        dP = np.stack(
            [djacobi(m, 0.0, 0.0, tau, 1) * 2.0 / T for m in range(time_order)]
        )
        return P, dP

    PHX, dPHX = (a.reshape((space_order,) + shape) for a in sb(x_g, hx, (ax_ + bx_d) / 2))
    PHY, dPHY = (a.reshape((space_order,) + shape) for a in sb(y_g, hy, (ay_ + by_d) / 2))
    PST, dPST = (a.reshape((time_order,) + shape) for a in tb_(t_g))

    jac = (np.asarray(el.jac_x) * np.asarray(el.jac_y) * np.asarray(el.jac_z)).astype(
        np.float64
    )[:, None, None, None]
    jx = (np.asarray(el.jac_y) * np.asarray(el.jac_z)).astype(np.float64)[:, None, None, None]
    jy = (np.asarray(el.jac_x) * np.asarray(el.jac_z)).astype(np.float64)[:, None, None, None]
    wphi_x = np.asarray(bx.wphi, dtype=np.float64)
    wdphi_x = np.asarray(bx.wdphi, dtype=np.float64)
    wphi_y = np.asarray(by.wphi, dtype=np.float64)
    wdphi_y = np.asarray(by.wdphi, dtype=np.float64)
    wphi_t = np.asarray(bt.wphi, dtype=np.float64)
    mask = np.asarray(el.mask, dtype=np.float64)

    def C(bxm, bym, btm, g):
        return np.asarray(
            contract_3d(jnp.asarray(bxm), jnp.asarray(bym), jnp.asarray(btm), jnp.asarray(g))
        )

    vx, vy = problem.extras["v_of"](problem.init_params(__import__("jax").random.key(0)))
    vx, vy = float(np.asarray(vx)), float(np.asarray(vy))
    f_proj = np.asarray(el.f_proj, dtype=np.float64)
    b_weak = (f_proj * mask).reshape(-1)
    n_c = space_order * space_order * time_order

    Xb = np.asarray(problem.data["xb"], dtype=np.float64)
    ub = np.asarray(problem.data["ub"], dtype=np.float64).reshape(-1)
    Psx, _ = sb(Xb[:, 0], hx, (ax_ + bx_d) / 2)
    Psy, _ = sb(Xb[:, 1], hy, (ay_ + by_d) / 2)
    Pst, _ = tb_(Xb[:, 2])
    B_data = (
        Psx[:, None, None, :] * Psy[None, :, None, :] * Pst[None, None, :, :]
    ).reshape(n_c, -1).T  # [n_data, n_c]

    # tensor-Legendre map basis at the quadrature grid
    xi_g = (x_g - (ax_ + bx_d) / 2.0) / hx
    et_g = (y_g - (ay_ + by_d) / 2.0) / hy
    Pjx = jacobi_all(eps_order - 1, 0.0, 0.0, xi_g)
    dPjx = np.stack([djacobi(j, 0.0, 0.0, xi_g, 1) / hx for j in range(eps_order)])
    Pky = jacobi_all(eps_order - 1, 0.0, 0.0, et_g)
    dPky = np.stack([djacobi(k, 0.0, 0.0, et_g, 1) / hy for k in range(eps_order)])

    def eps_grid(coef):
        return np.einsum("jk,j...,k...->...", coef, Pjx, Pky)

    def epsx_grid(coef):
        return np.einsum("jk,j...,k...->...", coef, dPjx, Pky)

    def epsy_grid(coef):
        return np.einsum("jk,j...,k...->...", coef, Pjx, dPky)

    def u_solve(e_q, ex_q, ey_q):
        A = np.empty((mask.size, n_c))
        k = 0
        for i in range(space_order):
            for j in range(space_order):
                for m in range(time_order):
                    ut_b = PHX[i] * PHY[j] * dPST[m]
                    ux_b = dPHX[i] * PHY[j] * PST[m]
                    uy_b = PHX[i] * dPHY[j] * PST[m]
                    r = (
                        jac * C(wphi_x, wphi_y, wphi_t,
                                ut_b + (vx + ex_q) * ux_b + (vy + ey_q) * uy_b)
                        + jx * C(wdphi_x, wphi_y, wphi_t, e_q * ux_b)
                        + jy * C(wphi_x, wdphi_y, wphi_t, e_q * uy_b)
                    )
                    A[:, k] = (r * mask).reshape(-1)
                    k += 1
        A_full = np.vstack([A, w_data * B_data])
        b_full = np.concatenate([b_weak, w_data * ub])
        c, *_ = np.linalg.lstsq(A_full, b_full, rcond=None)
        return c

    def eps_solve(c):
        cm = c.reshape(space_order, space_order, time_order)
        ut = np.einsum("ijm,i...,j...,m...->...", cm, PHX, PHY, dPST)
        ux = np.einsum("ijm,i...,j...,m...->...", cm, dPHX, PHY, PST)
        uy = np.einsum("ijm,i...,j...,m...->...", cm, PHX, dPHY, PST)
        b_vec = (f_proj - jac * C(wphi_x, wphi_y, wphi_t, ut + vx * ux + vy * uy)) * mask
        cols = []
        for j in range(eps_order):
            for k in range(eps_order):
                P = Pjx[j] * Pky[k]
                A_jk = (
                    jac * C(wphi_x, wphi_y, wphi_t,
                            (dPjx[j] * Pky[k]) * ux + (Pjx[j] * dPky[k]) * uy)
                    + jx * C(wdphi_x, wphi_y, wphi_t, P * ux)
                    + jy * C(wphi_x, wdphi_y, wphi_t, P * uy)
                )
                cols.append((A_jk * mask).reshape(-1))
        A = np.stack(cols, axis=1)
        cs = np.linalg.norm(A, axis=0)
        cs[cs == 0] = 1.0
        A_s = A / cs
        lam = eps_reg * (A_s * A_s).sum() / max(A.shape[0], 1)
        A_aug = np.vstack([A_s, np.sqrt(lam) * np.eye(A.shape[1])])
        b_aug = np.concatenate([b_vec.reshape(-1), np.zeros(A.shape[1])])
        coef, *_ = np.linalg.lstsq(A_aug, b_aug, rcond=None)
        return (coef / cs).reshape(eps_order, eps_order)

    coef = np.zeros((eps_order, eps_order))
    coef[0, 0] = eps_init
    c = None
    for _ in range(iters):
        c = u_solve(eps_grid(coef), epsx_grid(coef), epsy_grid(coef))
        coef = eps_solve(c)

    cm = c.reshape(space_order, space_order, time_order)

    def u_fn(X):
        X = np.asarray(X, dtype=np.float64)
        Px, _ = sb(X[:, 0], hx, (ax_ + bx_d) / 2)
        Py, _ = sb(X[:, 1], hy, (ay_ + by_d) / 2)
        Pt, _ = tb_(X[:, 2])
        return np.einsum("ijm,ip,jp,mp->p", cm, Px, Py, Pt).reshape(-1, 1)

    def eps_fn(X, Y):
        xi = (np.asarray(X, dtype=np.float64) - (ax_ + bx_d) / 2.0) / hx
        et = (np.asarray(Y, dtype=np.float64) - (ay_ + by_d) / 2.0) / hy
        Pj = np.asarray(jacobi_all(eps_order - 1, 0.0, 0.0, xi.reshape(-1)))
        Pk = np.asarray(jacobi_all(eps_order - 1, 0.0, 0.0, et.reshape(-1)))
        return np.einsum("jk,jp,kp->p", coef, Pj, Pk).reshape(np.shape(X))

    return u_fn, coef, eps_fn, {"space_order": space_order, "time_order": time_order}


def reduced_identify_kovasznay(
    problem,
    p: int = 16,
    bounds=(5e-3, 0.2),
    xatol: float = 1e-12,
    noise: float = 0.0,
    seed: int = 0,
):
    """VISCOSITY identification for the Navier-Stokes SYSTEM: Brent-search
    nu with the steady spectral solver (galerkin.solve_ns_steady) in the
    loop, minimizing the misfit against interior (u, v) velocity sensors —
    the NS twin of reduced_identify/reduced_identify_burgers.  Each trial
    solve warm-starts Newton from the previous solution (the coefficient
    space is nu-independent), so the inner solves settle in 1-2 Newton
    steps after the first.

    Sensors come from the problem's own inverse-mode data
    (problem.data["xs"]/"us", problems/kovasznay.py::sensor_data) when
    present, else are LHS-sampled here (seeded; `noise` adds Gaussian
    perturbation).  Boundary data for the solver is the Kovasznay trace —
    the same information the VPINN's boundary loss uses.

    Returns (nu_hat, info).
    """
    from hpvpinns_tpu.galerkin import solve_ns_steady
    from hpvpinns_tpu.problems.kovasznay import exact_fields
    from hpvpinns_tpu.utils.sampling import lhs_interval

    if problem.name != "kovasznay":
        raise ValueError(
            f"reduced_identify_kovasznay supports kovasznay problems, got {problem.name!r}"
        )
    cfg = problem.config
    if "xs" in problem.data:
        Xs = np.asarray(problem.data["xs"], dtype=np.float64)
        ds = np.asarray(problem.data["us"], dtype=np.float64)
    else:
        rng = np.random.default_rng(seed)
        xs = lhs_interval(*cfg.domain_x, cfg.n_sensors, rng)
        ys = lhs_interval(*cfg.domain_y, cfg.n_sensors, rng)
        Xs = np.hstack([xs, ys])
        u, v, _ = exact_fields(Xs[:, 0], Xs[:, 1], cfg.re)
        ds = np.stack([u, v], axis=-1)
        if noise > 0.0:
            ds = ds + rng.normal(0.0, noise, ds.shape)

    def g_fn(x, y):
        u, v, _ = exact_fields(x, y, cfg.re)
        return u, v

    n_solves = [0]
    warm = {"c": None}

    def misfit(nu):
        sol = solve_ns_steady(
            cfg.domain_x, cfg.domain_y, p, float(nu), g_fn, start=warm["c"]
        )
        warm["c"] = np.concatenate([
            sol.coef_u.reshape(-1), sol.coef_v.reshape(-1),
            sol.coef_p.reshape(-1)[1:],
        ])
        n_solves[0] += 1
        u, v = sol.velocity(Xs[:, 0], Xs[:, 1])
        return float(np.sum((u - ds[:, 0]) ** 2 + (v - ds[:, 1]) ** 2))

    from scipy.optimize import minimize_scalar

    res = minimize_scalar(misfit, bounds=bounds, method="bounded", options={"xatol": xatol})
    return float(res.x), {
        "misfit": float(res.fun), "n_solves": n_solves[0],
        "n_sensors": len(ds), "method": "brent-bounded", "p": p,
    }


def reduced_identify_taylorgreen(
    problem,
    p: int = 10,
    n_steps: int = 60,
    bounds=(0.01, 0.5),
    xatol: float = 1e-12,
    noise: float = 0.0,
    seed: int = 0,
):
    """VISCOSITY identification for the UNSTEADY Navier-Stokes system:
    Brent-search nu with the BDF2 spectral solver
    (galerkin.solve_ns_unsteady) in the loop, minimizing the misfit
    against interior space-time (u, v) sensors — the time-dependent twin
    of reduced_identify_kovasznay.

    Sensors come from the problem's own inverse-mode data
    (problem.data["xs"]/"us") when present, else are LHS-sampled here.

    Returns (nu_hat, info).
    """
    from hpvpinns_tpu.galerkin import solve_ns_unsteady
    from hpvpinns_tpu.problems.taylorgreen import exact_fields
    from hpvpinns_tpu.utils.sampling import lhs_box

    if problem.name != "taylorgreen":
        raise ValueError(
            f"reduced_identify_taylorgreen supports taylorgreen problems, got {problem.name!r}"
        )
    cfg = problem.config
    if "xs" in problem.data:
        Xs = np.asarray(problem.data["xs"], dtype=np.float64)
        ds = np.asarray(problem.data["us"], dtype=np.float64)
    else:
        rng = np.random.default_rng(seed)
        Xs = lhs_box(
            [cfg.domain_x, cfg.domain_y, (0.0, cfg.t_final)], cfg.n_sensors, rng
        )
        u, v, _ = exact_fields(Xs[:, 0], Xs[:, 1], Xs[:, 2], cfg.re)
        ds = np.stack([u, v], axis=-1)
        if noise > 0.0:
            ds = ds + rng.normal(0.0, noise, ds.shape)

    def g_fn(x, y, t):
        u, v, _ = exact_fields(x, y, t, cfg.re)
        return u, v

    def u0_fn(x, y):
        u, v, _ = exact_fields(x, y, 0.0, cfg.re)
        return u, v

    n_solves = [0]

    def misfit(nu):
        sol = solve_ns_unsteady(
            cfg.domain_x, cfg.domain_y, p, float(nu), g_fn, u0_fn,
            cfg.t_final, n_steps,
        )
        n_solves[0] += 1
        u, v = sol.velocity(Xs[:, 0], Xs[:, 1], Xs[:, 2])
        return float(np.sum((u - ds[:, 0]) ** 2 + (v - ds[:, 1]) ** 2))

    from scipy.optimize import minimize_scalar

    res = minimize_scalar(misfit, bounds=bounds, method="bounded", options={"xatol": xatol})
    return float(res.x), {
        "misfit": float(res.fun), "n_solves": n_solves[0],
        "n_sensors": len(ds), "method": "brent-bounded",
        "p": p, "n_steps": n_steps,
    }


def reduced_identify_helmholtz(
    problem,
    p: int = 14,
    bounds=(40.0, 130.0),
    n_scan: int = 61,
    xatol: float = 1e-10,
    noise: float = 0.0,
    seed: int = 0,
):
    """WAVENUMBER identification for the Helmholtz family: search k^2 with
    the exact indefinite spectral solver (galerkin.solve_helmholtz2d) in
    the loop, minimizing the misfit against interior sensors — the
    oscillatory twin of reduced_identify (AdvDiff.py:63's problem class,
    network-free).

    Unlike the diffusion coefficients, the misfit landscape over k^2 has
    POLES at the discrete Dirichlet eigenvalues of the solver's pencil
    (the forward map blows up at resonance), so a bare Brent search can
    lock onto the wrong basin.  The route therefore scans `n_scan` points
    over `bounds` first (skipping near-singular solves) and Brent-refines
    inside the bracketing interval of the scan minimum.

    Sensors come from the problem's own inverse-mode data
    (problem.data["xs"]/"us", problems/helmholtz.py) when present, else
    are LHS-sampled here (seeded; `noise` adds Gaussian perturbation).
    Boundary data for the solver is the exact trace via the Coons
    interpolant — the same information the VPINN's boundary loss uses.

    Returns (k_sq_hat, info).
    """
    from hpvpinns_tpu.galerkin import coons_lift, solve_helmholtz2d
    from hpvpinns_tpu.utils.sampling import lhs_box

    if problem.name != "helmholtz2d":
        raise ValueError(
            f"reduced_identify_helmholtz supports helmholtz2d problems, got {problem.name!r}"
        )
    cfg = problem.config
    if "xs" in problem.data:
        Xs = np.asarray(problem.data["xs"], dtype=np.float64)
        ds = np.asarray(problem.data["us"], dtype=np.float64).reshape(-1)
    else:
        rng = np.random.default_rng(seed)
        Xs = lhs_box([cfg.domain_x, cfg.domain_y], cfg.n_sensors, rng)
        ds = np.asarray(problem.exact(Xs[:, 0:1], Xs[:, 1:2])).reshape(-1)
        if noise > 0.0:
            ds = ds + rng.normal(0.0, noise, ds.shape)

    mesh = problem.extras["mesh"]
    f_fn = problem.extras["f_rhs"]
    lift = coons_lift(problem.exact, cfg.domain_x, cfg.domain_y)
    n_solves = [0]

    def misfit(k_sq):
        try:
            sol = solve_helmholtz2d(mesh, p, float(k_sq), f_fn, lift_fn=lift)
        except np.linalg.LinAlgError:  # exactly singular: at a resonance
            return np.inf
        n_solves[0] += 1
        u = sol(Xs[:, 0], Xs[:, 1]).reshape(-1)
        return float(np.sum((u - ds) ** 2))

    grid = np.linspace(bounds[0], bounds[1], n_scan)
    vals = np.array([misfit(g) for g in grid])
    i = int(np.argmin(vals))
    lo = grid[max(i - 1, 0)]
    hi = grid[min(i + 1, n_scan - 1)]

    from scipy.optimize import minimize_scalar

    res = minimize_scalar(
        misfit, bounds=(lo, hi), method="bounded", options={"xatol": xatol}
    )
    return float(res.x), {
        "misfit": float(res.fun), "n_solves": n_solves[0],
        "n_sensors": len(ds), "method": "scan+brent-bounded", "p": p,
        "scan_bracket": (float(lo), float(hi)),
    }
