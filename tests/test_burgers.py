"""Viscous Burgers family: Cole-Hopf exact solution, nonlinear weak forms,
end-to-end training (no reference analog — framework extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.geometry.mesh import TensorMesh2D
from hpvpinns_tpu.ops.assembly import burgers_residual, variational_loss
from hpvpinns_tpu.problems import burgers
from hpvpinns_tpu.problems.build import build_elements_2d, make_weighted_basis
from hpvpinns_tpu.spectral.quadrature import gauss_lobatto_jacobi

F64 = jnp.float64
NU = 0.1  # smooth regime for FD verification; the config default is 0.01/pi


def test_exact_solution_satisfies_pde_ic_bc():
    """Cole-Hopf quadrature solution: u_t + u u_x - nu u_xx = 0 by central
    finite differences, exact IC at t = 0, walls at machine zero."""
    x = np.linspace(-0.9, 0.9, 13)[:, None]
    t = np.full_like(x, 0.4)
    h = 1e-5
    u = lambda X, T: burgers.u_exact(X, T, NU)
    ut = (u(x, t + h) - u(x, t - h)) / (2 * h)
    ux = (u(x + h, t) - u(x - h, t)) / (2 * h)
    uxx = (u(x + h, t) - 2 * u(x, t) + u(x - h, t)) / h**2
    res = ut + u(x, t) * ux - NU * uxx
    np.testing.assert_allclose(res, 0.0, atol=5e-5)
    # IC exact
    x0 = np.linspace(-1, 1, 41)[:, None]
    np.testing.assert_allclose(u(x0, np.zeros_like(x0)), -np.sin(np.pi * x0), atol=0)
    # BC ~ 0 (Cole-Hopf preserves the odd symmetry; quadrature-level zero)
    tb = np.linspace(0.05, 1.0, 7)[:, None]
    for xv in (-1.0, 1.0):
        np.testing.assert_allclose(u(np.full_like(tb, xv), tb), 0.0, atol=1e-10)


def _setup(n_ex=2, n_et=2, n_quad=24, n_test=6):
    mesh = TensorMesh2D.uniform(-1.0, 1.0, n_ex, 0.0, 1.0, n_et)
    xq, wq = gauss_lobatto_jacobi(n_quad, 0.0, 0.0)
    elems = build_elements_2d(mesh, xq, wq, xq, wq, None, [n_test] * n_ex, [n_test] * n_et, F64)
    basis = make_weighted_basis(n_test, xq, wq, F64)
    return elems, basis


def test_burgers_forms_agree_on_multielement_mesh():
    """Conservation-form IBP (form 1) matches the direct form 0 for a generic
    smooth ansatz — the nonlinear analog of the linear IBP identities."""
    elems, basis = _setup()
    u_fn = lambda X: jnp.sin(1.7 * X[:, 0:1]) * jnp.exp(-0.4 * X[:, 1:2]) + 0.05
    r0 = burgers_residual(u_fn, elems, basis, basis, 0, NU)
    r1 = burgers_residual(u_fn, elems, basis, basis, 1, NU)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=1e-8, atol=1e-10)


def test_burgers_trains_and_reduces_strong_residual():
    cfg = hv.BurgersConfig(
        dtype="float64", nu=NU, n_elements_x=2, n_elements_t=1,
        n_test_x=5, n_test_t=5, n_quad=10, layers=(2, 10, 10, 1),
        train=hv.TrainConfig(iterations=2000, lbfgs_iterations=500, check_every=250),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    assert res.history["loss"][-1] < 0.02 * res.history["loss"][0]
    m = hv.evaluate_problem(prob, res.params)
    # measured 7.8% at this budget/seed; 2x margin
    assert m["rel_l2"] < 0.16

    from hpvpinns_tpu.evaluate import strong_residual

    X = prob.test_points[::500]
    r1 = strong_residual(prob, res.params, X)
    assert r1.shape[0] == X.shape[0] and np.all(np.isfinite(r1))


def test_burgers_hard_bc_exact_on_ic_and_walls():
    cfg = hv.BurgersConfig(dtype="float64", hard_bc=True, layers=(2, 8, 1))
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(3))
    t = np.linspace(0.0, 1.0, 17)[:, None]
    for xv in (-1.0, 1.0):
        Xb = np.hstack([np.full_like(t, xv), t])
        np.testing.assert_allclose(np.asarray(prob.apply(params, Xb)), 0.0, atol=1e-14)
    x = np.linspace(-1.0, 1.0, 33)[:, None]
    X0 = np.hstack([x, np.zeros_like(x)])
    np.testing.assert_allclose(
        np.asarray(prob.apply(params, X0)), -np.sin(np.pi * x), atol=1e-13
    )


def test_burgers_cli_and_dispatch():
    from hpvpinns_tpu.cli import _config_from_args, build_parser

    args = build_parser().parse_args(
        "run burgers --nu 0.05 --iterations 7 --n-quad 6".split()
    )
    cfg = _config_from_args(args)
    assert isinstance(cfg, hv.BurgersConfig)
    assert cfg.nu == 0.05 and cfg.train.iterations == 7
    assert hv.build(hv.BurgersConfig(n_quad=5, layers=(2, 6, 1))).name == "burgers"
    q = _config_from_args(build_parser().parse_args("run burgers --preset quality".split()))
    assert q.hard_bc is True and q.train.lbfgs_iterations == 20000 and q.grid_x is not None


def test_solve_burgers_spectral_vs_cole_hopf():
    """Direct nonlinear solve vs the Cole-Hopf exact solution: 1e-5-class
    on the front-resolving grid; BDF2 time-order verified."""
    from hpvpinns_tpu.galerkin import BURGERS_SOLVER_GRID, solve_burgers
    from hpvpinns_tpu.geometry.mesh import Interval1D
    from hpvpinns_tpu.problems.burgers import u_exact

    nu = 0.01 / np.pi
    axis = Interval1D(np.asarray(BURGERS_SOLVER_GRID))
    xs = np.linspace(-1, 1, 101)
    ue = u_exact(xs, np.full_like(xs, 1.0), nu).reshape(-1)
    errs = {}
    for n_steps in (200, 400):
        sol = solve_burgers(axis, 16, lambda x: -np.sin(np.pi * x), nu, 1.0, n_steps)
        uh = sol(xs, np.full_like(xs, 1.0))
        errs[n_steps] = np.linalg.norm(uh - ue) / np.linalg.norm(ue)
    assert errs[400] < 5e-5
    assert errs[400] < errs[200] / 2.5  # ~O(dt^2)


def test_vpinn_gap_burgers_and_guard():
    from hpvpinns_tpu.galerkin import vpinn_gap_burgers

    cfg = hv.BurgersConfig(
        dtype="float64",
        train=hv.TrainConfig(iterations=200, lbfgs_iterations=0, check_every=100),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    gap = vpinn_gap_burgers(prob, res.eval_params, p=16, n_steps=300)
    assert gap["rel_l2_galerkin_vs_exact"] < 1e-3
    assert np.isfinite(gap["rel_l2_net_vs_galerkin"])
    import jax as _jax
    p1 = hv.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="burgers"):
        vpinn_gap_burgers(p1, p1.init_params(_jax.random.key(0)))


def test_reduced_identify_burgers_viscosity():
    """Viscosity identification: Brent over exact nonlinear solves — nu to
    ~1e-6 relative from 30 Cole-Hopf sensor readings."""
    from hpvpinns_tpu.inverse import reduced_identify_burgers

    prob = hv.build(hv.BurgersConfig(dtype="float64"))
    nu_hat, info = reduced_identify_burgers(prob, p=16, n_steps=300)
    nu_true = prob.config.nu
    # the coarse test-budget solver (p16/300 steps) biases the estimate to
    # ~2e-4 relative; production settings (p20/600) reach 6e-7
    assert abs(nu_hat - nu_true) / nu_true < 1e-3
    assert info["n_solves"] < 40
    p1 = hv.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="burgers"):
        reduced_identify_burgers(p1)


def test_exact_solution_f32_shock_no_nan():
    """Regression (round 5): the Gauss-Hermite ratio must fold log(w) into
    the stabilized exponent — with only log_f offset, the max can land on a
    tail node whose weight underflows float32, den sums to exactly 0, and
    the viscous-shock band |x| <= 0.02 at t = 0.5 (nu = 0.01/pi) returns
    0/0.  This NaN killed the hard-BC march exact-restart arm on chip."""
    nu = 0.01 / np.pi
    x32 = jnp.linspace(-1.0, 1.0, 2001, dtype=jnp.float32).reshape(-1, 1)
    for t in (0.25, 0.5, 0.75, 1.0):
        u = burgers.u_exact_jnp(x32, jnp.float32(t), nu)
        assert not bool(jnp.isnan(u).any()), f"NaN at t={t}"
        # f64 numpy oracle agreement through the shock
        u64 = burgers.u_exact(np.asarray(x32, np.float64), t, nu)
        np.testing.assert_allclose(np.asarray(u).ravel(), u64.ravel(),
                                   atol=5e-5)
    # the derivative engines differentiate THROUGH the lift: grad and
    # second derivative must be finite at the shock too
    f = lambda xx: burgers.u_exact_jnp(
        xx.reshape(-1, 1), jnp.float32(0.5), nu).sum()
    pts = jnp.asarray([0.0, 0.01, -0.01], dtype=jnp.float32)
    g = jax.grad(f)(pts)
    h = jax.jacfwd(jax.grad(f))(pts)
    assert not bool(jnp.isnan(g).any()) and not bool(jnp.isnan(h).any())
