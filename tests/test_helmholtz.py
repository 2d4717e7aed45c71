"""Helmholtz family (problems/helmholtz.py, ops/assembly.helmholtz2d_residual,
galerkin.solve_helmholtz2d, inverse.reduced_identify_helmholtz).

The oscillatory/indefinite family has no reference analog; these tests hold
it to the framework-wide conventions: zero weak residual at the exact
solution, interchangeable derivative engines, the Gauss-Newton residual-vector
identity, spectral convergence of the direct solver, and identification to
the data's information limit.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.galerkin import coons_lift, solve_helmholtz2d, vpinn_gap_helmholtz2d
from hpvpinns_tpu.ops.assembly import helmholtz2d_residual
from hpvpinns_tpu.problems import helmholtz

CFG64 = hv.Helmholtz2DConfig(dtype="float64", n_quad=24, n_test_x=10, n_test_y=10)


def _exact_u_fn(cfg):
    u_jnp = helmholtz.make_exact_jnp(cfg)
    return lambda X: u_jnp(X[:, 0:1], X[:, 1:2])


@pytest.mark.parametrize("var_form", [0, 1])
def test_zero_residual_at_exact(var_form):
    """The masked weak residual vanishes at the exact plane wave (both
    Laplacian weak forms; the quadrature resolves k = 9 at Q = 24)."""
    prob = hv.build(CFG64)
    el = prob.data["elements"]
    res = helmholtz2d_residual(
        _exact_u_fn(CFG64), el, prob.data["basis_x"], prob.data["basis_y"],
        CFG64.k**2, var_form,
    ) * el.mask
    assert float(jnp.abs(res).max()) < 1e-10


def test_wrong_wavenumber_leaves_residual():
    """The mass term is live: the same field at a wrong k^2 does NOT
    annihilate the weak residual (guards against a silently-dropped term)."""
    prob = hv.build(CFG64)
    el = prob.data["elements"]
    res = helmholtz2d_residual(
        _exact_u_fn(CFG64), el, prob.data["basis_x"], prob.data["basis_y"],
        0.5 * CFG64.k**2, 1,
    ) * el.mask
    assert float(jnp.abs(res).max()) > 1e-3


def test_derivative_engines_interchangeable():
    """residual_fn under deriv_mode='taylor' == 'jvp' (framework convention:
    the engines must stay numerically interchangeable)."""
    cfg_t = dataclasses.replace(CFG64, deriv_mode="taylor")
    cfg_j = dataclasses.replace(CFG64, deriv_mode="jvp")
    prob_t = hv.build(cfg_t)
    prob_j = hv.build(cfg_j)
    params = prob_t.init_params(jax.random.key(3))
    r_t = prob_t.extras["residual_fn"](params, prob_t.data)
    r_j = prob_j.extras["residual_fn"](params, prob_j.data)
    np.testing.assert_allclose(np.asarray(r_t), np.asarray(r_j), atol=1e-12)


def test_closed_form_k_sq_at_exact_field():
    """The weak residual is affine in k^2; with the residual evaluated at the
    exact solution the closed-form least-squares estimate recovers the true
    wavenumber to quadrature accuracy.  (Tests the identification algebra
    with no optimizer in the loop: A + k^2 B = 0 at u = u_exact.)"""
    cfg = dataclasses.replace(CFG64, inverse=True)
    prob = hv.build(cfg)
    el = prob.data["elements"]
    u_fn = _exact_u_fn(cfg)
    A = np.asarray(helmholtz2d_residual(
        u_fn, el, prob.data["basis_x"], prob.data["basis_y"], 0.0, 1) * el.mask,
        dtype=np.float64).reshape(-1)
    B = np.asarray(helmholtz2d_residual(
        u_fn, el, prob.data["basis_x"], prob.data["basis_y"], 1.0, 1) * el.mask,
        dtype=np.float64).reshape(-1) - A
    k_sq_hat = -float(A @ B) / float(B @ B)
    assert abs(k_sq_hat - cfg.k**2) / cfg.k**2 < 1e-9


def test_gn_residual_identity_inverse():
    """sum(r^2) == loss for the inverse configuration (boundary + sensor +
    weak terms all registered — the Gauss-Newton contract)."""
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    cfg = dataclasses.replace(CFG64, inverse=True, n_sensors=20)
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    r = make_residual_vector(prob)(params, prob.data)
    loss, _ = prob.loss_fn(params, prob.data)
    np.testing.assert_allclose(float(jnp.sum(r**2)), float(loss), rtol=1e-12)


def test_hard_bc_trace_exact():
    """The Coons-lifted ansatz interpolates the Dirichlet data exactly at
    arbitrary parameters (boundary loss vanishes by construction)."""
    cfg = dataclasses.replace(CFG64, hard_bc=True)
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(1))
    ub_pred = prob.apply(params, prob.data["xb"])
    assert float(jnp.abs(ub_pred - prob.data["ub"]).max()) < 1e-12


def test_direct_solver_spectral_convergence():
    """solve_helmholtz2d converges spectrally in p on the plane-wave
    benchmark (measured: 4.2e-6 at p=8, 2.3e-10 at p=12)."""
    cfg = CFG64
    prob = hv.build(cfg)
    mesh = prob.extras["mesh"]
    lift = coons_lift(prob.exact, cfg.domain_x, cfg.domain_y)
    xs = np.linspace(-1, 1, 61)
    XG, YG = np.meshgrid(xs, xs)
    ut = np.asarray(prob.exact(XG, YG))
    errs = []
    for p in (8, 12):
        sol = solve_helmholtz2d(mesh, p, cfg.k**2, prob.extras["f_rhs"], lift_fn=lift)
        ug = sol(XG, YG)
        errs.append(np.linalg.norm(ug - ut) / np.linalg.norm(ut))
    assert errs[0] < 1e-4
    assert errs[1] < 1e-8


def test_manufactured_forcing_zero_residual():
    """A manufactured (forced) variant: u = sin(a x) sin(b y) with
    f = (k^2 - a^2 - b^2) u — the offline RHS projection and the mass term
    must cancel at the exact field."""
    a, b = 3.0, 2.0
    cfg = dataclasses.replace(CFG64, k=4.0)
    u_fn = lambda x, y: np.sin(a * x) * np.sin(b * y)  # noqa: E731
    f_fn = lambda x, y: (cfg.k**2 - a**2 - b**2) * np.sin(a * x) * np.sin(b * y)  # noqa: E731
    prob = helmholtz.build(cfg, u_fn=u_fn, f_fn=f_fn)
    el = prob.data["elements"]
    uj = lambda X: jnp.sin(a * X[:, 0:1]) * jnp.sin(b * X[:, 1:2])  # noqa: E731
    res = helmholtz2d_residual(
        uj, el, prob.data["basis_x"], prob.data["basis_y"], cfg.k**2, 1
    ) * el.mask
    assert float(jnp.abs(res).max()) < 1e-10


def test_adaptive_refined_config():
    """Helmholtz rides the 2D tensor-mesh adaptive branch: h-mode bisects
    the marked axis intervals, p-mode raises the ragged test orders."""
    from hpvpinns_tpu import adaptive

    prob = hv.build(CFG64)
    params = prob.init_params(jax.random.key(0))
    eta = adaptive.element_indicator(prob, params)
    assert eta.shape == (CFG64.n_elements_x * CFG64.n_elements_y,)
    cfg_h = adaptive._refined_config(CFG64, prob, eta, theta=0.5, mode="h")
    assert len(cfg_h.grid_x) > CFG64.n_elements_x  # at least one bisection
    cfg_p = adaptive._refined_config(CFG64, prob, eta, theta=0.5, mode="p")
    assert max(cfg_p.n_test_x_per_elem) > CFG64.n_test_x


def test_train_smoke_forward():
    """A short Adam run moves the network toward the wave (loss decreases,
    error below the trivial-zero level).  k = 4 keeps the smoke fast —
    measured 0.11 rel-L2 / ~23 s; the benchmark k = 9 needs the full
    quality budget (MEASUREMENTS.md)."""
    cfg = dataclasses.replace(
        CFG64, k=4.0, n_quad=16, activation="sin", layers=(2, 20, 20, 1),
        train=hv.TrainConfig(iterations=800, check_every=200),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    m = hv.evaluate_problem(prob, res.eval_params)
    assert m["rel_l2"] < 0.5  # trivial u=0 scores 1.0; measured 0.11
    assert res.history["loss"][-1] < res.history["loss"][0] / 10


@pytest.mark.slow  # ~2-4 min: scan + Brent over exact indefinite solves
def test_reduced_identification():
    """Network-free wavenumber recovery: scan+Brent over exact solves
    identifies k^2 to the data's information limit from 60 clean sensors."""
    from hpvpinns_tpu.inverse import reduced_identify_helmholtz

    cfg = dataclasses.replace(CFG64, inverse=True)
    prob = hv.build(cfg)
    k_sq, info = reduced_identify_helmholtz(prob, p=10, n_scan=31)
    assert abs(k_sq - cfg.k**2) / cfg.k**2 < 1e-5
    assert info["n_solves"] < 100


@pytest.mark.slow  # trains a network then runs the f64 direct solve
def test_gap_report():
    cfg = dataclasses.replace(
        CFG64, activation="sin",
        train=hv.TrainConfig(iterations=500, check_every=250),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    gap = vpinn_gap_helmholtz2d(prob, res.eval_params, p=12, n_points=41)
    assert gap["rel_l2_galerkin_vs_exact"] < 1e-7
    assert gap["rel_l2_net_vs_exact"] < 1.0
