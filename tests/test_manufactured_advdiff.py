"""Manufactured-solution AdvDiff: forced equation + spatially-varying
advection identification.

The reference's AdvDiff is homogeneous (F = 0, AdvDiff.py:180) and its
analytic solution exists only for CONSTANT velocity (AdvDiff.py:416-445).
The manufactured mode (problems/advdiff.py::make_manufactured + the
build(u_fn=, f_fn=, velocity_fn=) overrides) poses the FORCED equation
u_t + V(x) u_x - eps u_xx = f with a known smooth solution, which is how a
genuinely space-dependent true velocity becomes identifiable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.ops.assembly import advdiff_residual
from hpvpinns_tpu.problems import advdiff


V_TRUE = lambda x: 1.0 + 0.3 * x  # noqa: E731


def _manufactured_problem(**cfg_kw):
    cfg = hv.AdvDiffConfig(dtype="float64", **cfg_kw)
    u_fn, f_fn = advdiff.make_manufactured(cfg, V_TRUE)
    return cfg, advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE)


def test_manufactured_exact_solution_zero_weak_residual():
    """The exact manufactured solution drives both weak forms to (near) zero
    at the true coefficients: form 0 cancels pointwise against the projected
    forcing (same quadrature points); form 1 to quadrature accuracy."""
    cfg, prob = _manufactured_problem(
        inverse=False, n_quad=12, n_test_x=6, n_test_t=6, n_elements_x=2, n_elements_t=2
    )
    el = prob.data["elements"]
    exact_u = lambda X: jnp.sin(jnp.pi * X[:, 0:1]) * jnp.exp(-X[:, 1:2])
    eps = cfg.gamma / np.pi
    for vf, tol in ((0, 1e-14), (1, 1e-8)):
        res = advdiff_residual(
            exact_u, el, prob.data["basis_x"], prob.data["basis_t"], vf,
            V_TRUE(el.x), eps,
        )
        assert float(jnp.abs(res).max()) < tol, f"form {vf}"


def test_manufactured_data_comes_from_u_fn():
    """Boundary/IC/sensor readings are u_fn values (NOT the benchmark's
    zeros / -sin); the forcing projection is live; velocity_true is the
    domain mean of the manufactured field."""
    cfg, prob = _manufactured_problem(inverse=False)
    Xb = np.asarray(prob.data["xb"], dtype=np.float64)
    ub = np.asarray(prob.data["ub"], dtype=np.float64)
    np.testing.assert_allclose(
        ub, np.sin(np.pi * Xb[:, 0:1]) * np.exp(-Xb[:, 1:2]), atol=1e-12
    )
    assert float(np.abs(np.asarray(prob.data["elements"].f_proj)).max()) > 1e-3
    # mean of 1 + 0.3 x over [-1, 1] is 1
    assert abs(prob.extras["velocity_true"] - 1.0) < 1e-10
    # test grid carries the manufactured solution
    tv = np.asarray(prob.test_values)
    tp = prob.test_points
    np.testing.assert_allclose(
        tv.reshape(-1), (np.sin(np.pi * tp[:, 0]) * np.exp(-tp[:, 1])), atol=1e-12
    )


def test_velocity_field_gradient_matches_fd():
    """d(loss)/d(vel_coef) from autodiff matches central finite differences —
    the trainable polynomial field V(x) is differentiated through the weak
    form correctly (both the form-0 pointwise and form-1 paths)."""
    for vf in (0, 1):
        cfg = hv.AdvDiffConfig(
            dtype="float64", velocity_trainable=True, velocity_model="linear",
            var_form=vf, n_quad=8, n_test_x=4, n_test_t=4, layers=(2, 8, 1),
        )
        u_fn, f_fn = advdiff.make_manufactured(cfg, V_TRUE)
        prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE)
        params = prob.init_params(jax.random.key(3))
        loss = lambda p: prob.loss_fn(p, prob.data)[0]
        g = jax.grad(loss)(params)["pde"]["vel_coef"]
        h = 1e-6
        for i in range(2):
            pp = jax.tree_util.tree_map(lambda x: x, params)
            coef = np.asarray(params["pde"]["vel_coef"], dtype=np.float64)
            cp, cm = coef.copy(), coef.copy()
            cp[i] += h
            cm[i] -= h
            pp["pde"]["vel_coef"] = jnp.asarray(cp)
            lp = float(loss(pp))
            pp["pde"]["vel_coef"] = jnp.asarray(cm)
            lm = float(loss(pp))
            fd = (lp - lm) / (2 * h)
            assert abs(float(g[i]) - fd) <= 1e-6 * max(1.0, abs(fd)), (vf, i)


@pytest.mark.slow
def test_linear_velocity_field_identification_moves_toward_truth():
    """Joint (eps, v0, v1) identification from manufactured data: a short f64
    budget already moves every coefficient most of the way to truth."""
    cfg = hv.AdvDiffConfig(
        dtype="float64", velocity_trainable=True, velocity_model="linear",
        velocity_init=0.5, var_form=1,
        sensor_stations=(-0.75, -0.5, -0.25, 0.0, 0.25, 0.5, 0.75),
        train=hv.TrainConfig(iterations=1500, lbfgs_iterations=1500, check_every=250),
    )
    u_fn, f_fn = advdiff.make_manufactured(cfg, V_TRUE)
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE)
    res = hv.train(prob, verbose=False)
    c = np.asarray(res.eval_params["pde"]["vel_coef"], dtype=np.float64)
    assert abs(c[0] - 1.0) < 0.5 * abs(0.5 - 1.0)  # v0: 0.5 -> 1.0
    assert abs(c[1] - 0.3) < 0.5 * 0.3  # v1: 0.0 -> 0.3
    eps = float(np.asarray(res.eval_params["pde"]["epsilon"]))
    assert abs(eps - prob.extras["eps_true"]) < 0.25 * abs(1.0 - prob.extras["eps_true"])
    # aux reporting: the velocity history is the domain mean; coef channels live
    assert "vel_c1" in res.final_aux
    assert abs(res.final_aux["velocity"] - c[0]) < 1e-12  # mean = v0 on [-1, 1]
    # strong residual subtracts the manufactured forcing
    from hpvpinns_tpu.evaluate import strong_residual

    r = strong_residual(prob, res.eval_params, prob.test_points[::2000])
    assert np.all(np.isfinite(r))
    assert float(np.abs(r).mean()) < 0.5  # forced operator ~ 0 near the solution


def test_quadratic_velocity_model_leaves_and_aux():
    cfg = hv.AdvDiffConfig(
        dtype="float64", velocity_trainable=True, velocity_model="quadratic",
        layers=(2, 6, 1),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    assert params["pde"]["vel_coef"].shape == (3,)
    _, aux = prob.loss_fn(params, prob.data)
    assert "vel_c1" in aux and "vel_c2" in aux
    assert abs(float(aux["velocity"]) - cfg.velocity_init) < 1e-12


def test_velocity_model_validation():
    with pytest.raises(ValueError, match="velocity_model"):
        hv.build(hv.AdvDiffConfig(velocity_model="cubic"))


def test_hard_bc_with_manufactured_u_requires_lift():
    cfg = hv.AdvDiffConfig(hard_bc=True)
    u_fn, f_fn = advdiff.make_manufactured(cfg, V_TRUE)
    with pytest.raises(ValueError, match="lift"):
        advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn)
