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


def test_neural_epsilon_field_init_flat_and_derivative():
    """epsilon_model='mlp': the field initializes (near-)flat at
    epsilon_init; eps_x_of is the exact autodiff derivative (FD-checked);
    the Tikhonov term enters the loss."""
    cfg = hv.AdvDiffConfig(
        dtype="float64", epsilon_model="mlp", epsilon_init=0.1, epsilon_reg=1e-3,
        layers=(2, 6, 1),
    )
    u_fn, f_fn = advdiff.make_manufactured(cfg, V_TRUE)
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE)
    params = prob.init_params(jax.random.key(0))
    assert "eps_net" in params["pde"]
    xs = jnp.linspace(-1.0, 1.0, 101).reshape(-1, 1)
    e0 = np.asarray(prob.extras["eps_of"](params, xs)).reshape(-1)
    np.testing.assert_allclose(e0, cfg.epsilon_init, atol=0.02)  # near-flat
    # FD check of the field derivative (enters the form-1 IBP + the reg term)
    h = 1e-6
    ex = np.asarray(prob.extras["eps_of"](params, xs + h)).reshape(-1)
    em = np.asarray(prob.extras["eps_of"](params, xs - h)).reshape(-1)
    f = lambda z: prob.extras["eps_of"](params, z)
    _, eps_x = jax.jvp(f, (xs,), (jnp.ones_like(xs),))
    np.testing.assert_allclose(
        np.asarray(eps_x).reshape(-1), (ex - em) / (2 * h), atol=1e-8
    )
    # regularized loss is strictly larger than the unregularized one
    loss_r, _ = prob.loss_fn(params, prob.data)
    prob0 = advdiff.build(
        hv.AdvDiffConfig(dtype="float64", epsilon_model="mlp", epsilon_init=0.1,
                         layers=(2, 6, 1)),
        u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE,
    )
    loss_0, _ = prob0.loss_fn(params, prob0.data)
    assert float(loss_r) > float(loss_0)


def test_manufactured_cos_profile_zero_residual():
    """profile='cos' manufactured pair satisfies the weak form exactly at a
    genuinely varying eps(x) truth (field + forcing consistent)."""
    eps_fn = lambda x: (0.1 / np.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    cfg = hv.AdvDiffConfig(dtype="float64", inverse=False, n_quad=14, n_test_x=6, n_test_t=6)
    u_fn, f_fn = advdiff.make_manufactured(cfg, V_TRUE, epsilon=eps_fn, profile="cos")
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE, epsilon_fn=eps_fn)
    el = prob.data["elements"]
    exact_u = lambda X: jnp.cos(jnp.pi / 2 * X[:, 0:1]) * jnp.exp(-X[:, 1:2])
    # form 0: pointwise cancellation against the projected forcing
    res = advdiff_residual(
        exact_u, el, prob.data["basis_x"], prob.data["basis_t"], 0,
        V_TRUE(el.x), eps_fn(el.x),
    )
    assert float(jnp.abs(res).max()) < 1e-14
    # forward loss_fn consistency at the true varying field (form 1 + eps_x)
    cfg1 = hv.AdvDiffConfig(dtype="float64", inverse=False, var_form=1,
                            n_quad=14, n_test_x=6, n_test_t=6, layers=(2, 6, 1))
    prob1 = advdiff.build(cfg1, u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE, epsilon_fn=eps_fn)
    params = prob1.init_params(jax.random.key(0))
    loss, aux = prob1.loss_fn(params, prob1.data)
    assert np.isfinite(float(loss))


def test_profile_validation():
    cfg = hv.AdvDiffConfig()
    with pytest.raises(ValueError, match="profile"):
        advdiff.make_manufactured(cfg, V_TRUE, profile="tanh")


def test_two_phase_field_fit_oracle_spectral_convergence():
    """inverse.fit_epsilon_field with the ORACLE solution recovers a
    non-polynomial eps(x) truth spectrally: the linear solve is exact up to
    the Legendre truncation of sin(pi x)."""
    from hpvpinns_tpu.inverse import fit_epsilon_field

    eps_fn = lambda x: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    # identifiability needs >= `order` test functions along x (the residual
    # rows are projections onto the test space: unseen modes go to lstsq's
    # null space)
    cfg = hv.AdvDiffConfig(dtype="float64", n_quad=24, n_test_x=14, n_test_t=8)
    u_fn, f_fn = advdiff.make_manufactured(cfg, V_TRUE, epsilon=eps_fn, profile="cos")
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE)
    params = prob.init_params(jax.random.key(0))  # ignored: oracle u below
    oracle = lambda X: jnp.cos(jnp.pi / 2 * X[:, 0:1]) * jnp.exp(-X[:, 1:2])  # noqa: E731

    xs = np.linspace(-1.0, 1.0, 513)
    et = np.asarray(eps_fn(xs))
    errs = {}
    for order in (4, 8, 12):
        _, eps_hat, info = fit_epsilon_field(prob, params, order=order, u_fn=oracle)
        eh = np.asarray(eps_hat(xs)).reshape(-1)
        errs[order] = float(np.linalg.norm(eh - et) / np.linalg.norm(et))
        assert info["residual_after"] <= info["residual_before"]
    # spectral decay of the truncation error
    assert errs[8] < errs[4] / 10
    assert errs[12] < 1e-5


def test_two_phase_field_fit_regularization_and_validation():
    from hpvpinns_tpu.inverse import fit_epsilon_field, legendre_field

    # Tikhonov shrinks the derivative energy of the recovered field
    eps_fn = lambda x: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    cfg = hv.AdvDiffConfig(dtype="float64", n_quad=12, n_test_x=6, n_test_t=6)
    u_fn, f_fn = advdiff.make_manufactured(cfg, V_TRUE, epsilon=eps_fn, profile="cos")
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=V_TRUE)
    params = prob.init_params(jax.random.key(0))
    oracle = lambda X: jnp.cos(jnp.pi / 2 * X[:, 0:1]) * jnp.exp(-X[:, 1:2])  # noqa: E731
    c0, _, _ = fit_epsilon_field(prob, params, order=8, u_fn=oracle)
    c1, _, _ = fit_epsilon_field(prob, params, order=8, reg=10.0, u_fn=oracle)
    assert np.linalg.norm(c1[1:]) < np.linalg.norm(c0[1:])  # flatter field

    # legendre_field evaluates the expansion on the mapped domain
    f = legendre_field(np.array([2.0, 0.5]), domain=(0.0, 2.0))
    np.testing.assert_allclose(f(np.array([0.0, 1.0, 2.0])), [1.5, 2.0, 2.5])

    # non-advdiff problems are rejected
    from hpvpinns_tpu.problems import poisson1d

    p1 = poisson1d.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff"):
        fit_epsilon_field(p1, p1.init_params(jax.random.key(0)))


def test_joint_field_fit_oracle_and_aliasing_cap():
    """fit_coefficient_fields: joint (eps(x), V(x)) recovery from one
    lstsq at oracle u — accurate for vel_order <= 2; the measured V vs
    -eps_x aliasing degrades higher joint orders (documented cap)."""
    from hpvpinns_tpu.inverse import fit_coefficient_fields

    eps_fn = lambda x: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    v_fn = lambda x: 1.0 + 0.3 * x  # noqa: E731
    cfg = hv.AdvDiffConfig(dtype="float64", n_quad=24, n_test_x=14, n_test_t=8)
    u_fn, f_fn = advdiff.make_manufactured(cfg, v_fn, epsilon=eps_fn, profile="cos")
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=v_fn)
    params = prob.init_params(jax.random.key(0))
    oracle = lambda X: jnp.cos(jnp.pi / 2 * X[:, 0:1]) * jnp.exp(-X[:, 1:2])  # noqa: E731

    xs = np.linspace(-1.0, 1.0, 513)
    et = np.asarray(eps_fn(xs))
    vt = np.asarray(v_fn(xs))
    _, ef, _, vf, info = fit_coefficient_fields(
        prob, params, eps_order=8, vel_order=2, reg=1e-6, u_fn=oracle
    )
    eps_err = np.linalg.norm(np.asarray(ef(xs)) - et) / np.linalg.norm(et)
    vel_err = np.linalg.norm(np.asarray(vf(xs)) - vt) / np.linalg.norm(vt)
    assert eps_err < 0.03
    assert vel_err < 1e-3
    assert info["residual_after"] <= info["residual_before"]

    # vel_order=0 path: reduces to the eps-only fit against the frozen V
    _, ef0, vc0, vf0, _ = fit_coefficient_fields(
        prob, params, eps_order=8, vel_order=0, u_fn=oracle
    )
    assert vc0 is None and vf0 is None
    eps_err0 = np.linalg.norm(np.asarray(ef0(xs)) - et) / np.linalg.norm(et)
    assert eps_err0 < 0.01

    # the measured aliasing cap: a rich joint basis is NOT identifiable
    _, ef4, _, _, _ = fit_coefficient_fields(
        prob, params, eps_order=8, vel_order=4, reg=1e-6, u_fn=oracle
    )
    eps_err4 = np.linalg.norm(np.asarray(ef4(xs)) - et) / np.linalg.norm(et)
    assert eps_err4 > 10 * eps_err  # documented degradation

    from hpvpinns_tpu.problems import poisson1d
    p1 = poisson1d.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff"):
        fit_coefficient_fields(p1, p1.init_params(jax.random.key(0)))


def test_als_identify_network_free_field_recovery():
    """inverse.als_identify: alternating linear least squares (no network)
    recovers a non-polynomial eps(x) to ~4e-4 from clean dense sensing —
    measured ~150x below the neural-route plateau (MEASUREMENTS.md)."""
    from hpvpinns_tpu.inverse import als_identify

    eps_fn = lambda x: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    vfn = lambda x: 1.0 + 0.0 * x  # noqa: E731
    cfg = hv.AdvDiffConfig(
        dtype="float64", n_quad=24, n_test_x=14, n_test_t=10,
        sensor_stations=tuple(float(s) for s in np.linspace(-0.95, 0.95, 19)),
        n_sensors_per_station=20,
    )
    u_fn, f_fn = advdiff.make_manufactured(cfg, vfn, epsilon=eps_fn, profile="cos")
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=vfn, epsilon_fn=eps_fn)
    uf, coef, ef, info = als_identify(prob, iters=3)
    xs = np.linspace(-1.0, 1.0, 513)
    et = np.asarray(eps_fn(xs))
    err = np.linalg.norm(np.asarray(ef(xs)) - et) / np.linalg.norm(et)
    assert err < 2e-3
    u_hat = uf(prob.test_points).reshape(-1)
    u_tr = np.asarray(prob.test_values).reshape(-1)
    assert np.linalg.norm(u_hat - u_tr) / np.linalg.norm(u_tr) < 1e-6
    assert len(info["eps_coef_history"]) == 3

    from hpvpinns_tpu.problems import poisson1d
    p1 = poisson1d.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff"):
        als_identify(p1)


def test_als_identify_multi_element_grid():
    """The global spectral u-basis composes with any element grid: the weak
    rows come from the problem's per-element test space."""
    from hpvpinns_tpu.inverse import als_identify

    eps_fn = lambda x: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    vfn = lambda x: 1.0 + 0.0 * x  # noqa: E731
    cfg = hv.AdvDiffConfig(
        dtype="float64", n_quad=14, n_test_x=8, n_test_t=6,
        n_elements_x=2, n_elements_t=2,
        sensor_stations=tuple(float(s) for s in np.linspace(-0.95, 0.95, 19)),
        n_sensors_per_station=20,
    )
    u_fn, f_fn = advdiff.make_manufactured(cfg, vfn, epsilon=eps_fn, profile="cos")
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=vfn, epsilon_fn=eps_fn)
    _, _, ef, _ = als_identify(prob, iters=3)
    xs = np.linspace(-1.0, 1.0, 513)
    et = np.asarray(eps_fn(xs))
    assert np.linalg.norm(np.asarray(ef(xs)) - et) / np.linalg.norm(et) < 2e-3


def test_reduced_identify_scalar_machine_precision():
    """inverse.reduced_identify: Brent over exact forward solves identifies
    the BENCHMARK's scalar eps to ~1e-8 from the reference's own 15-sensor
    layout (the Adam route plateaus ~1e-2 at record budgets)."""
    from hpvpinns_tpu.inverse import reduced_identify

    prob = hv.build(hv.AdvDiffConfig(dtype="float64"))
    coef, eps_fn, info = reduced_identify(prob)
    et = prob.extras["eps_true"]
    assert abs(coef[0] - et) / et < 1e-6
    assert info["method"] == "brent-bounded"
    assert info["n_solves"] < 40  # Brent, not a sweep
    assert float(np.asarray(eps_fn(np.zeros(1)))[0]) == pytest.approx(coef[0])

    from hpvpinns_tpu.problems import poisson1d
    p1 = poisson1d.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff"):
        reduced_identify(p1)


def test_reduced_identify_joint_eps_velocity():
    """identify_velocity=True: joint (eps, V) scalars by Nelder-Mead over
    exact forward solves — both to ~1e-7-class from the benchmark's own
    15 sensors (the joint-optimization route: 7.5e-2 / 5e-3)."""
    from hpvpinns_tpu.inverse import reduced_identify

    prob = hv.build(hv.AdvDiffConfig(dtype="float64"))
    coef, _, info = reduced_identify(prob, identify_velocity=True, p=36)
    et = prob.extras["eps_true"]
    assert abs(coef[0] - et) / et < 1e-5
    assert abs(info["velocity"] - 1.0) < 1e-6
    with pytest.raises(ValueError, match="eps_order"):
        reduced_identify(prob, eps_order=2, identify_velocity=True)


def test_reduced_identify_field_sparse_sensors():
    """Differentiable reduced FIELD identification: exact jax gradients
    through the expm propagator recover a non-polynomial eps(x) to ~2e-2
    from ONLY 35 sensors — the regime where ALS diverges and the neural
    route plateaus ~0.12 (MEASUREMENTS.md regime map)."""
    from hpvpinns_tpu.inverse import reduced_identify_field

    eps_fn_true = lambda x: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    vfn = lambda x: 1.0 + 0.0 * x  # noqa: E731
    cfg = hv.AdvDiffConfig(
        dtype="float64",
        sensor_stations=tuple(float(s) for s in np.linspace(-0.95, 0.95, 7)),
        n_sensors_per_station=5,
    )
    u_fn, f_fn = advdiff.make_manufactured(cfg, vfn, epsilon=eps_fn_true, profile="cos")
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=vfn, epsilon_fn=eps_fn_true)
    s_coef, eps_fn, info = reduced_identify_field(prob, eps_order=8, p=20)
    xs = np.linspace(-1.0, 1.0, 513)
    et = np.asarray(eps_fn_true(xs))
    err = np.linalg.norm(np.asarray(eps_fn(xs)) - et) / np.linalg.norm(et)
    assert err < 0.06
    assert info["misfit"] < 1e-6
    assert np.all(np.asarray(eps_fn(xs)) > 0)  # log-parameterization

    from hpvpinns_tpu.problems import poisson1d
    p1 = poisson1d.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff"):
        reduced_identify_field(p1)


def test_reduced_identify_field_homogeneous_benchmark():
    """The f = 0 benchmark path (no forcing term in the propagator): a
    scalar-truth run recovers a near-constant field at the right level."""
    from hpvpinns_tpu.inverse import reduced_identify_field

    prob = hv.build(hv.AdvDiffConfig(dtype="float64"))
    s_coef, eps_fn, info = reduced_identify_field(prob, eps_order=3, p=24, maxiter=150)
    xs = np.linspace(-1.0, 1.0, 257)
    eh = np.asarray(eps_fn(xs))
    et = prob.extras["eps_true"]
    assert abs(np.mean(eh) - et) / et < 0.05


def test_reduced_identify_field_smooth_reg_noisy_sparse():
    """smooth_reg (log-field Tikhonov) is the sparse+noisy lever: measured
    0.58 -> ~0.12 at 7x5 stations with 1e-3 sensor noise."""
    from hpvpinns_tpu.inverse import reduced_identify_field

    eps_fn_true = lambda x: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    vfn = lambda x: 1.0 + 0.0 * x  # noqa: E731
    cfg = hv.AdvDiffConfig(
        dtype="float64",
        sensor_stations=tuple(float(s) for s in np.linspace(-0.95, 0.95, 7)),
        n_sensors_per_station=5, sensor_noise_std=1e-3,
    )
    u_fn, f_fn = advdiff.make_manufactured(cfg, vfn, epsilon=eps_fn_true, profile="cos")
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=vfn, epsilon_fn=eps_fn_true)
    xs = np.linspace(-1.0, 1.0, 513)
    et = np.asarray(eps_fn_true(xs))
    _, ef_reg, _ = reduced_identify_field(prob, eps_order=6, p=20, smooth_reg=1e-5)
    err_reg = np.linalg.norm(np.asarray(ef_reg(xs)) - et) / np.linalg.norm(et)
    _, ef_raw, _ = reduced_identify_field(prob, eps_order=6, p=20)
    err_raw = np.linalg.norm(np.asarray(ef_raw(xs)) - et) / np.linalg.norm(et)
    assert err_reg < 0.25
    assert err_reg < 0.5 * err_raw  # the penalty buys >= 2x here
