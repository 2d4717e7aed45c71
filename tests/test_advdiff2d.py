"""2D space-time advection-diffusion (advdiff2d): the 2-space-dimension
generalization of the reference's inverse family (AdvDiff.py:161-180,63) on
the 3D tensor machinery.  Manufactured problem — every piece is exactly
verifiable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.ops.assembly import advdiff2d_residual
from hpvpinns_tpu.problems import advdiff2d


def _exact_u(X):
    return jnp.sin(jnp.pi * X[:, 0:1]) * jnp.sin(jnp.pi * X[:, 1:2]) * jnp.exp(-X[:, 2:3])


def test_exact_solution_zero_weak_residual_both_forms():
    """The manufactured solution drives both weak forms to (near) zero at the
    true coefficients on a multi-element mesh: form 0 cancels pointwise
    against the projected forcing; form 1 to quadrature accuracy."""
    cfg = hv.AdvDiff2DConfig(
        dtype="float64", n_quad=10,
        n_elements_x=2, n_elements_y=1, n_elements_t=2,
    )
    prob = advdiff2d.build(cfg)
    el = prob.data["elements"]
    eps = cfg.gamma / np.pi
    for vf, tol in ((0, 1e-13), (1, 1e-7)):
        res = advdiff2d_residual(
            _exact_u, el, prob.data["basis_x"], prob.data["basis_y"],
            prob.data["basis_t"], vf, *cfg.velocity, eps,
        )
        assert float(jnp.abs(res).max()) < tol, f"form {vf}"


def test_field_engines_agree():
    """taylor and jvp derivative engines give the same loss/grad (the
    three-engine interchangeability contract extended to this family)."""
    cfgs = [
        hv.AdvDiff2DConfig(dtype="float64", layers=(3, 8, 1), deriv_mode=m, var_form=vf)
        for m in ("taylor", "jvp") for vf in (0, 1)
    ]
    key = jax.random.key(5)
    for vf in (0, 1):
        pair = [c for c in cfgs if c.var_form == vf]
        probs = [advdiff2d.build(c) for c in pair]
        params = probs[0].init_params(key)
        vals = []
        for p in probs:
            loss, _ = p.loss_fn(params, p.data)
            g = jax.grad(lambda q: p.loss_fn(q, p.data)[0])(params)
            vals.append((float(loss), g))
        np.testing.assert_allclose(vals[0][0], vals[1][0], rtol=1e-12)
        for a, b in zip(
            jax.tree_util.tree_leaves(vals[0][1]), jax.tree_util.tree_leaves(vals[1][1])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)


def test_training_data_faces_and_sensors():
    """Side walls carry (near-)zero values, the t=0 face the initial slice,
    the sensors exact readings; counts match the config."""
    cfg = hv.AdvDiff2DConfig(dtype="float64", n_bound=16, n_sensors_per_station=3)
    prob = advdiff2d.build(cfg)
    Xb = np.asarray(prob.data["xb"], dtype=np.float64)
    ub = np.asarray(prob.data["ub"], dtype=np.float64)
    n_sensor = len(cfg.sensor_stations) * cfg.n_sensors_per_station
    assert Xb.shape[0] == 5 * cfg.n_bound + n_sensor
    np.testing.assert_allclose(
        ub, advdiff2d.u_exact(Xb[:, 0:1], Xb[:, 1:2], Xb[:, 2:3]), atol=1e-12
    )
    # x = +-1 walls: u = 0 exactly (sin(pi * +-1) = 0)
    walls = np.abs(np.abs(Xb[:, 0]) - 1.0) < 1e-12
    assert walls.sum() == 2 * cfg.n_bound
    np.testing.assert_allclose(ub[walls], 0.0, atol=1e-12)


@pytest.mark.slow
def test_joint_identification_moves_toward_truth():
    cfg = hv.AdvDiff2DConfig(
        dtype="float64", velocity_trainable=True,
        train=hv.TrainConfig(iterations=1500, lbfgs_iterations=1500, check_every=250),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    assert set(params["pde"]) == {"epsilon", "velocity"}
    res = hv.train(prob, verbose=False)
    eps = float(np.asarray(res.eval_params["pde"]["epsilon"]))
    assert abs(eps - prob.extras["eps_true"]) < 0.3 * abs(
        cfg.epsilon_init - prob.extras["eps_true"]
    )
    v = np.asarray(res.eval_params["pde"]["velocity"], dtype=np.float64)
    assert abs(v[0] - 1.0) < 0.5 * abs(cfg.velocity_init[0] - 1.0)
    assert abs(v[1] - 0.5) < 0.5 * abs(cfg.velocity_init[1] - 0.5)
    # strong residual subtracts the forcing; finite and small near the solution
    from hpvpinns_tpu.evaluate import strong_residual

    r = strong_residual(prob, res.eval_params, prob.test_points[::1000])
    assert np.all(np.isfinite(r))
    # per-element error map works on the space-time tensor mesh
    from hpvpinns_tpu.evaluate import per_element_rel_l2

    errs = per_element_rel_l2(prob, res.eval_params)
    assert errs.shape == (prob.extras["mesh"].n_elem,)
    assert np.all(np.isfinite(errs))


def test_cli_advdiff2d(capsys):
    import json

    from hpvpinns_tpu.cli import main

    rc = main(
        "run advdiff2d --dtype float64 --identify-velocity "
        "--iterations 40 --quiet".split()
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["problem"] == "advdiff2d"
    assert "epsilon" in summary and "velocity" in summary
    assert abs(summary["velocity_true"] - np.hypot(1.0, 0.5)) < 1e-12


def test_forward_mode_has_no_pde_params():
    cfg = hv.AdvDiff2DConfig(dtype="float64", inverse=False, layers=(3, 6, 1))
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    assert params["pde"] == {}
    loss, aux = prob.loss_fn(params, prob.data)
    assert np.isfinite(float(loss)) and "epsilon" not in aux


@pytest.mark.slow
def test_reduced_identify2d_three_scalars():
    """Network-free (eps, vx, vy) identification for the 2D family: NM over
    exact tensor-product forward solves — all three to ~1e-5-class from the
    family's own 25 sensors (the optimization route: ~0.1-0.2%)."""
    from hpvpinns_tpu.inverse import reduced_identify2d

    prob = hv.build(hv.AdvDiff2DConfig(dtype="float64"))
    coef, info = reduced_identify2d(prob, p=10, maxiter=250)
    et = prob.extras["eps_true"]
    assert abs(coef[0] - et) / et < 1e-3
    assert abs(coef[1] - 1.0) < 1e-4
    assert abs(coef[2] - 0.5) < 1e-4

    p1 = hv.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff2d"):
        reduced_identify2d(p1)


def test_variable_eps_map_zero_residual_and_forward_loss():
    """The assembly extension for eps(x, y) MAPS: the exact manufactured
    solution drives both weak forms to (near) zero at a genuinely varying
    diffusivity field (form 0 pointwise; form 1 via the exact-autodiff
    eps_x/eps_y IBP terms)."""
    import jax

    from hpvpinns_tpu.ops.assembly import advdiff2d_residual

    eps_fn = lambda X, Y: (0.1 / jnp.pi) * (  # noqa: E731
        1.0 + 0.3 * jnp.sin(jnp.pi * X) * jnp.cos(jnp.pi * Y / 2)
    )
    cfg = hv.AdvDiff2DConfig(
        dtype="float64", inverse=False, n_quad=12, n_test_x=6, n_test_y=6, n_test_t=6
    )
    prob = advdiff2d.build(cfg, epsilon_fn=eps_fn)
    el = prob.data["elements"]
    exact_u = lambda X: (  # noqa: E731
        jnp.sin(jnp.pi * X[:, 0:1]) * jnp.sin(jnp.pi * X[:, 1:2]) * jnp.exp(-X[:, 2:3])
    )
    vx, vy = cfg.velocity
    res0 = advdiff2d_residual(
        exact_u, el, prob.data["basis_x"], prob.data["basis_y"], prob.data["basis_t"],
        0, vx, vy, eps_fn(el.x, el.y),
    )
    assert float(jnp.abs(res0).max()) < 1e-14
    e = eps_fn(el.x, el.y)
    _, ex = jax.jvp(lambda q: eps_fn(q, el.y), (el.x,), (jnp.ones_like(el.x),))
    _, ey = jax.jvp(lambda q: eps_fn(el.x, q), (el.y,), (jnp.ones_like(el.y),))
    res1 = advdiff2d_residual(
        exact_u, el, prob.data["basis_x"], prob.data["basis_y"], prob.data["basis_t"],
        1, vx, vy, e, epsilon_x=ex, epsilon_y=ey,
    )
    assert float(jnp.abs(res1).max()) < 1e-6  # quadrature accuracy
    # forward loss runs with the field truth (the _eps_args path)
    cfg1 = hv.AdvDiff2DConfig(
        dtype="float64", inverse=False, var_form=1, n_quad=8,
        n_test_x=4, n_test_y=4, n_test_t=4, layers=(3, 8, 1),
    )
    prob1 = advdiff2d.build(cfg1, epsilon_fn=eps_fn)
    params = prob1.init_params(jax.random.key(0))
    loss, _ = prob1.loss_fn(params, prob1.data)
    assert np.isfinite(float(loss))
    assert prob1.extras["eps_true"] == pytest.approx(0.1 / np.pi, rel=1e-3)  # map mean


def test_fit_epsilon_field2d_oracle_spectral():
    """2D diffusivity-map linear fit: spectral at oracle u (1.7e-4 at
    orders (8,8)); trained-u recovery measured at ~4% (MEASUREMENTS.md)."""
    import jax

    from hpvpinns_tpu.inverse import fit_epsilon_field2d

    eps_fn = lambda X, Y: (0.1 / jnp.pi) * (  # noqa: E731
        1.0 + 0.3 * jnp.sin(jnp.pi * X) * jnp.cos(jnp.pi * Y / 2)
    )
    cfg = hv.AdvDiff2DConfig(dtype="float64", n_quad=12, n_test_x=10, n_test_y=10, n_test_t=6)
    prob = advdiff2d.build(cfg, epsilon_fn=eps_fn)
    params = prob.init_params(jax.random.key(0))
    oracle = lambda X: (  # noqa: E731
        jnp.sin(jnp.pi * X[:, 0:1]) * jnp.sin(jnp.pi * X[:, 1:2]) * jnp.exp(-X[:, 2:3])
    )
    xs = np.linspace(-1, 1, 49)
    XG, YG = np.meshgrid(xs, xs, indexing="ij")
    ET = np.asarray(eps_fn(XG, YG))
    errs = {}
    for o in (4, 8):
        _, ef, info = fit_epsilon_field2d(prob, params, order_x=o, order_y=o, u_fn=oracle)
        errs[o] = np.linalg.norm(np.asarray(ef(XG, YG)) - ET) / np.linalg.norm(ET)
        assert info["residual_after"] <= info["residual_before"]
    assert errs[8] < 5e-4
    assert errs[8] < errs[4] / 20
    p1 = hv.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff2d"):
        fit_epsilon_field2d(p1, p1.init_params(jax.random.key(0)))


def test_als_identify2d_map_recovery():
    """Network-free 2D map identification: ~4-8% from clean dense sensing
    (sin-profile observability bounded — MEASUREMENTS.md); the test-order >
    basis-order size rule is what keeps the u-solve full-rank."""
    from hpvpinns_tpu.inverse import als_identify2d

    eps_fn = lambda X, Y: (0.1 / jnp.pi) * (  # noqa: E731
        1.0 + 0.3 * jnp.sin(jnp.pi * X) * jnp.cos(jnp.pi * Y / 2)
    )
    st = [(x, y) for x in np.linspace(-0.8, 0.8, 7) for y in np.linspace(-0.8, 0.8, 7)]
    cfg = hv.AdvDiff2DConfig(
        dtype="float64", n_quad=16, n_test_x=12, n_test_y=12, n_test_t=10,
        sensor_stations=tuple((float(a), float(b)) for a, b in st),
        n_sensors_per_station=20,
    )
    prob = advdiff2d.build(cfg, epsilon_fn=eps_fn)
    uf, coef, ef, info = als_identify2d(prob, space_order=10, time_order=8, iters=3)
    xs = np.linspace(-1, 1, 49)
    XG, YG = np.meshgrid(xs, xs, indexing="ij")
    ET = np.asarray(eps_fn(XG, YG))
    err = np.linalg.norm(np.asarray(ef(XG, YG)) - ET) / np.linalg.norm(ET)
    assert err < 0.12
    u_hat = uf(prob.test_points).reshape(-1)
    u_tr = np.asarray(prob.test_values).reshape(-1)
    assert np.linalg.norm(u_hat - u_tr) / np.linalg.norm(u_tr) < 5e-3
    p1 = hv.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff2d"):
        als_identify2d(p1)


def test_advdiff2d_p_refinement_per_axis_orders():
    """Per-axis-element test orders on the 3D tensor assembly (p-adaptivity
    completed for every family): p-mode raises marked axis orders, h-mode
    splits the order arrays with the grids."""
    from hpvpinns_tpu.adaptive import _refined_config, element_indicator

    cfg = hv.AdvDiff2DConfig(
        dtype="float64", n_elements_x=2, n_elements_y=2, n_elements_t=1,
        n_quad=5, n_test_x=3, n_test_y=3, n_test_t=3, layers=(3, 8, 1),
    )
    prob = advdiff2d.build(cfg)
    params = prob.init_params(jax.random.key(0))
    eta = element_indicator(prob, params, enrich=2)
    c2 = _refined_config(cfg, prob, eta, theta=0.5, mode="p", p_step=2, axes="xt")
    assert len(c2.n_test_x_per_elem) == 2 and max(c2.n_test_x_per_elem) == 5
    assert len(c2.n_test_t_per_elem) == 1
    prob2 = advdiff2d.build(c2)
    assert np.isfinite(float(prob2.loss_fn(params, prob2.data)[0]))
    el = prob2.data["elements"]
    ntx = np.asarray(c2.n_test_x_per_elem)
    nty = np.asarray(c2.n_test_y_per_elem)
    ntt = np.asarray(c2.n_test_t_per_elem)
    expect = (ntx[:, None, None] * nty[None, :, None] * ntt[None, None, :]).reshape(-1)
    np.testing.assert_allclose(np.asarray(el.n_test), expect.astype(float))

    c3 = _refined_config(c2, prob2, element_indicator(prob2, params, enrich=2),
                         theta=0.5, mode="h", axes="xt")
    assert len(c3.n_test_x_per_elem) == len(c3.grid_x) - 1
    assert len(c3.n_test_t_per_elem) == len(c3.grid_t) - 1
    prob3 = advdiff2d.build(c3)
    assert np.isfinite(float(prob3.loss_fn(params, prob3.data)[0]))


def test_strong_residual_uses_manufactured_eps_map_pointwise():
    """Forward advdiff2d with a NON-constant eps(x, y) map: the strong
    residual at the exact manufactured solution must vanish pointwise.
    Using the field's domain MEAN instead (the pre-fix behavior) leaves an
    O((eps(x,y)-mean)*Lap u) error ~1e-1 at these coefficients."""
    import dataclasses

    from hpvpinns_tpu.evaluate import strong_residual

    eps_fn = lambda X, Y: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * X))  # noqa: E731
    cfg = hv.AdvDiff2DConfig(
        dtype="float64", inverse=False, n_test_x=4, n_test_y=4, n_test_t=3,
        n_quad=8, layers=(3, 8, 1),
    )
    prob = advdiff2d.build(cfg, epsilon_fn=eps_fn)
    exact = lambda params, X: (  # noqa: E731
        jnp.sin(jnp.pi * X[:, 0:1]) * jnp.sin(jnp.pi * X[:, 1:2])
        * jnp.exp(-X[:, 2:3])
    )
    probx = dataclasses.replace(prob, apply_override=exact)
    params = prob.init_params(jax.random.key(0))
    X = prob.test_points[::501]
    r = strong_residual(probx, params, X)
    assert np.max(np.abs(r)) < 1e-8  # exact-solution identity, f64
