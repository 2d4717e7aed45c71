"""End-to-end problem behavior: construction, training dynamics, convergence
against analytic solutions (the reference's de-facto validation, SURVEY.md §4).

Budgets are kept CPU-small; thresholds are calibrated loose (these are smoke
convergence tests — the full configs-of-record run in the benchmark harness).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.evaluate import per_element_rel_l2
from hpvpinns_tpu.problems import advdiff, poisson1d, poisson2d


def test_poisson1d_f_consistency():
    """f = -u'' by finite differences."""
    x = np.linspace(-0.9, 0.9, 101)[:, None]
    e = 1e-5
    u = poisson1d.u_exact
    upp = (u(x + e) - 2 * u(x) + u(x - e)) / e**2
    np.testing.assert_allclose(poisson1d.f_rhs(x), -upp, rtol=1e-3, atol=1e-3)


def test_poisson2d_f_consistency():
    """f = Delta u by finite differences (reference convention)."""
    x = np.linspace(-0.9, 0.9, 21)[:, None]
    y = np.linspace(-0.9, 0.9, 21)[None, :]
    x, y = np.broadcast_arrays(x, y)
    e = 1e-5
    u = poisson2d.u_exact
    lap = (
        u(x + e, y) + u(x - e, y) + u(x, y + e) + u(x, y - e) - 4 * u(x, y)
    ) / e**2
    np.testing.assert_allclose(poisson2d.f_rhs(x, y), lap, rtol=1e-3, atol=1e-3)


def test_advdiff_exact_satisfies_pde_and_conditions():
    """The Fourier series satisfies the PDE (finite differences), the initial
    condition, and the boundary conditions (AdvDiff.py:351-353,416-445)."""
    eps, V = 0.1 / np.pi, 1.0
    u = lambda x, t: advdiff.u_exact(x, t, eps, V, trunc=800)
    # x capped at 0.35: the series' exp(V x / 2 eps) prefactor (~e^{15.7 x})
    # amplifies float64 cancellation in the finite-difference u_xx beyond that.
    x = np.linspace(-0.7, 0.35, 9)[:, None]
    t = np.full_like(x, 0.43)
    e = 1e-4
    ut = (u(x, t + e) - u(x, t - e)) / (2 * e)
    ux = (u(x + e, t) - u(x - e, t)) / (2 * e)
    uxx = (u(x + e, t) - 2 * u(x, t) + u(x - e, t)) / e**2
    np.testing.assert_allclose(ut + V * ux - eps * uxx, 0.0, atol=1e-3)
    xs = np.linspace(-1, 1, 33)[:, None]
    np.testing.assert_allclose(u(xs, np.zeros_like(xs)), -np.sin(np.pi * xs), atol=1e-12)
    ts = np.linspace(0.05, 1.0, 7)[:, None]  # series truncation ~1e-4 at small t
    np.testing.assert_allclose(u(np.ones_like(ts), ts), 0.0, atol=1e-3)
    np.testing.assert_allclose(u(-np.ones_like(ts), ts), 0.0, atol=1e-3)


@pytest.mark.slow
def test_poisson1d_hp_convergence():
    """3-element hp grid (the reference's N_Element==3 special case,
    Poisson-1D.py:270-273) resolves the steep solution."""
    cfg = hv.Poisson1DConfig(
        dtype="float64",
        grid=(-1.0, -0.1, 0.1, 1.0),
        n_quad=60,
        n_test=40,
        train=hv.TrainConfig(iterations=6001, check_every=100),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    metrics = hv.evaluate_problem(prob, res.params)
    assert metrics["rel_l2"] < 0.05, metrics
    errs = per_element_rel_l2(prob, res.params)
    assert errs.shape == (3,)
    assert np.all(errs < 0.1)


@pytest.mark.slow
def test_poisson2d_vpinn_trains():
    cfg = hv.Poisson2DConfig(
        dtype="float64",
        n_quad=8,
        train=hv.TrainConfig(iterations=2001, check_every=100),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    first, last = res.history["loss"][0], res.history["loss"][-1]
    assert last < 0.5 * first, (first, last)


def test_poisson2d_pinn_mode():
    cfg = hv.Poisson2DConfig(
        scheme="PINNs",
        dtype="float64",
        n_quad=5,
        train=hv.TrainConfig(iterations=201, check_every=100),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    assert "lossp" in res.final_aux and "lossv" not in res.final_aux
    assert res.history["loss"][-1] < res.history["loss"][0]


@pytest.mark.slow
def test_advdiff_inverse_epsilon_moves_toward_truth():
    cfg = hv.AdvDiffConfig(
        dtype="float64",
        train=hv.TrainConfig(iterations=3001, check_every=100),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    eps_true = prob.extras["eps_true"]
    eps_hist = res.history["epsilon"]
    assert abs(eps_hist[-1] - eps_true) < abs(eps_hist[0] - eps_true) * 0.25
    assert res.final_aux["epsilon"] < 0.15  # well on the way from 1.0 to 0.0318


def test_advdiff_hard_bc_ansatz_exact_on_ic_and_bc():
    """Lifted space-time ansatz: u(x, 0) = -sin(pi x) and u(+-1, t) = 0 hold
    to machine precision for RANDOM parameters."""
    import jax

    cfg = hv.AdvDiffConfig(dtype="float64", hard_bc=True, layers=(2, 8, 1))
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(7))
    t = np.linspace(0.0, 1.0, 33)[:, None]
    for xv in (-1.0, 1.0):
        Xb = np.hstack([np.full_like(t, xv), t])
        np.testing.assert_allclose(np.asarray(prob.apply(params, Xb)), 0.0, atol=1e-14)
    x = np.linspace(-1.0, 1.0, 65)[:, None]
    X0 = np.hstack([x, np.zeros_like(x)])
    np.testing.assert_allclose(
        np.asarray(prob.apply(params, X0)), -np.sin(np.pi * x), atol=1e-13
    )
    # boundary/IC part of the data loss is ~0 by construction (sensors remain)
    loss, aux = prob.loss_fn(params, prob.data)
    res = hv.train(prob, hv.TrainConfig(iterations=40, check_every=20), verbose=False)
    assert res.history["loss"][-1] < res.history["loss"][0]
    assert "epsilon" in res.final_aux


def test_advdiff_joint_velocity_identification():
    """V trainable alongside eps: both leaves exist, both move toward truth
    (V: 0.5 -> 1.0; eps: 1.0 -> 0.0318) under a modest f64 budget."""
    import jax

    cfg = hv.AdvDiffConfig(
        dtype="float64", velocity_trainable=True, velocity_init=0.5,
        train=hv.TrainConfig(iterations=1500, check_every=250),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    assert set(params["pde"]) == {"epsilon", "velocity"}
    res = hv.train(prob, verbose=False)
    v_hist = res.history["velocity"]
    assert abs(v_hist[-1] - 1.0) < abs(v_hist[0] - 1.0)
    eps_hist = res.history["epsilon"]
    assert abs(eps_hist[-1] - prob.extras["eps_true"]) < abs(
        eps_hist[0] - prob.extras["eps_true"]
    )
    # the trainable V feeds the strong residual too
    from hpvpinns_tpu.evaluate import strong_residual

    r = strong_residual(prob, res.params, prob.test_points[:32])
    assert np.all(np.isfinite(r))


def test_advdiff_forward_mode_has_no_pde_params():
    cfg = hv.AdvDiffConfig(inverse=False, train=hv.TrainConfig(iterations=1))
    prob = hv.build(cfg)
    import jax

    params = prob.init_params(jax.random.key(0))
    assert params["pde"] == {}


def test_advdiff_layer_feature_ansatz():
    """layer_feature appends the outflow profile exp(V (x - 1)/eps_true) as a
    third network input: the input layer widens by 1 automatically, the
    Gauss-Newton residual-vector identity holds through the wrapped apply,
    training decreases the loss, and inverse runs reject the flag (the
    feature is built from the TRUE eps)."""
    import jax

    cfg = hv.AdvDiffConfig(
        inverse=False, layer_feature=True, dtype="float64",
        layers=(2, 8, 8, 1), n_quad=8, n_test_x=4, n_test_t=4,
        train=hv.TrainConfig(iterations=60, check_every=30),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    assert params["net"][0]["W"].shape[0] == 3  # (x, t, layer feature)
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    rv = make_residual_vector(prob)(params, prob.data)
    loss, _ = prob.loss_fn(params, prob.data)
    np.testing.assert_allclose(
        float(np.sum(np.asarray(rv) ** 2)), float(loss), rtol=1e-12
    )
    res = hv.train(prob, verbose=False)
    assert res.history["loss"][-1] < res.history["loss"][0]
    with pytest.raises(ValueError, match="layer_feature"):
        hv.build(hv.AdvDiffConfig(layer_feature=True))

    # composes with the hard-BC lift: IC/BC still exact by construction
    cfgh = hv.AdvDiffConfig(
        inverse=False, layer_feature=True, hard_bc=True,
        dtype="float64", layers=(2, 8, 1),
    )
    probh = hv.build(cfgh)
    ph = probh.init_params(jax.random.key(1))
    t = np.linspace(0.0, 1.0, 9)[:, None]
    Xb = np.hstack([np.ones_like(t), t])
    np.testing.assert_allclose(np.asarray(probh.apply(ph, Xb)), 0.0, atol=1e-14)


def test_burgers_front_feature_ansatz():
    """front_feature appends tanh(x/2nu) as a third network input: the input
    layer widens by 1 automatically, the GN residual-vector identity holds
    through the wrapped apply, training decreases the loss, and the feature
    composes with the hard-BC lift (IC/BC still exact by construction)."""
    import jax

    cfg = hv.BurgersConfig(
        front_feature=True, dtype="float64",
        layers=(2, 8, 8, 1), n_quad=8, n_test_x=4, n_test_t=4,
        n_elements_x=2, n_elements_t=1,
        train=hv.TrainConfig(iterations=60, check_every=30),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    assert params["net"][0]["W"].shape[0] == 3  # (x, t, front feature)
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    rv = make_residual_vector(prob)(params, prob.data)
    loss, _ = prob.loss_fn(params, prob.data)
    np.testing.assert_allclose(
        float(np.sum(np.asarray(rv) ** 2)), float(loss), rtol=1e-12
    )
    res = hv.train(prob, verbose=False)
    assert res.history["loss"][-1] < res.history["loss"][0]

    # composes with the hard-BC lift: walls still exact by construction
    cfgh = hv.BurgersConfig(
        front_feature=True, hard_bc=True, dtype="float64", layers=(2, 8, 1),
        n_elements_x=2, n_elements_t=1,
    )
    probh = hv.build(cfgh)
    ph = probh.init_params(jax.random.key(1))
    t = np.linspace(0.0, 1.0, 9)[:, None]
    Xw = np.hstack([np.ones_like(t), t])
    np.testing.assert_allclose(np.asarray(probh.apply(ph, Xw)), 0.0, atol=1e-14)


def test_burgers_hybrid_strong_loss():
    """n_strong adds a strong-collocation term: sampled in the window, the
    GN residual-vector identity holds through the extra block (sum r^2 ==
    loss incl. ws * mean(strong^2)), and training decreases the loss."""
    import jax

    cfg = hv.BurgersConfig(
        n_strong=50, strong_weight=0.5, strong_window=(-0.15, 0.15),
        dtype="float64", layers=(2, 8, 8, 1), n_quad=8,
        n_test_x=4, n_test_t=4, n_elements_x=2, n_elements_t=1,
        train=hv.TrainConfig(iterations=60, check_every=30),
    )
    prob = hv.build(cfg)
    xr = np.asarray(prob.data["xr"])
    assert xr.shape == (50, 2)
    assert xr[:, 0].min() >= -0.15 and xr[:, 0].max() <= 0.15
    assert xr[:, 1].min() >= 0.0 and xr[:, 1].max() <= cfg.t_final

    params = prob.init_params(jax.random.key(0))
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    rv = make_residual_vector(prob)(params, prob.data)
    loss, aux = prob.loss_fn(params, prob.data)
    assert "lossr" in aux
    np.testing.assert_allclose(
        float(np.sum(np.asarray(rv) ** 2)), float(loss), rtol=1e-12
    )
    res = hv.train(prob, verbose=False)
    assert res.history["loss"][-1] < res.history["loss"][0]


def test_build_dispatch():
    assert hv.build(hv.Poisson1DConfig(n_quad=5, n_test=3)).name == "poisson1d"
    assert hv.build(hv.Poisson2DConfig(n_quad=4)).name == "poisson2d"
    assert hv.build(hv.AdvDiffConfig()).name == "advdiff"
    with pytest.raises(TypeError):
        hv.build(object())


@pytest.mark.slow
def test_custom_manufactured_solution_1d():
    """build() accepts user u/f overrides — custom PDEs without editing the
    library (the reference requires editing driver constants)."""
    from hpvpinns_tpu.problems import poisson1d

    prob = poisson1d.build(
        hv.Poisson1DConfig(
            dtype="float64", n_quad=20, n_test=10, layers=(1, 12, 12, 1),
            train=hv.TrainConfig(iterations=2000, lbfgs_iterations=500, check_every=200),
        ),
        u_fn=lambda x: x**3,
        f_fn=lambda x: -6 * x,
    )
    res = hv.train(prob, verbose=False)
    assert hv.evaluate_problem(prob, res.params)["rel_l2"] < 1e-4


def test_custom_manufactured_solution_2d_builds():
    from hpvpinns_tpu.problems import poisson2d

    u = lambda x, y: x * y
    f = lambda x, y: 0.0 * x * y  # Delta(xy) = 0
    prob = poisson2d.build(
        hv.Poisson2DConfig(dtype="float64", n_quad=5, layers=(2, 6, 1),
                           train=hv.TrainConfig(iterations=20, check_every=10)),
        u_fn=u, f_fn=f,
    )
    np.testing.assert_allclose(np.asarray(prob.data["elements"].f_proj), 0.0, atol=1e-14)
    res = hv.train(prob, verbose=False)
    assert np.isfinite(res.final_aux["loss"])


def test_bfloat16_trains():
    """bf16 is supported end to end (convergence is slower — see
    benchmarks/MEASUREMENTS.md; f32 with HIGHEST-precision matmuls is the
    accuracy-sane default)."""
    cfg = hv.Poisson2DConfig(dtype="bfloat16", n_quad=5, layers=(2, 6, 1),
                             train=hv.TrainConfig(iterations=30, check_every=10))
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    assert np.isfinite(res.final_aux["loss"])
    assert prob.data["xb"].dtype == jnp.bfloat16


@pytest.mark.slow
@pytest.mark.slow
def test_advdiff_inverse_lbfgs_recovers_epsilon():
    """Adam + L-BFGS identifies the diffusion coefficient to a few percent
    (measured: eps=0.0326 vs true 0.0318 at the 5k+10k budget)."""
    cfg = hv.AdvDiffConfig(
        dtype="float64",
        train=hv.TrainConfig(iterations=2000, lbfgs_iterations=4000, check_every=500),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    eps_true = prob.extras["eps_true"]
    assert abs(res.final_aux["epsilon"] - eps_true) / eps_true < 0.2


def test_hard_bc_ansatz():
    """Boundary lifting u = g + D*N: BC exact by construction (lossb ~ 0 at
    any params), predict() uses the composite, training improves the PDE
    residual. On-chip quality run reached rel-L2 3.1e-4 (MEASUREMENTS.md)."""
    import jax

    from hpvpinns_tpu.problems import poisson2d

    cfg = hv.Poisson2DConfig(
        dtype="float64", n_quad=6, layers=(2, 8, 1),
        train=hv.TrainConfig(iterations=60, check_every=20),
    )
    prob = poisson2d.build(
        cfg, lift_fn=poisson2d.default_lift, envelope_fn=poisson2d.default_envelope
    )
    params = prob.init_params(jax.random.key(0))
    _, aux = prob.loss_fn(params, prob.data)
    assert float(aux["lossb"]) < 1e-10  # exact BC before any training
    res = hv.train(prob, verbose=False)
    assert res.history["lossv"][-1] < res.history["lossv"][0]
    # predict() must evaluate the composite ansatz, not the bare MLP
    Xb = np.array([[1.0, 0.25], [-1.0, -0.5]])
    u_pred = hv.predict(prob, res.params, Xb)
    np.testing.assert_allclose(
        u_pred, poisson2d.u_exact(Xb[:, 0:1], Xb[:, 1:2]), atol=1e-9
    )


@pytest.mark.slow
def test_epsilon_field_model_scalar_parity():
    """epsilon_model='scalar' is exact reference parity; var_form 1's
    epsilon-inside-integrand refactor must not change scalar results."""
    import jax

    cfg0 = hv.AdvDiffConfig(dtype="float64", var_form=1)
    prob = hv.build(cfg0)
    params = prob.init_params(jax.random.key(0))
    l, aux = prob.loss_fn(params, prob.data)
    assert np.isfinite(float(l)) and "epsilon" in aux
    with pytest.raises(ValueError, match="epsilon_model"):
        hv.build(hv.AdvDiffConfig(epsilon_model="cubic"))


@pytest.mark.slow
def test_epsilon_field_identification():
    """Space-dependent eps(x) = c0 + c1 x + c2 x^2 identified jointly
    (beyond reference): from init eps=1.0 the field collapses to the
    vicinity of the true constant 0.0318 (profile is weakly identified
    from 15 sensors; c0 lands within ~30%)."""
    import jax.numpy as jnp

    cfg = hv.AdvDiffConfig(
        dtype="float64", epsilon_model="quadratic",
        train=hv.TrainConfig(iterations=2000, lbfgs_iterations=3000, check_every=500),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    c = np.asarray(res.params["pde"]["eps_coef"])
    eps_true = prob.extras["eps_true"]
    assert abs(c[0] - eps_true) < 0.5 * eps_true + 0.01
    field = np.asarray(prob.extras["eps_of"](res.params, jnp.linspace(-1, 1, 9)))
    assert np.all(field > 0.0) and np.all(field < 0.2)  # collapsed from 1.0
    assert "eps_c1" in res.final_aux


def test_hard_bc_1d():
    """1D boundary lifting: BC exact at any params; improves over soft BC
    at equal budget (measured 6.4e-3 vs 9.6e-3 on the hp3 config)."""
    import jax

    from hpvpinns_tpu.problems import poisson1d

    cfg = hv.Poisson1DConfig(
        dtype="float64", n_quad=12, n_test=6, layers=(1, 8, 1),
        train=hv.TrainConfig(iterations=40, check_every=20),
    )
    prob = poisson1d.build(cfg, hard_bc=True)
    params = prob.init_params(jax.random.key(0))
    _, aux = prob.loss_fn(params, prob.data)
    assert float(aux["lossb"]) < 1e-12
    res = hv.train(prob, verbose=False)
    xb = np.asarray(cfg.domain)[:, None]
    np.testing.assert_allclose(
        hv.predict(prob, res.params, xb), poisson1d.u_exact(xb), atol=1e-12
    )


def test_advdiff_sensor_noise_knob():
    """sensor_noise_std perturbs ONLY the interior sensor readings; the
    boundary/initial rows stay exact."""
    from hpvpinns_tpu.problems.advdiff import training_data

    cfg0 = hv.AdvDiffConfig(sensor_noise_std=0.0)
    cfg1 = hv.AdvDiffConfig(sensor_noise_std=1e-2)
    rng0 = np.random.default_rng(cfg0.train.seed)
    rng1 = np.random.default_rng(cfg1.train.seed)
    X0, u0 = training_data(cfg0, rng0)
    X1, u1 = training_data(cfg1, rng1)
    np.testing.assert_array_equal(X0, X1)
    n_bc = 3 * cfg0.n_bound  # two walls + initial edge
    np.testing.assert_array_equal(u0[:n_bc], u1[:n_bc])  # exact BC/IC rows
    diff = np.abs(u0[n_bc:] - u1[n_bc:])
    assert diff.max() > 0 and diff.max() < 0.1  # perturbed, at noise scale
