"""Taylor-Green vortex — UNSTEADY incompressible Navier-Stokes, the
framework's second PDE system and first time-dependent one (no reference
analog).  The exact decaying-vortex solution makes every layer exactly
verifiable; the weak form rides the space-time tensor machinery (time =
slowest axis, like advdiff2d) with a vector 3D JVP derivative engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.ops.assembly import ns_unsteady_residual
from hpvpinns_tpu.ops.fields import vector_fields_3d
from hpvpinns_tpu.problems import taylorgreen


def _exact_w_fn(re: float):
    nu = 1.0 / re

    def w_fn(X):
        x, y, t = X[:, 0:1], X[:, 1:2], X[:, 2:3]
        e = jnp.exp(-2.0 * nu * t)
        u = -jnp.cos(x) * jnp.sin(y) * e
        v = jnp.sin(x) * jnp.cos(y) * e
        p = -0.25 * (jnp.cos(2.0 * x) + jnp.cos(2.0 * y)) * e**2
        return jnp.concatenate([u, v, p], axis=-1)

    return w_fn


def test_exact_solution_satisfies_strong_system():
    """Momentum + continuity vanish pointwise at the decaying vortex."""
    re = 10.0
    nu = 1.0 / re
    w_fn = _exact_w_fn(re)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, np.pi, (1, 40)))
    y = jnp.asarray(rng.uniform(0, np.pi, (1, 40)))
    t = jnp.asarray(rng.uniform(0, 1.0, (1, 40)))
    f = vector_fields_3d(w_fn, x, y, t)
    w, wx, wy, wt = f["w"], f["wx"], f["wy"], f["wz"]
    wxx, wyy = f["wxx"], f["wyy"]
    u, v = w[..., 0], w[..., 1]
    mom_x = wt[..., 0] + u * wx[..., 0] + v * wy[..., 0] + wx[..., 2] - nu * (wxx[..., 0] + wyy[..., 0])
    mom_y = wt[..., 1] + u * wx[..., 1] + v * wy[..., 1] + wy[..., 2] - nu * (wxx[..., 1] + wyy[..., 1])
    div = wx[..., 0] + wy[..., 1]
    for r in (mom_x, mom_y, div):
        assert float(jnp.abs(r).max()) < 1e-12


def test_exact_solution_zero_weak_residual_both_forms():
    """Both weak forms vanish at the exact solution on a multi-element
    space-time mesh (form 0 pointwise; form 1 to quadrature accuracy)."""
    cfg = hv.TaylorGreenConfig(dtype="float64", n_quad=14,
                               n_test_x=5, n_test_y=5, n_test_t=5)
    w_fn = _exact_w_fn(cfg.re)
    for vf, tol in ((0, 1e-12), (1, 1e-8)):
        prob = taylorgreen.build(hv.TaylorGreenConfig(
            dtype="float64", n_quad=14, n_test_x=5, n_test_y=5, n_test_t=5,
            var_form=vf))
        el = prob.data["elements"]
        res = ns_unsteady_residual(
            w_fn, el, prob.data["basis_x"], prob.data["basis_y"],
            prob.data["basis_t"], vf, 1.0 / cfg.re,
        )
        assert float(jnp.abs(res).max()) < tol, f"form {vf}"


@pytest.mark.parametrize(
    "kw",
    [{}, {"bc_pressure": False}, {"inverse": True}, {"eq_weights": (1.0, 4.0, 2.0)},
     {"hard_bc": True}, {"hard_bc": True, "var_form": 0}],
    ids=["bc_p", "gauge_anchor", "inverse", "eq_weights", "hard_bc",
         "hard_bc_vf0"],
)
def test_gauss_newton_resvec_identity(kw):
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    cfg = hv.TaylorGreenConfig(
        dtype="float64", n_quad=6, n_test_x=3, n_test_y=3, n_test_t=3,
        layers=(3, 6, 3), **kw,
    )
    prob = taylorgreen.build(cfg)
    params = prob.init_params(jax.random.key(2))
    loss, _ = prob.loss_fn(params, prob.data)
    r = make_residual_vector(prob)(params, prob.data)
    np.testing.assert_allclose(float(jnp.sum(r**2)), float(loss), rtol=1e-12)


def test_evaluate_strong_residual_per_element():
    cfg = hv.TaylorGreenConfig(dtype="float64", n_quad=6, n_test_x=3,
                               n_test_y=3, n_test_t=3, layers=(3, 6, 3))
    prob = taylorgreen.build(cfg)
    params = prob.init_params(jax.random.key(0))
    rep = hv.evaluate_problem(prob, params)
    for k in ("rel_l2", "rel_l2_u", "rel_l2_v", "rel_l2_p"):
        assert np.isfinite(rep[k])
    from hpvpinns_tpu.evaluate import per_element_rel_l2, strong_residual

    errs = per_element_rel_l2(prob, params)
    assert errs.shape == (prob.extras["mesh"].n_elem,)
    r = strong_residual(prob, params, prob.test_points[::2000])
    assert r.shape[-1] == 3 and np.all(np.isfinite(r))
    from hpvpinns_tpu.adaptive import element_indicator

    eta = element_indicator(prob, params, enrich=2)
    assert eta.shape == (8,) and np.all(np.isfinite(eta))


def test_training_reduces_loss():
    cfg = hv.TaylorGreenConfig(
        dtype="float64", n_quad=6, n_test_x=3, n_test_y=3, n_test_t=3,
        layers=(3, 8, 3),
        train=hv.TrainConfig(iterations=150, lbfgs_iterations=0, check_every=50),
    )
    prob = hv.build(cfg)
    params0 = prob.init_params(jax.random.key(cfg.train.seed))
    loss0, _ = prob.loss_fn(params0, prob.data)
    res = hv.train(prob, verbose=False)
    assert res.final_aux["loss"] < float(loss0)


def test_solve_ns_unsteady_second_order_and_accurate():
    """BDF2 spectral march vs the exact vortex: O(dt^2) in all THREE
    components (the startup-pressure extrapolation keeps p at scheme
    order — measured 100x better than the naive t0 copy)."""
    from hpvpinns_tpu.galerkin import solve_ns_unsteady

    re = 10.0
    g = lambda x, y, t: taylorgreen.exact_fields(x, y, t, re)[:2]  # noqa: E731
    u0 = lambda x, y: taylorgreen.exact_fields(x, y, 0.0, re)[:2]  # noqa: E731
    xs = np.linspace(0, np.pi, 21)
    ts = np.linspace(0, 1, 5)
    TG, YG, XG = np.meshgrid(ts, xs, xs, indexing="ij")
    ut, vt, pt = taylorgreen.exact_fields(XG, YG, TG, re)
    errs = []
    for ns in (10, 20):  # coarse steps: time error dominates the p=12
        # spatial floor (measured: 3.8e-5 -> 8.8e-6 u, 2.1e-4 -> 3.7e-5 p)
        sol = solve_ns_unsteady((0, np.pi), (0, np.pi), 12, 1.0 / re, g, u0, 1.0, ns)
        u, v = sol.velocity(XG, YG, TG)
        ph = sol.pressure(XG, YG, TG)
        ph = ph + pt.mean() - ph.mean()
        errs.append([
            np.linalg.norm(a - b) / np.linalg.norm(b)
            for a, b in ((u, ut), (v, vt), (ph, pt))
        ])
    for e_coarse, e_fine in zip(*errs):
        assert e_fine < e_coarse / 3.0  # ~4x per dt halving
    assert max(errs[1]) < 2e-4


def test_reduced_identify_taylorgreen():
    """Network-free viscosity identification through the unsteady solver:
    nu to ~5e-5-class in ~13 solves (p=10/60 steps — the error tracks the
    solver's O(dt^2) floor; p=12/160 measured 6.3e-6)."""
    from hpvpinns_tpu.inverse import reduced_identify_taylorgreen

    cfg = hv.TaylorGreenConfig(dtype="float64", inverse=True)
    prob = hv.build(cfg)
    nu_hat, info = reduced_identify_taylorgreen(prob)
    nu_true = prob.extras["nu_true"]
    assert abs(nu_hat - nu_true) / nu_true < 5e-4
    assert info["n_solves"] < 40


@pytest.mark.slow
def test_vpinn_gap_taylorgreen():
    from hpvpinns_tpu.galerkin import vpinn_gap_taylorgreen

    cfg = hv.TaylorGreenConfig(dtype="float64", n_quad=6, n_test_x=3,
                               n_test_y=3, n_test_t=3, layers=(3, 6, 3))
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    gap = vpinn_gap_taylorgreen(prob, params, p=10, n_steps=60)
    assert gap["rel_l2_galerkin_vs_exact"] < 1e-4
    assert np.isfinite(gap["rel_l2_net_vs_galerkin"])


def test_element_mesh_sharding_matches_single_device():
    from hpvpinns_tpu.parallel.sharding import element_mesh, replicate, shard_problem

    mesh = element_mesh()
    cfg = hv.TaylorGreenConfig(
        dtype="float64", n_elements_x=3, n_elements_y=2, n_elements_t=1,
        n_quad=4, n_test_x=3, n_test_y=3, n_test_t=3, layers=(3, 6, 3),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(1))
    loss0, _ = prob.loss_fn(params, prob.data)
    data = shard_problem(prob.data, mesh)
    p = replicate(params, mesh)
    loss1, _ = jax.jit(prob.loss_fn)(p, data)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-10)


def test_cli_taylorgreen(capsys):
    import json

    from hpvpinns_tpu.cli import main

    rc = main(
        "run taylorgreen --dtype float64 --iterations 40 --lbfgs-iterations 0 "
        "--n-quad 5 --n-test-x 3 --n-test-y 3 --n-test-t 3 --inverse --quiet".split()
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["problem"] == "taylorgreen"
    assert {"rel_l2_u", "rel_l2_v", "rel_l2_p", "nu", "nu_true"} <= set(summary)
    assert abs(summary["nu_true"] - 0.1) < 1e-12


def test_adaptive_taylorgreen_three_axis():
    """The unsteady NS system rides the AdvDiff2D x/y/t tensor-mesh branch
    of adaptive._refined_config: per-axis Dörfler marking, grids strictly
    nest, and p-mode raises the marked axis orders."""
    from hpvpinns_tpu import adaptive

    cfg = hv.TaylorGreenConfig(
        dtype="float64", n_test_x=3, n_test_y=3, n_test_t=3, n_quad=5,
        layers=(3, 8, 3), n_bound=12,
        train=hv.TrainConfig(iterations=40, lbfgs_iterations=0, check_every=20),
    )
    out = adaptive.adaptive_solve(cfg, rounds=2, axes="xt", verbose=False)
    r0, r1 = out.rounds
    assert r1["n_elem"] > r0["n_elem"]
    for k in ("grid_x", "grid_y", "grid_t"):
        assert set(np.round(r0[k], 12)).issubset(set(np.round(r1[k], 12)))
    # p-mode: marked axis test orders rise, element count is unchanged
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    eta = adaptive.element_indicator(prob, params, enrich=2)
    cfg2 = adaptive._refined_config(cfg, prob, eta, theta=0.5, mode="p",
                                    p_step=2, axes="xt")
    for name, base in (("n_test_x_per_elem", 3), ("n_test_y_per_elem", 3),
                       ("n_test_t_per_elem", 3)):
        per = getattr(cfg2, name)
        assert per is not None and max(per) == base + 2 and min(per) >= base


def test_adaptive_taylorgreen_inverse_tracks_nu():
    from hpvpinns_tpu import adaptive

    cfg = hv.TaylorGreenConfig(
        dtype="float64", inverse=True, n_test_x=3, n_test_y=3, n_test_t=3,
        n_quad=5, layers=(3, 8, 3), n_bound=12, n_sensors=24,
        train=hv.TrainConfig(iterations=40, lbfgs_iterations=0, check_every=20),
    )
    out = adaptive.adaptive_solve(cfg, rounds=2, verbose=False)
    for r in out.rounds:
        assert np.isfinite(r["nu"])
        assert r["nu_true"] == pytest.approx(0.1)


def test_reduced_ns_unsteady_ci():
    """GN/CRLB interval through the BDF2 solver: finite positive std, the
    CRLB mode scales with the declared noise, and at truth with exact
    sensors the residual-based sigma prices the solver's own O(dt^2) bias
    (tiny but nonzero)."""
    from hpvpinns_tpu.uncertainty import reduced_ns_unsteady_ci

    cfg = hv.TaylorGreenConfig(dtype="float64", inverse=True, n_sensors=32)
    prob = hv.build(cfg)
    nu_t = prob.extras["nu_true"]
    ci = reduced_ns_unsteady_ci(prob, nu_t, p=6, n_steps=10)
    assert ci["params"] == ["nu"] and not ci["crlb"]
    assert 0.0 < ci["std"][0] < 0.1 * nu_t
    assert ci["ci95"][0][0] <= nu_t <= ci["ci95"][0][1]
    ci2 = reduced_ns_unsteady_ci(prob, nu_t, p=6, n_steps=10, noise_std=1e-3)
    assert ci2["crlb"] and ci2["sigma"] == pytest.approx(1e-3)
    ci3 = reduced_ns_unsteady_ci(prob, nu_t, p=6, n_steps=10, noise_std=2e-3)
    assert ci3["std"][0] == pytest.approx(2 * ci2["std"][0], rel=1e-9)


def test_reduced_ci_richardson_debias():
    """The Richardson debias removes the O(dt^2) identification bias: at a
    coarse TIME discretization (p=8, 10 steps) the raw Brent estimate
    carries a 1.7e-4-class solver-bias error; the GN-mapped Richardson
    correction must cut it >=10x and the recentered interval must cover
    truth.  (Measured sweep: 25x here, 1.3e4x at p=8/20 steps; at p=6 the
    gain saturates at ~4x because the SPATIAL bias floor ~6e-5 is not a
    time-discretization error and survives — by design.)"""
    from hpvpinns_tpu.inverse import reduced_identify_taylorgreen
    from hpvpinns_tpu.uncertainty import reduced_ns_unsteady_ci

    cfg = hv.TaylorGreenConfig(dtype="float64", inverse=True, n_sensors=32)
    prob = hv.build(cfg)
    nu_t = prob.extras["nu_true"]
    nu_hat, _ = reduced_identify_taylorgreen(prob, p=8, n_steps=10)
    raw_err = abs(nu_hat - nu_t)
    assert raw_err > 1e-5  # the coarse solver leaves a real bias to remove
    ci = reduced_ns_unsteady_ci(prob, nu_hat, p=8, n_steps=10)
    nu_db = ci["debiased"][0]
    assert abs(nu_db - nu_t) < raw_err / 10
    assert ci["ci95"][0][0] <= nu_t <= ci["ci95"][0][1]


def test_hard_bc_exact_on_data_faces():
    """The space-time lifted ansatz matches the exact velocity on the four
    side walls (at arbitrary t) and on the whole t=0 face for ANY network
    parameters; the interior at t>0 keeps a live network contribution."""
    cfg = hv.TaylorGreenConfig(dtype="float64", hard_bc=True, layers=(3, 8, 3),
                               n_quad=4, n_test_x=3, n_test_y=3, n_test_t=3)
    prob = taylorgreen.build(cfg)
    params = prob.init_params(jax.random.key(7))
    w_fn = lambda X: prob.apply_override(params, X)  # noqa: E731
    (xl, xr), (yl, yr), T = cfg.domain_x, cfg.domain_y, cfg.t_final
    rng = np.random.default_rng(3)
    n = 40
    ys, ts = rng.uniform(yl, yr, n), rng.uniform(0, T, n)
    xs = rng.uniform(xl, xr, n)
    faces = [
        np.stack([np.full(n, xl), ys, ts], axis=-1),
        np.stack([np.full(n, xr), ys, ts], axis=-1),
        np.stack([xs, np.full(n, yl), ts], axis=-1),
        np.stack([xs, np.full(n, yr), ts], axis=-1),
        np.stack([xs, ys, np.zeros(n)], axis=-1),  # the t=0 face
    ]
    for X in faces:
        got = np.asarray(w_fn(jnp.asarray(X)))[:, :2]
        want = taylorgreen.exact_stacked(X[:, 0], X[:, 1], X[:, 2], cfg.re)[:, :2]
        np.testing.assert_allclose(got, want, atol=1e-12)
    # interior, t > 0: the enveloped network must actually contribute
    Xi = np.stack([xs, ys, np.maximum(ts, 0.1)], axis=-1)
    got = np.asarray(w_fn(jnp.asarray(Xi)))[:, :2]
    want = taylorgreen.exact_stacked(Xi[:, 0], Xi[:, 1], Xi[:, 2], cfg.re)[:, :2]
    assert np.abs(got - want).max() > 1e-8


def test_zero_mean_gauge_penalty_identity_and_exactness():
    """p_zero_mean_weight: the per-time-slice zero-mean gauge penalty must
    (a) keep the GN residual identity sum(r^2) == loss exact, and (b) vanish
    on the exact solution (the exact p's quadrature slice means ARE the
    pinned targets)."""
    from hpvpinns_tpu.problems.taylorgreen import exact_stacked
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    cfg = hv.TaylorGreenConfig(
        dtype="float64", layers=(3, 8, 3), n_quad=4,
        n_elements_x=1, n_elements_y=1, n_elements_t=1,
        n_test_x=3, n_test_y=3, n_test_t=3,
        p_zero_mean_weight=5.0, n_zero_mean_t=4)
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    r = make_residual_vector(prob)(params, prob.data)
    loss = float(prob.loss_fn(params, prob.data)[0])
    np.testing.assert_allclose(float(np.sum(np.asarray(r) ** 2)), loss,
                               rtol=1e-10)
    # exact p on the zero-mean grid reproduces the pinned means exactly
    X = np.asarray(prob.data["x_zeromean"])
    p_ex = exact_stacked(X[:, 0], X[:, 1], X[:, 2], cfg.re)[:, 2]
    w = np.asarray(prob.data["w_zeromean"])
    means = p_ex.reshape(cfg.n_zero_mean_t, -1) @ w
    np.testing.assert_allclose(means, np.asarray(prob.data["p_mean_exact"]),
                               atol=1e-12)
    # ... and those targets are the zero-mean gauge (standard [0, pi]^2 box)
    np.testing.assert_allclose(means, 0.0, atol=1e-12)


def test_p_test_enrich_masks_continuity_only():
    """p_test_enrich=2: momentum rows get the enriched tensor orders, the
    continuity row keeps the base block (enriched rows exactly zero), and
    the GN residual identity survives the equation-selective mask."""
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    cfg = hv.TaylorGreenConfig(
        dtype="float64", layers=(3, 8, 3), n_quad=6,
        n_elements_x=1, n_elements_y=1, n_elements_t=1,
        n_test_x=3, n_test_y=3, n_test_t=3, p_test_enrich=2)
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(1))
    res = np.asarray(prob.extras["residual_fn"](params, prob.data))
    assert res.shape == (1, 3, 5, 5, 5)
    cont = res[0, 2]
    assert np.abs(cont[3:]).max() == 0.0
    assert np.abs(cont[:, 3:]).max() == 0.0
    assert np.abs(cont[:, :, 3:]).max() == 0.0
    # momentum rows DO carry enriched content
    assert np.abs(res[0, :2, 3:]).max() > 0.0
    r = make_residual_vector(prob)(params, prob.data)
    loss = float(prob.loss_fn(params, prob.data)[0])
    np.testing.assert_allclose(float(np.sum(np.asarray(r) ** 2)), loss,
                               rtol=1e-10)
