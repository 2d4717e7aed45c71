"""Kovasznay flow — steady incompressible Navier-Stokes, the framework's
first SYSTEM of coupled PDEs (no reference analog: every family in
ehsankharazmi/hp-VPINNs is a scalar PDE).  The exact laminar-wake solution
makes every layer exactly verifiable: the analytic solution satisfies both
weak forms to quadrature precision, the Gauss-Newton residual-vector
identity holds in every configuration, and the trainable-viscosity inverse
problem moves toward truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.ops.assembly import ns_residual
from hpvpinns_tpu.ops.fields import vector_fields_2d
from hpvpinns_tpu.problems import kovasznay


def _exact_w_fn(re: float):
    """The exact (u, v, p) triple as a jnp map [P, 2] -> [P, 3]."""
    lam = kovasznay.lam_of(re)

    def w_fn(X):
        x, y = X[:, 0:1], X[:, 1:2]
        ex = jnp.exp(lam * x)
        u = 1.0 - ex * jnp.cos(2.0 * jnp.pi * y)
        v = (lam / (2.0 * jnp.pi)) * ex * jnp.sin(2.0 * jnp.pi * y)
        p = 0.5 * (1.0 - jnp.exp(2.0 * lam * x))
        return jnp.concatenate([u, v, p], axis=-1)

    return w_fn


def test_exact_solution_satisfies_strong_system():
    """Momentum + continuity vanish pointwise at the analytic solution
    (the Kovasznay quadratic identity nu lam^2 - lam - 4 pi^2 nu = 0)."""
    re = 40.0
    nu, lam = 1.0 / re, kovasznay.lam_of(re)
    assert abs(nu * lam**2 - lam - 4.0 * np.pi**2 * nu) < 1e-10
    w_fn = _exact_w_fn(re)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-0.5, 1.0, (1, 40)))
    y = jnp.asarray(rng.uniform(-0.5, 1.5, (1, 40)))
    f = vector_fields_2d(w_fn, x, y)
    w, wx, wy, wxx, wyy = f["w"], f["wx"], f["wy"], f["wxx"], f["wyy"]
    u, v = w[..., 0], w[..., 1]
    mom_x = u * wx[..., 0] + v * wy[..., 0] + wx[..., 2] - nu * (wxx[..., 0] + wyy[..., 0])
    mom_y = u * wx[..., 1] + v * wy[..., 1] + wy[..., 2] - nu * (wxx[..., 1] + wyy[..., 1])
    div = wx[..., 0] + wy[..., 1]
    for r in (mom_x, mom_y, div):
        assert float(jnp.abs(r).max()) < 1e-10


def test_exact_solution_zero_weak_residual_both_forms():
    """Both weak forms vanish at the exact solution on a multi-element mesh
    (form 0 pointwise from the strong identity; form 1 to quadrature
    accuracy — the integrands are entire, so GLJ converges spectrally)."""
    cfg = hv.KovasznayConfig(dtype="float64", n_quad=20, n_test_x=6, n_test_y=6)
    w_fn = _exact_w_fn(cfg.re)
    for vf, tol in ((0, 1e-10), (1, 1e-9)):
        prob = kovasznay.build(hv.KovasznayConfig(
            dtype="float64", n_quad=20, n_test_x=6, n_test_y=6, var_form=vf))
        el = prob.data["elements"]
        res = ns_residual(
            w_fn, el, prob.data["basis_x"], prob.data["basis_y"], vf, 1.0 / cfg.re
        )
        assert float(jnp.abs(res).max()) < tol, f"form {vf}"


def test_var_forms_agree_at_random_net():
    """Integration by parts is an identity: form 0 == form 1 at an arbitrary
    (non-solution) network, up to quadrature error on the smooth integrand."""
    probs = [
        kovasznay.build(hv.KovasznayConfig(
            dtype="float64", n_quad=30, n_test_x=4, n_test_y=4,
            layers=(2, 8, 3), var_form=vf))
        for vf in (0, 1)
    ]
    params = probs[0].init_params(jax.random.key(7))
    res = [
        np.asarray(p.extras["residual_fn"](params, p.data)) for p in probs
    ]
    np.testing.assert_allclose(res[0], res[1], rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"bc_pressure": False},
        {"inverse": True},
        {"bc_pressure": False, "inverse": True},
    ],
    ids=["bc_p", "gauge_anchor", "inverse", "gauge_inverse"],
)
def test_gauss_newton_resvec_identity(kw):
    """sum(r^2) == loss in every configuration — pressure-BC, velocity-only
    BC + anchor (reg_resvec_fn), and the trainable-viscosity inverse."""
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    cfg = hv.KovasznayConfig(
        dtype="float64", n_quad=8, n_test_x=4, n_test_y=4, layers=(2, 6, 3), **kw
    )
    prob = kovasznay.build(cfg)
    params = prob.init_params(jax.random.key(2))
    loss, _ = prob.loss_fn(params, prob.data)
    r = make_residual_vector(prob)(params, prob.data)
    np.testing.assert_allclose(float(jnp.sum(r**2)), float(loss), rtol=1e-12)


def test_boundary_and_sensor_data_shapes():
    cfg = hv.KovasznayConfig(dtype="float64", n_bound=9, inverse=True, n_sensors=11)
    prob = kovasznay.build(cfg)
    assert prob.data["xb"].shape == (36, 2)
    assert prob.data["ub"].shape == (36, 3)  # bc_pressure default True
    assert prob.data["xs"].shape == (11, 2)
    assert prob.data["us"].shape == (11, 2)  # velocity-only sensors
    # boundary data is the exact solution on the walls
    Xb = np.asarray(prob.data["xb"], dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(prob.data["ub"], dtype=np.float64),
        kovasznay.exact_stacked(Xb[:, 0], Xb[:, 1], cfg.re), atol=1e-12,
    )
    gauge = kovasznay.build(hv.KovasznayConfig(dtype="float64", bc_pressure=False))
    assert gauge.data["ub"].shape[-1] == 2
    assert gauge.data["x_anchor"].shape == (1, 2)


def test_evaluate_reports_components():
    cfg = hv.KovasznayConfig(dtype="float64", n_quad=6, n_test_x=3, n_test_y=3,
                             layers=(2, 6, 3))
    prob = kovasznay.build(cfg)
    params = prob.init_params(jax.random.key(0))
    rep = hv.evaluate_problem(prob, params)
    for k in ("rel_l2", "rel_l2_u", "rel_l2_v", "rel_l2_p"):
        assert np.isfinite(rep[k])
    from hpvpinns_tpu.evaluate import per_element_rel_l2, strong_residual

    errs = per_element_rel_l2(prob, params)
    assert errs.shape == (prob.extras["mesh"].n_elem,)
    assert np.all(np.isfinite(errs))
    r = strong_residual(prob, params, prob.test_points[::500])
    assert r.shape[-1] == 3 and np.all(np.isfinite(r))


def test_enriched_indicator_shape():
    from hpvpinns_tpu.adaptive import element_indicator

    cfg = hv.KovasznayConfig(dtype="float64", n_quad=8, n_test_x=4, n_test_y=4,
                             layers=(2, 6, 3))
    prob = kovasznay.build(cfg)
    params = prob.init_params(jax.random.key(1))
    eta = element_indicator(prob, params, enrich=2)
    assert eta.shape == (4,) and np.all(eta >= 0) and np.all(np.isfinite(eta))


def test_training_smoke_forward_and_gn():
    """Adam reduces the loss; a short GN polish runs on the system residual
    (the leading-component BC slice in make_residual_vector)."""
    cfg = hv.KovasznayConfig(
        dtype="float64", n_quad=8, n_test_x=4, n_test_y=4, layers=(2, 8, 3),
        bc_pressure=False,
        train=hv.TrainConfig(iterations=150, lbfgs_iterations=0,
                             gn_iterations=3, check_every=50),
    )
    prob = hv.build(cfg)
    params0 = prob.init_params(jax.random.key(cfg.train.seed))
    loss0, _ = prob.loss_fn(params0, prob.data)
    res = hv.train(prob, verbose=False)
    assert res.final_aux["loss"] < float(loss0)


@pytest.mark.slow
def test_inverse_nu_moves_toward_truth():
    """nu: 0.1 -> ~0.028 (truth 0.025) in 3000 Adam iterations — measured
    trajectory passes through an early ~0.21 transient before descending,
    so the budget must clear it."""
    cfg = hv.KovasznayConfig(
        dtype="float64", inverse=True, n_quad=10, n_test_x=5, n_test_y=5,
        train=hv.TrainConfig(iterations=3000, lbfgs_iterations=0, check_every=250),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    assert set(params["pde"]) == {"nu"}
    res = hv.train(prob, verbose=False)
    nu = float(np.asarray(res.eval_params["pde"]["nu"]))
    nu_true = prob.extras["nu_true"]
    assert abs(nu - nu_true) < 0.2 * abs(cfg.nu_init - nu_true)
    assert "nu" in res.history


def test_element_mesh_sharding_matches_single_device():
    """The NS system rides the standard element-axis sharding layout:
    identical loss and grads on the 8-device mesh."""
    from hpvpinns_tpu.parallel.sharding import element_mesh, replicate, shard_problem

    mesh = element_mesh()
    cfg = hv.KovasznayConfig(
        dtype="float64", n_elements_x=3, n_elements_y=2, n_quad=5,
        n_test_x=3, n_test_y=3, layers=(2, 6, 3),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(1))
    loss0, _ = prob.loss_fn(params, prob.data)
    data = shard_problem(prob.data, mesh)
    p = replicate(params, mesh)
    loss1, _ = jax.jit(prob.loss_fn)(p, data)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-10)
    g0 = jax.grad(lambda q: prob.loss_fn(q, prob.data)[0])(params)
    g1 = jax.jit(jax.grad(lambda q: prob.loss_fn(q, data)[0]))(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-12
        ),
        g0, g1,
    )


def test_cli_kovasznay(capsys):
    import json

    from hpvpinns_tpu.cli import main

    rc = main(
        "run kovasznay --dtype float64 --iterations 40 --lbfgs-iterations 0 "
        "--n-quad 6 --n-test-x 3 --n-test-y 3 --inverse --quiet".split()
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["problem"] == "kovasznay"
    assert {"rel_l2_u", "rel_l2_v", "rel_l2_p", "nu", "nu_true"} <= set(summary)
    assert abs(summary["nu_true"] - 0.025) < 1e-12


def test_solve_ns_steady_spectral_convergence():
    """The direct steady-NS solver converges spectrally to the exact
    Kovasznay solution (boundary traces only enter)."""
    from hpvpinns_tpu.galerkin import solve_ns_steady

    re = 40.0

    def g(x, y):
        u, v, _ = kovasznay.exact_fields(x, y, re)
        return u, v

    xs = np.linspace(-0.5, 1.0, 41)
    ys = np.linspace(-0.5, 1.5, 41)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    ut, vt, pt = kovasznay.exact_fields(X, Y, re)
    errs = []
    for p in (8, 16):
        sol = solve_ns_steady((-0.5, 1.0), (-0.5, 1.5), p, 1.0 / re, g)
        assert sol.residual_norm < 1e-11  # Newton converged
        u, v = sol.velocity(X, Y)
        ph = sol.pressure(X, Y)
        ph = ph + pt.mean() - ph.mean()  # zero-mean gauge -> exact's mean
        errs.append(np.linalg.norm(np.stack([u - ut, v - vt, ph - pt]))
                    / np.linalg.norm(np.stack([ut, vt, pt])))
    assert errs[1] < 1e-6  # p=16 measured 2e-7-class
    assert errs[1] < 1e-3 * errs[0]  # spectral decay


def test_reduced_identify_kovasznay():
    """Network-free viscosity identification: Brent over direct solves,
    nu to ~1e-7-class from the family's own 64 interior sensors."""
    from hpvpinns_tpu.inverse import reduced_identify_kovasznay

    cfg = hv.KovasznayConfig(dtype="float64", inverse=True)
    prob = hv.build(cfg)
    nu_hat, info = reduced_identify_kovasznay(prob)
    nu_true = prob.extras["nu_true"]
    assert abs(nu_hat - nu_true) / nu_true < 1e-6
    assert info["n_solves"] < 40


def test_vpinn_gap_kovasznay():
    from hpvpinns_tpu.galerkin import vpinn_gap_kovasznay

    cfg = hv.KovasznayConfig(dtype="float64", n_quad=6, n_test_x=3, n_test_y=3,
                             layers=(2, 6, 3))
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    gap = vpinn_gap_kovasznay(prob, params, p=16)
    assert gap["rel_l2_galerkin_vs_exact"] < 1e-6
    assert np.isfinite(gap["rel_l2_net_vs_galerkin"])


def test_cli_identify_kovasznay(capsys):
    import json

    from hpvpinns_tpu.cli import main

    rc = main("identify kovasznay".split())
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["nu_rel_err"] < 1e-6


@pytest.mark.slow
def test_adaptive_refinement_kovasznay():
    """The solve-estimate-mark-refine loop runs on the NS system: the h
    round grows the tensor mesh, the p round raises per-axis test orders
    (hp mode alternates them), and per-element orders split with bisected
    intervals."""
    from hpvpinns_tpu.adaptive import adaptive_solve

    cfg = hv.KovasznayConfig(
        dtype="float64", n_quad=6, n_test_x=3, n_test_y=3, layers=(2, 6, 3),
        train=hv.TrainConfig(iterations=60, lbfgs_iterations=0, check_every=30),
    )
    out = adaptive_solve(cfg, rounds=3, mode="hp", verbose=False)
    assert len(out.rounds) == 3
    assert out.rounds[1]["n_elem"] > out.rounds[0]["n_elem"]  # h round split
    # p round raised at least one marked axis order
    assert max(out.rounds[2]["n_test_per_elem"]) > max(out.rounds[1]["n_test_per_elem"])
    assert all(np.isfinite(r["rel_l2"]) for r in out.rounds)


def test_reduced_ns_ci_covers_truth():
    """GN/Fisher CI through the steady-NS solver: at declared noise the
    95% interval covers truth and sigma matches (measured 6/6 coverage,
    MEASUREMENTS.md)."""
    import dataclasses

    from hpvpinns_tpu.inverse import reduced_identify_kovasznay
    from hpvpinns_tpu.uncertainty import reduced_ns_ci

    noise = 1e-3
    cfg = hv.KovasznayConfig(
        dtype="float64", inverse=True, sensor_noise=noise,
        train=dataclasses.replace(hv.KovasznayConfig().train, seed=3),
    )
    prob = hv.build(cfg)
    nu_hat, _ = reduced_identify_kovasznay(prob)
    nu_true = prob.extras["nu_true"]
    ci = reduced_ns_ci(prob, nu_hat, noise_std=noise)
    assert ci["ci95"][0][0] <= nu_true <= ci["ci95"][0][1]
    ci_r = reduced_ns_ci(prob, nu_hat)
    assert 0.5 * noise < ci_r["sigma"] < 2.0 * noise  # sigma recovers noise


def test_eq_weights_scale_residual_and_keep_gn_identity():
    """eq_weights scales the equation rows consistently across loss and
    GN residual vector (the measured v-rebalancing knob)."""
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    base = hv.KovasznayConfig(dtype="float64", n_quad=6, n_test_x=3,
                              n_test_y=3, layers=(2, 6, 3))
    wcfg = hv.KovasznayConfig(dtype="float64", n_quad=6, n_test_x=3,
                              n_test_y=3, layers=(2, 6, 3),
                              eq_weights=(1.0, 6.0, 2.0))
    p0, pw = kovasznay.build(base), kovasznay.build(wcfg)
    params = p0.init_params(jax.random.key(4))
    r0 = np.asarray(p0.extras["residual_fn"](params, p0.data))
    rw = np.asarray(pw.extras["residual_fn"](params, pw.data))
    w = np.asarray([1.0, 6.0, 2.0])[None, :, None, None]
    np.testing.assert_allclose(rw, r0 * w, rtol=1e-12)
    loss, _ = pw.loss_fn(params, pw.data)
    r = make_residual_vector(pw)(params, pw.data)
    np.testing.assert_allclose(float(np.sum(np.asarray(r) ** 2)), float(loss), rtol=1e-12)


def test_hard_bc_velocity_exact_and_gn_identity():
    """Lifted ansatz: (u, v) match the exact boundary traces to machine
    precision for ARBITRARY parameters; the GN residual identity holds
    (p stays soft on the boundary = the gauge)."""
    from hpvpinns_tpu.training.gauss_newton import make_residual_vector

    cfg = hv.KovasznayConfig(dtype="float64", hard_bc=True, n_quad=6,
                             n_test_x=3, n_test_y=3, layers=(2, 6, 3))
    prob = kovasznay.build(cfg)
    params = prob.init_params(jax.random.key(9))
    Xb = np.asarray(prob.data["xb"], dtype=np.float64)
    w = np.asarray(prob.apply(params, jnp.asarray(Xb)))
    ex = kovasznay.exact_stacked(Xb[:, 0], Xb[:, 1], cfg.re)
    assert np.abs(w[:, :2] - ex[:, :2]).max() < 1e-13
    loss, _ = prob.loss_fn(params, prob.data)
    r = make_residual_vector(prob)(params, prob.data)
    np.testing.assert_allclose(float(np.sum(np.asarray(r) ** 2)), float(loss), rtol=1e-12)
    with pytest.raises(ValueError):
        kovasznay.build(hv.KovasznayConfig(hard_bc=True, bc_pressure=False))
