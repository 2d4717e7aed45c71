"""Adaptive h-refinement: indicator, marking, bisection, end-to-end loop
(the closed-loop version of the reference's hand-edited hp grids)."""

import functools

import jax
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu import adaptive
from hpvpinns_tpu.problems import poisson1d


def test_dorfler_marking_bulk_property():
    eta = np.array([8.0, 1.0, 0.5, 0.25, 0.25])
    m = adaptive.dorfler_mark(eta, theta=0.5)
    # the single dominant element already carries >= 50% of the mass
    assert m.tolist() == [True, False, False, False, False]
    m2 = adaptive.dorfler_mark(eta, theta=0.95)
    assert m2.sum() >= 3 and m2[0]


def test_bisect_marked():
    grid = np.array([-1.0, 0.0, 1.0])
    out = adaptive.bisect_marked(grid, np.array([False, True]))
    assert out == (-1.0, 0.0, 0.5, 1.0)


def test_indicator_matches_lossv_decomposition():
    """sum_e eta_e == lossv for the same params."""
    import jax

    cfg = hv.Poisson1DConfig(dtype="float64", n_elements=3, n_test=6, n_quad=12, layers=(1, 8, 1))
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    eta = adaptive.element_indicator(prob, params, enrich=0)  # plain indicator
    _, aux = prob.loss_fn(params, prob.data)
    np.testing.assert_allclose(eta.sum(), float(aux["lossv"]), rtol=1e-12)


def _layer_build(cfg):
    """Manufactured u = tanh(40x): one interior layer the 6-mode training
    basis cannot resolve — the case hierarchical estimation exists for."""
    k = 40.0
    u = lambda x: np.tanh(k * x)
    f = lambda x: 2 * k * k * np.tanh(k * x) / np.cosh(k * x) ** 2
    return poisson1d.build(cfg, u_fn=u, f_fn=f)


@pytest.mark.slow
def test_adaptive_loop_targets_the_layer():
    """The enriched (hierarchical) indicator marks the under-resolved
    layer-containing middle element — the plain in-basis residual is blind
    to it (near-orthogonal to the trained test space) and mis-marks."""
    cfg = hv.Poisson1DConfig(
        dtype="float64", grid=(-1.0, -1.0 / 3, 1.0 / 3, 1.0), n_elements=3,
        n_test=6, n_quad=30, layers=(1, 12, 12, 1),
        train=hv.TrainConfig(iterations=800, lbfgs_iterations=400, check_every=200),
    )
    out = adaptive.adaptive_solve(
        cfg, rounds=3, theta=0.5, build_fn=_layer_build, verbose=False
    )
    assert [r["n_elem"] for r in out.rounds][0] == 3
    # round 0: the enriched indicator puts (nearly) all mass on the middle
    eta0 = np.asarray(out.rounds[0]["eta"])
    assert eta0[1] > 10 * max(eta0[0], eta0[2])
    # refinement is localized: every newly inserted boundary lies inside the
    # layer-containing middle third of the domain
    g0 = set(np.round(out.rounds[0]["grid"], 12))
    g_last = np.asarray(out.rounds[-1]["grid"])
    new_pts = [g for g in g_last if round(float(g), 12) not in g0]
    assert new_pts, "no refinement happened"
    assert all(abs(g) <= 1.0 / 3 + 1e-12 for g in new_pts), f"refined outside the layer: {new_pts}"
    # the trajectory does not blow up (convergence quality is budget-bound
    # here; the full-budget convergence demo lives in MEASUREMENTS.md)
    rels = out.rel_l2_trajectory
    assert min(rels[1:]) < rels[0] * 1.2


def test_adaptive_cli(capsys, tmp_path):
    from hpvpinns_tpu.cli import main

    rc = main(
        f"adapt poisson1d --rounds 2 --iterations 60 --lbfgs-iterations 0 "
        f"--n-quad 10 --n-elements 2 --dtype float64 --outdir {tmp_path}".split()
    )
    assert rc == 0
    import json

    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert len(summary["rel_l2_trajectory"]) == 2
    assert summary["n_elem_trajectory"][1] > 2 or summary["n_elem_trajectory"][1] >= 2
    assert (tmp_path / "adapt_rounds.json").exists()


def test_adaptive_p_mode_raises_marked_order():
    """mode='p': the marked (layer) element's test count rises; the mesh
    stays fixed."""
    cfg = hv.Poisson1DConfig(
        dtype="float64", grid=(-1.0, -1.0 / 3, 1.0 / 3, 1.0), n_elements=3,
        n_test=6, n_quad=30, layers=(1, 12, 12, 1),
        train=hv.TrainConfig(iterations=400, lbfgs_iterations=200, check_every=200),
    )
    out = adaptive.adaptive_solve(
        cfg, rounds=2, theta=0.5, mode="p", p_step=4, build_fn=_layer_build, verbose=False
    )
    assert out.rounds[1]["grid"] == out.rounds[0]["grid"]  # mesh unchanged
    nt0 = out.rounds[0]["n_test_per_elem"]
    nt1 = out.rounds[1]["n_test_per_elem"]
    assert nt0 == [6, 6, 6]
    assert nt1[1] == 10  # the layer element got the p bump
    assert sum(nt1) < 30  # and not everything did


def test_enriched_indicator_2d_localizes():
    """2D hierarchical indicator: for a solution with an x-front at x=0 the
    enriched-mode residual mass concentrates in the front-containing element
    column."""
    from hpvpinns_tpu.problems import poisson2d

    k = 20.0
    u = lambda x, y: np.tanh(k * x) * np.sin(np.pi * y)
    # f = Delta u for u = tanh(kx) sin(pi y)
    f = lambda x, y: (
        -2 * k * k * np.tanh(k * x) / np.cosh(k * x) ** 2 - np.pi**2 * np.tanh(k * x)
    ) * np.sin(np.pi * y)
    cfg = hv.Poisson2DConfig(
        dtype="float64", n_elements_x=3, n_elements_y=2, n_quad=16,
        n_test_x=4, n_test_y=4, layers=(2, 10, 1),
        domain_x=(-1.0, 1.0), domain_y=(-1.0, 1.0),
    )
    prob2 = poisson2d.build(cfg, u_fn=u, f_fn=f)
    res = hv.train(prob2, hv.TrainConfig(iterations=300, check_every=100), verbose=False)
    eta = adaptive.element_indicator(prob2, res.eval_params, enrich=3)
    Ex, Ey = prob2.extras["mesh"].shape
    col = eta.reshape(Ex, Ey).sum(axis=1)  # per x-column mass
    assert col[1] > col[0] and col[1] > col[2], f"front column not dominant: {col}"


def test_adaptive_2d_tensor_refinement():
    """2D: axis intervals bisect while the tensor structure is preserved."""
    cfg = hv.Poisson2DConfig(
        dtype="float64", n_elements_x=2, n_elements_y=2, n_quad=6,
        n_test_x=4, n_test_y=4, layers=(2, 10, 1),
        train=hv.TrainConfig(iterations=150, check_every=50),
    )
    out = adaptive.adaptive_solve(cfg, rounds=2, theta=0.6, verbose=False)
    r1 = out.rounds[1]
    Ex = len(r1["grid_x"]) - 1
    Ey = len(r1["grid_y"]) - 1
    assert r1["n_elem"] == Ex * Ey
    assert Ex > 2 or Ey > 2  # something was refined


def test_budget_growth_scales_per_round_budgets():
    """budget_growth multiplies BOTH optimization budgets each round (the
    fixed-budget regression on refined meshes is measured in MEASUREMENTS.md;
    growth is the lever)."""
    cfg = hv.Poisson1DConfig(
        dtype="float64", n_elements=2, n_test=5, n_quad=10, layers=(1, 8, 1),
        train=hv.TrainConfig(iterations=40, lbfgs_iterations=20, check_every=20),
    )
    out = adaptive.adaptive_solve(cfg, rounds=3, budget_growth=2.0, verbose=False)
    assert [r["iterations"] for r in out.rounds] == [40, 80, 160]
    assert [r["lbfgs_iterations"] for r in out.rounds] == [20, 40, 80]


def test_adaptive_burgers_refines_space_axis():
    """The nonlinear space-time family refines the SPACE axis only (the
    front is spatial); time grid untouched, tensor structure intact."""
    cfg = hv.BurgersConfig(
        dtype="float64", n_elements_x=2, n_elements_t=1, n_test_x=6, n_test_t=6,
        n_quad=10, layers=(2, 10, 10, 1),
        train=hv.TrainConfig(iterations=120, lbfgs_iterations=0, check_every=40),
    )
    out = adaptive.adaptive_solve(cfg, rounds=2, verbose=False)
    assert out.rounds[0]["n_elem"] == 2
    assert out.rounds[1]["n_elem"] > 2
    # time axis untouched: one time element in every round
    assert out.rounds[1]["grid_y"] == [0.0, cfg.t_final]
    # space grid is a strict refinement of the starting grid
    g0, g1 = out.rounds[0]["grid_x"], out.rounds[1]["grid_x"]
    assert set(np.round(g0, 12)).issubset(set(np.round(g1, 12)))
    # p-adaptivity for this family no longer raises (round-3 lift); its
    # behavior is covered by test_spacetime_p_mode_raises_axis_orders.


def test_adaptive_cli_burgers_flags(capsys, tmp_path):
    """adapt burgers with --hard-bc / --n-test / space-axis --n-elements."""
    from hpvpinns_tpu.cli import main

    rc = main(
        f"adapt burgers --rounds 2 --iterations 40 --lbfgs-iterations 0 "
        f"--n-quad 8 --n-test 4 --hard-bc --n-elements 2 --dtype float64 "
        f"--outdir {tmp_path}".split()
    )
    assert rc == 0
    import json

    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_elem_trajectory"][0] == 4  # 2 space x 2 time
    assert summary["n_elem_trajectory"][1] > 4


def test_adaptive_burgers_time_axis_marking():
    """axes='xt' bisects marked TIME intervals too (moving fronts)."""
    cfg = hv.BurgersConfig(
        dtype="float64", n_elements_x=2, n_elements_t=2, n_test_x=5, n_test_t=5,
        n_quad=8, layers=(2, 10, 1),
        train=hv.TrainConfig(iterations=80, lbfgs_iterations=0, check_every=40),
    )
    out = adaptive.adaptive_solve(cfg, rounds=2, axes="xt", verbose=False)
    g0t, g1t = out.rounds[0]["grid_y"], out.rounds[1]["grid_y"]
    assert len(g1t) > len(g0t)  # time axis refined
    assert set(np.round(g0t, 12)).issubset(set(np.round(g1t, 12)))


def test_adaptive_advdiff_space_time():
    """AdvDiff (linear space-time) supports the solve-mark-refine loop; the
    enriched indicator and per-axis marking run on its assembly."""
    from hpvpinns_tpu.problems import advdiff

    cfg = hv.AdvDiffConfig(
        dtype="float64", inverse=False, n_elements_x=2, n_elements_t=1,
        n_test_x=4, n_test_t=4, n_quad=8, layers=(2, 10, 1),
        train=hv.TrainConfig(iterations=80, lbfgs_iterations=0, check_every=40),
    )
    out = adaptive.adaptive_solve(cfg, rounds=2, axes="xt", verbose=False)
    assert out.rounds[1]["n_elem"] > out.rounds[0]["n_elem"]
    g0, g1 = out.rounds[0]["grid_x"], out.rounds[1]["grid_x"]
    assert set(np.round(g0, 12)).issubset(set(np.round(g1, 12)))
    assert "epsilon" not in out.rounds[0]  # forward run: nothing identified
    # indicator sources exist and are finite and element-shaped
    prob = out.best_problem
    eta = adaptive.element_indicator(prob, out.best_params)
    assert eta.shape == (out.rounds[out.best_round]["n_elem"],)
    assert np.all(np.isfinite(eta))


def test_advdiff_nonuniform_grids_build_and_train():
    """grid_x/grid_t build non-uniform space-time meshes whose weak residual
    vanishes at the exact manufactured solution (jacobians per element)."""
    import jax.numpy as jnp

    from hpvpinns_tpu.ops.assembly import advdiff_residual
    from hpvpinns_tpu.problems import advdiff

    V = lambda x: 1.0 + 0.0 * x  # noqa: E731
    cfg = hv.AdvDiffConfig(
        dtype="float64", inverse=False, n_quad=14, n_test_x=6, n_test_t=6,
        grid_x=(-1.0, -0.4, 0.1, 1.0), grid_t=(0.0, 0.35, 1.0),
    )
    u_fn, f_fn = advdiff.make_manufactured(cfg, V)
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=V)
    el = prob.data["elements"]
    assert el.x.shape[0] == 6  # 3 x-elements * 2 t-elements
    exact_u = lambda X: jnp.sin(jnp.pi * X[:, 0:1]) * jnp.exp(-X[:, 1:2])  # noqa: E731
    res = advdiff_residual(
        exact_u, el, prob.data["basis_x"], prob.data["basis_t"], 0,
        V(el.x), prob.extras["eps_true"],
    )
    assert float(jnp.abs(res).max()) < 1e-12


def test_adaptive_advdiff2d_three_axis():
    """advdiff2d (2D space + time tensor family): per-axis Dörfler marking
    on all three axes; grids strictly refine; enriched indicator runs."""
    cfg = hv.AdvDiff2DConfig(
        dtype="float64", inverse=False, n_test_x=4, n_test_y=4, n_test_t=4,
        n_quad=6, layers=(3, 8, 1),
        train=hv.TrainConfig(iterations=50, lbfgs_iterations=0, check_every=25),
    )
    out = adaptive.adaptive_solve(cfg, rounds=2, axes="xt", verbose=False)
    r0, r1 = out.rounds
    assert r1["n_elem"] > r0["n_elem"]
    for k in ("grid_x", "grid_y", "grid_t"):
        assert set(np.round(r0[k], 12)).issubset(set(np.round(r1[k], 12)))
    # axes="x" marks ONLY the space axes
    out2 = adaptive.adaptive_solve(cfg, rounds=2, axes="x", verbose=False)
    assert out2.rounds[1]["grid_t"] == out2.rounds[0]["grid_t"]
    assert len(out2.rounds[1]["grid_x"]) > len(out2.rounds[0]["grid_x"])


def test_adaptive_inverse_tracks_epsilon_per_round():
    """Inverse families record the identified coefficient per round."""
    cfg = hv.AdvDiffConfig(
        dtype="float64", n_test_x=4, n_test_t=4, n_quad=8, layers=(2, 8, 1),
        train=hv.TrainConfig(iterations=60, lbfgs_iterations=0, check_every=30),
    )
    out = adaptive.adaptive_solve(cfg, rounds=2, verbose=False)
    for r in out.rounds:
        assert np.isfinite(r["epsilon"])
        assert r["eps_true"] == pytest.approx(0.1 / np.pi)


def test_adaptive_galerkin_1d_monotone_on_steep_benchmark():
    """Classical adaptive spectral elements (direct solver in the loop):
    monotone-by-construction refinement on the tanh(80x) benchmark — the
    regression-free answer to the warm-started VPINN loop's round>=1
    instability (linear problems only)."""
    recs = adaptive.adaptive_galerkin_1d(
        hv.Poisson1DConfig(dtype="float64", n_elements=2), rounds=5
    )
    rels = [r["rel_l2"] for r in recs]
    assert rels[0] > 1e-2
    assert rels[-1] < 1e-4  # 5.5e-2 -> ~3e-5 measured
    assert all(b <= a * 1.05 for a, b in zip(rels, rels[1:]))  # monotone
    # refinement localizes at the layer: every new boundary is near x = 0
    g0 = set(np.round(recs[0]["grid"], 12))
    new_pts = [g for g in recs[-1]["grid"] if round(float(g), 12) not in g0]
    assert new_pts and all(abs(g) <= 0.51 for g in new_pts)
    with pytest.raises(TypeError, match="Poisson1DConfig"):
        adaptive.adaptive_galerkin_1d(hv.BurgersConfig())


def test_adaptive_galerkin_2d_monotone_and_localized():
    """2D direct-solver adaptive loop (p-enrichment indicator): monotone on
    a manufactured x-front, with new x-boundaries bracketing the front."""
    import functools

    from hpvpinns_tpu.problems import poisson2d

    k = 20.0
    u = lambda x, y: np.tanh(k * x) * np.sin(np.pi * y)  # noqa: E731
    f = lambda x, y: (  # noqa: E731
        -2 * k * k * np.tanh(k * x) / np.cosh(k * x) ** 2
        - np.pi**2 * np.tanh(k * x)
    ) * np.sin(np.pi * y)
    cfg = hv.Poisson2DConfig(dtype="float64", n_elements_x=2, n_elements_y=2)
    recs = adaptive.adaptive_galerkin_2d(
        cfg, rounds=3, p=8, build_fn=functools.partial(poisson2d.build, u_fn=u, f_fn=f)
    )
    rels = [r["rel_l2"] for r in recs]
    assert rels[-1] < 2e-4 and all(b <= a * 1.05 for a, b in zip(rels, rels[1:]))
    g0 = set(np.round(recs[0]["grid_x"], 12))
    new_x = [g for g in recs[-1]["grid_x"] if round(float(g), 12) not in g0]
    assert new_x and all(abs(g) <= 0.51 for g in new_x)  # front-localized
    with pytest.raises(TypeError, match="Poisson2DConfig"):
        adaptive.adaptive_galerkin_2d(hv.Poisson1DConfig())


def test_adaptive_galerkin_advdiff_resolves_outflow_layer():
    """Space-time classical adaptive loop: monotone on the benchmark, new
    boundaries marching toward the x=1 outflow layer; the terminal rel-L2
    plateaus at ~1e-5 — the f64 Fourier-series oracle's OWN proven accuracy
    floor (test_galerkin.py::test_solver_beats_f64_series...)."""
    recs = adaptive.adaptive_galerkin_advdiff(
        hv.AdvDiffConfig(dtype="float64"), rounds=3, p=12
    )
    rels = [r["rel_l2"] for r in recs]
    assert rels[0] < 2e-3
    assert rels[-1] < 1e-4
    assert all(b <= a * 1.05 for a, b in zip(rels, rels[1:]))
    # refinement marches toward the outflow layer (right half)
    g0 = set(np.round(recs[0]["grid_x"], 12))
    new_x = [g for g in recs[-1]["grid_x"] if round(float(g), 12) not in g0]
    assert new_x and all(g >= -0.51 for g in new_x)
    with pytest.raises(TypeError, match="AdvDiffConfig"):
        adaptive.adaptive_galerkin_advdiff(hv.Poisson1DConfig())


def test_adaptive_galerkin_burgers_discovers_front_grid():
    """Nonlinear classical loop: monotone on the Cole-Hopf benchmark, every
    inserted boundary zooming geometrically into the x=0 front (the
    automatic version of BURGERS_SOLVER_GRID)."""
    recs = adaptive.adaptive_galerkin_burgers(
        hv.BurgersConfig(dtype="float64"), rounds=3, p=10, n_steps=200
    )
    rels = [r["rel_l2"] for r in recs]
    assert rels[-1] < rels[0] / 5
    assert all(b <= a * 1.05 for a, b in zip(rels, rels[1:]))
    g0 = set(np.round(recs[0]["grid_x"], 12))
    new_x = [g for g in recs[-1]["grid_x"] if round(float(g), 12) not in g0]
    assert new_x and all(abs(g) <= 0.26 for g in new_x)  # front-bracketing
    with pytest.raises(TypeError, match="BurgersConfig"):
        adaptive.adaptive_galerkin_burgers(hv.Poisson1DConfig())


def test_adaptive_cli_galerkin_solver(capsys, tmp_path):
    from hpvpinns_tpu.cli import main

    rc = main(
        f"adapt poisson1d --solver galerkin --rounds 3 --outdir {tmp_path}".split()
    )
    assert rc == 0
    import json

    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["solver"] == "galerkin"
    rels = s["rel_l2_trajectory"]
    assert rels[-1] < rels[0]
    assert (tmp_path / "adapt_rounds.json").exists()


def test_adaptive_cli_galerkin_flags_note_and_p_passthrough(capsys, tmp_path):
    """Optimizer-only flags on --solver galerkin produce a stderr note (not
    silence); --n-test maps to the direct solver's polynomial order."""
    from hpvpinns_tpu.cli import main

    rc = main(
        f"adapt poisson1d --solver galerkin --rounds 2 --n-test 6 --mode p "
        f"--iterations 99 --outdir {tmp_path}".split()
    )
    assert rc == 0
    captured = capsys.readouterr()
    assert "ignores mode, iterations" in captured.err
    import json

    s = json.loads(captured.out.strip().splitlines()[-1])
    recs = json.load(open(tmp_path / "adapt_rounds.json"))
    assert s["solver"] == "galerkin" and recs[0]["p"] == 6


def test_spacetime_p_mode_raises_axis_orders():
    """p-adaptivity for the space-time families (the round-2 restriction
    lifted): marked x-axis intervals get +p_step test order, t likewise
    under axes='xt'; rebuilt problems stay consistent."""
    import dataclasses

    from hpvpinns_tpu.adaptive import _refined_config, element_indicator

    cfg = hv.BurgersConfig(
        dtype="float64", n_elements_x=3, n_elements_t=2, n_quad=10,
        n_test_x=4, n_test_t=4, layers=(2, 8, 8, 1),
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    eta = element_indicator(prob, params)
    cfg2 = _refined_config(cfg, prob, eta, theta=0.5, mode="p", p_step=3, axes="xt")
    ntx = np.asarray(cfg2.n_test_x_per_elem)
    ntt = np.asarray(cfg2.n_test_t_per_elem)
    assert ntx.shape == (3,) and ntt.shape == (2,)
    assert set(ntx) <= {4, 7} and 7 in ntx  # at least one marked
    assert set(ntt) <= {4, 7}
    prob2 = hv.build(cfg2)
    assert np.isfinite(float(prob2.loss_fn(params, prob2.data)[0]))
    # masks encode the ragged counts exactly
    el = prob2.data["elements"]
    expect = (ntx[:, None] * ntt[None, :]).reshape(-1).astype(float)
    np.testing.assert_allclose(np.asarray(el.n_test), expect)


def test_spacetime_h_after_p_splits_order_arrays():
    """h-bisection with ragged per-element orders present must split the
    order arrays alongside the grid (same length invariant)."""
    from hpvpinns_tpu.adaptive import _refined_config, element_indicator

    cfg = hv.AdvDiffConfig(
        dtype="float64", n_elements_x=3, n_elements_t=2, n_quad=8,
        n_test_x_per_elem=(3, 6, 3), n_test_t_per_elem=(4, 3),
        layers=(2, 8, 1), inverse=False,
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    eta = element_indicator(prob, params)
    cfg2 = _refined_config(cfg, prob, eta, theta=0.5, mode="h", axes="xt")
    assert len(cfg2.n_test_x_per_elem) == len(cfg2.grid_x) - 1
    assert len(cfg2.n_test_t_per_elem) == len(cfg2.grid_t) - 1
    prob2 = hv.build(cfg2)
    assert np.isfinite(float(prob2.loss_fn(params, prob2.data)[0]))


def test_adaptive_hp_alternation_runs():
    """mode='hp' alternates h and p rounds on a space-time family end to
    end (tiny budgets; structural check)."""
    from hpvpinns_tpu import adaptive

    cfg = hv.BurgersConfig(
        dtype="float64", n_elements_x=2, n_elements_t=1, n_quad=8,
        n_test_x=3, n_test_t=3, layers=(2, 8, 1),
        train=hv.TrainConfig(iterations=30, check_every=10),
    )
    out = adaptive.adaptive_solve(cfg, rounds=3, mode="hp", axes="x", verbose=False)
    assert len(out.rounds) == 3
    # round 0 -> h split (more elements), round 1 -> p enrich (orders up)
    assert out.rounds[1]["n_elem"] > out.rounds[0]["n_elem"]
    nt1 = np.asarray(out.rounds[1]["n_test_per_elem"])
    nt2 = np.asarray(out.rounds[2]["n_test_per_elem"])
    assert out.rounds[2]["n_elem"] == out.rounds[1]["n_elem"]
    assert nt2.sum() > nt1.sum()
