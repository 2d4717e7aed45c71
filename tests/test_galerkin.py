"""Spectral-element direct solver (galerkin.py): spectral convergence and the
VPINN-gap analysis."""

import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.galerkin import solve_poisson1d, vpinn_gap_1d
from hpvpinns_tpu.geometry.mesh import Interval1D, TensorMesh2D
from hpvpinns_tpu.problems import poisson1d


def _rel(u, v):
    return np.linalg.norm(u - v) / np.linalg.norm(v)


def test_spectral_convergence_smooth():
    """u = sin(pi x): error drops spectrally in p, to machine precision."""
    mesh = Interval1D.uniform(-1, 1, 3)
    f = lambda x: np.pi**2 * np.sin(np.pi * x)
    x = np.linspace(-1, 1, 801)
    errs = []
    for p in (4, 8, 16):
        u = solve_poisson1d(mesh, p, f, (np.sin(-np.pi), np.sin(np.pi)))
        errs.append(_rel(u(x), np.sin(np.pi * x)))
    assert errs[0] < 1e-3 and errs[1] < 1e-7 and errs[2] < 1e-12
    assert errs[0] > errs[1] > errs[2]


def test_steep_benchmark_direct_solve():
    """The reference's steep problem on its hp3 grid: p=60 reaches 1.3e-6."""
    mesh = Interval1D(grid=np.array([-1.0, -0.1, 0.1, 1.0]))
    u = solve_poisson1d(
        mesh, 60, poisson1d.f_rhs,
        (float(poisson1d.u_exact(-1.0)), float(poisson1d.u_exact(1.0))),
    )
    x = np.linspace(-1, 1, 1501)
    assert _rel(u(x), poisson1d.u_exact(x)) < 5e-6


def test_nonzero_dirichlet_and_hats_only():
    """p=1 (hats only) reduces to linear FEM; nonzero BC handled."""
    mesh = Interval1D.uniform(0, 1, 50)
    f = lambda x: np.zeros_like(x)  # -u''=0, u(0)=2, u(1)=5 -> u = 2+3x
    u = solve_poisson1d(mesh, 1, f, (2.0, 5.0))
    x = np.linspace(0, 1, 101)
    np.testing.assert_allclose(u(x), 2 + 3 * x, rtol=1e-12)


def test_invalid_degree_raises():
    with pytest.raises(ValueError, match="degree"):
        solve_poisson1d(Interval1D.uniform(0, 1, 2), 0, lambda x: x, (0, 0))


@pytest.mark.slow
def test_vpinn_gap_analysis():
    """The gap report separates discretization error (direct solve, ~1e-6)
    from the network's optimization/representation error (~1e-2)."""
    cfg = hv.Poisson1DConfig(
        dtype="float64", grid=(-1.0, -0.1, 0.1, 1.0), n_quad=60, n_test=40,
        train=hv.TrainConfig(iterations=1500, lbfgs_iterations=1000, check_every=200),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    gap = vpinn_gap_1d(prob, res.params, p=60)
    assert gap["rel_l2_galerkin_vs_exact"] < 1e-5
    assert gap["rel_l2_net_vs_exact"] < 0.05
    # the network's error dominates: net-vs-galerkin ~ net-vs-exact
    assert abs(gap["rel_l2_net_vs_galerkin"] - gap["rel_l2_net_vs_exact"]) < 0.3 * gap["rel_l2_net_vs_exact"]


def test_solve_poisson2d_homogeneous_spectral():
    """u = sin(pi x) sin(pi y): spectral accuracy on a 2x2 mesh at p=10."""
    from hpvpinns_tpu.galerkin import solve_poisson2d

    mesh = TensorMesh2D.uniform(-1, 1, 2, -1, 1, 2)
    f = lambda x, y: -2 * np.pi**2 * np.sin(np.pi * x) * np.sin(np.pi * y)
    sol = solve_poisson2d(mesh, p=10, f_fn=f)
    xs = np.linspace(-1, 1, 41)
    X, Y = np.meshgrid(xs, xs)
    err = np.abs(sol(X, Y) - np.sin(np.pi * X) * np.sin(np.pi * Y)).max()
    assert err < 1e-8


def test_solve_poisson2d_benchmark_with_coons_lift():
    """Non-homogeneous benchmark data through the boundary-only Coons lift."""
    from hpvpinns_tpu.galerkin import coons_lift, solve_poisson2d
    from hpvpinns_tpu.problems.poisson2d import f_rhs, u_exact

    mesh = TensorMesh2D.uniform(-1, 1, 4, -1, 1, 4)
    sol = solve_poisson2d(
        mesh, p=14, f_fn=f_rhs, lift_fn=coons_lift(u_exact, (-1, 1), (-1, 1))
    )
    xs = np.linspace(-1, 1, 41)
    X, Y = np.meshgrid(xs, xs)
    rel = np.linalg.norm(sol(X, Y) - u_exact(X, Y)) / np.linalg.norm(u_exact(X, Y))
    assert rel < 1e-4


def test_vpinn_gap_2d_report():
    import jax

    from hpvpinns_tpu.galerkin import vpinn_gap_2d

    cfg = hv.Poisson2DConfig(
        dtype="float64", n_elements_x=2, n_elements_y=2, n_quad=8,
        n_test_x=4, n_test_y=4, layers=(2, 12, 1),
        train=hv.TrainConfig(iterations=200, check_every=100),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    gap = vpinn_gap_2d(prob, res.params, p=10)
    # the direct solve is orders of magnitude closer to the truth than a
    # 200-iteration network, and the net-vs-galerkin distance ~ net-vs-exact
    assert gap["rel_l2_galerkin_vs_exact"] < 5e-3
    assert gap["rel_l2_galerkin_vs_exact"] < gap["rel_l2_net_vs_exact"]
    assert abs(gap["rel_l2_net_vs_galerkin"] - gap["rel_l2_net_vs_exact"]) < 0.05


def test_solve_advdiff_matches_fourier_benchmark():
    """Direct space-time solve vs the 800-term Fourier series
    (AdvDiff.py:416-445): agreement to the SERIES' own f64 accuracy (~1e-5;
    its exp(V/2D) prefactor costs ~11 digits of cancellation at the
    benchmark Peclet — the solver's self-convergence is ~1e-8)."""
    from hpvpinns_tpu.galerkin import solve_advdiff
    from hpvpinns_tpu.problems.advdiff import u_exact

    eps, V = 0.1 / np.pi, 1.0
    axis = Interval1D.uniform(-1.0, 1.0, 1)
    xs = np.linspace(-1, 1, 81)
    ts = np.linspace(0, 1, 11)
    X, T = np.meshgrid(xs, ts)
    u40 = solve_advdiff(axis, 40, lambda x: -np.sin(np.pi * x), eps, V)(X, T)
    ue = u_exact(X.reshape(-1, 1), T.reshape(-1, 1), eps, V, 800).reshape(X.shape)
    assert np.linalg.norm(u40 - ue) / np.linalg.norm(ue) < 5e-5
    # self-convergence well below the series' accuracy
    u52 = solve_advdiff(axis, 52, lambda x: -np.sin(np.pi * x), eps, V)(X, T)
    assert np.linalg.norm(u40 - u52) / np.linalg.norm(u52) < 1e-6
    # exact initial condition at t = 0 (L2 projection at p = 40)
    assert np.max(np.abs(u40[0] + np.sin(np.pi * xs))) < 1e-8


def test_solve_advdiff_forced_variable_coefficients():
    """Manufactured forced problem with VARIABLE eps(x) and V(x) — beyond
    the reference's closed form: spectral accuracy via the Duhamel path."""
    import jax.numpy as jnp

    from hpvpinns_tpu.galerkin import solve_advdiff

    eps_fn = lambda x: (0.1 / jnp.pi) * (1.0 + 0.5 * jnp.sin(jnp.pi * x))  # noqa: E731
    v_fn = lambda x: 1.0 + 0.3 * x  # noqa: E731
    h = np.pi / 2

    def f_fn(X, T):
        return np.exp(-T) * (
            -np.cos(h * X)
            - np.asarray(v_fn(X)) * h * np.sin(h * X)
            + np.asarray(eps_fn(X)) * h * h * np.cos(h * X)
        )

    axis = Interval1D.uniform(-1.0, 1.0, 1)
    sol = solve_advdiff(axis, 30, lambda x: np.cos(h * x), eps_fn, v_fn, f_fn=f_fn)
    xs = np.linspace(-1, 1, 81)
    ts = np.linspace(0, 1, 11)
    X, T = np.meshgrid(xs, ts)
    ug = sol(X, T)
    ut = np.cos(h * X) * np.exp(-T)
    assert np.linalg.norm(ug - ut) / np.linalg.norm(ut) < 1e-8


def test_vpinn_gap_advdiff_report():
    from hpvpinns_tpu.galerkin import vpinn_gap_advdiff

    cfg = hv.AdvDiffConfig(
        dtype="float64", inverse=False,
        train=hv.TrainConfig(iterations=400, lbfgs_iterations=200, check_every=200),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    gap = vpinn_gap_advdiff(prob, res.eval_params, p=36, n_points=61)
    assert gap["rel_l2_galerkin_vs_exact"] < 1e-4  # series-accuracy floor
    assert gap["rel_l2_net_vs_galerkin"] == pytest.approx(
        gap["rel_l2_net_vs_exact"], rel=0.05
    )
    p1 = hv.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="advdiff"):
        vpinn_gap_advdiff(p1, p1.init_params(__import__("jax").random.key(0)))


def test_solve_advdiff2d_spectral_and_gap():
    """2D space-time tensor solver: spectral in p against the manufactured
    exact; the separable-forcing closed-form Duhamel is exercised (the
    family's forcing is e^{-t} g)."""
    from hpvpinns_tpu.galerkin import solve_advdiff2d, vpinn_gap_advdiff2d
    from hpvpinns_tpu.problems import advdiff2d

    cfg = hv.AdvDiff2DConfig(dtype="float64")
    eps = cfg.gamma / np.pi
    vx, vy = cfg.velocity
    f_fn = advdiff2d.make_forcing(cfg)
    u0 = lambda X, Y: np.sin(np.pi * X) * np.sin(np.pi * Y)  # noqa: E731
    ax = Interval1D.uniform(-1.0, 1.0, 1)
    xs = np.linspace(-1, 1, 13)
    ts = np.linspace(0, 1, 4)
    X, Y, T = np.meshgrid(xs, xs, ts, indexing="ij")
    ue = advdiff2d.u_exact(X, Y, T)
    errs = {}
    for p in (8, 12):
        sol = solve_advdiff2d(ax, ax, p, u0, eps, vx, vy, f_fn=f_fn)
        ug = sol(X, Y, T)
        errs[p] = np.linalg.norm(ug - ue) / np.linalg.norm(ue)
    assert errs[12] < 1e-6
    assert errs[12] < errs[8] / 100  # spectral decay

    prob = hv.build(hv.AdvDiff2DConfig(
        dtype="float64", inverse=False,
        train=hv.TrainConfig(iterations=150, lbfgs_iterations=0, check_every=50),
    ))
    res = hv.train(prob, verbose=False)
    gap = vpinn_gap_advdiff2d(prob, res.eval_params, p=10, n_points=9)
    assert gap["rel_l2_galerkin_vs_exact"] < 1e-4
    assert np.isfinite(gap["rel_l2_net_vs_galerkin"])
    p1 = hv.build(hv.Poisson1DConfig(dtype="float64"))
    import jax as _jax
    with pytest.raises(ValueError, match="advdiff2d"):
        vpinn_gap_advdiff2d(p1, p1.init_params(_jax.random.key(0)))


def test_exp_decay_detection():
    from hpvpinns_tpu.galerkin import _detect_exp_decay

    xs = np.linspace(-1, 1, 33)[:, None]
    f_sep = lambda x, t: np.exp(-2.5 * t) * np.sin(np.pi * x)  # noqa: E731
    r = _detect_exp_decay(f_sep, (xs,))
    assert r == pytest.approx(2.5, rel=1e-9)
    f_non = lambda x, t: np.sin(np.pi * x) * np.exp(-t) + t * x  # noqa: E731
    assert _detect_exp_decay(f_non, (xs,)) is None


def test_solver_beats_f64_series_against_mpmath_truth():
    """50-digit oracle for the benchmark series: the direct solver matches
    the high-precision truth to ~1e-12-class at the point where the f64
    series loses ~6 digits to exp(V/2D) cancellation (the measured basis for
    'the solver is more accurate than the reference's own exact formula')."""
    from mpmath import cos as mcos
    from mpmath import cosh, exp, mp, mpf
    from mpmath import pi as mppi
    from mpmath import sin as msin
    from mpmath import sinh

    from hpvpinns_tpu.galerkin import solve_advdiff
    from hpvpinns_tpu.problems.advdiff import u_exact

    mp.dps = 50
    D, V = mpf("0.1") / mppi, mpf(1)

    def u_mp(x, t, trunc=800):
        x, t = mpf(x), mpf(t)
        c0 = 16 * mppi**2 * D**3 * V * exp(V / D / 2 * (x - V * t / 2))
        s1 = mpf(0)
        for p in range(trunc + 1):
            n = (-1) ** p * 2 * p * msin(p * mppi * x) * exp(-D * p**2 * mppi**2 * t)
            d = V**4 + 8 * (V * mppi * D) ** 2 * (p**2 + 1) + 16 * (mppi * D) ** 4 * (p**2 - 1) ** 2
            s1 += n / d
        s2 = mpf(0)
        for p in range(trunc + 1):
            n = (-1) ** p * (2 * p + 1) * mcos((p + mpf("0.5")) * mppi * x) * exp(
                -D * (2 * p + 1) ** 2 * mppi**2 * t / 4
            )
            d = V**4 + (V * mppi * D) ** 2 * (8 * p**2 + 8 * p + 10) + (mppi * D) ** 4 * (
                4 * p**2 + 4 * p - 3
            ) ** 2
            s2 += n / d
        return float(c0 * (sinh(V / D / 2) * s1 + cosh(V / D / 2) * s2))

    x0, t0 = 0.9, 0.25  # inside the outflow layer: worst series cancellation
    truth = u_mp(x0, t0)
    f64_series = float(u_exact(np.array([[x0]]), np.array([[t0]]), 0.1 / np.pi, 1.0, 800)[0, 0])
    axis = Interval1D.uniform(-1.0, 1.0, 1)
    sol = solve_advdiff(axis, 52, lambda x: -np.sin(np.pi * x), float(0.1 / np.pi), 1.0)
    u_solver = float(sol(np.array([x0]), np.array([t0]))[0])
    assert abs(f64_series - truth) > 1e-6  # the series HAS lost digits here
    assert abs(u_solver - truth) < 1e-9  # the solver has not
