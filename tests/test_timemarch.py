"""Slab-sequential time marching (training/timemarch.py): t_start/ic_fn
slab plumbing in the unsteady builders, the marching driver, and the CLI
`march` subcommand.  No reference analog — the reference trains single
space-time domains only (AdvDiff.py:35-53); marching composes the
framework's existing slab configs + IC handoff."""

import dataclasses
import json

import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.cli import main
from hpvpinns_tpu.problems import advdiff, burgers


def _tiny_burgers(**kw):
    base = dict(
        n_elements_x=3,
        n_elements_t=2,
        n_test_x=5,
        n_test_t=5,
        n_quad=10,
        n_bound=16,
        layers=(2, 10, 10, 1),
        dtype="float64",
        train=hv.TrainConfig(iterations=150, check_every=75, lbfgs_iterations=0),
    )
    base.update(kw)
    return hv.BurgersConfig(**base)


def _tiny_advdiff(**kw):
    base = dict(
        n_elements_x=2,
        n_elements_t=2,
        n_test_x=4,
        n_test_t=4,
        n_quad=10,
        n_bound=12,
        n_sensors_per_station=4,
        inverse=False,
        fourier_terms=200,
        layers=(2, 8, 8, 1),
        dtype="float64",
        train=hv.TrainConfig(iterations=100, check_every=50, lbfgs_iterations=0),
    )
    base.update(kw)
    return hv.AdvDiffConfig(**base)


# ---------------------------------------------------------------- builders


def test_burgers_tstart_shifts_training_data():
    """A t_start > 0 slab places the initial edge at t_start with exact
    Cole-Hopf values and samples the walls inside [t_start, t_final]."""
    cfg = _tiny_burgers(t_start=0.4, t_final=0.7)
    rng = np.random.default_rng(0)
    X, u = burgers.training_data(cfg, rng)
    n = cfg.n_bound
    walls = X[: 2 * n]
    assert walls[:, 1].min() >= 0.4 and walls[:, 1].max() <= 0.7
    ic = X[2 * n :]
    np.testing.assert_allclose(ic[:, 1], 0.4)
    np.testing.assert_allclose(
        u[2 * n :], burgers.u_exact(ic[:, 0:1], ic[:, 1:2], cfg.nu), atol=0
    )


def test_burgers_ic_fn_overrides_initial_edge():
    cfg = _tiny_burgers(t_start=0.5)
    rng = np.random.default_rng(1)
    X, u = burgers.training_data(cfg, rng, ic_fn=lambda x: 2.0 * x)
    n = cfg.n_bound
    np.testing.assert_allclose(u[2 * n :], 2.0 * X[2 * n :, 0:1], atol=0)


def test_advdiff_tstart_shifts_training_data():
    """AdvDiff slab: IC edge at t_start uses the exact 800-term series (not
    the -sin(pi x) t=0 initial profile); sensors sample slab times only."""
    cfg = _tiny_advdiff(t_start=0.3, t_final=0.8)
    rng = np.random.default_rng(2)
    X, u = advdiff.training_data(cfg, rng)
    n = cfg.n_bound
    ic = X[2 * n : 3 * n]
    np.testing.assert_allclose(ic[:, 1], 0.3)
    want = advdiff.u_exact(
        ic[:, 0:1], ic[:, 1:2], cfg.gamma / np.pi, cfg.velocity, cfg.fourier_terms
    )
    np.testing.assert_allclose(u[2 * n : 3 * n], want, atol=1e-12)
    sensors = X[3 * n :]
    assert sensors[:, 1].min() >= 0.3 and sensors[:, 1].max() <= 0.8


def test_advdiff_ic_fn_overrides_initial_edge():
    cfg = _tiny_advdiff(t_start=0.25)
    rng = np.random.default_rng(3)
    X, u = advdiff.training_data(cfg, rng, ic_fn=lambda x: np.cos(x))
    n = cfg.n_bound
    np.testing.assert_allclose(u[2 * n : 3 * n], np.cos(X[2 * n : 3 * n, 0:1]))


def test_slab_build_meshes_span_the_slab():
    """The slab problem's time elements and test grid span [t_start,
    t_final], not [0, t_final]."""
    prob = burgers.build(_tiny_burgers(t_start=0.5, t_final=1.0))
    ts = prob.test_points[:, 1]
    assert ts.min() >= 0.5 - 1e-12 and ts.max() <= 1.0 + 1e-9
    prob2 = advdiff.build(_tiny_advdiff(t_start=0.5, t_final=1.0))
    ts2 = prob2.test_points[:, 1]
    assert ts2.min() >= 0.5 - 1e-12


def test_hard_bc_rejects_slab_configs():
    """The DEFAULT lift interpolates the analytic t=0 IC; slab runs
    (t_start > 0 / handed-off ic_fn) must fail loudly unless the caller
    supplies a slab-aware lift (make_interface_lift — what the marching
    driver constructs)."""
    with pytest.raises(ValueError, match="lift_fn"):
        burgers.build(_tiny_burgers(t_start=0.5, hard_bc=True))
    with pytest.raises(ValueError, match="soft BC"):
        advdiff.build(_tiny_advdiff(t_start=0.5, hard_bc=True))
    with pytest.raises(ValueError, match="lift_fn"):
        burgers.build(_tiny_burgers(hard_bc=True), ic_fn=lambda x: x)
    # advdiff has no slab-aware lift: the marching driver rejects upfront
    with pytest.raises(ValueError, match="burgers and"):
        hv.time_march(_tiny_advdiff(hard_bc=True), n_slabs=2, verbose=False)


def _tiny_tg(**kw):
    base = dict(
        n_elements_x=1,
        n_elements_y=1,
        n_elements_t=2,
        n_test_x=4,
        n_test_y=4,
        n_test_t=4,
        n_quad=6,
        n_bound=12,
        layers=(3, 10, 10, 3),
        dtype="float64",
        train=hv.TrainConfig(iterations=100, check_every=50, lbfgs_iterations=0),
    )
    base.update(kw)
    return hv.TaylorGreenConfig(**base)


def test_taylorgreen_tstart_and_ic_fn():
    """TG slab: walls/anchor span [t_start, t_final], the IC face sits at
    t_start with exact vortex values, and ic_fn hands off a full (u, v, p)
    state."""
    from hpvpinns_tpu.problems import taylorgreen

    cfg = _tiny_tg(t_start=0.4, t_final=0.9)
    rng = np.random.default_rng(4)
    Xb, wb = taylorgreen.training_data(cfg, rng)
    n = cfg.n_bound
    walls = Xb[: 4 * n]
    assert walls[:, 2].min() >= 0.4 and walls[:, 2].max() <= 0.9
    icf = Xb[4 * n :]
    np.testing.assert_allclose(icf[:, 2], 0.4)
    np.testing.assert_allclose(
        wb[4 * n :], taylorgreen.exact_stacked(icf[:, 0], icf[:, 1], icf[:, 2], cfg.re)
    )
    Xb2, wb2 = taylorgreen.training_data(
        cfg, np.random.default_rng(4),
        ic_fn=lambda xy: np.stack([xy[:, 0], xy[:, 1], 0 * xy[:, 0]], axis=-1),
    )
    np.testing.assert_allclose(wb2[4 * n :, 0], Xb2[4 * n :, 0])
    np.testing.assert_allclose(wb2[4 * n :, 2], 0.0)
    # a handed-off ic_fn without the matching traceable lift pair must
    # reject (the lift would interpolate the WRONG initial face); the
    # analytic t_start > 0 slab builds fine (generalized Coons lift)
    with pytest.raises(ValueError, match="ic_lift_fns"):
        taylorgreen.build(
            _tiny_tg(t_start=0.4, hard_bc=True, bc_pressure=True),
            ic_fn=lambda xy: np.zeros((len(xy), 3)),
        )
    prob_hb = taylorgreen.build(_tiny_tg(t_start=0.4, hard_bc=True,
                                         bc_pressure=True))
    # the slab lift is exact on the slab's OWN initial face and walls
    params = prob_hb.init_params(__import__("jax").random.key(0))
    xe = np.linspace(0.0, np.pi, 9)
    X0 = np.stack([xe, np.full(9, 0.3), np.full(9, 0.4)], -1)
    pred = np.asarray(prob_hb.apply(params, X0))
    ue, ve, _ = taylorgreen.exact_fields(X0[:, 0], X0[:, 1], X0[:, 2],
                                         prob_hb.config.re)
    np.testing.assert_allclose(pred[:, 0], ue, atol=1e-12)
    np.testing.assert_allclose(pred[:, 1], ve, atol=1e-12)


def test_taylorgreen_time_march_runs():
    """The unsteady NS SYSTEM marches: full (u, v, p) state handed across
    the interface, component-wise global metrics."""
    res = hv.time_march(_tiny_tg(), n_slabs=2, verbose=False)
    assert len(res.problems) == 2
    for key in ("rel_l2", "rel_l2_u", "rel_l2_v", "rel_l2_p"):
        assert np.isfinite(res.metrics[key])
    X = np.array([[1.0, 1.0, 0.2], [1.0, 1.0, 0.8]])
    assert res.predict(X).shape == (2, 3)
    with pytest.raises(ValueError, match="forward"):
        hv.time_march(_tiny_tg(inverse=True), n_slabs=2)


# ------------------------------------------------------------------ driver


def test_time_march_runs_and_stitches():
    cfg = _tiny_burgers()
    res = hv.time_march(cfg, n_slabs=2, verbose=False)
    np.testing.assert_allclose(res.edges, [0.0, 0.5, 1.0])
    assert len(res.problems) == len(res.params) == len(res.per_slab) == 2
    for k, m in enumerate(res.per_slab):
        assert m["slab"] == k
        assert np.isfinite(m["rel_l2"]) and np.isfinite(m["final_loss"])
    assert np.isfinite(res.metrics["rel_l2"])
    # slab ownership: interior times to their slab, the interface to the
    # EARLIER slab (whose network matched data there)
    np.testing.assert_array_equal(res.slab_of(np.array([0.1, 0.5, 0.9])), [0, 0, 1])
    # piecewise predict routes each point to its owner's network
    X = np.array([[0.3, 0.2], [0.3, 0.8]])
    from hpvpinns_tpu.evaluate import predict

    want0 = predict(res.problems[0], res.params[0], X[:1])
    want1 = predict(res.problems[1], res.params[1], X[1:])
    np.testing.assert_allclose(
        res.predict(X), np.vstack([want0, want1]).reshape(-1, 1), rtol=1e-12
    )


def test_time_march_exact_ic_fresh_start_and_edges():
    cfg = _tiny_advdiff()
    res = hv.time_march(
        cfg, n_slabs=2, ic="exact", warm_start=False,
        edges=[0.0, 0.3, 1.0], verbose=False,
    )
    np.testing.assert_allclose(res.edges, [0.0, 0.3, 1.0])
    assert res.per_slab[1]["t0"] == 0.3
    assert np.isfinite(res.metrics["rel_l2"])


def test_time_march_validation():
    cfg = _tiny_burgers()
    with pytest.raises(ValueError, match="n_slabs"):
        hv.time_march(cfg, n_slabs=0)
    with pytest.raises(ValueError, match="ascending"):
        hv.time_march(cfg, n_slabs=2, edges=[0.0, 0.7, 0.5])
    with pytest.raises(ValueError, match="ic must be"):
        hv.time_march(cfg, n_slabs=2, ic="both")
    with pytest.raises(ValueError, match="forward"):
        hv.time_march(_tiny_advdiff(inverse=True), n_slabs=2)
    with pytest.raises(TypeError, match="slab-capable"):
        hv.time_march(hv.Poisson2DConfig(), n_slabs=2)


def test_time_march_budget_weights():
    """Per-slab budget multipliers re-allocate iterations (mean-1
    normalized: the march's TOTAL budget is unchanged); bad weight vectors
    fail loudly.  Motivated by the equal-split study: the first slab owns
    the IC transient (benchmarks/timemarch_study.py)."""
    cfg = _tiny_burgers()
    res = hv.time_march(
        cfg, n_slabs=2, budget_weights=[3.0, 1.0], verbose=False
    )
    iters = [m["iterations"] for m in res.per_slab]
    assert iters[0] > iters[1]  # front-loaded
    # [3, 1] normalizes to [1.5, 0.5]: 225 + 75 == the uniform 150 + 150
    assert abs(sum(iters) - 2 * cfg.train.iterations) <= 4
    with pytest.raises(ValueError, match="budget_weights"):
        hv.time_march(cfg, n_slabs=2, budget_weights=[1.0])
    with pytest.raises(ValueError, match="budget_weights"):
        hv.time_march(cfg, n_slabs=2, budget_weights=[1.0, -1.0])


def test_time_march_hard_bc_burgers():
    """Hard-BC slab marching (burgers): every slab's ansatz is exactly
    zero on the walls, and the chained interface lift makes the handoff
    EXACT — slab k's ansatz at the interface time equals slab k-1's
    prediction to machine eps (make_interface_lift + the slab-anchored
    envelope; round-4 VERDICT ask #4)."""
    from hpvpinns_tpu.evaluate import predict

    cfg = _tiny_burgers(hard_bc=True)
    res = hv.time_march(cfg, n_slabs=2, verbose=False)
    # walls exact at times in BOTH slabs
    tw = np.linspace(0.0, 1.0, 7)
    for xw in (-1.0, 1.0):
        X = np.stack([np.full(7, xw), tw], -1)
        np.testing.assert_allclose(res.predict(X), 0.0, atol=1e-14)
    # exact handoff across the interface
    Xi = np.stack([np.linspace(-1, 1, 11), np.full(11, 0.5)], -1)
    u0 = np.asarray(predict(res.problems[0], res.params[0], Xi))
    u1 = np.asarray(predict(res.problems[1], res.params[1], Xi))
    np.testing.assert_allclose(u1, u0, atol=1e-13)
    assert np.isfinite(res.metrics["rel_l2"])
    # exact-restart control: slab 1's lift is the traceable Cole-Hopf
    # solution at the interface, so its start face matches u_exact
    res_e = hv.time_march(cfg, n_slabs=2, ic="exact", verbose=False)
    u1e = np.asarray(predict(res_e.problems[1], res_e.params[1], Xi))
    want = burgers.u_exact(Xi[:, 0:1], Xi[:, 1:2], cfg.nu)
    np.testing.assert_allclose(u1e, want, atol=1e-12)  # the n_hermite=96
    # twin matches the numpy 128-point reference to machine eps (both are
    # converged Gauss-Hermite evaluations of the same Cole-Hopf ratio)


def test_tg_predicted_face_lift_exactness():
    """Non-slow twin of test_time_march_hard_bc_taylorgreen: the SAME
    lift/handoff properties checked directly on built (untrained) slabs —
    the exactness is a property of the generalized Coons lift, not of the
    optimizer, so no training is needed to enforce it."""
    import jax
    import jax.numpy as jnp

    from hpvpinns_tpu.problems import taylorgreen
    from hpvpinns_tpu.training.timemarch import _hard_bc_slab_kwargs

    cfg = _tiny_tg(hard_bc=True)
    s0 = dataclasses.replace(cfg, t_start=0.0, t_final=0.5, n_elements_t=1)
    s1 = dataclasses.replace(cfg, t_start=0.5, t_final=1.0, n_elements_t=1)
    p0 = taylorgreen.build(s0)
    params0 = p0.init_params(jax.random.key(3))  # untrained: arbitrary net
    kw = _hard_bc_slab_kwargs(cfg, s1, 1, "net", p0, params0)
    assert set(kw) == {"ic_lift_fns"}
    p1 = taylorgreen.build(s1, **kw)
    params1 = p1.init_params(jax.random.key(9))  # different arbitrary net
    # (u, v) handoff exact at the interface for ANY slab-1 parameters
    rng = np.random.default_rng(7)
    Xi = np.stack([rng.uniform(0, np.pi, 13), rng.uniform(0, np.pi, 13),
                   np.full(13, 0.5)], -1)
    w0 = np.asarray(p0.apply(params0, jnp.asarray(Xi)))
    w1 = np.asarray(p1.apply(params1, jnp.asarray(Xi)))
    np.testing.assert_allclose(w1[:, :2], w0[:, :2], atol=1e-13)
    # side walls analytic-exact at a slab-1 time
    y = np.linspace(0.0, np.pi, 9)
    X = np.stack([np.zeros(9), y, np.full(9, 0.75)], -1)
    ue, ve, _ = taylorgreen.exact_fields(X[:, 0], X[:, 1], X[:, 2], cfg.re)
    w = np.asarray(p1.apply(params1, jnp.asarray(X)))
    np.testing.assert_allclose(w[:, 0], ue, atol=1e-12)
    np.testing.assert_allclose(w[:, 1], ve, atol=1e-12)


@pytest.mark.slow  # ~2 min: 2 trained slabs, slab 1's jit graph chains
# slab 0's full Coons ansatz; the non-slow lift/handoff coverage is
# test_tg_predicted_face_lift_exactness (no training, same properties)
def test_time_march_hard_bc_taylorgreen():
    """Hard-BC slab marching (NS system): side walls analytic-exact on
    every slab, predicted (u, v) initial face interpolated exactly by the
    generalized Coons lift (ic_lift_fns)."""
    from hpvpinns_tpu.evaluate import predict
    from hpvpinns_tpu.problems import taylorgreen

    cfg = _tiny_tg(hard_bc=True, bc_pressure=True)
    res = hv.time_march(cfg, n_slabs=2, verbose=False)
    # side walls exact at a slab-1 time
    y = np.linspace(0.0, np.pi, 9)
    X = np.stack([np.zeros(9), y, np.full(9, 0.75)], -1)
    pred = res.predict(X)
    ue, ve, _ = taylorgreen.exact_fields(X[:, 0], X[:, 1], X[:, 2], cfg.re)
    np.testing.assert_allclose(pred[:, 0], ue, atol=1e-12)
    np.testing.assert_allclose(pred[:, 1], ve, atol=1e-12)
    # exact velocity handoff at the interface
    rng = np.random.default_rng(7)
    Xi = np.stack([rng.uniform(0, np.pi, 13), rng.uniform(0, np.pi, 13),
                   np.full(13, 0.5)], -1)
    w0 = np.asarray(predict(res.problems[0], res.params[0], Xi))
    w1 = np.asarray(predict(res.problems[1], res.params[1], Xi))
    np.testing.assert_allclose(w1[:, :2], w0[:, :2], atol=1e-13)
    for key in ("rel_l2", "rel_l2_u", "rel_l2_v", "rel_l2_p"):
        assert np.isfinite(res.metrics[key])


# --------------------------------------------------------------------- CLI


def test_cli_march_end_to_end(capsys, tmp_path):
    rc = main(
        (
            "march burgers --slabs 2 --n-elements-x 3 --n-elements-t 2 "
            "--n-test-x 5 --n-test-t 5 --layers 2,10,10,1 --iterations 150 "
            "--lbfgs-iterations 0 --dtype float64 --quiet --plots "
            f"--outdir {tmp_path}"
        ).split()
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    summary = lines[0]
    assert summary["command"] == "march"
    assert summary["slabs"] == 2 and len(summary["per_slab"]) == 2
    assert summary["edges"] == [0.0, 0.5, 1.0]
    assert np.isfinite(summary["rel_l2"])
    assert any("plots" in l for l in lines)
