"""h/p sweeps (sweep.py) and strong-residual evaluation (evaluate.py)."""

import json

import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu import sweep
from hpvpinns_tpu.evaluate import strong_residual


@pytest.mark.slow
def test_strong_residual_small_for_good_1d_fit():
    """A well-trained hp network's strong residual drops far below the
    untrained one (full config + L-BFGS phase; weak-form training drives the
    pointwise residual down only once u_xx itself converges)."""
    cfg = hv.Poisson1DConfig(
        dtype="float64", grid=(-1.0, -0.1, 0.1, 1.0), n_quad=60, n_test=40,
        train=hv.TrainConfig(iterations=2000, lbfgs_iterations=1500, check_every=200),
    )
    prob = hv.build(cfg)
    import jax

    params0 = prob.init_params(jax.random.key(0))
    res = hv.train(prob, verbose=False)
    X = np.linspace(-0.95, 0.95, 101)[:, None]
    r_trained = np.abs(strong_residual(prob, res.params, X)).mean()
    r_init = np.abs(strong_residual(prob, params0, X)).mean()
    assert r_trained < 0.1 * r_init


def test_strong_residual_all_problems_shapes():
    import jax

    for cfg in (
        hv.Poisson1DConfig(dtype="float64", n_quad=8, n_test=4, layers=(1, 6, 1)),
        hv.Poisson2DConfig(dtype="float64", n_quad=4, layers=(2, 6, 1)),
        hv.AdvDiffConfig(dtype="float64", layers=(2, 6, 1)),
    ):
        prob = hv.build(cfg)
        params = prob.init_params(jax.random.key(0))
        X = prob.test_points[:50]
        r = strong_residual(prob, params, X)
        assert r.shape[0] == 50 and np.all(np.isfinite(r))


@pytest.mark.slow
def test_h_sweep_converges_1d():
    """More elements -> lower error on the steep problem (h-refinement)."""
    base = hv.Poisson1DConfig(
        dtype="float64", n_quad=30, n_test=15, layers=(1, 16, 16, 1)
    )
    tc = hv.TrainConfig(iterations=1200, check_every=200)
    recs = sweep.h_sweep(base, [1, 4], tc)
    assert [r["n_elements"] for r in recs] == [1, 4]
    assert recs[1]["rel_l2"] < recs[0]["rel_l2"]


def test_p_sweep_records_and_plot(tmp_path):
    base = hv.Poisson1DConfig(dtype="float64", n_quad=12, layers=(1, 6, 1))
    tc = hv.TrainConfig(iterations=40, check_every=20)
    recs = sweep.p_sweep(base, [2, 4], tc)
    assert [r["n_test"] for r in recs] == [2, 4]
    path = sweep.save_sweep(recs, str(tmp_path / "sweep.json"))
    assert json.load(open(path))[0]["axis"] == "p"
    plot = sweep.plot_sweep(recs, str(tmp_path))
    import os

    assert os.path.getsize(plot) > 0


def test_sweep_cli(capsys, tmp_path):
    from hpvpinns_tpu.cli import main

    rc = main(
        f"sweep poisson1d --axis p --values 2,3 --iterations 30 --n-quad 8 "
        f"--dtype float64 --outdir {tmp_path}".split()
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines[0]["sweep"]) == 2
    assert (tmp_path / "p_sweep.json").exists()
