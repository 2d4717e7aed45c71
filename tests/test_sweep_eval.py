"""h/p sweeps (sweep.py) and strong-residual evaluation (evaluate.py)."""

import json

import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu import sweep
from hpvpinns_tpu.evaluate import strong_residual


@pytest.mark.slow
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


def test_strong_residual_2d_uses_problem_forcing():
    """Regression: the 2D strong residual must use the problem's OWN f_fn
    (build(f_fn=...)), not the module-level benchmark forcing — for the
    manufactured solution u = x^2 + y^2 (f = 4) an exact ansatz has zero
    residual only against its own forcing."""
    import jax

    from hpvpinns_tpu.problems import poisson2d

    cfg = hv.Poisson2DConfig(dtype="float64", n_quad=4, layers=(2, 6, 1))
    u_fn = lambda x, y: x**2 + y**2
    f_fn = lambda x, y: 4.0 + 0.0 * x * y
    prob = poisson2d.build(cfg, u_fn=u_fn, f_fn=f_fn)
    params = prob.init_params(jax.random.key(0))
    # override the ansatz with the exact solution: residual must be ~0
    prob.apply_override = lambda p, X: X[:, 0:1] ** 2 + X[:, 1:2] ** 2
    X = prob.test_points[:64]
    r = strong_residual(prob, params, X)
    np.testing.assert_allclose(r, 0.0, atol=1e-8)


def test_poisson2d_var_form_2_warns_on_multielement():
    import warnings

    from hpvpinns_tpu.problems import poisson2d

    cfg = hv.Poisson2DConfig(dtype="float64", var_form=2, n_quad=4, layers=(2, 6, 1))
    with pytest.warns(UserWarning, match="var_form=2"):
        poisson2d.build(cfg)
    # single unit element: no warning
    cfg1 = hv.Poisson2DConfig(
        dtype="float64", var_form=2, n_elements_x=1, n_elements_y=1, n_quad=4, layers=(2, 6, 1)
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        poisson2d.build(cfg1)


def test_per_element_rel_l2_2d_and_3d():
    """Per-element error maps on tensor-product meshes (the 2D/3D
    generalization of the reference's intended predict_subdomain)."""
    import jax

    from hpvpinns_tpu.evaluate import per_element_rel_l2

    cfg = hv.Poisson2DConfig(
        dtype="float64", n_elements_x=4, n_elements_y=3, n_quad=4, layers=(2, 6, 1)
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    # exact ansatz (jnp-traceable) -> per-element error ~ 0 everywhere
    import jax.numpy as jnp

    prob.apply_override = lambda p, X: (
        0.1 * jnp.sin(2 * jnp.pi * X[:, 0:1]) + jnp.tanh(10.0 * X[:, 0:1])
    ) * jnp.sin(2 * jnp.pi * X[:, 1:2])
    errs = per_element_rel_l2(prob, params)
    assert errs.shape == (12,)
    np.testing.assert_allclose(errs, 0.0, atol=1e-12)
    # zero ansatz -> rel error exactly 1 per element
    prob.extras.pop("_apply_jit", None)
    prob.apply_override = lambda p, X: 0.0 * X[:, 0:1]
    errs = per_element_rel_l2(prob, params)
    np.testing.assert_allclose(errs, 1.0, atol=1e-12)

    cfg3 = hv.Poisson3DConfig(
        dtype="float64", n_elements_x=2, n_elements_y=2, n_elements_z=2,
        n_quad=3, n_test_x=2, n_test_y=2, n_test_z=2, layers=(3, 6, 1),
    )
    prob3 = hv.build(cfg3)
    params3 = prob3.init_params(jax.random.key(0))
    errs3 = per_element_rel_l2(prob3, params3, n_points=6)
    assert errs3.shape == (8,) and np.all(np.isfinite(errs3))


def test_sweep_records_carry_per_element_errors():
    cfg = hv.Poisson1DConfig(
        dtype="float64", n_quad=8, n_test=4, layers=(1, 6, 1),
        train=hv.TrainConfig(iterations=20, check_every=10),
    )
    recs = sweep.h_sweep(cfg, [2, 3], cfg.train)
    assert len(recs[0]["per_element_rel_l2"]) == 2
    assert len(recs[1]["per_element_rel_l2"]) == 3


def test_per_element_error_plot(tmp_path):
    import jax

    from hpvpinns_tpu import viz

    cfg = hv.Poisson2DConfig(
        dtype="float64", n_elements_x=2, n_elements_y=2, n_quad=4, layers=(2, 6, 1)
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    path = viz.plot_per_element_error(prob, params, str(tmp_path))
    import os

    assert os.path.exists(path)


def test_poisson2d_var_form_2c_trains():
    """The corrected form is trainable end to end."""
    cfg = hv.Poisson2DConfig(
        dtype="float64", var_form="2c", n_elements_x=2, n_elements_y=2,
        n_quad=6, n_test_x=3, n_test_y=3, layers=(2, 8, 1),
        train=hv.TrainConfig(iterations=30, check_every=10),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    assert res.history["loss"][-1] < res.history["loss"][0]
    assert np.isfinite(res.history["loss"][-1])


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


def test_sweeps_are_family_generic(tmp_path):
    """h/p sweeps dispatch on the framework-wide field convention, so every
    problem family sweeps — including the space-time NS system (3 mesh axes,
    clears explicit grids and per-element test orders)."""
    base = hv.BurgersConfig(
        dtype="float64", grid_x=(-1.0, -0.2, 1.0), n_quad=6,
        n_test_x=3, n_test_t=3, layers=(2, 6, 1),
    )
    tc = hv.TrainConfig(iterations=20, check_every=10)
    recs = sweep.h_sweep(base, [1, 2], tc)
    assert [r["n_elements"] for r in recs] == [1, 2]
    # 2 x-elements x 2 t-elements (uniform over both axes; grid_x cleared)
    assert len(recs[1]["per_element_rel_l2"]) == 4

    base = hv.TaylorGreenConfig(
        dtype="float64", n_quad=4, layers=(3, 6, 3),
        n_elements_x=1, n_elements_y=1, n_elements_t=1,
        n_test_x_per_elem=(3,), n_test_y_per_elem=(3,), n_test_t_per_elem=(3,),
    )
    recs = sweep.p_sweep(base, [2, 3], tc)
    assert [r["n_test"] for r in recs] == [2, 3]
    assert all(np.isfinite(r["rel_l2"]) for r in recs)


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
