"""Results records (AdvDiff.py:500-508 behavior) and the plot set (C16)."""

import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu import viz
from hpvpinns_tpu.utils.records import build_record, load_record, save_record


@pytest.fixture(scope="module")
def trained_1d():
    cfg = hv.Poisson1DConfig(
        dtype="float64", n_test=5, n_quad=10, layers=(1, 6, 1),
        train=hv.TrainConfig(iterations=30, check_every=10),
    )
    prob = hv.build(cfg)
    return prob, hv.train(prob, verbose=False)


@pytest.fixture(scope="module")
def trained_adv():
    cfg = hv.AdvDiffConfig(
        dtype="float64", n_quad=6, n_test_x=3, n_test_t=3, layers=(2, 6, 1),
        train=hv.TrainConfig(iterations=30, check_every=10),
    )
    prob = hv.build(cfg)
    return prob, hv.train(prob, verbose=False)


def test_record_roundtrip(tmp_path, trained_1d):
    prob, res = trained_1d
    written = save_record(prob, res, str(tmp_path / "rec"))
    assert str(tmp_path / "rec.npz") in written
    back = load_record(str(tmp_path / "rec.npz"))
    np.testing.assert_allclose(back["x_test"], prob.test_points)
    assert back["u_pred"].shape == prob.test_values.shape
    assert "history_loss" in back
    # .mat variant loads through scipy too
    mat = [w for w in written if w.endswith(".mat")]
    if mat:
        m = load_record(mat[0])
        np.testing.assert_allclose(
            np.asarray(m["u_pred"]), back["u_pred"], rtol=1e-12
        )


def test_record_params_roundtrip(tmp_path, trained_1d):
    from hpvpinns_tpu.evaluate import predict
    from hpvpinns_tpu.utils.records import params_from_record

    prob, res = trained_1d
    written = save_record(prob, res, str(tmp_path / "recp"),
                          include_params=True)
    for path in written:  # .npz and (when scipy is present) .mat
        back = load_record(path)
        params = params_from_record(prob, back)
        np.testing.assert_allclose(
            predict(prob, params), predict(prob, res.eval_params),
            rtol=1e-12, atol=1e-12,
        )
    # a record without params refuses loudly
    plain = load_record(save_record(prob, res, str(tmp_path / "rec0"))[0])
    with pytest.raises(ValueError):
        params_from_record(prob, plain)


def test_record_contains_grids(trained_adv):
    prob, res = trained_adv
    rec = build_record(prob, res)
    assert "grid_x" in rec and "grid_y" in rec
    assert "history_epsilon" in rec


def test_standard_report_1d(tmp_path, trained_1d):
    prob, res = trained_1d
    paths = viz.standard_report(prob, res, str(tmp_path))
    names = {p.split("/")[-1] for p in paths}
    assert {
        "loss.pdf", "train_quad_points.pdf", "prediction.pdf", "error.pdf",
        "per_element_error.png",
    } <= names
    import os

    assert all(os.path.getsize(p) > 0 for p in paths)


def test_standard_report_advdiff(tmp_path, trained_adv):
    prob, res = trained_adv
    paths = viz.standard_report(prob, res, str(tmp_path))
    names = {p.split("/")[-1] for p in paths}
    assert "epsilon_convergence.pdf" in names
    assert "time_slices.pdf" in names


def test_standard_report_2d(tmp_path):
    cfg = hv.Poisson2DConfig(
        dtype="float64", n_quad=5, n_test_x=3, n_test_y=3, layers=(2, 6, 1),
        train=hv.TrainConfig(iterations=20, check_every=10),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    paths = viz.standard_report(prob, res, str(tmp_path))
    names = {p.split("/")[-1] for p in paths}
    assert {"prediction.png", "exact.png", "pointwise_error.png"} <= names


def test_standard_report_3d(tmp_path):
    cfg = hv.Poisson3DConfig(
        dtype="float64", n_quad=4, n_test_x=2, n_test_y=2, n_test_z=2,
        layers=(3, 6, 1), train=hv.TrainConfig(iterations=10, check_every=10),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    paths = viz.standard_report(prob, res, str(tmp_path))
    names = {p.split("/")[-1] for p in paths}
    assert "z_slices.png" in names


def test_coefficient_field_plot(tmp_path):
    """Space-dependent inverse models get a recovered-vs-true profile plot."""
    import os

    import jax

    from hpvpinns_tpu.problems import advdiff

    vfn = lambda x: 1.0 + 0.3 * x  # noqa: E731
    cfg = hv.AdvDiffConfig(
        dtype="float64", velocity_trainable=True, velocity_model="linear",
        epsilon_model="quadratic", layers=(2, 6, 1),
    )
    u_fn, f_fn = advdiff.make_manufactured(cfg, vfn)
    prob = advdiff.build(cfg, u_fn=u_fn, f_fn=f_fn, velocity_fn=vfn)
    params = prob.init_params(jax.random.key(0))
    path = viz.plot_coefficient_field(prob, params, str(tmp_path))
    assert path is not None and os.path.exists(path)
    # scalar-only models: no field panel, returns None
    prob2 = hv.build(hv.AdvDiffConfig(dtype="float64", layers=(2, 6, 1)))
    params2 = prob2.init_params(jax.random.key(0))
    assert viz.plot_coefficient_field(prob2, params2, str(tmp_path)) is None
