"""Vmapped seed-ensemble trainer (training/ensemble.py).

The ensemble step must be EXACTLY S independent trainings fused into one
jitted loop.  Bitwise init equality and machine-epsilon grad equality hold;
multi-step trajectories then drift only by Adam's chaotic amplification of
matmul-reassociation ulps (measured: ~7e-4 after 10 f64 steps), so
equivalence is asserted at the places it is well-conditioned: the stacked
init, the vmapped gradient, and a single optimizer step.
"""

import jax
import numpy as np

import hpvpinns_tpu as hv
from hpvpinns_tpu.training.ensemble import init_ensemble


def _cfg(iters=40):
    return hv.Poisson1DConfig(
        dtype="float64", n_test=5, n_quad=10, layers=(1, 8, 8, 1),
        train=hv.TrainConfig(iterations=iters, check_every=10),
    )


def _leaves_close(a, b, rtol, atol, msg=""):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol,
                                   atol=atol, err_msg=msg)


def test_ensemble_init_bitwise_and_grads_exact():
    prob = hv.build(_cfg())
    stack = init_ensemble(prob, (0, 7))
    for i, seed in enumerate((0, 7)):
        serial = prob.init_params(jax.random.key(seed))
        member = jax.tree.map(lambda a: a[i], stack)
        _leaves_close(member, serial, rtol=0, atol=0, msg=f"init seed {seed}")
        g_serial = jax.grad(lambda p: prob.loss_fn(p, prob.data)[0])(serial)
        g_stack = jax.vmap(jax.grad(lambda p: prob.loss_fn(p, prob.data)[0]))(stack)
        _leaves_close(jax.tree.map(lambda a: a[i], g_stack), g_serial,
                      rtol=1e-12, atol=1e-13, msg=f"grad seed {seed}")


def test_ensemble_single_step_matches_serial():
    prob = hv.build(_cfg(iters=1))
    cfg = hv.TrainConfig(iterations=1, check_every=1)
    ens = hv.train_ensemble(prob, cfg, seeds=(0, 7), verbose=False)
    assert ens.iterations_run == 1
    for i, seed in enumerate((0, 7)):
        serial = hv.train(prob, hv.TrainConfig(iterations=1, check_every=1, seed=seed),
                          verbose=False)
        _leaves_close(ens.member(i), serial.params, rtol=1e-6, atol=1e-9,
                      msg=f"1-step params seed {seed}")
        np.testing.assert_allclose(ens.final_aux["loss"][i],
                                   serial.final_aux["loss"], rtol=1e-8)


def test_ensemble_multi_step_losses_track_serial():
    """Trajectories drift at the ulp-amplification level only: after 40
    steps every member's loss still matches its serial twin to ~1e-3."""
    prob = hv.build(_cfg())
    ens = hv.train_ensemble(prob, seeds=(0, 7), verbose=False)
    assert ens.iterations_run == 40
    for i, seed in enumerate((0, 7)):
        serial = hv.train(prob, hv.TrainConfig(iterations=40, check_every=10, seed=seed),
                          verbose=False)
        np.testing.assert_allclose(ens.final_aux["loss"][i],
                                   serial.final_aux["loss"], rtol=5e-3)


def test_ensemble_system_families():
    """The ensemble step is family-generic: the vector-output NS systems
    (steady Kovasznay, unsteady space-time Taylor-Green) train as a stacked
    fleet and every member's loss is finite and decreasing."""
    for cfg in (
        hv.KovasznayConfig(
            dtype="float64", layers=(2, 6, 3), n_quad=4, n_test_x=3, n_test_y=3,
            train=hv.TrainConfig(iterations=20, check_every=10),
        ),
        hv.TaylorGreenConfig(
            dtype="float64", layers=(3, 6, 3), n_quad=4,
            n_test_x=3, n_test_y=3, n_test_t=3,
            train=hv.TrainConfig(iterations=20, check_every=10),
        ),
    ):
        prob = hv.build(cfg)
        ens = hv.train_ensemble(prob, cfg.train, seeds=(0, 1), verbose=False)
        losses = np.asarray(ens.final_aux["loss"])
        first = np.asarray(ens.history["loss"][0])
        assert losses.shape == (2,) and np.all(np.isfinite(losses))
        assert np.all(losses < first), (losses, first)


def test_ensemble_history_and_best_member():
    prob = hv.build(_cfg())
    ens = hv.train_ensemble(prob, seeds=(0, 1, 2), verbose=False)
    assert ens.history["loss"].shape == (4, 3)  # 4 records x 3 seeds
    i, params = ens.best_member()
    assert i == int(np.argmin(ens.final_aux["loss"]))
    loss, _ = prob.loss_fn(params, prob.data)
    np.testing.assert_allclose(float(loss), ens.final_aux["loss"][i], rtol=1e-9)
    assert ens.seed_steps_per_sec == ens.steps_per_sec * 3
