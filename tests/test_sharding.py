"""Multi-device sharding equivalence on the 8-device virtual CPU mesh.

Both parallel paths must reproduce single-device semantics exactly:
  * GSPMD: jit over element-sharded data (XLA inserts the all-reduce);
  * shard_map: explicit per-shard loss with psum over the element axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.parallel.sharding import (
    element_mesh,
    pad_elements,
    replicate,
    shard_map_loss,
    shard_problem,
)


@pytest.fixture(scope="module")
def problem():
    cfg = hv.Poisson2DConfig(
        dtype="float64", n_elements_x=4, n_elements_y=3, n_quad=6, n_test_x=4, n_test_y=4
    )
    return hv.build(cfg)  # E = 12, not divisible by 8 -> exercises padding


@pytest.fixture(scope="module")
def params(problem):
    return problem.init_params(jax.random.key(0))


def test_mesh_has_8_devices():
    assert element_mesh().size == 8


def test_pad_elements_preserves_loss(problem, params):
    loss0, _ = problem.loss_fn(params, problem.data)
    padded = dict(problem.data)
    padded["elements"] = pad_elements(problem.data["elements"], 8)
    assert padded["elements"].mask.shape[0] == 16
    loss1, _ = problem.loss_fn(params, padded)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-12)


def test_gspmd_loss_matches_single_device(problem, params):
    mesh = element_mesh()
    data = shard_problem(problem.data, mesh)
    p = replicate(params, mesh)
    loss0, aux0 = problem.loss_fn(params, problem.data)
    loss1, aux1 = jax.jit(problem.loss_fn)(p, data)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-10)
    np.testing.assert_allclose(float(aux0["lossv"]), float(aux1["lossv"]), rtol=1e-10)


def test_gspmd_grads_match_single_device(problem, params):
    mesh = element_mesh()
    data = shard_problem(problem.data, mesh)
    p = replicate(params, mesh)
    gfun = jax.grad(lambda pp, dd: problem.loss_fn(pp, dd)[0])
    g0 = gfun(params, problem.data)
    g1 = jax.jit(gfun)(p, data)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12),
        g0,
        g1,
    )


def test_shard_map_loss_matches_single_device(problem, params):
    mesh = element_mesh()
    data = shard_problem(problem.data, mesh)
    p = replicate(params, mesh)
    wrapped = shard_map_loss(problem.loss_fn, data, mesh)
    loss0, _ = problem.loss_fn(params, problem.data)
    loss1, aux1 = jax.jit(wrapped)(p, data)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-10)

    g0 = jax.grad(lambda pp: problem.loss_fn(pp, problem.data)[0])(params)
    g1 = jax.jit(jax.grad(lambda pp: wrapped(pp, data)[0]))(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12),
        g0,
        g1,
    )


def test_train_on_mesh(problem):
    mesh = element_mesh()
    cfg = hv.TrainConfig(iterations=40, check_every=20)
    res_mesh = hv.train(problem, cfg, mesh=mesh, verbose=False)
    res_single = hv.train(problem, cfg, verbose=False)
    np.testing.assert_allclose(
        res_mesh.history["loss"], res_single.history["loss"], rtol=1e-8
    )


def test_element_point_mesh_2d_problem(problem, params):
    """elements x points mesh: Q padded 6->8, contraction partial-sums
    all-reduced over the point axis; loss and grads bit-match."""
    from hpvpinns_tpu.parallel.sharding import element_point_mesh

    mesh = element_point_mesh((4, 2))
    data = shard_problem(problem.data, mesh)
    p = replicate(params, mesh)
    loss0, _ = problem.loss_fn(params, problem.data)
    loss1, _ = jax.jit(problem.loss_fn)(p, data)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-12)
    g0 = jax.grad(lambda q: problem.loss_fn(q, problem.data)[0])(params)
    g1 = jax.jit(jax.grad(lambda q: problem.loss_fn(q, data)[0]))(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-13
        ),
        g0,
        g1,
    )


def test_element_point_mesh_1d_problem():
    from hpvpinns_tpu.parallel.sharding import element_point_mesh

    cfg = hv.Poisson1DConfig(dtype="float64", n_elements=3, n_quad=10, n_test=5)
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(0))
    mesh = element_point_mesh((2, 4))  # Q=10 -> padded to 12
    data = shard_problem(prob.data, mesh)
    l0, _ = prob.loss_fn(params, prob.data)
    l1, _ = jax.jit(prob.loss_fn)(replicate(params, mesh), data)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-12)


def test_pad_points_inert():
    from hpvpinns_tpu.parallel.sharding import pad_points

    cfg = hv.Poisson1DConfig(dtype="float64", n_elements=2, n_quad=10, n_test=5)
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(1))
    elems, basis = pad_points(prob.data["elements"], prob.data["basis"], 8)
    assert elems.x.shape[-1] == 16 and basis.wphi.shape[-1] == 16
    padded = dict(prob.data, elements=elems, basis=basis)
    l0, _ = prob.loss_fn(params, prob.data)
    l1, _ = prob.loss_fn(params, padded)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-12)


def test_distributed_initialize_single_process():
    """Single-process bring-up is a no-op that reports the topology (the
    multi-host path calls jax.distributed.initialize with the same surface)."""
    from hpvpinns_tpu.parallel.distributed import initialize

    info = initialize()
    assert info["process_count"] == 1
    assert info["process_index"] == 0
    assert info["global_devices"] == len(jax.devices())
    # idempotent
    assert initialize() == info


@pytest.mark.slow
def test_gspmd_burgers_and_advdiff_shard():
    """The newer space-time families shard over the element mesh with
    identical losses (nonlinear weak form + trainable-coefficient pytrees
    ride the same element-axis layout)."""
    mesh = element_mesh()
    for cfg in (
        hv.BurgersConfig(dtype="float64", n_elements_x=3, n_elements_t=2,
                         n_quad=5, n_test_x=3, n_test_t=3, layers=(2, 6, 1)),
        hv.AdvDiffConfig(dtype="float64", n_elements_x=3, n_elements_t=2,
                         n_quad=5, n_test_x=3, n_test_t=3, layers=(2, 6, 1),
                         velocity_trainable=True),
        hv.AdvDiffConfig(dtype="float64", n_elements_x=3, n_elements_t=2,
                         n_quad=5, n_test_x=3, n_test_t=3, layers=(2, 6, 1),
                         velocity_trainable=True, velocity_model="linear"),
        hv.AdvDiff2DConfig(dtype="float64", n_elements_x=3, n_elements_y=2,
                           n_elements_t=1, n_quad=4, n_test_x=3, n_test_y=3,
                           n_test_t=3, layers=(3, 6, 1), velocity_trainable=True),
        # the oscillatory/indefinite family, inverse mode: the trainable-k_sq
        # pde leaf and the sensor misfit ride the same element-axis layout
        hv.Helmholtz2DConfig(dtype="float64", n_elements_x=3, n_elements_y=2,
                             n_quad=5, n_test_x=3, n_test_y=3, layers=(2, 6, 1),
                             inverse=True, n_sensors=6),
    ):
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


def test_gauss_newton_sharded_matches_single_device(problem, params):
    """The precision phase on the mesh: LM with the matrix-free CG kernel
    (the solver whose matvecs keep the element axis sharded, never
    materializing J) must reproduce the unsharded trajectory — loss AND
    parameters — after several accepted steps."""
    from jax.flatten_util import ravel_pytree

    from hpvpinns_tpu.training.gauss_newton import gauss_newton

    gn0 = gauss_newton(problem, params, iterations=5, verbose=False, solve="cg")
    gn1 = gauss_newton(problem, params, iterations=5, verbose=False,
                       solve="cg", mesh=element_mesh())
    # CG's iterate path is rounding-sensitive, so sharded reduction order
    # drifts the trajectory by ~1e-7 relative over 5 steps; a missing
    # collective would be off by ~n_devices, far outside these tolerances.
    np.testing.assert_allclose(
        gn1.final_aux["loss"], gn0.final_aux["loss"], rtol=1e-5)
    t0, _ = ravel_pytree(gn0.params)
    t1, _ = ravel_pytree(gn1.params)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                               rtol=1e-2, atol=1e-4)


def test_gauss_newton_sharded_dense_qr(problem, params):
    """The dense kernels must stay CORRECT under the mesh too (GSPMD may
    gather J — documented; cg is the scaling path): sharded qr == unsharded."""
    from hpvpinns_tpu.training.gauss_newton import gauss_newton

    gn0 = gauss_newton(problem, params, iterations=3, verbose=False, solve="qr")
    gn1 = gauss_newton(problem, params, iterations=3, verbose=False,
                       solve="qr", mesh=element_mesh())
    np.testing.assert_allclose(
        gn1.final_aux["loss"], gn0.final_aux["loss"], rtol=1e-8)


def test_ensemble_on_mesh_matches_unsharded(problem):
    """--mesh --seeds: the vmapped seed ensemble over element-sharded data
    (the round-3 silent-ignore fix) must match the unsharded ensemble."""
    from hpvpinns_tpu.training.ensemble import train_ensemble

    cfg = hv.TrainConfig(iterations=20, check_every=10)
    e0 = train_ensemble(problem, cfg, seeds=(0, 1, 2), verbose=False)
    e1 = train_ensemble(problem, cfg, seeds=(0, 1, 2), verbose=False,
                        mesh=element_mesh())
    np.testing.assert_allclose(
        np.asarray(e1.final_aux["loss"]), np.asarray(e0.final_aux["loss"]),
        rtol=1e-9)


def test_trainer_gn_phase_on_mesh(problem):
    """run --mesh with a gn_iterations phase: the trainer hands the SHARDED
    data pytree into gauss_newton, so the full three-phase pipeline must
    reproduce the unsharded result."""
    cfg = hv.TrainConfig(iterations=40, check_every=20, gn_iterations=3,
                         gn_solve="cg")
    r0 = hv.train(problem, cfg, verbose=False)
    r1 = hv.train(problem, cfg, mesh=element_mesh(), verbose=False)
    np.testing.assert_allclose(r1.final_aux["loss"], r0.final_aux["loss"],
                               rtol=1e-4)
