"""Fused Pallas field kernel vs the XLA Taylor path (ops/pallas_fields.py).

On CPU the kernel runs in Pallas interpret mode — semantics-identical to the
Mosaic-compiled TPU path (which was verified on hardware to 2.6e-7 in f32;
benchmarks/MEASUREMENTS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvpinns_tpu.models.mlp import MLP, init_mlp
from hpvpinns_tpu.ops.pallas_fields import (
    _xla_fields_flat,
    fields_flat,
    pallas_fields_1d,
    pallas_fields_2d,
)
from hpvpinns_tpu.ops.taylor import taylor_fields_1d, taylor_fields_2d


@pytest.fixture(scope="module")
def setup():
    spec = MLP(layers=(2, 20, 20, 20, 1), activation="tanh")
    params = init_mlp(spec, jax.random.key(0), dtype=jnp.float32)
    x = jnp.linspace(-1, 1, 4 * 25).reshape(4, 5, 5).astype(jnp.float32)
    y = (x[::-1] * 0.5).astype(jnp.float32)
    return spec, params, x, y


def test_pallas_2d_matches_taylor(setup):
    spec, params, x, y = setup
    f0 = taylor_fields_2d(spec, params, x, y)
    f1 = pallas_fields_2d(spec, params, x, y)
    for key in ("u", "ux", "uy", "uxx", "uyy"):
        np.testing.assert_allclose(
            np.asarray(f1[key]), np.asarray(f0[key]), rtol=2e-5, atol=1e-6, err_msg=key
        )


def test_pallas_1d_matches_taylor():
    spec = MLP(layers=(1, 12, 12, 1), activation="sin")
    params = init_mlp(spec, jax.random.key(1), dtype=jnp.float32)
    x = jnp.linspace(-1, 1, 33).reshape(1, -1).astype(jnp.float32)
    u0, ux0, uxx0 = taylor_fields_1d(spec, params, x)
    u1, ux1, uxx1 = pallas_fields_1d(spec, params, x)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ux1), np.asarray(ux0), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(uxx1), np.asarray(uxx0), rtol=2e-5, atol=1e-4)


def test_custom_vjp_backward_matches_xla(setup):
    """fields_flat's custom VJP (the fused Pallas backward kernel for
    sin/tanh) agrees with the XLA backward to f32 roundoff."""
    spec, params, x, y = setup
    X = jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
    g = jax.random.normal(jax.random.key(2), (X.shape[0], 5), dtype=jnp.float32)
    gp = jax.grad(lambda p: (fields_flat(spec, p, X, 2, True) * g).sum())(params)
    gx = jax.grad(lambda p: (_xla_fields_flat(spec, p, X, 2, True) * g).sum())(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        gp,
        gx,
    )


def test_pallas_mode_trains():
    import hpvpinns_tpu as hv

    cfg = hv.Poisson2DConfig(
        n_quad=5, n_test_x=3, n_test_y=3, layers=(2, 8, 1), deriv_mode="pallas",
        train=hv.TrainConfig(iterations=20, check_every=10),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    assert res.history["loss"][-1] < res.history["loss"][0]


def test_unsupported_activation_raises():
    spec = MLP(layers=(1, 4, 1), activation="gelu")
    params = init_mlp(spec, jax.random.key(0), dtype=jnp.float32)
    x = jnp.zeros((1, 8), dtype=jnp.float32)
    with pytest.raises(ValueError, match="sin/tanh"):
        pallas_fields_1d(spec, params, x)


def test_fused_backward_kernel_matches_xla_vjp(setup):
    """The hand-written backward kernel (_pallas_fields_bwd) reproduces the
    XLA VJP of the Taylor propagation (verified to ~1e-6 f32 on TPU hardware;
    here in interpret mode)."""
    from hpvpinns_tpu.ops.pallas_fields import _pallas_fields_bwd

    spec, params, x, y = setup
    X = jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
    g = jax.random.normal(jax.random.key(7), (X.shape[0], 5), dtype=jnp.float32)
    gp, gx = _pallas_fields_bwd(spec, params, X, g, 2, block_points=64)
    _, vjp = jax.vjp(lambda p, xx: _xla_fields_flat(spec, p, xx, 2, True), params, X)
    gp0, gx0 = vjp(g)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        gp,
        gp0,
    )
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx0), rtol=2e-4, atol=1e-5)


def test_fused_backward_1d_sin(setup):
    from hpvpinns_tpu.models.mlp import init_mlp
    from hpvpinns_tpu.ops.pallas_fields import _pallas_fields_bwd

    spec = MLP(layers=(1, 12, 12, 1), activation="sin")
    params = init_mlp(spec, jax.random.key(3), dtype=jnp.float32)
    X = jnp.linspace(-1, 1, 90, dtype=jnp.float32).reshape(-1, 1)
    g = jax.random.normal(jax.random.key(8), (90, 3), dtype=jnp.float32)
    gp, gx = _pallas_fields_bwd(spec, params, X, g, 1, block_points=32)
    _, vjp = jax.vjp(lambda p, xx: _xla_fields_flat(spec, p, xx, 1, True), params, X)
    gp0, gx0 = vjp(g)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        gp,
        gp0,
    )


@pytest.mark.slow
def test_wide_and_mixed_width_gradients():
    """Widths > 128 and mixed widths pad to one uniform tile width; the
    backward kernel's scratch must follow (regression for a hardcoded
    H=128 that crashed MLP(2,256,1) gradients)."""
    from hpvpinns_tpu.models.mlp import init_mlp

    for layers, nd, nf in (((2, 256, 1), 2, 5), ((1, 200, 40, 1), 1, 3)):
        spec = MLP(layers=layers, activation="tanh")
        params = init_mlp(spec, jax.random.key(0), dtype=jnp.float32)
        X = jax.random.uniform(jax.random.key(1), (64, layers[0]), dtype=jnp.float32)
        g = jax.random.normal(jax.random.key(2), (64, nf), dtype=jnp.float32)
        gp = jax.grad(lambda p: (fields_flat(spec, p, X, nd, True) * g).sum())(params)
        gx = jax.grad(lambda p: (_xla_fields_flat(spec, p, X, nd, True) * g).sum())(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4
            ),
            gp,
            gx,
        )


def test_poisson3d_pallas_mode_matches_taylor():
    import dataclasses

    import hpvpinns_tpu as hv

    cfg = hv.Poisson3DConfig(n_quad=4, n_test_x=2, n_test_y=2, n_test_z=2, layers=(3, 8, 1))
    pt = hv.build(dataclasses.replace(cfg, deriv_mode="taylor"))
    pp = hv.build(dataclasses.replace(cfg, deriv_mode="pallas"))
    params = pt.init_params(jax.random.key(0))
    lt, _ = pt.loss_fn(params, pt.data)
    lp, _ = pp.loss_fn(params, pp.data)
    np.testing.assert_allclose(float(lt), float(lp), rtol=1e-5)
    gt = jax.grad(lambda p: pt.loss_fn(p, pt.data)[0])(params)
    gp = jax.grad(lambda p: pp.loss_fn(p, pp.data)[0])(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        ),
        gp,
        gt,
    )

    with pytest.raises(ValueError, match="deriv_mode"):
        hv.build(hv.Poisson3DConfig(deriv_mode="bogus"))


def test_stepwise_chunk_aux_is_post_update():
    """Fallback chunk must report metrics at the UPDATED params, matching
    the scan chunk's contract (threshold stop / best-snapshot correctness)."""
    import optax

    import hpvpinns_tpu as hv
    from hpvpinns_tpu.training.trainer import (
        _build_chunk,
        _build_stepwise_chunk,
        make_optimizer,
    )

    prob = hv.build(hv.Poisson1DConfig(dtype="float64", n_quad=8, n_test=4, layers=(1, 6, 1)))
    opt = make_optimizer(hv.TrainConfig())
    params = prob.init_params(jax.random.key(0))
    st = opt.init(params)
    p1, s1, aux1 = _build_chunk(prob.loss_fn, opt, 5)(params, st, prob.data)
    params = prob.init_params(jax.random.key(0))
    st = opt.init(params)
    p2, s2, aux2 = _build_stepwise_chunk(prob.loss_fn, opt, 5)(params, st, prob.data)
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-10)
