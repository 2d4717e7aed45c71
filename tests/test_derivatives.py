"""Nested-JVP derivative fields vs finite differences (replaces the
reference's nested tf.gradients, Poisson-1D.py:144-155)."""

import jax
import jax.numpy as jnp
import numpy as np

from hpvpinns_tpu.models.mlp import MLP, init_mlp, mlp_apply
from hpvpinns_tpu.ops.fields import scalar_fields_1d, scalar_fields_2d


def _fd(f, x, eps=1e-5):
    return (f(x + eps) - f(x - eps)) / (2 * eps)


def test_fields_1d_against_finite_differences():
    spec = MLP(layers=(1, 8, 8, 1), activation="sin")
    params = init_mlp(spec, jax.random.key(0), dtype=jnp.float64)
    u_fn = lambda X: mlp_apply(spec, params, X)
    x = jnp.linspace(-0.9, 0.9, 7).reshape(1, -1)

    u, ux, uxx = scalar_fields_1d(u_fn, x)
    f = lambda xs: np.asarray(u_fn(jnp.asarray(xs).reshape(-1, 1))).reshape(xs.shape)
    xs = np.asarray(x)
    np.testing.assert_allclose(np.asarray(u), f(xs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ux), _fd(f, xs), rtol=1e-6, atol=1e-8)
    fd2 = (f(xs + 1e-4) - 2 * f(xs) + f(xs - 1e-4)) / 1e-8
    np.testing.assert_allclose(np.asarray(uxx), fd2, rtol=1e-5, atol=1e-6)


def test_fields_2d_against_finite_differences():
    spec = MLP(layers=(2, 8, 8, 1), activation="tanh")
    params = init_mlp(spec, jax.random.key(1), dtype=jnp.float64)
    u_fn = lambda X: mlp_apply(spec, params, X)
    x = jnp.linspace(-0.8, 0.8, 3).reshape(1, 1, 3)
    y = jnp.linspace(-0.5, 0.5, 3).reshape(1, 3, 1)
    x, y = jnp.broadcast_arrays(x, y)

    flds = scalar_fields_2d(u_fn, x, y)

    def f(xs, ys):
        X = jnp.stack([jnp.asarray(xs).reshape(-1), jnp.asarray(ys).reshape(-1)], axis=-1)
        return np.asarray(u_fn(X)).reshape(xs.shape)

    xs, ys = np.asarray(x), np.asarray(y)
    e = 1e-5
    np.testing.assert_allclose(np.asarray(flds["u"]), f(xs, ys), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(flds["ux"]), (f(xs + e, ys) - f(xs - e, ys)) / (2 * e), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(flds["uy"]), (f(xs, ys + e) - f(xs, ys - e)) / (2 * e), rtol=1e-6, atol=1e-8
    )
    e2 = 1e-4
    np.testing.assert_allclose(
        np.asarray(flds["uxx"]),
        (f(xs + e2, ys) - 2 * f(xs, ys) + f(xs - e2, ys)) / e2**2,
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(flds["uyy"]),
        (f(xs, ys + e2) - 2 * f(xs, ys) + f(xs, ys - e2)) / e2**2,
        rtol=1e-4,
        atol=1e-6,
    )


def test_fields_2d_first_y_only():
    spec = MLP(layers=(2, 4, 1), activation="tanh")
    params = init_mlp(spec, jax.random.key(2), dtype=jnp.float64)
    u_fn = lambda X: mlp_apply(spec, params, X)
    x = jnp.ones((1, 2, 2)) * 0.1
    y = jnp.ones((1, 2, 2)) * 0.2
    flds = scalar_fields_2d(u_fn, x, y, first_y_only=True)
    assert set(flds) == {"u", "ux", "uxx", "uy"}
