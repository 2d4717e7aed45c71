"""3D Poisson (volumetric tensor-product generalization; no reference analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpvpinns_tpu as hv
from hpvpinns_tpu.geometry.mesh import TensorMesh3D
from hpvpinns_tpu.ops.assembly import poisson3d_residual
from hpvpinns_tpu.ops.contract import contract_3d
from hpvpinns_tpu.problems import poisson3d


def test_contract_3d_matches_loop():
    rng = np.random.default_rng(0)
    wx, wy, wz = rng.normal(size=(3, 5)), rng.normal(size=(4, 6)), rng.normal(size=(2, 7))
    g = rng.normal(size=(3, 7, 6, 5))
    expected = np.einsum("rx,ky,mz,ezyx->emkr", wx, wy, wz, g)
    got = contract_3d(jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12)


def test_mesh3d_flat_order_and_jacobians():
    m = TensorMesh3D.uniform(0, 2, 2, 0, 3, 3, 0, 1, 1)
    assert m.n_elem == 6
    jx, jy, jz = m.jacobians()
    np.testing.assert_allclose(jx, 0.5)
    np.testing.assert_allclose(jy, 0.5)
    np.testing.assert_allclose(jz, 0.5)
    X, Y, Z = m.map_points(np.array([0.0]), np.array([0.0]), np.array([0.0]))
    # e = (ex * Ey + ey) * Ez + ez, x-major
    np.testing.assert_allclose(X[:, 0, 0, 0], [0.5, 0.5, 0.5, 1.5, 1.5, 1.5])
    np.testing.assert_allclose(Y[:, 0, 0, 0], [0.5, 1.5, 2.5, 0.5, 1.5, 2.5])


def test_f_rhs_is_laplacian():
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.8, 0.8, (20, 1))
    y, z = np.roll(x, 3), np.roll(x, 7)
    e = 1e-5
    u = poisson3d.u_exact
    lap = (
        u(x + e, y, z) + u(x - e, y, z) + u(x, y + e, z) + u(x, y - e, z)
        + u(x, y, z + e) + u(x, y, z - e) - 6 * u(x, y, z)
    ) / e**2
    np.testing.assert_allclose(poisson3d.f_rhs(x, y, z), lap, rtol=1e-3, atol=1e-3)


def test_forms_agree_and_exact_zero_residual():
    cfg = hv.Poisson3DConfig(dtype="float64", n_quad=12, n_test_x=4, n_test_y=4, n_test_z=4)
    prob = hv.build(cfg)
    el = prob.data["elements"]
    bx, by, bz = prob.data["basis_x"], prob.data["basis_y"], prob.data["basis_z"]
    u_s = lambda X: jnp.sin(jnp.pi * X[:, 0:1]) * jnp.sin(jnp.pi * X[:, 1:2]) * jnp.sin(jnp.pi * X[:, 2:3])
    r0 = poisson3d_residual(u_s, el, bx, by, bz, 0)
    r1 = poisson3d_residual(u_s, el, bx, by, bz, 1)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=1e-9, atol=1e-11)
    with pytest.raises(ValueError):
        poisson3d_residual(u_s, el, bx, by, bz, 2)


def test_taylor_jvp_equivalence_3d():
    import dataclasses

    cfg = hv.Poisson3DConfig(dtype="float64", n_quad=5, n_test_x=3, n_test_y=3, n_test_z=3)
    pt = hv.build(dataclasses.replace(cfg, deriv_mode="taylor"))
    pj = hv.build(dataclasses.replace(cfg, deriv_mode="jvp"))
    params = pt.init_params(jax.random.key(0))
    lt, _ = pt.loss_fn(params, pt.data)
    lj, _ = pj.loss_fn(params, pj.data)
    np.testing.assert_allclose(float(lt), float(lj), rtol=1e-12)
    gt = jax.grad(lambda p: pt.loss_fn(p, pt.data)[0])(params)
    gj = jax.grad(lambda p: pj.loss_fn(p, pj.data)[0])(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12),
        gt, gj,
    )


def test_3d_shards_on_mesh():
    from hpvpinns_tpu.parallel.sharding import element_mesh, replicate, shard_problem

    cfg = hv.Poisson3DConfig(dtype="float64", n_quad=4, n_test_x=2, n_test_y=2, n_test_z=2)
    prob = hv.build(cfg)  # E = 8
    params = prob.init_params(jax.random.key(0))
    mesh = element_mesh()
    data = shard_problem(prob.data, mesh)
    l0, _ = prob.loss_fn(params, prob.data)
    l1, _ = jax.jit(prob.loss_fn)(replicate(params, mesh), data)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-12)


@pytest.mark.slow
@pytest.mark.slow
def test_3d_trains_toward_solution():
    cfg = hv.Poisson3DConfig(
        dtype="float64",
        train=hv.TrainConfig(iterations=1500, lbfgs_iterations=500, check_every=200),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    m = hv.evaluate_problem(prob, res.params)
    assert m["rel_l2"] < 0.35, m
    assert res.history["loss"][-1] < 0.05 * res.history["loss"][0]


def test_3d_p_nonuniformity():
    """Ragged per-axis test counts mask correctly (parity with 1D/2D)."""
    cfg = hv.Poisson3DConfig(
        dtype="float64", n_quad=4, n_elements_x=2,
        n_test_x_per_elem=(2, 3), n_test_y=2, n_test_z=2,
        layers=(3, 6, 1), train=hv.TrainConfig(iterations=10, check_every=10),
    )
    prob = hv.build(cfg)
    m = np.asarray(prob.data["elements"].mask)
    assert m.shape == (8, 2, 2, 3)
    np.testing.assert_array_equal(np.asarray(prob.data["elements"].n_test)[:4], 8.0)
    np.testing.assert_array_equal(np.asarray(prob.data["elements"].n_test)[4:], 12.0)
    res = hv.train(prob, verbose=False)
    assert np.isfinite(res.final_aux["loss"])


def test_poisson3d_hard_bc_exact_on_faces():
    """Lifted 3D ansatz: all six Dirichlet faces exact for random params."""
    import jax

    from hpvpinns_tpu.problems import poisson3d

    cfg = hv.Poisson3DConfig(
        dtype="float64", hard_bc=True, layers=(3, 8, 1), n_quad=3,
        n_test_x=2, n_test_y=2, n_test_z=2,
    )
    prob = hv.build(cfg)
    params = prob.init_params(jax.random.key(2))
    g = np.linspace(-1, 1, 5)
    A, B = np.meshgrid(g, g)
    flat = np.stack([A.reshape(-1), B.reshape(-1)], axis=-1)
    for axis in range(3):
        for val in (-1.0, 1.0):
            X = np.insert(flat, axis, val, axis=1)
            u = np.asarray(prob.apply(params, X)).reshape(-1)
            u_true = np.asarray(
                poisson3d.u_exact(X[:, 0:1], X[:, 1:2], X[:, 2:3])
            ).reshape(-1)
            np.testing.assert_allclose(u, u_true, atol=1e-12)
    # trains
    res = hv.train(prob, hv.TrainConfig(iterations=20, check_every=10), verbose=False)
    assert np.isfinite(res.final_aux["loss"])


def test_solve_poisson3d_fast_diagonalization_spectral():
    """3D direct solver (per-axis generalized eigen + elementwise divide):
    spectral in p against the manufactured exact, non-homogeneous x-face
    Dirichlet data through the transfinite lift."""
    from hpvpinns_tpu.galerkin import solve_poisson3d
    from hpvpinns_tpu.geometry.mesh import TensorMesh3D
    from hpvpinns_tpu.problems.poisson3d import f_rhs, u_exact

    mesh = TensorMesh3D.uniform(-1, 1, 2, -1, 1, 2, -1, 1, 2)

    def lift(x, y, z):
        ua = np.asarray(u_exact(np.full_like(x, -1.0), y, z))
        ub = np.asarray(u_exact(np.full_like(x, 1.0), y, z))
        s = (x + 1.0) / 2.0
        return (1 - s) * ua + s * ub

    xs = np.linspace(-1, 1, 13)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    ue = u_exact(X, Y, Z)
    errs = {}
    for p in (8, 12):
        sol = solve_poisson3d(mesh, p, f_rhs, lift_fn=lift)
        errs[p] = np.linalg.norm(sol(X, Y, Z) - ue) / np.linalg.norm(ue)
    assert errs[12] < 5e-5
    assert errs[12] < errs[8] / 10  # spectral decay


def test_vpinn_gap_3d_report():
    from hpvpinns_tpu.galerkin import vpinn_gap_3d

    cfg = hv.Poisson3DConfig(
        dtype="float64",
        train=hv.TrainConfig(iterations=150, lbfgs_iterations=0, check_every=50),
    )
    prob = hv.build(cfg)
    res = hv.train(prob, verbose=False)
    gap = vpinn_gap_3d(prob, res.eval_params, p=10, n_points=13)
    assert gap["rel_l2_galerkin_vs_exact"] < 1e-3
    assert np.isfinite(gap["rel_l2_net_vs_galerkin"])
    import jax as _jax
    p1 = hv.build(hv.Poisson1DConfig(dtype="float64"))
    with pytest.raises(ValueError, match="poisson3d"):
        vpinn_gap_3d(p1, p1.init_params(_jax.random.key(0)))
