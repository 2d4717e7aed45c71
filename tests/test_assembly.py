"""Variational assembly properties (reference C4, Poisson-1D.py:64-96,
Poisson-2D.py:68-120, AdvDiff.py:108-182).

Key invariants:
  * integration-by-parts identity: all var_forms agree to quadrature accuracy
    on integrands the quadrature resolves (test fns vanish at element
    endpoints, so 1D forms 1/2 and 2D forms 0/1 have no boundary terms;
    1D form 3 carries the explicit flux, Poisson-1D.py:88-91);
  * the exact solution's residual vanishes identically under var_form 1/0
    (U and F are then the same quadrature sum);
  * masking reproduces ragged per-element test counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvpinns_tpu.geometry.mesh import Interval1D, TensorMesh2D
from hpvpinns_tpu.ops.assembly import (
    advdiff_residual,
    poisson1d_residual,
    poisson2d_residual,
    variational_loss,
)
from hpvpinns_tpu.problems.build import (
    build_elements_1d,
    build_elements_2d,
    make_weighted_basis,
)
from hpvpinns_tpu.spectral.quadrature import gauss_lobatto_jacobi

F64 = jnp.float64


def _setup_1d(n_elem=3, n_quad=40, n_test=8):
    mesh = Interval1D.uniform(-1.0, 1.0, n_elem)
    xq, wq = gauss_lobatto_jacobi(n_quad, 0.0, 0.0)
    f_fn = lambda x: np.pi**2 * np.sin(np.pi * x)  # -u'' for u = sin(pi x)
    elems = build_elements_1d(mesh, xq, wq, f_fn, [n_test] * n_elem, F64)
    basis = make_weighted_basis(n_test, xq, wq, F64)
    return elems, basis


def test_1d_var_forms_agree_on_resolved_integrand():
    elems, basis = _setup_1d()
    u_fn = lambda X: jnp.sin(2.0 * X) + 0.3 * X**3
    rs = [poisson1d_residual(u_fn, elems, basis, vf) for vf in (1, 2, 3)]
    np.testing.assert_allclose(np.asarray(rs[0]), np.asarray(rs[1]), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(rs[0]), np.asarray(rs[2]), rtol=1e-9, atol=1e-10)


def test_1d_exact_solution_zero_residual_form1():
    elems, basis = _setup_1d()
    u_fn = lambda X: jnp.sin(jnp.pi * X)
    res = poisson1d_residual(u_fn, elems, basis, 1)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-12)


def test_1d_mask_raggedness():
    """Element 0 uses 3 test fns, element 1 uses 8: masked slots are zero and
    the per-element mean divides by the element's own count
    (Poisson-1D.py:268,95)."""
    mesh = Interval1D.uniform(-1.0, 1.0, 2)
    xq, wq = gauss_lobatto_jacobi(30, 0.0, 0.0)
    f_fn = lambda x: np.pi**2 * np.sin(np.pi * x)
    elems = build_elements_1d(mesh, xq, wq, f_fn, [3, 8], F64)
    basis = make_weighted_basis(8, xq, wq, F64)
    u_fn = lambda X: 0.2 * X**2
    res = poisson1d_residual(u_fn, elems, basis, 1)
    masked = np.asarray(res * elems.mask)
    assert np.all(masked[0, 3:] == 0.0)
    loss = variational_loss(res, elems.mask, elems.n_test)
    manual = (masked[0, :3] ** 2).sum() / 3 + (masked[1] ** 2).sum() / 8
    np.testing.assert_allclose(float(loss), manual, rtol=1e-12)


def _setup_2d(n_ex=2, n_ey=2, n_quad=20, n_test=6):
    mesh = TensorMesh2D.uniform(-1.0, 1.0, n_ex, -1.0, 1.0, n_ey)
    xq, wq = gauss_lobatto_jacobi(n_quad, 0.0, 0.0)
    # u = sin(pi x) sin(pi y); f = Delta u = -2 pi^2 u (reference convention
    # f = Delta u, Poisson-2D.py:307-310)
    f_fn = lambda x, y: -2 * np.pi**2 * np.sin(np.pi * x) * np.sin(np.pi * y)
    elems = build_elements_2d(
        mesh, xq, wq, xq, wq, f_fn, [n_test] * n_ex, [n_test] * n_ey, F64
    )
    basis = make_weighted_basis(n_test, xq, wq, F64)
    return elems, basis


def test_2d_forms_0_and_1_agree():
    elems, basis = _setup_2d()
    u_fn = lambda X: jnp.sin(X[:, 0:1]) * jnp.cos(0.5 * X[:, 1:2])
    r0 = poisson2d_residual(u_fn, elems, basis, basis, 0)
    r1 = poisson2d_residual(u_fn, elems, basis, basis, 1)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=1e-9, atol=1e-10)


def test_2d_form_2_agrees_on_single_unit_element():
    """Reference form 2 omits the reference-derivative jacobian scalings
    (Poisson-2D.py:108-115) — exact only on a single [-1,1]^2 element, where
    it must agree with forms 0/1 for functions vanishing appropriately.
    phi-weighted flux terms vanish because phi_n(+-1) = 0 and the second IBP
    flux involves u * dphi at the boundary -- not zero in general, so use a u
    that vanishes on the boundary of the square."""
    mesh = TensorMesh2D.uniform(-1.0, 1.0, 1, -1.0, 1.0, 1)
    xq, wq = gauss_lobatto_jacobi(30, 0.0, 0.0)
    f_fn = lambda x, y: -2 * np.pi**2 * np.sin(np.pi * x) * np.sin(np.pi * y)
    elems = build_elements_2d(mesh, xq, wq, xq, wq, f_fn, [8], [8], F64)
    basis = make_weighted_basis(8, xq, wq, F64)
    u_fn = lambda X: jnp.sin(jnp.pi * X[:, 0:1]) * jnp.sin(jnp.pi * X[:, 1:2])
    r0 = poisson2d_residual(u_fn, elems, basis, basis, 0)
    r2 = poisson2d_residual(u_fn, elems, basis, basis, 2)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r2), rtol=1e-8, atol=1e-9)


def test_2d_form_2c_agrees_on_multielement_nonunit_mesh():
    """The corrected twice-IBP form '2c' (1/jac^2 scalings + live [u dphi]
    boundary flux) must agree with forms 0/1 on ANY mesh and for u NOT
    vanishing on the boundary — exactly where the reference-verbatim form 2 is
    inconsistent (Poisson-2D.py:108-115)."""
    mesh = TensorMesh2D.uniform(-1.0, 1.0, 2, 0.0, 2.0, 3)  # jac_x != jac_y
    xq, wq = gauss_lobatto_jacobi(30, 0.0, 0.0)
    f_fn = lambda x, y: 0.0 * x * y
    elems = build_elements_2d(mesh, xq, wq, xq, wq, f_fn, [7, 7], [7, 7, 7], F64)
    basis = make_weighted_basis(7, xq, wq, F64)
    # generic smooth u, nonzero on element boundaries
    u_fn = lambda X: jnp.sin(1.3 * X[:, 0:1]) * jnp.cos(0.7 * X[:, 1:2]) + 0.2 * X[:, 0:1]
    r0 = poisson2d_residual(u_fn, elems, basis, basis, 0)
    r2c = poisson2d_residual(u_fn, elems, basis, basis, "2c")
    np.testing.assert_allclose(np.asarray(r2c), np.asarray(r0), rtol=1e-8, atol=1e-9)
    # and the verbatim form 2 does NOT agree here (the bug is real)
    r2 = poisson2d_residual(u_fn, elems, basis, basis, 2)
    assert np.max(np.abs(np.asarray(r2) - np.asarray(r0))) > 1e-3


def test_advdiff_form_2_flux_agrees_on_multielement_mesh():
    """Twice-IBP diffusion with the live [u dphi] space-time boundary flux
    (the machinery AdvDiff.py:132-154 sketches) must match forms 0/1 for
    scalar eps on a multi-element mesh."""
    mesh = TensorMesh2D.uniform(-1.0, 1.0, 2, 0.0, 1.0, 2)
    xq, wq = gauss_lobatto_jacobi(26, 0.0, 0.0)
    elems = build_elements_2d(mesh, xq, wq, xq, wq, None, [6, 6], [6, 6], F64)
    basis = make_weighted_basis(6, xq, wq, F64)
    u_fn = lambda X: jnp.sin(X[:, 0:1]) * jnp.exp(-0.3 * X[:, 1:2]) + 0.1
    r0 = advdiff_residual(u_fn, elems, basis, basis, 0, 1.0, 0.05)
    r2 = advdiff_residual(u_fn, elems, basis, basis, 2, 1.0, 0.05)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r0), rtol=1e-8, atol=1e-10)

    def loss_of_eps(eps):
        r = advdiff_residual(u_fn, elems, basis, basis, 2, 1.0, eps)
        return variational_loss(r, elems.mask, elems.n_test)

    g = jax.grad(loss_of_eps)(0.05)
    e = 1e-6
    fd = (loss_of_eps(0.05 + e) - loss_of_eps(0.05 - e)) / (2 * e)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


def test_advdiff_form_2_rejects_variable_eps():
    mesh = TensorMesh2D.uniform(-1.0, 1.0, 1, 0.0, 1.0, 1)
    xq, wq = gauss_lobatto_jacobi(8, 0.0, 0.0)
    elems = build_elements_2d(mesh, xq, wq, xq, wq, None, [3], [3], F64)
    basis = make_weighted_basis(3, xq, wq, F64)
    with pytest.raises(ValueError, match="scalar epsilon"):
        advdiff_residual(
            lambda X: X[:, 0:1], elems, basis, basis, 2, 1.0,
            0.05 + 0.01 * elems.x, epsilon_x=0.01 + 0.0 * elems.x,
        )


def test_2d_exact_solution_zero_residual_form0():
    elems, basis = _setup_2d()
    u_fn = lambda X: jnp.sin(jnp.pi * X[:, 0:1]) * jnp.sin(jnp.pi * X[:, 1:2])
    res = poisson2d_residual(u_fn, elems, basis, basis, 0)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-11)


def test_advdiff_forms_agree_and_epsilon_is_differentiable():
    mesh = TensorMesh2D.uniform(-1.0, 1.0, 2, 0.0, 1.0, 2)
    xq, wq = gauss_lobatto_jacobi(24, 0.0, 0.0)
    elems = build_elements_2d(mesh, xq, wq, xq, wq, None, [6, 6], [6, 6], F64)
    basis = make_weighted_basis(6, xq, wq, F64)
    u_fn = lambda X: jnp.sin(X[:, 0:1]) * jnp.exp(-0.3 * X[:, 1:2])
    r0 = advdiff_residual(u_fn, elems, basis, basis, 0, 1.0, 0.05)
    r1 = advdiff_residual(u_fn, elems, basis, basis, 1, 1.0, 0.05)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=1e-9, atol=1e-11)

    def loss_of_eps(eps):
        r = advdiff_residual(u_fn, elems, basis, basis, 1, 1.0, eps)
        return variational_loss(r, elems.mask, elems.n_test)

    g = jax.grad(loss_of_eps)(0.05)
    e = 1e-6
    fd = (loss_of_eps(0.05 + e) - loss_of_eps(0.05 - e)) / (2 * e)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


@pytest.mark.parametrize("bad", [0, 4])
def test_1d_invalid_var_form_raises(bad):
    elems, basis = _setup_1d(n_elem=1, n_quad=5, n_test=2)
    with pytest.raises(ValueError):
        poisson1d_residual(lambda X: X, elems, basis, bad)


def test_advdiff_variable_eps_forms_agree():
    """For a space-dependent eps(x), var_form 1 needs the eps_x u_x IBP term;
    with it both forms test the SAME operator -eps(x) u_xx (agree to 1e-15)."""
    mesh = TensorMesh2D.uniform(-1.0, 1.0, 2, 0.0, 1.0, 2)
    xq, wq = gauss_lobatto_jacobi(24, 0.0, 0.0)
    elems = build_elements_2d(mesh, xq, wq, xq, wq, None, [6, 6], [6, 6], F64)
    basis = make_weighted_basis(6, xq, wq, F64)
    u_fn = lambda X: jnp.sin(X[:, 0:1]) * jnp.exp(-0.3 * X[:, 1:2])
    c0, c1, c2 = 0.05, 0.02, 0.03
    eps = c0 + c1 * elems.x + c2 * elems.x**2
    eps_x = c1 + 2 * c2 * elems.x
    r0 = advdiff_residual(u_fn, elems, basis, basis, 0, 1.0, eps)
    r1 = advdiff_residual(u_fn, elems, basis, basis, 1, 1.0, eps, epsilon_x=eps_x)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=1e-9, atol=1e-12)
