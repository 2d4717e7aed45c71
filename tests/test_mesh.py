"""Element geometry: grids, affine maps, jacobians (reference C10,
Poisson-1D.py:264-273, Poisson-2D.py:369-378)."""

import numpy as np

from hpvpinns_tpu.geometry.mesh import Interval1D, TensorMesh2D


def test_uniform_interval():
    m = Interval1D.uniform(-1.0, 1.0, 4)
    np.testing.assert_allclose(m.grid, [-1, -0.5, 0, 0.5, 1])
    np.testing.assert_allclose(m.jacobians, 0.25)
    assert m.n_elem == 4


def test_nonuniform_interval_reference_3elem():
    """The reference's N_Element==3 special grid (Poisson-1D.py:270-273)."""
    m = Interval1D(grid=np.array([-1.0, -0.1, 0.1, 1.0]))
    np.testing.assert_allclose(m.jacobians, [0.45, 0.1, 0.45])
    xi = np.array([-1.0, 0.0, 1.0])
    mapped = m.map_points(xi)
    np.testing.assert_allclose(mapped[1], [-0.1, 0.0, 0.1])
    np.testing.assert_allclose(mapped[:, 0], m.grid[:-1])
    np.testing.assert_allclose(mapped[:, -1], m.grid[1:])


def test_locate():
    m = Interval1D.uniform(0.0, 1.0, 5)
    np.testing.assert_array_equal(m.locate(np.array([0.05, 0.55, 0.999, 1.0])), [0, 2, 4, 4])


def test_tensor_mesh_flat_order_is_x_major():
    """Flat element order e = ex*Ey + ey matches the reference's
    `for ex: for ey:` loop nesting (Poisson-2D.py:69-70)."""
    m = TensorMesh2D.uniform(0.0, 2.0, 2, 0.0, 3.0, 3)
    assert m.n_elem == 6
    jx, jy = m.jacobians()
    np.testing.assert_allclose(jx, [0.5] * 6)
    np.testing.assert_allclose(jy, [0.5] * 6)
    xi = np.array([0.0])
    eta = np.array([0.0])
    X, Y = m.map_points(xi, eta)  # [6, 1, 1] element centers
    np.testing.assert_allclose(X[:, 0, 0], [0.5, 0.5, 0.5, 1.5, 1.5, 1.5])
    np.testing.assert_allclose(Y[:, 0, 0], [0.5, 1.5, 2.5, 0.5, 1.5, 2.5])


def test_tensor_mesh_point_layout_y_slow():
    """[E, Qy, Qx] with y on the slow axis (meshgrid convention,
    Poisson-2D.py:362-364)."""
    m = TensorMesh2D.uniform(-1.0, 1.0, 1, -1.0, 1.0, 1)
    xi = np.array([-0.5, 0.5])
    eta = np.array([-0.25, 0.0, 0.25])
    X, Y = m.map_points(xi, eta)
    assert X.shape == (1, 3, 2)
    np.testing.assert_allclose(X[0, 0], [-0.5, 0.5])
    np.testing.assert_allclose(Y[0, :, 0], [-0.25, 0.0, 0.25])
