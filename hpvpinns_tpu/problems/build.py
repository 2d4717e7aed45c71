"""Offline assembly: host-side float64 precomputation of basis tensors,
element geometry, and RHS projections.

This preserves the reference's single most important structural fact: test
functions, quadrature rules and RHS projections are numpy constants computed
once before training (Poisson-1D.py:261-294, Poisson-2D.py:358-414); only the
network forward + derivatives is live compute.  Everything returned here is a
device-ready pytree (Elements1D/2D/3D, Basis1D) in the training dtype, assembled
in float64 for accuracy regardless of the on-device dtype.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hpvpinns_tpu.geometry.mesh import Interval1D, TensorMesh2D
from hpvpinns_tpu.ops.assembly import Basis1D, Elements1D, Elements2D
from hpvpinns_tpu.spectral.basis import make_test_basis


def make_weighted_basis(n_test: int, xq: np.ndarray, wq: np.ndarray, dtype) -> Basis1D:
    """Basis1D with quadrature weights folded in: Wphi[n,q] = w_q phi_n(xi_q)."""
    tb = make_test_basis(n_test, xq)
    w = np.asarray(wq, dtype=np.float64).reshape(1, -1)
    return Basis1D(
        wphi=jnp.asarray(tb.phi * w, dtype=dtype),
        wdphi=jnp.asarray(tb.dphi * w, dtype=dtype),
        wd2phi=jnp.asarray(tb.d2phi * w, dtype=dtype),
        dphi_b=jnp.asarray(tb.dphi_b, dtype=dtype),
    )


def _test_mask(n_test_per_elem: np.ndarray, n_max: int):
    """mask[e, n] = 1.0 for n < n_test[e]; plus float counts [E]."""
    nt = np.asarray(n_test_per_elem, dtype=np.int64)
    mask = (np.arange(n_max)[None, :] < nt[:, None]).astype(np.float64)
    return mask, nt.astype(np.float64)


def build_elements_1d(
    mesh: Interval1D,
    xq: np.ndarray,
    wq: np.ndarray,
    f_fn,
    n_test_per_elem,
    dtype,
) -> Elements1D:
    """1D element batch with RHS projections
    F[e, n] = jac_e * sum_q w_q f(x^e_q) phi_n(xi_q)  (Poisson-1D.py:277-291).
    """
    xq = np.asarray(xq, dtype=np.float64).reshape(-1)
    wq = np.asarray(wq, dtype=np.float64).reshape(-1)
    n_test_per_elem = np.asarray(n_test_per_elem, dtype=np.int64)
    n_max = int(n_test_per_elem.max())
    tb = make_test_basis(n_max, xq)

    x_elem = mesh.map_points(xq)  # [E, Q]
    jac = mesh.jacobians  # [E]
    f_vals = f_fn(x_elem)  # [E, Q]
    f_proj = jac[:, None] * np.einsum("nq,eq->en", tb.phi * wq[None, :], f_vals)
    mask, n_test = _test_mask(n_test_per_elem, n_max)
    f_proj = f_proj * mask

    return Elements1D(
        x=jnp.asarray(x_elem, dtype=dtype),
        bounds=jnp.asarray(mesh.element_bounds(), dtype=dtype),
        jac=jnp.asarray(jac, dtype=dtype),
        f_proj=jnp.asarray(f_proj, dtype=dtype),
        mask=jnp.asarray(mask, dtype=dtype),
        n_test=jnp.asarray(n_test, dtype=dtype),
    )


def build_elements_2d(
    mesh: TensorMesh2D,
    xq: np.ndarray,
    wq_x: np.ndarray,
    yq: np.ndarray,
    wq_y: np.ndarray,
    f_fn,
    n_test_x_per_elem,
    n_test_y_per_elem,
    dtype,
) -> Elements2D:
    """Tensor-product element batch with RHS projections
    F[e, k, r] = jac_e * sum_{qy,qx} wx wy f(x, y) phi_r(xi) phi_k(eta)
    (Poisson-2D.py:386-414; flat element order e = ex*Ey + ey matches the
    reference's loop nesting :386-387).  f_fn=None (AdvDiff) gives F = 0
    (AdvDiff.py:180).
    """
    xq = np.asarray(xq, dtype=np.float64).reshape(-1)
    yq = np.asarray(yq, dtype=np.float64).reshape(-1)
    ntx = np.asarray(n_test_x_per_elem, dtype=np.int64)
    nty = np.asarray(n_test_y_per_elem, dtype=np.int64)
    n_max_x, n_max_y = int(ntx.max()), int(nty.max())
    tbx = make_test_basis(n_max_x, xq)
    tby = make_test_basis(n_max_y, yq)

    X, Y = mesh.map_points(xq, yq)  # [E, Qy, Qx]
    jx, jy = mesh.jacobians()  # [E], [E]
    E = mesh.n_elem
    Ex, Ey = mesh.shape

    wphix = tbx.phi * np.asarray(wq_x, dtype=np.float64).reshape(1, -1)  # [R, Qx]
    wphiy = tby.phi * np.asarray(wq_y, dtype=np.float64).reshape(1, -1)  # [K, Qy]
    if f_fn is None:
        f_proj = np.zeros((E, n_max_y, n_max_x))
    else:
        f_vals = f_fn(X, Y)  # [E, Qy, Qx]
        t = np.einsum("rx,eyx->eyr", wphix, f_vals)
        f_proj = (jx * jy)[:, None, None] * np.einsum("ky,eyr->ekr", wphiy, t)

    # Per-element (k, r) mask from the per-axis test counts (x-major flat order).
    mask_x = (np.arange(n_max_x)[None, :] < ntx[:, None]).astype(np.float64)  # [Ex, R]
    mask_y = (np.arange(n_max_y)[None, :] < nty[:, None]).astype(np.float64)  # [Ey, K]
    mask = (
        mask_y[None, :, :, None] * mask_x[:, None, None, :]
    ).reshape(E, n_max_y, n_max_x)
    n_test = (ntx[:, None] * nty[None, :]).reshape(E).astype(np.float64)
    f_proj = f_proj * mask

    bounds_x, bounds_y = mesh.element_bounds()
    return Elements2D(
        x=jnp.asarray(X, dtype=dtype),
        y=jnp.asarray(Y, dtype=dtype),
        bounds_x=jnp.asarray(bounds_x, dtype=dtype),
        bounds_y=jnp.asarray(bounds_y, dtype=dtype),
        jac_x=jnp.asarray(jx, dtype=dtype),
        jac_y=jnp.asarray(jy, dtype=dtype),
        f_proj=jnp.asarray(f_proj, dtype=dtype),
        mask=jnp.asarray(mask, dtype=dtype),
        n_test=jnp.asarray(n_test, dtype=dtype),
    )


def build_elements_3d(
    mesh,
    xq: np.ndarray,
    wq: np.ndarray,
    f_fn,
    n_test_x,
    n_test_y,
    n_test_z,
    dtype,
):
    """3D element batch with RHS projections (volumetric generalization of
    build_elements_2d; same quadrature rule on every axis).

    F[e, m, k, r] = jac_e * sum_q wx wy wz f(x,y,z) phi_r(xi) phi_k(eta) phi_m(zeta)

    n_test_* may be ints (uniform) or per-axis-element arrays
    (p-nonuniformity, masked exactly like the 1D/2D builders).
    """
    from hpvpinns_tpu.ops.assembly import Elements3D  # avoids a cycle at import time

    xq = np.asarray(xq, dtype=np.float64).reshape(-1)
    wq = np.asarray(wq, dtype=np.float64).reshape(-1)
    Ex, Ey, Ez = mesh.shape
    ntx = np.broadcast_to(np.asarray(n_test_x, dtype=np.int64), (Ex,))
    nty = np.broadcast_to(np.asarray(n_test_y, dtype=np.int64), (Ey,))
    ntz = np.broadcast_to(np.asarray(n_test_z, dtype=np.int64), (Ez,))
    n_max_x, n_max_y, n_max_z = int(ntx.max()), int(nty.max()), int(ntz.max())
    tbx = make_test_basis(n_max_x, xq)
    tby = make_test_basis(n_max_y, xq)
    tbz = make_test_basis(n_max_z, xq)

    X, Y, Z = mesh.map_points(xq, xq, xq)  # [E, Qz, Qy, Qx]
    jx, jy, jz = mesh.jacobians()
    E = mesh.n_elem

    w = wq[None, :]
    if f_fn is None:
        f_proj = np.zeros((E, n_max_z, n_max_y, n_max_x))
    else:
        f_vals = f_fn(X, Y, Z)
        t = np.einsum("rx,ezyx->ezyr", tbx.phi * w, f_vals)
        t = np.einsum("ky,ezyr->ezkr", tby.phi * w, t)
        f_proj = (jx * jy * jz)[:, None, None, None] * np.einsum(
            "mz,ezkr->emkr", tbz.phi * w, t
        )
    # mask[e, m, k, r] over flat element order e = (ex*Ey + ey)*Ez + ez
    mx = (np.arange(n_max_x)[None, :] < ntx[:, None]).astype(np.float64)  # [Ex, R]
    my = (np.arange(n_max_y)[None, :] < nty[:, None]).astype(np.float64)  # [Ey, K]
    mz = (np.arange(n_max_z)[None, :] < ntz[:, None]).astype(np.float64)  # [Ez, M]
    mask = np.einsum("cm,bk,ar->abcmkr", mz, my, mx).reshape(E, n_max_z, n_max_y, n_max_x)
    n_test = (ntx[:, None, None] * nty[None, :, None] * ntz[None, None, :]).reshape(E).astype(np.float64)
    f_proj = f_proj * mask

    return Elements3D(
        x=jnp.asarray(X, dtype=dtype),
        y=jnp.asarray(Y, dtype=dtype),
        z=jnp.asarray(Z, dtype=dtype),
        jac_x=jnp.asarray(jx, dtype=dtype),
        jac_y=jnp.asarray(jy, dtype=dtype),
        jac_z=jnp.asarray(jz, dtype=dtype),
        f_proj=jnp.asarray(f_proj, dtype=dtype),
        mask=jnp.asarray(mask, dtype=dtype),
        n_test=jnp.asarray(n_test, dtype=dtype),
    )
