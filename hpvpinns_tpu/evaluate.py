"""Evaluation: dense-grid prediction and error metrics.

Covers the reference's predict()/error instrumentation (C15): dense test-grid
inference (Poisson-1D.py:197-199,315-316; Poisson-2D.py:255-257,418-426;
AdvDiff.py:448-458), global and per-element relative L2 errors
`||u - u_hat||_2 / ||u||_2` (Poisson-1D.py:192 — the reference's
predict_subdomain references a nonexistent attribute and is dead code; this
is the working equivalent).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hpvpinns_tpu.problems.base import Problem


def predict(problem: Problem, params, X: Optional[np.ndarray] = None, batch_size: int = 262144) -> np.ndarray:
    """Network forward on X (default: the problem's dense test grid)."""
    if X is None:
        X = problem.test_points
    X = np.asarray(X)
    dtype = problem.data["xb"].dtype
    # One jitted apply per Problem (cached in extras): repeat predict calls
    # must not re-trace — compiles are expensive on the remote-compile path.
    apply = problem.extras.get("_apply_jit")
    if apply is None:
        apply = jax.jit(lambda p, x: problem.apply(p, x))
        problem.extras["_apply_jit"] = apply
    outs = []
    for i in range(0, X.shape[0], batch_size):
        xb = jnp.asarray(X[i : i + batch_size], dtype=dtype)
        outs.append(np.asarray(apply(params, xb)))
    return np.concatenate(outs)


def rel_l2(u_pred: np.ndarray, u_true: np.ndarray) -> float:
    """Relative L2 error (Poisson-1D.py:192)."""
    u_pred = np.asarray(u_pred).reshape(-1)
    u_true = np.asarray(u_true).reshape(-1)
    return float(np.linalg.norm(u_true - u_pred) / np.linalg.norm(u_true))


def evaluate(problem: Problem, params) -> dict:
    """Standard report: global rel-L2 + max pointwise error on the test grid.

    Multi-component problems (a trailing component axis on test_values, e.g.
    the Navier-Stokes (u, v, p) triple) additionally get per-component
    rel-L2 keys named from extras["component_names"]."""
    u_pred = predict(problem, params)
    u_true = np.asarray(problem.test_values)
    err = np.abs(u_true.reshape(-1) - u_pred.reshape(-1))
    out = {
        "rel_l2": rel_l2(u_pred, u_true),
        "max_abs_err": float(err.max()),
        "mean_abs_err": float(err.mean()),
    }
    if u_true.ndim == 2 and u_true.shape[1] > 1 and u_pred.shape == u_true.shape:
        names = problem.extras.get(
            "component_names", tuple(f"c{i}" for i in range(u_true.shape[1]))
        )
        for i, name in enumerate(names):
            out[f"rel_l2_{name}"] = rel_l2(u_pred[:, i], u_true[:, i])
    return out


def strong_residual(problem: Problem, params, X: Optional[np.ndarray] = None) -> np.ndarray:
    """Pointwise strong-form PDE residual — the reference's `net_f`
    (Poisson-1D.py:150-155: f_pred = -u_xx; Poisson-2D.py:187-194:
    f_pred = u_xx + u_yy; AdvDiff.py:247-253: u_t + V u_x - eps u_xx).

    For the Poisson problems the residual is f_pred - f(X); for AdvDiff it is
    the homogeneous operator value itself (F = 0).  Uses the generic JVP
    derivative engine on the FULL ansatz (problem.apply) so composite
    hard-BC ansatzes are differentiated correctly."""
    from hpvpinns_tpu.ops.fields import scalar_fields_1d, scalar_fields_2d

    if X is None:
        X = problem.test_points
    dtype = problem.data["xb"].dtype
    X = jnp.asarray(np.asarray(X), dtype=dtype)
    u_fn = lambda Z: problem.apply(params, Z)
    if problem.name == "poisson1d":
        f_fn = problem.extras["f_rhs"]
        _, _, uxx = scalar_fields_1d(u_fn, X[:, 0:1])
        return np.asarray(-uxx - jnp.asarray(f_fn(np.asarray(X)), dtype=dtype))
    if problem.name == "poisson2d":
        f_fn = problem.extras["f_rhs"]  # the problem's OWN forcing (custom
        # manufactured solutions override it via build(f_fn=...))
        flds = scalar_fields_2d(u_fn, X[:, 0:1], X[:, 1:2])
        f_pred = flds["uxx"] + flds["uyy"]
        f_true = jnp.asarray(
            f_fn(np.asarray(X[:, 0:1]), np.asarray(X[:, 1:2])), dtype=dtype
        )
        return np.asarray(f_pred - f_true)
    if problem.name == "helmholtz2d":
        f_fn = problem.extras["f_rhs"]
        k_sq = (
            params["pde"]["k_sq"]
            if problem.config.inverse
            else problem.extras["k_sq_true"]
        )
        flds = scalar_fields_2d(u_fn, X[:, 0:1], X[:, 1:2])
        f_pred = flds["uxx"] + flds["uyy"] + k_sq * flds["u"]
        f_true = jnp.asarray(
            f_fn(np.asarray(X[:, 0:1]), np.asarray(X[:, 1:2])), dtype=dtype
        )
        return np.asarray(f_pred - f_true)
    if problem.name == "advdiff":
        cfg = problem.config
        eps_of = problem.extras.get("eps_of")
        eps = eps_of(params, X[:, 0:1]) if eps_of else problem.extras["eps_true"]
        v_of = problem.extras.get("v_of")
        V = v_of(params, X[:, 0:1]) if v_of else cfg.velocity
        flds = scalar_fields_2d(u_fn, X[:, 0:1], X[:, 1:2], first_y_only=True)
        r = flds["uy"] + V * flds["ux"] - eps * flds["uxx"]
        f_fn = problem.extras.get("f_rhs")  # manufactured forcing (F = 0 in
        # the reference, AdvDiff.py:180; build(f_fn=...) overrides)
        if f_fn is not None:
            r = r - jnp.asarray(
                f_fn(np.asarray(X[:, 0:1]), np.asarray(X[:, 1:2])), dtype=dtype
            )
        return np.asarray(r)
    if problem.name == "burgers":
        flds = scalar_fields_2d(u_fn, X[:, 0:1], X[:, 1:2], first_y_only=True)
        return np.asarray(
            flds["uy"] + flds["u"] * flds["ux"] - problem.config.nu * flds["uxx"]
        )
    if problem.name == "advdiff2d":
        from hpvpinns_tpu.ops.fields import scalar_fields_3d

        eps_fn = problem.extras.get("epsilon_fn")
        if problem.config.inverse:
            eps = params["pde"]["epsilon"]
        elif eps_fn is not None:
            # manufactured eps(x, y) MAP: evaluate pointwise (eps_true is its
            # domain MEAN — using it here made the forward-field strong
            # residual wrong; the weak form's eps_x/eps_y terms are IBP
            # bookkeeping of -eps*Lap(u), so no grad-eps term appears in the
            # strong operator — problems/advdiff2d.py::make_forcing)
            eps = jnp.asarray(eps_fn(X[:, 0:1], X[:, 1:2]), dtype=dtype)
        else:
            eps = problem.extras["eps_true"]
        vx, vy = problem.extras["v_of"](params)
        flds = scalar_fields_3d(u_fn, X[:, 0:1], X[:, 1:2], X[:, 2:3])
        r = (
            flds["uz"] + vx * flds["ux"] + vy * flds["uy"]
            - eps * (flds["uxx"] + flds["uyy"])
        )
        f_fn = problem.extras["f_rhs"]
        return np.asarray(
            r - jnp.asarray(
                f_fn(np.asarray(X[:, 0:1]), np.asarray(X[:, 1:2]), np.asarray(X[:, 2:3])),
                dtype=dtype,
            )
        )
    if problem.name == "taylorgreen":
        from hpvpinns_tpu.ops.fields import vector_fields_3d

        nu = problem.extras["nu_of"](params)
        flds = vector_fields_3d(u_fn, X[:, 0:1], X[:, 1:2], X[:, 2:3])
        w, wx, wy, wt = flds["w"], flds["wx"], flds["wy"], flds["wz"]
        wxx, wyy = flds["wxx"], flds["wyy"]
        u, v = w[..., 0], w[..., 1]
        mom_x = (
            wt[..., 0] + u * wx[..., 0] + v * wy[..., 0] + wx[..., 2]
            - nu * (wxx[..., 0] + wyy[..., 0])
        )
        mom_y = (
            wt[..., 1] + u * wx[..., 1] + v * wy[..., 1] + wy[..., 2]
            - nu * (wxx[..., 1] + wyy[..., 1])
        )
        div = wx[..., 0] + wy[..., 1]
        return np.asarray(jnp.concatenate([mom_x, mom_y, div], axis=-1))
    if problem.name == "kovasznay":
        from hpvpinns_tpu.ops.fields import vector_fields_2d

        nu = problem.extras["nu_of"](params)
        flds = vector_fields_2d(u_fn, X[:, 0:1], X[:, 1:2])
        w, wx, wy = flds["w"], flds["wx"], flds["wy"]
        wxx, wyy = flds["wxx"], flds["wyy"]
        u, v = w[..., 0], w[..., 1]
        mom_x = (
            u * wx[..., 0] + v * wy[..., 0] + wx[..., 2]
            - nu * (wxx[..., 0] + wyy[..., 0])
        )
        mom_y = (
            u * wx[..., 1] + v * wy[..., 1] + wy[..., 2]
            - nu * (wxx[..., 1] + wyy[..., 1])
        )
        div = wx[..., 0] + wy[..., 1]
        return np.asarray(jnp.concatenate([mom_x, mom_y, div], axis=-1))
    raise ValueError(f"no strong form registered for problem {problem.name!r}")


def per_element_rel_l2(problem: Problem, params, n_points: Optional[int] = None) -> np.ndarray:
    """Per-subdomain rel-L2 on a fresh per-element grid (the working version
    of the reference's dead predict_subdomain, Poisson-1D.py:185-195),
    generalized to tensor-product 2D/3D meshes.

    Returns [E] in the mesh's flat element order (x-major; reshape with
    `problem.extras["mesh"].shape` for a per-element error map).
    n_points is per axis (defaults: 500 / 40 / 16 for 1D / 2D / 3D)."""
    mesh = problem.extras["mesh"]
    if not hasattr(mesh, "map_points"):
        raise TypeError("per_element_rel_l2 needs a mesh with map_points")
    dim = problem.test_points.shape[1]
    n = n_points or {1: 500, 2: 40, 3: 16}[dim]
    xi = np.linspace(-1.0, 1.0, n)
    if dim == 1:
        coords = (mesh.map_points(xi),)  # [E, P]
    elif dim == 2:
        coords = mesh.map_points(xi, xi)  # ([E, P, P],) x 2
    elif dim == 3:
        coords = mesh.map_points(xi, xi, xi)
    else:
        raise ValueError(f"unsupported dimension {dim}")
    u_true = np.asarray(problem.exact(*coords))
    pts = np.stack([c.reshape(-1) for c in coords], axis=-1)
    shape = coords[0].shape
    u_pred = predict(problem, params, pts)
    if u_pred.size != int(np.prod(shape)):  # trailing component axis (systems)
        shape = shape + (u_pred.size // int(np.prod(shape)),)
    u_pred = u_pred.reshape(shape)
    u_true = u_true.reshape(shape)
    axes = tuple(range(1, u_true.ndim))
    num = np.sqrt(((u_true - u_pred) ** 2).sum(axis=axes))
    den = np.sqrt((u_true**2).sum(axis=axes))
    return num / den
