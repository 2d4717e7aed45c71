"""Results records — the reference's persistence behavior.

AdvDiff dumps a .mat record of test grids, predictions, loss/epsilon history
and train time via scipy.io.savemat (AdvDiff.py:500-508).  `save_record`
reproduces that artifact (``.mat`` when scipy is present, always also a
compressed ``.npz``) for any problem, and `load_record` reads either back.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from jax.tree_util import tree_flatten as _tree_flatten
from jax.tree_util import tree_unflatten as _tree_unflatten

from hpvpinns_tpu.evaluate import predict
from hpvpinns_tpu.problems.base import Problem
from hpvpinns_tpu.training.trainer import TrainResult


def build_record(problem: Problem, result: TrainResult,
                 include_params: bool = False) -> dict:
    rec = {
        "x_test": problem.test_points,
        "u_test": problem.test_values,
        "u_pred": predict(problem, result.eval_params),
        "total_time_train": np.asarray(result.wall_time_s),
        "iterations": result.history["iteration"],
    }
    for key, val in result.history.items():
        if key != "iteration":
            rec[f"history_{key}"] = val
    if include_params:
        # flattened parameter leaves so the trained network itself is
        # restorable from the record (the reference's .mat keeps only
        # predictions, AdvDiff.py:500-508 — a record without the weights
        # cannot seed a polish/serving step; see params_from_record)
        leaves, _ = _tree_flatten(result.eval_params)
        for i, leaf in enumerate(leaves):
            rec[f"param_leaf_{i}"] = np.asarray(leaf)
    mesh = problem.extras.get("mesh")
    if mesh is not None:
        if hasattr(mesh, "axis_x"):  # tensor-product mesh
            rec["grid_x"] = mesh.axis_x.grid
            rec["grid_y"] = mesh.axis_y.grid
            if hasattr(mesh, "axis_z"):
                rec["grid_z"] = mesh.axis_z.grid
        else:
            rec["grid"] = mesh.grid
    return rec


def save_record(problem: Problem, result: TrainResult, path: str,
                include_params: bool = False) -> list:
    """Write <path>.npz (always) and <path>.mat (if scipy is available).

    Returns the list of files written.  ``include_params=True`` adds the
    flattened parameter leaves (``param_leaf_i``) so the record can seed
    :func:`params_from_record`.
    """
    rec = build_record(problem, result, include_params=include_params)
    base, ext = os.path.splitext(path)
    if ext in (".mat", ".npz"):
        path = base
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    written = []
    np.savez_compressed(path + ".npz", **rec)
    written.append(path + ".npz")
    try:
        import scipy.io

        scipy.io.savemat(path + ".mat", rec)
        written.append(path + ".mat")
    except ImportError:
        pass
    return written


def params_from_record(problem: Problem, record: dict):
    """Rebuild the trained parameter pytree from a record written with
    ``include_params=True`` (leaf order is the problem's own flatten
    order, so the record is portable across processes but tied to the
    config that built the problem)."""
    keys = sorted(
        (k for k in record if k.startswith("param_leaf_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    if not keys:
        raise ValueError(
            "record has no param_leaf_* entries "
            "(written without include_params=True)"
        )
    template = problem.init_params(jax.random.key(0))
    leaves, treedef = _tree_flatten(template)
    if len(keys) != len(leaves):
        raise ValueError(
            f"record has {len(keys)} param leaves, problem expects "
            f"{len(leaves)} — config mismatch"
        )
    return _tree_unflatten(
        treedef,
        [np.asarray(record[k]).reshape(np.shape(l)).astype(
            np.asarray(l).dtype) for k, l in zip(keys, leaves)],
    )


def load_record(path: str) -> dict:
    if path.endswith(".mat"):
        import scipy.io

        return scipy.io.loadmat(path)
    with np.load(path) as data:
        return dict(data)
