"""Results records — the reference's persistence behavior.

AdvDiff dumps a .mat record of test grids, predictions, loss/epsilon history
and train time via scipy.io.savemat (AdvDiff.py:500-508).  `save_record`
reproduces that artifact (``.mat`` when scipy is present, always also a
compressed ``.npz``) for any problem, and `load_record` reads either back.
"""

from __future__ import annotations

import os

import numpy as np

from hpvpinns_tpu.evaluate import predict
from hpvpinns_tpu.problems.base import Problem
from hpvpinns_tpu.training.trainer import TrainResult


def build_record(problem: Problem, result: TrainResult) -> dict:
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


def save_record(problem: Problem, result: TrainResult, path: str) -> list:
    """Write <path>.npz (always) and <path>.mat (if scipy is available).

    Returns the list of files written.
    """
    rec = build_record(problem, result)
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


def load_record(path: str) -> dict:
    if path.endswith(".mat"):
        import scipy.io

        return scipy.io.loadmat(path)
    with np.load(path) as data:
        return dict(data)
