"""h/p-refinement sweeps — the hp-convergence studies of the method.

The reference exposes h-refinement (element count / the non-uniform 3-element
grid, Poisson-1D.py:264-273) and p-refinement (per-element test-function
counts, Poisson-1D.py:268, Poisson-2D.py:284-285) as constants to edit by
hand; the papers' headline plots are error-vs-h and error-vs-p curves.  This
module runs those sweeps programmatically (BASELINE.json config 2:
"Poisson-1D hp-VPINN: 4 subdomains, ... h/p-refinement sweep").

Each sweep point retrains from the same seed and reports rel-L2 against the
analytic solution plus throughput, as one record; `plot_sweep` renders the
log-error convergence curves.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence

import hpvpinns_tpu as hv


def _with(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


def _run_point(cfg, train_cfg, mesh=None, verbose=False) -> dict:
    from hpvpinns_tpu.evaluate import per_element_rel_l2

    prob = hv.build(cfg)
    res = hv.train(prob, train_cfg, mesh=mesh, verbose=verbose)
    metrics = hv.evaluate_problem(prob, res.eval_params)
    return {
        "rel_l2": metrics["rel_l2"],
        "max_abs_err": metrics["max_abs_err"],
        "final_loss": res.final_aux.get("loss"),
        "steps_per_sec": res.steps_per_sec,
        "iterations": res.iterations_run,
        # the hp story per point: where in the mesh the error lives
        # (reference intent: predict_subdomain, Poisson-1D.py:185-195)
        "per_element_rel_l2": [float(v) for v in per_element_rel_l2(prob, res.eval_params)],
    }


def h_sweep(
    base_cfg,
    n_elements: Sequence[int],
    train_cfg: Optional[hv.TrainConfig] = None,
    mesh=None,
    verbose: bool = False,
):
    """Refine in h (element count), holding the per-element order fixed."""
    records = []
    for ne in n_elements:
        if isinstance(base_cfg, hv.Poisson1DConfig):
            cfg = _with(base_cfg, n_elements=ne, grid=None)
        elif isinstance(base_cfg, hv.Poisson2DConfig):
            cfg = _with(base_cfg, n_elements_x=ne, n_elements_y=ne)
        else:
            raise TypeError(f"h_sweep supports Poisson configs, got {type(base_cfg).__name__}")
        rec = {"axis": "h", "n_elements": ne, **_run_point(cfg, train_cfg, mesh, verbose)}
        records.append(rec)
    return records


def p_sweep(
    base_cfg,
    n_tests: Sequence[int],
    train_cfg: Optional[hv.TrainConfig] = None,
    mesh=None,
    verbose: bool = False,
):
    """Refine in p (test-function order), holding the element grid fixed."""
    records = []
    for nt in n_tests:
        if isinstance(base_cfg, hv.Poisson1DConfig):
            cfg = _with(base_cfg, n_test=nt)
        elif isinstance(base_cfg, hv.Poisson2DConfig):
            cfg = _with(base_cfg, n_test_x=nt, n_test_y=nt)
        else:
            raise TypeError(f"p_sweep supports Poisson configs, got {type(base_cfg).__name__}")
        rec = {"axis": "p", "n_test": nt, **_run_point(cfg, train_cfg, mesh, verbose)}
        records.append(rec)
    return records


def save_sweep(records, path: str):
    with open(path, "w") as f:
        json.dump(records, f, indent=1)
    return path


def plot_sweep(records, outdir: str, fmt: str = "pdf"):
    """Log-scale rel-L2 convergence curve over the swept axis."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(outdir, exist_ok=True)
    axis = records[0]["axis"]
    key = "n_elements" if axis == "h" else "n_test"
    xs = [r[key] for r in records]
    ys = [r["rel_l2"] for r in records]
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.loglog(xs, ys, "o-")
    ax.set_xlabel("number of elements" if axis == "h" else "test functions per element")
    ax.set_ylabel("relative $L_2$ error")
    ax.grid(True, which="both", alpha=0.4)
    path = os.path.join(outdir, f"{axis}_convergence.{fmt}")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path
