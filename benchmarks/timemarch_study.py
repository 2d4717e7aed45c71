"""Time-marching study: slab-sequential solves vs the single space-time net.

training/timemarch.py splits the horizon into S slabs and hands the network
state across each interface (no reference analog — the reference trains one
space-time domain per run, AdvDiff.py:35-53).  This study answers the two
questions the feature raises, with EQUAL-TOTAL-BUDGET controls:

1. At the benchmark horizon (T = 1), does marching beat the single solve
   when both spend the same total time elements and the same total
   optimizer iterations?  (single arm gets n_elements_t = S so the test /
   quadrature budgets match the S slabs' exactly)
2. On a LONGER horizon (T = 2, advdiff), where a single net must spread its
   capacity over twice the domain, does marching recover accuracy?

Each marched point also runs the ic="exact" control (every slab restarts
from the analytic solution), which splits the marched error into per-slab
representation error vs interface-propagation error.

Run from the repo root on the chip: python benchmarks/timemarch_study.py
(ARMS=adv1,adv2,burg env override to subset).  One JSON row per arm.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hpvpinns_tpu as hv  # noqa: E402


def _split_train(train, s):
    """Per-slab budget = total / S for every phase (accepted GN steps
    included), so the march spends what the single solve spends."""
    return dataclasses.replace(
        train,
        iterations=max(1, train.iterations // s),
        lbfgs_iterations=max(0, train.lbfgs_iterations // s),
        gn_iterations=max(0, train.gn_iterations // s),
        check_every=max(1, train.check_every // s),
    )


def _advdiff_cfg(t_final: float, n_et: int) -> "hv.AdvDiffConfig":
    """The forward-precision operating point (layer_feature + clustered
    x-grid + QR-LM, config.advdiff_forward_precision) with the time-element
    count as the study variable."""
    base = hv.config.advdiff_forward_precision()
    return dataclasses.replace(base, t_final=t_final, n_elements_t=n_et)


def _tg_cfg(n_et: int) -> "hv.TaylorGreenConfig":
    """The quality point (soft-BC already — the hard-BC lift interpolates
    the analytic t=0 face, so it cannot march), time elements as the study
    variable, zero-mean gauge penalty on (the measured round-4 winner)."""
    base = hv.config.taylorgreen_quality()
    return dataclasses.replace(base, n_elements_t=n_et, p_zero_mean_weight=10.0)


def _burgers_cfg(n_et: int) -> "hv.BurgersConfig":
    """The quality point's front-clustered grid, soft-BC (the lifted ansatz
    interpolates the analytic t=0 IC, so marching requires soft BC; both
    arms use it for a like-for-like comparison)."""
    base = hv.config.burgers_quality()
    return dataclasses.replace(
        base, hard_bc=False, n_elements_t=n_et,
        train=dataclasses.replace(base.train, gn_iterations=40, gn_solve="qr"),
    )


def _burgers_hb_cfg(n_et: int) -> "hv.BurgersConfig":
    """The RECOMMENDED burgers config — the hard-BC quality preset (8.6e-3
    single-solve) — marchable since round 5: each slab's lift interpolates
    the PREDICTED interface state (problems/burgers.py::make_interface_lift
    via timemarch._hard_bc_slab_kwargs), so the march arms compare against
    the measured-best ansatz instead of the weak soft-BC family."""
    base = hv.config.burgers_quality()
    return dataclasses.replace(
        base, n_elements_t=n_et,
        train=dataclasses.replace(base.train, gn_iterations=40, gn_solve="qr"),
    )


def _tg_hb_cfg(n_et: int) -> "hv.TaylorGreenConfig":
    """Hard-BC NS system march: the quality point with the space-time Coons
    lift; slabs interpolate the predicted (u, v) interface face
    (problems/taylorgreen.py::coons_lift_spacetime_jnp g_ic_fn hook)."""
    base = hv.config.taylorgreen_quality()
    return dataclasses.replace(base, hard_bc=True, n_elements_t=n_et,
                               p_zero_mean_weight=10.0)


def _emit(row):
    """Print the row the moment it exists: a later arm crashing (or the
    process being killed) must not lose completed measurements — the
    round-5 burg_hb first run lost its single+net rows exactly this way."""
    print(json.dumps(row), flush=True)
    return row


def run_single(name, cfg):
    prob = hv.build(cfg)
    t0 = time.perf_counter()
    res = hv.train(prob, verbose=False)
    wall = time.perf_counter() - t0
    m = hv.evaluate_problem(prob, res.eval_params)
    return _emit({"arm": name, "mode": "single", "slabs": 1,
                  "wall_s": round(wall, 1),
                  **{k: float(v) for k, v in m.items()}})


def run_march(name, cfg, s, ic="net", weights=None):
    scfg = dataclasses.replace(
        cfg,
        n_elements_t=max(1, cfg.n_elements_t // s),
        train=_split_train(cfg.train, s),
    )
    res = hv.time_march(scfg, n_slabs=s, ic=ic, budget_weights=weights,
                        verbose=False)
    row = {"arm": name, "mode": f"march-{ic}", "slabs": s,
           "wall_s": round(res.wall_time_s, 1),
           "per_slab_rel_l2": [round(m["rel_l2"], 6) for m in res.per_slab],
           **{k: float(v) for k, v in res.metrics.items()}}
    if weights is not None:
        row["budget_weights"] = list(weights)
    return _emit(row)


ARMS = {
    # benchmark horizon, equal totals: 4 time elements / 1500 Adam / 150 GN
    "adv1": lambda: [
        run_single("advdiff T=1", _advdiff_cfg(1.0, 4)),
        run_march("advdiff T=1", _advdiff_cfg(1.0, 4), 4, ic="net"),
        run_march("advdiff T=1", _advdiff_cfg(1.0, 4), 4, ic="exact"),
    ],
    # doubled horizon, equal totals: 8 time elements over [0, 2]
    "adv2": lambda: [
        run_single("advdiff T=2", _advdiff_cfg(2.0, 8)),
        run_march("advdiff T=2", _advdiff_cfg(2.0, 8), 4, ic="net"),
        run_march("advdiff T=2", _advdiff_cfg(2.0, 8), 4, ic="exact"),
    ],
    # nonlinear front, soft-BC both arms: 2 time elements / 10k+20k+40
    "burg": lambda: [
        run_single("burgers T=1", _burgers_cfg(2)),
        run_march("burgers T=1", _burgers_cfg(2), 2, ic="net"),
        run_march("burgers T=1", _burgers_cfg(2), 2, ic="exact"),
    ],
    # QUADRUPLED horizon: does the single space-time net finally run out
    # of capacity at T=4 (16 time elements), and does marching recover it?
    "adv4": lambda: [
        run_single("advdiff T=4", _advdiff_cfg(4.0, 16)),
        run_march("advdiff T=4", _advdiff_cfg(4.0, 16), 4, ic="net"),
        run_march("advdiff T=4", _advdiff_cfg(4.0, 16), 4, ic="net",
                  weights=(2.2, 0.8, 0.5, 0.5)),
    ],
    # budget-weighted march (same totals, front-loaded): the uniform-split
    # arms put the marched error on slab 1, which owns the IC transient —
    # does re-allocating iterations there close the gap?
    "advw": lambda: [
        run_march("advdiff T=1", _advdiff_cfg(1.0, 4), 4, ic="net",
                  weights=(2.2, 0.8, 0.5, 0.5)),
        run_march("advdiff T=1", _advdiff_cfg(1.0, 4), 4, ic="exact",
                  weights=(2.2, 0.8, 0.5, 0.5)),
    ],
    # unsteady NS system, full (u, v, p) interface handoff: 2 time
    # elements / Adam10k + LBFGS10k totals
    "tg": lambda: [
        run_single("taylorgreen T=1", _tg_cfg(2)),
        run_march("taylorgreen T=1", _tg_cfg(2), 2, ic="net"),
        run_march("taylorgreen T=1", _tg_cfg(2), 2, ic="exact"),
    ],
    # HARD-BC marching (round 5): the round-4 burgers march arms were
    # soft-BC only and landed 15-40x above the hard-BC single solve; the
    # interface-state lift lets the measured-best ansatz march.  Equal
    # totals vs the hard-BC single arm (the recommended config).
    "burg_hb": lambda: [
        run_single("burgers T=1 hard-BC", _burgers_hb_cfg(2)),
        run_march("burgers T=1 hard-BC", _burgers_hb_cfg(2), 2, ic="net"),
        run_march("burgers T=1 hard-BC", _burgers_hb_cfg(2), 2, ic="exact"),
    ],
    # hard-BC NS system march: does the round-4 "marching WINS on the NS
    # system" verdict survive the stronger (lifted) single arm?
    "tg_hb": lambda: [
        run_single("taylorgreen T=1 hard-BC", _tg_hb_cfg(2)),
        run_march("taylorgreen T=1 hard-BC", _tg_hb_cfg(2), 2, ic="net"),
        run_march("taylorgreen T=1 hard-BC", _tg_hb_cfg(2), 2, ic="exact"),
    ],
}


def main():
    arms = os.environ.get("ARMS", "adv1,adv2,burg,advw,tg").split(",")
    for arm in arms:
        ARMS[arm.strip()]()  # rows stream from _emit as each run completes


if __name__ == "__main__":
    main()
