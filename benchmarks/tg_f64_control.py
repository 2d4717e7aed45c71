"""Taylor-Green f64-CPU control of the chip precision frontier.

The matched-config twin of `taylorgreen_precision` (w50, 3x3x2 space-time
mesh, hard-BC Coons lift, var_form 0, zero-mean-p gauge weight 10, Adam-10k
+ L-BFGS-10k + GN/LM) run at float64 on the host — the same attribution
control the round-4 Kovasznay study ran (MEASUREMENTS.md "f64-CPU controls
of the NS chip frontiers"): is the 2.09e-4 chip frontier f32-limited or
objective-limited?  Reference anchor being superseded: the reference's
f64-everywhere discipline (hp-VPINN Poisson-1D.py:46-51,116).

The GN budget is REDUCED from the chip's 250 accepted steps (the f64 CPU
Jacobian wall: ~5.4k parameter passes through the 3D space-time assembly
per build) — pass --gn-iterations to trade wall for depth; the matrix-free
CG kernel is the default for the same reason the poisson3d preset ships it.

Run from the repo root:  python benchmarks/tg_f64_control.py
Merges a `taylorgreen_precision_f64cpu` row into ACCURACY.json.
"""

import argparse
import json
import os
import sys
import time
from dataclasses import replace

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hpvpinns_tpu as hv  # noqa: E402
from benchmarks.accuracy import merge_into  # noqa: E402
from hpvpinns_tpu.training.gauss_newton import gauss_newton  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gn-iterations", type=int, default=60,
                    help="accepted LM steps (chip twin runs 250; the f64 "
                    "CPU build wall forces a reduced budget, as the "
                    "round-3 poisson2d control did)")
    ap.add_argument("--gn-solve", default="cg",
                    choices=("normal", "qr", "cg", "lsqr"))
    ap.add_argument("--quick", action="store_true",
                    help="1/10 budgets (smoke)")
    ap.add_argument("--warm-q", type=int, default=1,
                    help="divide ONLY the Adam/L-BFGS warm budgets by this "
                    "(the 1-core f64 wall is dominated by the 20k warm "
                    "steps; the GN phase is what the control attributes — "
                    "keep it full and shrink the warm phase, like the "
                    "round-3 partial poisson2d control)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ACCURACY.json"))
    args = ap.parse_args()

    q = 10 if args.quick else 1
    base = hv.taylorgreen_precision()
    cfg = replace(
        base,
        dtype="float64",
        train=replace(
            base.train,
            iterations=base.train.iterations // (q * args.warm_q),
            lbfgs_iterations=base.train.lbfgs_iterations // (q * args.warm_q),
            gn_iterations=0,  # GN run explicitly below for phase timing
        ),
    )
    prob = hv.build(cfg)
    t0 = time.perf_counter()
    res = hv.train(prob, verbose=False)
    warm_wall = time.perf_counter() - t0
    warm = hv.evaluate_problem(prob, res.eval_params)
    print(f"warm phase: {warm_wall:.1f}s rel_l2={warm['rel_l2']:.4e}",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    gn = gauss_newton(
        prob, res.params,
        iterations=max(5, args.gn_iterations // q),
        solve=args.gn_solve, cg_tol=1e-4, cg_maxiter=2000,
        verbose=True,
    )
    gn_wall = time.perf_counter() - t0
    final = hv.evaluate_problem(prob, gn.params)

    rec = {
        "config": "taylorgreen_precision_f64cpu",
        "dtype": "float64",
        "device": "cpu",
        "warm_q": args.warm_q,
        "gn_solve": args.gn_solve,
        "gn_accepted": int(gn.accepted),
        "gn_stopped": gn.stopped,
        "final_loss": float(gn.final_aux["loss"]),
        "warm_wall_s": round(warm_wall, 1),
        "gn_wall_s": round(gn_wall, 1),
        "warm_rel_l2": float(warm["rel_l2"]),
        **{k: float(v) for k, v in final.items()},
    }
    print(json.dumps(rec), flush=True)
    if not args.quick:
        merge_into(args.out, [rec])
        print(f"merged into {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
