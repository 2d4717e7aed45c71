"""Width x seed-ensemble MFU composition study (round-4 VERDICT ask #3).

Width scaling and seed stacking each measured multiplicative headroom in
isolation (MEASUREMENTS.md width-scaling / ensemble tables); the round-3
attempt to measure their COMPOSITION died to a relay outage.  This sweep
measures the composed operating points W in {128, 256} x S in {4, 8} on the
scaled 64-element Poisson-2D bench workload (BASELINE.json config 5 geometry)
and prints one JSON row per point: steps/s, seed-steps/s, residual evals/s,
and the XLA-cost-analysis MFU of the compiled ensemble step.

Run from the repo root on the chip:  python benchmarks/width_ensemble.py
(optionally WIDTHS=128,256 SEEDS=4,8 env overrides).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_wide_point  # noqa: E402


def main():
    widths = [int(w) for w in os.environ.get("WIDTHS", "128,256").split(",")]
    seed_counts = [int(s) for s in os.environ.get("SEEDS", "4,8").split(",")]
    rows = []
    for w in widths:
        for s in seed_counts:
            row = measure_wide_point(width=w, seeds=s)
            rows.append(row)
            print(json.dumps({k: round(v, 6) if isinstance(v, float) else v
                              for k, v in row.items()}), flush=True)
    best = max(rows, key=lambda r: r.get("mfu_vs_peak", 0.0))
    print(json.dumps({"best_point": {"width": best["width"], "seeds": best["seeds"],
                                     "mfu_vs_peak": best.get("mfu_vs_peak"),
                                     "seed_steps_per_sec": best["seed_steps_per_sec"]}}),
          flush=True)


if __name__ == "__main__":
    main()
