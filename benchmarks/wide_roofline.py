"""Wide-point roofline study: is 2.5% MFU a ceiling or a plateau?

Round 4 established the second operating line (`bench.py wide_point`:
W=256 x S=4 seed-ensemble on the 64-element scaled workload, 5.0 TFLOP/s
sustained / 2.53% MFU) and ASSERTED the step stays HBM/launch-bound with
full tiles.  This study quantifies the bound (VERDICT round-4 weak #6):

1. XLA cost analysis now reports bytes accessed alongside FLOPs
   (bench._mfu_fields), so every point carries its own roofline:
   arithmetic intensity, the HBM-vs-MXU per-step lower bound, and
   `roofline_attainment` — the fraction of that bound the measured step
   actually achieves (the remainder is launch/sync overhead no roofline
   sees).
2. The one unexplored axis that RAISES arithmetic intensity is the batch:
   more elements / quadrature points per step amortizes the fixed
   parameter traffic (W=256 3-layer params = 4 x 133k x 4 B ~ 2.1 MB/seed
   vs activations that grow with B).  Sweep n_elem_axis x n_quad at fixed
   W=256 / S=4 / depth 3 and watch MFU + attainment.

Interpretation key: if MFU climbs with batch while attainment holds, the
2.5% was a plateau (the operating line rises and bench.py's wide point
should move to the larger batch); if MFU saturates where the roofline
says HBM, the shape is bandwidth-bound and 2.5% is its ceiling on this
chip (the scaling-book recipe: raise intensity or change the kernel, not
the schedule).

Run from the repo root on the chip:  python benchmarks/wide_roofline.py
One JSON row per point; ~1 min each + compile.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_wide_point  # noqa: E402

# (n_elem_axis, n_quad): batch B = n_elem_axis^2 * n_quad^2 points/seed.
# 8x16 = the shipped wide point (B=16k); the ladder multiplies B by 2.25,
# 4, 9, 16 — past the point where activation traffic dwarfs the basis
# tensors' fixed cost.
POINTS = (
    (8, 16),    # B =  16,384  (the round-4 wide point)
    (12, 16),   # B =  36,864
    (8, 32),    # B =  65,536  (quad-heavy: same elements, 4x points)
    (16, 16),   # B =  65,536  (element-heavy twin)
    (16, 24),   # B = 147,456
    (24, 24),   # B = 331,776
)


def main():
    points = POINTS
    if len(sys.argv) > 1:  # e.g. "8x16,16x16"
        points = tuple(tuple(int(v) for v in p.split("x"))
                       for p in sys.argv[1].split(","))
    for ne, nq in points:
        row = measure_wide_point(n_elem_axis=ne, n_quad=nq)
        row["n_elem_axis"] = ne
        row["n_quad"] = nq
        row["batch_points_per_seed"] = ne * ne * nq * nq
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
