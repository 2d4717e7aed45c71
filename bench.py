"""Benchmark harness.

Measures training-step throughput on the scaled hp-VPINN Poisson-2D workload
(BASELINE.json config 5: 64-element 2D Poisson, high-order quadrature) and
reports it as quadrature-point residual evaluations per second per chip — the
hot-path unit of work (network forward + nested JVPs + weighted-basis
contraction at one quadrature point of one element).

The reference publishes no numbers (BASELINE.md); the baseline is this same
workload measured with matched hyperparameters on one CPU host
(benchmarks/baseline_cpu.json, the stand-in for the TF1-CPU original, which
predates installable TF).  `vs_baseline` is the speedup ratio against the
float64 CPU row — the reference runs float64 on a CPU-pinned session
(Poisson-1D.py:46-51,105,116), so that is the apples-to-apples denominator;
the stricter float32-CPU cross-ratio is reported on stderr.

Prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_bench_problem():
    from hpvpinns_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    import hpvpinns_tpu as hv

    # 64-element, 16x16-point quadrature, 10x10 test functions per element.
    cfg = hv.poisson2d_scaled(n_elem_axis=8, n_quad=16, n_test=10)
    return hv.build(cfg)


def measure_steps_per_sec(steps: int = 200, warmup: int = 20, trials: int = 5) -> dict:
    import jax

    import hpvpinns_tpu as hv

    from hpvpinns_tpu.training.trainer import _build_chunk, make_optimizer

    prob = build_bench_problem()
    params = prob.init_params(jax.random.key(0))
    opt = make_optimizer(hv.TrainConfig())
    opt_state = opt.init(params)

    # Measure the trainer's actual unit of work: a lax.scan chunk of
    # `chunk_len` optimizer steps per launch (training/trainer.py).
    chunk_len = 10
    chunk = _build_chunk(prob.loss_fn, opt, chunk_len)

    data = prob.data
    try:
        params, opt_state, aux = chunk(params, opt_state, data)
    except Exception as err:
        # scan-of-steps compile crash on some XLA builds (MEASUREMENTS.md):
        # fall back to pipelined single-step jit, using the trainer's own
        # predicate so the two paths can never drift apart.
        from hpvpinns_tpu.training.trainer import _build_stepwise_chunk, _is_compile_crash

        if not _is_compile_crash(err):
            raise

        chunk = _build_stepwise_chunk(prob.loss_fn, opt, chunk_len)
        params, opt_state, aux = chunk(params, opt_state, data)
    for _ in range(max(1, warmup // chunk_len - 1)):
        params, opt_state, aux = chunk(params, opt_state, data)
    loss = aux["loss"]
    jax.block_until_ready(loss)
    float(loss)  # pay the backend's one-time first-readback handshake here

    # Best of `trials` pipelined windows: the tunneled device transport has
    # high wall-clock variance, so the best window is the honest device rate.
    best_dt = float("inf")
    n_chunks = max(1, steps // chunk_len)
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            params, opt_state, aux = chunk(params, opt_state, data)
        jax.block_until_ready(aux["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)
    steps = n_chunks * chunk_len
    loss = aux["loss"]

    el = prob.data["elements"]
    n_elem = el.x.shape[0]
    n_qpts = el.x.shape[1] * el.x.shape[2]
    steps_per_sec = steps / best_dt
    return {
        "steps_per_sec": steps_per_sec,
        "residual_evals_per_sec": steps_per_sec * n_elem * n_qpts,
        "n_elem": n_elem,
        "n_quad_pts_per_elem": n_qpts,
        "final_loss": float(loss),
        "device": str(jax.devices()[0]),
    }


def main():
    result = measure_steps_per_sec()

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline_cpu.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        # float64 row = the reference's own numerics (see module docstring);
        # legacy flat layout supported for older snapshots.
        base = (baseline.get("float64") or baseline).get("residual_evals_per_sec")
        if base:
            vs_baseline = result["residual_evals_per_sec"] / base
        base32 = (baseline.get("float32") or {}).get("residual_evals_per_sec")
        if base32:
            result["vs_float32_cpu"] = result["residual_evals_per_sec"] / base32

    print(
        json.dumps(
            {
                "metric": "poisson2d_scaled_residual_evals_per_sec_per_chip",
                "value": result["residual_evals_per_sec"],
                "unit": "quadrature-point residual evals/s/chip",
                "vs_baseline": vs_baseline,
            }
        )
    )
    print(json.dumps({"detail": result}), file=sys.stderr)


if __name__ == "__main__":
    main()
