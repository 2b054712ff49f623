#!/usr/bin/env python
"""Calibrate the TPU roofline model against measured per-cycle times.

Measures 5 lowered reference cycles on the real chip (per-cycle device
seconds via fori-loop differencing, which cancels the tunnel dispatch
constant), then fits the model's two free constants —
``red_black_penalty`` and ``kernel_launch_overhead`` — by minimizing the
sum of squared log-ratios between predicted and measured time/cycle.
The reference fitted its 1.4303… red-black penalty the same way
("experimentally obtained", reference
model_based_prediction/performance.py:93-94).

Writes artifacts/roofline_calibration.json with the measurements and the
fit; tests/test_models.py asserts the (committed) model reproduces every
stored measurement within 2×, keeping `--model-based` NSGA time
objectives honest.

Run on the TPU:  python scripts/calibrate_roofline.py
"""

import json
import os
import sys
import time


def measure_per_cycle(step, u0, f, iters=60):
    """Shared fori-loop-differencing routine (see utils/timing.py for the
    value-fetch-barrier rationale); 7 repeats for calibration stability."""
    from evostencils_tpu.utils.timing import per_cycle_time

    return per_cycle_time(step, u0, f, iters=iters, repeats=7)


def build_cases():
    import jax.numpy as jnp

    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.ir import base, partitioning as part, smoother
    from evostencils_tpu.ir.reference_cycles import generate_v_cycle
    from evostencils_tpu.problems.poisson import poisson_2d

    cases = []
    for max_level, min_level in ((9, 5), (10, 6)):
        problem = poisson_2d(
            min_level=min_level, max_level=max_level, dtype=jnp.float32
        )
        _, tl = generate_primitive_set(
            problem.approximation(), problem.rhs(), 2,
            problem.coarsening_factors, max_level, problem.equations,
            problem.operators, problem.fields,
            depth=max_level - min_level, maximum_local_system_size=8,
        )
        n = 2 ** max_level
        cases.append((f"V(2,1)_rb_{n}", problem,
                      generate_v_cycle(tl, problem.rhs(), 2, 1)))
        cases.append((f"V(2,2)_rb_{n}", problem,
                      generate_v_cycle(tl, problem.rhs(), 2, 2)))
        cases.append((f"V(2,2)_jacobi_{n}", problem,
                      generate_v_cycle(tl, problem.rhs(), 2, 2,
                                       partitioning=part.Single)))

        # Smoothing-only chain (no coarse correction): isolates the sweep
        # cost the red-black penalty models.
        t0 = tl[0]
        u, fr, A = t0.approximation, problem.rhs(), t0.operator
        ucur = u
        for _ in range(4):
            res = base.Residual(A, ucur, fr)
            corr = base.Multiplication(
                base.Inverse(smoother.generate_collective_jacobi(A)), res
            )
            ucur = base.Cycle(ucur, fr, corr, partitioning=part.RedBlack,
                              relaxation_factor=1.0)
        cases.append((f"smooth4_rb_{n}", problem, ucur))
    return cases


def main():
    sys.setrecursionlimit(100000)
    import numpy as np

    from evostencils_tpu.ir.transformations import invalidate_expression
    from evostencils_tpu.models.roofline import PerformanceEvaluator

    refit = "--refit" in sys.argv
    cases = build_cases()
    measured = []
    if refit:
        # Refit the model constants against the measurements already in the
        # committed artifact — no TPU needed.
        path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                            "roofline_calibration.json")
        with open(os.path.abspath(path)) as fh:
            stored = {c["case"]: c["measured_s"] for c in json.load(fh)["cases"]}
        for name, problem, expr in cases:
            measured.append((name, problem, expr, stored[name]))
    else:
        import jax.numpy as jnp

        from evostencils_tpu.backend.lowering import CycleLowering

        for name, problem, expr in cases:
            lowering = CycleLowering(jnp.float32, use_pallas=True)
            step = lowering.lower(expr)
            u0, f = problem.initial_state(jnp.float32)
            # Small grids need many more loop iterations: the measurement
            # must rise above the tunnel's ~ms dispatch jitter.
            iters = 60 if u0[0].shape[0] > 600 else 800
            t = measure_per_cycle(step, u0, f, iters=iters)
            measured.append((name, problem, expr, t))
            print(f"{name}: {1e6 * t:.2f} us/cycle (iters={iters})", flush=True)

    def model_times(penalty, overhead, fusion, single_fusion, intergrid, subset):
        out = []
        for _, _, expr, _ in subset:
            perf = PerformanceEvaluator(
                red_black_penalty=penalty, kernel_launch_overhead=overhead,
                fusion_factor=fusion, single_sweep_fusion=single_fusion,
                intergrid_factor=intergrid,
            )
            invalidate_expression(expr)
            out.append(perf.estimate_runtime(expr))
        return out

    def log_err(pred, subset):
        return sum(
            (np.log(p) - np.log(m[3])) ** 2 for p, m in zip(pred, subset)
        )

    # Stage 1: fit the shared constants — sweep penalty + fusion + the
    # exact-f32 transfer surcharge — on the red-black cases (smoothing-only
    # chains pin fusion/penalty; the V-cycles pin intergrid_factor).  The
    # jacobi cases get their own single_sweep_fusion in stage 2, so they
    # must not bias the shared fit.
    rb_cases = [m for m in measured if "_jacobi_" not in m[0]]
    jac_cases = [m for m in measured if "_jacobi_" in m[0]]
    best = None
    for penalty in np.linspace(1.0, 2.0, 11):
        for fusion in np.linspace(1.0, 4.0, 13):
            for intergrid in np.linspace(1.0, 6.0, 21):
                pred = model_times(float(penalty), 0.0, float(fusion), 1.0,
                                   float(intergrid), rb_cases)
                err = log_err(pred, rb_cases)
                if best is None or err < best[0]:
                    best = (err, float(penalty), float(fusion), float(intergrid))
    err_rb, penalty, fusion, intergrid = best
    overhead = 0.0
    # Stage 2: fit the single-sweep (plain Jacobi) fusion factor alone.
    best2 = None
    for sf in np.linspace(1.0, 5.0, 81):
        pred = model_times(penalty, overhead, fusion, float(sf), intergrid,
                           jac_cases)
        err = log_err(pred, jac_cases)
        if best2 is None or err < best2[0]:
            best2 = (err, float(sf))
    err_jac, single_fusion = best2
    err = err_rb + err_jac
    pred = model_times(penalty, overhead, fusion, single_fusion, intergrid,
                       measured)
    print(f"\nfit: red_black_penalty={penalty:.3f}, "
          f"kernel_launch_overhead={overhead * 1e6:.1f} us, "
          f"fusion_factor={fusion:.2f}, "
          f"single_sweep_fusion={single_fusion:.3f}, "
          f"intergrid_factor={intergrid:.2f}, "
          f"log-rmse={np.sqrt(err / len(measured)):.3f}")
    rows = []
    for (name, _, _, t), p in zip(measured, pred):
        ratio = p / t
        print(f"  {name}: measured {1e6 * t:.1f} us, "
              f"predicted {1e6 * p:.1f} us, ratio {ratio:.2f}")
        rows.append({"case": name, "measured_s": t, "predicted_s": p})

    out = {
        "device": "tpu-v5e (axon tunnel)",
        "red_black_penalty": penalty,
        "kernel_launch_overhead_s": overhead,
        "fusion_factor": fusion,
        "single_sweep_fusion": single_fusion,
        "intergrid_factor": intergrid,
        "log_rmse": float(np.sqrt(err / len(measured))),
        "cases": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "roofline_calibration.json")
    with open(os.path.abspath(path), "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"\nwrote {os.path.abspath(path)}")
    print("Update RED_BLACK_PENALTY_TPU / KERNEL_LAUNCH_OVERHEAD_TPU in "
          "evostencils_tpu/models/roofline.py with these values.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
