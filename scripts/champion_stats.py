#!/usr/bin/env python
"""N-sample re-measurement of stored champion artifacts.

Mirrors the reference's final re-evaluation discipline (reference
optimization/program.py:928: hall-of-fame individuals are re-measured
with 20 evaluation samples before any number is published).  For each
champion artifact this script

  * parses the grammar string and stored tuned relaxation factors
    (utils/champions.py format),
  * evaluates ``--samples`` independent measurements; each sample uses a
    DISTINCT seeded random right-hand side (``rhs_seed``), so the spread
    of the measured convergence factor reflects initial-error content
    (with a zero initial guess the error is -A⁻¹f) and the spread of the
    timing reflects machine noise,
  * reports min/median/max for measured ρ, time-to-target and iteration
    count, with and without the stored tuned ω.

Example (the round-3 elasticity champion, VERDICT round-3 item 8):

  python scripts/champion_stats.py \
      artifacts/secondary_r3/elasticity_individual_0_tuned.txt \
      --problem elasticity --min-level 5 --max-level 8 --samples 20
"""

import argparse
import json
import statistics
import sys


def _stats(values):
    finite = [v for v in values if v < 1e50]
    if not finite:
        return {"n": 0, "all_failed": True}
    return {
        "n": len(finite),
        "min": min(finite),
        "median": statistics.median(finite),
        "max": max(finite),
        "failed": len(values) - len(finite),
    }


def measure(generator, expr, samples, base_seed=1000, vary="rhs"):
    """Per-sample (time_ms, rho, iterations) lists over seeded samples.

    ``vary="rhs"`` seeds a random right-hand side per sample (the default
    spread protocol); ``vary="init"`` seeds a random INITIAL GUESS and
    keeps the physical RHS — the protocol that still converges on
    indefinite problems (Helmholtz k≥160), where a white-noise RHS puts
    full energy into near-resonant modes and every solver stagnates.
    ``vary="none"`` repeats the identical fixed-RHS zero-guess solve —
    the reference's literal 20-sample re-eval (timing noise only)."""
    times, rhos, its = [], [], []
    attr = {"init": "init_seed", "rhs": "rhs_seed", "none": None}[vary]
    for s in range(samples):
        if attr is not None:
            setattr(generator, attr, base_seed + s)
        t, rho, n = generator.generate_and_evaluate(expr, evaluation_samples=1)
        times.append(float(t))
        rhos.append(float(rho))
        its.append(int(n) if n < 1e18 else n)
    if attr is not None:
        setattr(generator, attr, None)
    return times, rhos, its


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("champions", nargs="+",
                        help="champion artifact files (grammar string + "
                             "optional '# tuned omegas: [...]' line)")
    parser.add_argument("--problem", default="poisson2d")
    parser.add_argument("--min-level", type=int, default=None)
    parser.add_argument("--max-level", type=int, default=None)
    parser.add_argument("--samples", type=int, default=20)
    parser.add_argument("--max-local-system-size", type=int, default=8)
    parser.add_argument("--helmholtz-k0", type=float, default=None,
                        help="wavenumber for --problem helmholtz (default "
                             "80; pass 160/320 for the upper ladder rungs)")
    parser.add_argument("--outer-cap", type=int, default=None,
                        help="outer-solver iteration cap override "
                             "(Helmholtz rungs need 12000-20000)")
    parser.add_argument("--vary", choices=("rhs", "init", "none"),
                        default="rhs",
                        help="per-sample randomization: 'rhs' = seeded "
                             "random right-hand side (default); 'init' = "
                             "seeded random initial guess with the "
                             "physical RHS (the convergent protocol for "
                             "indefinite Helmholtz rungs); 'none' = "
                             "repeat the identical fixed-RHS solve "
                             "(timing noise only, the reference's "
                             "literal 20-sample re-eval)")
    parser.add_argument("--tuned-only", action="store_true",
                        help="measure only the stored-tuned-ω row of each "
                             "artifact (skips the untuned row — halves the "
                             "cost when only the tuned comparison matters)")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--dtype", default=None)
    parser.add_argument("--json", default=None, help="also write a JSON report")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from evostencils_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.grammar import gp
    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.problems import build_named_problem
    from evostencils_tpu.utils.champions import (apply_stored_omegas,
                                                 parse_champion_file)

    # Per-problem level defaults = each family's PUBLISHED champion config
    # (RESULTS.md tables).  2D defaults silently misconfigured a 3D run in
    # round 4 (511³ instead of the champion's 64³); explicit flags still
    # override.
    default_levels = {
        "poisson2d": (5, 9), "poisson2d_var": (5, 9), "poisson3d": (2, 6),
        "elasticity": (5, 8), "helmholtz": (3, 7), "fas": (5, 9),
    }.get(args.problem, (5, 9))
    if args.min_level is None:
        args.min_level = default_levels[0]
    if args.max_level is None:
        args.max_level = default_levels[1]

    if args.problem == "helmholtz" and args.helmholtz_k0 is not None:
        from evostencils_tpu.problems.helmholtz import helmholtz_2d

        problem = helmholtz_2d(min_level=args.min_level,
                               max_level=args.max_level,
                               k=args.helmholtz_k0)
    else:
        problem = build_named_problem(
            args.problem, args.min_level, args.max_level)
    if args.outer_cap and getattr(problem, "outer_solver", None):
        problem = problem._clone(
            outer_solver=dict(problem.outer_solver,
                              max_iterations=args.outer_cap))
    if args.dtype:
        if "64" in args.dtype or "128" in args.dtype:
            jax.config.update("jax_enable_x64", True)
        problem = problem._clone(dtype=getattr(jnp, args.dtype))
    pset, _ = generate_primitive_set(
        problem.approximation(), problem.rhs(), problem.dimension,
        problem.coarsening_factors, problem.max_level, problem.equations,
        problem.operators, problem.fields,
        depth=problem.max_level - problem.min_level,
        maximum_local_system_size=args.max_local_system_size,
        FAS=bool(getattr(problem, "uses_fas", False)),
    )
    generator = JaxProgramGenerator(problem)

    report = {"problem": args.problem,
              "levels": [args.min_level, args.max_level],
              "helmholtz_k0": args.helmholtz_k0,
              "outer_cap": args.outer_cap,
              "vary": args.vary,
              "samples": args.samples,
              "platform": jax.devices()[0].platform,
              "champions": []}
    for path in args.champions:
        tree_str, omegas = parse_champion_file(path)
        entry = {"file": path, "has_stored_omegas": omegas is not None}
        for label, use_omegas in (("untuned", False), ("tuned", True)):
            if use_omegas and omegas is None:
                continue
            if args.tuned_only and not use_omegas and omegas is not None:
                continue
            expr, _ = gp.compile_tree(gp.parse_tree(tree_str, pset), pset)
            if use_omegas and not apply_stored_omegas(expr, omegas, label=path):
                continue
            times, rhos, its = measure(generator, expr, args.samples,
                                       vary=args.vary)
            entry[label] = {
                "rho": _stats(rhos),
                "time_to_target_ms": _stats(times),
                "iterations": _stats([float(i) for i in its]),
            }
            r = entry[label]["rho"]
            t = entry[label]["time_to_target_ms"]
            print(f"{path} [{label}] n={args.samples}: "
                  f"rho min/med/max = {r.get('min', float('nan')):.4f}/"
                  f"{r.get('median', float('nan')):.4f}/"
                  f"{r.get('max', float('nan')):.4f}; "
                  f"time-to-target med {t.get('median', float('nan')):.1f} ms",
                  flush=True)
        report["champions"].append(entry)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"report written to {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
