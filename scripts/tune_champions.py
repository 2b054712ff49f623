#!/usr/bin/env python
"""Gradient ω-tuning of stored champion artifacts (batch form of
`optimize.py --tune`).

For each artifact: parse the grammar string, tune the relaxation factors
with the differentiable error-propagation surrogate
(optimization/relaxation.tune_relaxation_factors — the reference could
only do this by patching generated C++ globals and recompiling,
exastencils.py:241-293), re-measure, and write `<name>_tuned.txt` with
the stored-ω line champion consumers parse (utils/champions.py).

  python scripts/tune_champions.py artifacts/paper_protocol/individual_{0,1,2,3}.txt \
      --problem poisson2d --cpu
"""

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("champions", nargs="+")
    parser.add_argument("--problem", default="poisson2d")
    parser.add_argument("--min-level", type=int, default=5)
    parser.add_argument("--max-level", type=int, default=9)
    parser.add_argument("--max-local-system-size", type=int, default=8)
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--samples", type=int, default=3,
                        help="re-measurement samples before/after tuning "
                             "(median ρ is written to the artifact header; "
                             "single-sample numbers caused the round-3 "
                             "elasticity confusion)")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--suffix", default="_tuned")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from evostencils_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.grammar import gp
    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.optimization.relaxation import tune_relaxation_factors
    from evostencils_tpu.problems import build_named_problem
    from evostencils_tpu.utils.champions import parse_champion_file

    problem = build_named_problem(args.problem, args.min_level, args.max_level)
    pset, _ = generate_primitive_set(
        problem.approximation(), problem.rhs(), problem.dimension,
        problem.coarsening_factors, problem.max_level, problem.equations,
        problem.operators, problem.fields,
        depth=problem.max_level - problem.min_level,
        maximum_local_system_size=args.max_local_system_size,
        FAS=bool(getattr(problem, "uses_fas", False)),
    )
    generator = JaxProgramGenerator(problem)

    def _measure(expr):
        """Median (ρ, iterations) over --samples seeded-RHS measurements
        (distinct rhs_seed per sample, as scripts/champion_stats.py)."""
        import statistics

        rhos, its = [], []
        for s in range(max(1, args.samples)):
            generator.rhs_seed = 1000 + s
            _, rho, it = generator.generate_and_evaluate(
                expr, evaluation_samples=1)
            rhos.append(float(rho))
            its.append(it)
        generator.rhs_seed = None
        return statistics.median(rhos), sorted(its)[len(its) // 2]

    for path in args.champions:
        tree_str, _ = parse_champion_file(path)
        expr, _ = gp.compile_tree(gp.parse_tree(tree_str, pset), pset)
        rho0, it0 = _measure(expr)
        tuned, _ = tune_relaxation_factors(
            expr, generator.problem, iterations=args.iterations)
        rho1, it1 = _measure(expr)
        out = os.path.splitext(path)[0] + args.suffix + ".txt"
        with open(out, "w") as fh:
            fh.write(tree_str + "\n")
            fh.write(f"# tuned omegas: {[round(w, 4) for w in tuned]}\n")
            fh.write(f"# rho (median of {args.samples}): {rho0} -> {rho1}; "
                     f"iters {it0} -> {it1}\n")
        print(f"{path}: rho {rho0:.4f} -> {rho1:.4f}, iters {it0} -> {it1} "
              f"-> {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
