#!/usr/bin/env python
"""Time the textbook baseline solver (reference scripts/evaluate_reference_solver.py).

Builds the standard V(2,2) red-black collective-Jacobi cycle over the full
hierarchy — the analog of ExaStencils' default `generate solver`
configuration — and measures its time-to-convergence over 20 runs.  This
is the baseline evolved solvers must beat.
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--problem", default="poisson2d")
    parser.add_argument("--min-level", type=int, default=5)
    parser.add_argument("--max-level", type=int, default=9)
    parser.add_argument("--samples", type=int, default=20)
    parser.add_argument("--pre", type=int, default=2)
    parser.add_argument("--post", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.ir.reference_cycles import generate_v_cycle
    from evostencils_tpu.problems import build_named_problem

    problem = build_named_problem(args.problem, args.min_level, args.max_level)
    _, terminal_list = generate_primitive_set(
        problem.approximation(), problem.rhs(), problem.dimension,
        problem.coarsening_factors, problem.max_level, problem.equations,
        problem.operators, problem.fields,
        depth=problem.max_level - problem.min_level,
    )
    cycle = generate_v_cycle(
        terminal_list, problem.rhs(), pre_smoothing=args.pre, post_smoothing=args.post
    )
    generator = JaxProgramGenerator(problem)
    t, rho, iterations = generator.generate_and_evaluate(
        cycle, evaluation_samples=args.samples
    )
    print(f"Reference V({args.pre},{args.post}) RB-Jacobi cycle on {problem.name}:")
    print(f"  Time to convergence: {t:.3f} ms")
    print(f"  Convergence factor:  {rho:.6f}")
    print(f"  Iterations:          {iterations}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
