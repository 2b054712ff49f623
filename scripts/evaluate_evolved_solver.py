#!/usr/bin/env python
"""Re-evaluate a stored evolved solver (reference scripts/evaluate_evolved_solver.py).

Loads a grammar-string individual (individual_<j>.txt from optimize.py),
re-parses it through the typed grammar and measures time-to-convergence /
convergence factor / iterations with 20 evaluation samples.
"""

import argparse
import random
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("individual", help="path to individual_<j>.txt")
    parser.add_argument("--problem", default="poisson2d")
    parser.add_argument("--min-level", type=int, default=5)
    parser.add_argument("--max-level", type=int, default=9)
    parser.add_argument("--evaluation-samples", type=int, default=20)
    parser.add_argument("--max-local-system-size", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.optimization.optimizer import Optimizer
    from evostencils_tpu.problems import build_named_problem

    with open(args.individual) as f:
        grammar_string = f.readline().strip()

    problem = build_named_problem(args.problem, args.min_level, args.max_level)
    generator = JaxProgramGenerator(problem)
    optimizer = Optimizer.for_problem(problem, program_generator=generator,
                                      rng=random.Random(0))
    t, rho, iterations = optimizer.generate_and_evaluate_program_from_grammar_representation(
        grammar_string, args.max_local_system_size,
        evaluation_samples=args.evaluation_samples,
    )
    print(f"Time to convergence: {t:.3f} ms")
    print(f"Convergence factor:  {rho:.6f}")
    print(f"Iterations:          {iterations}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
