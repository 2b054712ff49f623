#!/usr/bin/env python
"""Evaluate Helmholtz preconditioner cycles at the reference k-ladder.

For each candidate cycle structure, runs the FULL reference protocol
(2D_FD_Helmholtz_fromL3.exa3 + exastencils.py:518-535): the cycle
preconditions BiCGStab on the outer Helmholtz operator A at k = 80, 160,
320 (h·k anchored by the level range), to the TRUE 1e-7 relative target
(host-f64 restarts), reporting outer iterations and ρ_outer per k.

Candidates: the textbook V(2,1)/V(2,2) shifted-Laplace cycles (the
reference default gen_mgCycle shape) and, optionally, evolved grammar
strings (e.g. Poisson-evolved structures re-instantiated on M — the
grammar's productions are problem-independent).

    python scripts/evaluate_helmholtz_ladder.py \
        --champion artifacts/poisson2d_champion_r2.txt
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--min-level", type=int, default=3)
    parser.add_argument("--max-level", type=int, default=7)
    parser.add_argument("--k", type=float, default=80.0)
    parser.add_argument("--champion", action="append", default=[])
    parser.add_argument("--max-iterations", type=int, default=10000)
    parser.add_argument("--rungs", type=int, default=3,
                        help="number of k-ladder rungs (k·2^i) to evaluate; "
                             "1 = base k only, for fast sweeps")
    parser.add_argument("--textbook", action="append", default=[],
                        metavar="PRE,POST,OMEGA",
                        help="extra textbook V(PRE,POST) ω=OMEGA candidates "
                             "(repeatable); default set is V(2,1)/V(2,2) "
                             "at ω=0.6 (the reference gen_mgCycle shape)")
    parser.add_argument("--tune-outer", type=int, default=0, metavar="GENS",
                        help="CMA-ES-tune each candidate's relaxation "
                             "factors against the measured outer iteration "
                             "count at the base k for GENS generations "
                             "before the ladder sweep")
    parser.add_argument("--save-tuned", default=None, metavar="DIR",
                        help="write tuned candidates as grammar+ω artifacts "
                             "into DIR")
    parser.add_argument("--no-default-textbooks", action="store_true",
                        help="skip the built-in V(2,1)/V(2,2) baselines "
                             "(e.g. when tuning only champions; tuned "
                             "textbook artifacts reload via --champion)")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--dtype", default="complex64",
                        choices=["complex64", "complex128"],
                        help="complex128 (CPU/x64) matches the reference's "
                             "double-precision BiCGStab: continuous solve, "
                             "no f32 restart stages")
    args = parser.parse_args()

    sys.setrecursionlimit(100000)
    import jax

    from evostencils_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "complex128":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.grammar import gp
    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.ir.reference_cycles import generate_v_cycle
    from evostencils_tpu.problems.helmholtz import helmholtz_2d

    problem = helmholtz_2d(
        min_level=args.min_level, max_level=args.max_level, k=args.k
    )
    if args.max_iterations:
        spec = dict(problem.outer_solver)
        spec["max_iterations"] = args.max_iterations
        problem = problem._clone(outer_solver=spec)
    depth = args.max_level - args.min_level
    pset, tl = generate_primitive_set(
        problem.approximation(), problem.rhs(), problem.dimension,
        problem.coarsening_factors, problem.max_level, problem.equations,
        problem.operators, problem.fields, depth=depth,
        maximum_local_system_size=8,
    )

    textbook_specs = [] if args.no_default_textbooks else [(2, 1, 0.6),
                                                           (2, 2, 0.6)]
    for spec_str in args.textbook:
        parts = spec_str.split(",")
        spec = (int(parts[0]), int(parts[1]), float(parts[2]))
        if spec not in textbook_specs:  # defaults are always present
            textbook_specs.append(spec)
    candidates = []
    grammar_strings = {}
    for pre, post, omega in textbook_specs:
        expr = generate_v_cycle(
            tl, problem.rhs(), pre_smoothing=pre, post_smoothing=post,
            omega=omega,
        )
        name = f"textbook V({pre},{post}) ω={omega}"
        candidates.append((name, expr))
        try:
            from evostencils_tpu.grammar.multigrid import textbook_cycle_string
            from evostencils_tpu.utils.champions import omega_index

            grammar_strings[name] = textbook_cycle_string(
                tl, pre, post, omega_index=omega_index(omega)
            )
        except Exception:
            pass
    from evostencils_tpu.utils.champions import (
        apply_stored_omegas, parse_champion_file,
    )

    for path in args.champion:
        tree_string, omegas = parse_champion_file(path)
        try:
            tree = gp.parse_tree(tree_string, pset)
            expr, _ = gp.compile_tree(tree, pset)
        except Exception as e:
            print(f"[skip] {path}: {type(e).__name__}: {e}", flush=True)
            continue
        name = path.rsplit("/", 1)[-1].replace(".txt", "")
        grammar_strings[name] = tree_string
        if apply_stored_omegas(expr, omegas, label=path):
            name += " (tuned ω)"
        candidates.append((name, expr))

    generator = JaxProgramGenerator(problem, dtype=getattr(jnp, args.dtype))
    print(f"# Helmholtz ladder k={args.k}·(1,2,4), levels "
          f"[{args.min_level},{args.max_level}], outer target 1e-7, "
          f"cap {args.max_iterations}\n", flush=True)
    if args.tune_outer:
        import os

        from evostencils_tpu.optimization.relaxation import tune_outer_relaxation

        for name, expr in candidates:
            tuned, best = tune_outer_relaxation(
                expr, generator, iterations=args.tune_outer, verbose=True
            )
            print(f"[tuned {name}] outer fitness -> {best:.1f} "
                  f"ω={[round(w, 3) for w in tuned]}", flush=True)
            if args.save_tuned:
                os.makedirs(args.save_tuned, exist_ok=True)
                safe = name.replace(" ", "_").replace("(", "").replace(
                    ")", "").replace(",", "_").replace("ω=", "w")
                # Durable, reloadable form: the grammar string (champions
                # are already grammar strings; textbook shapes use their
                # grammar derivation) + the tuned ω vector, applied at
                # load time via the `# tuned omegas:` comment.
                durable = grammar_strings.get(name) or grammar_strings.get(
                    name.replace(" (tuned ω)", "")
                )
                if durable is None:
                    # str(expr) is an IR repr, NOT a reloadable grammar
                    # string — an artifact written from it would silently
                    # lose hours of CMA-ES work at reload time.
                    print(f"[warn] no grammar string for {name}; tuned "
                          f"omegas printed above but no artifact written",
                          flush=True)
                    continue
                with open(os.path.join(
                        args.save_tuned, f"{safe}_tuned.txt"), "w") as f:
                    f.write(durable + "\n")
                    f.write(f"# tuned omegas: {[round(w, 4) for w in tuned]}\n")
                    f.write(f"# outer fitness at k={args.k}: {best}\n")

    rows = []
    for name, expr in candidates:
        per_k = []
        for step in range(args.rungs):
            kk = args.k * 2 ** step
            generator._apply_parameter_values({"k": kk})
            t, rho, iters = generator.generate_and_evaluate(
                expr, evaluation_samples=1
            )
            ok = t < 1e50
            per_k.append((kk, ok, t, rho, iters))
            print(f"[{name}] k={kk:.0f}: "
                  f"{'converged' if ok else 'FAILED'} "
                  f"rho_outer={min(rho, 9.99):.4f} "
                  f"outer_iters={min(iters, 99999):.0f} "
                  f"t={min(t, 9e9):.1f}ms", flush=True)
        generator._apply_parameter_values({"k": args.k})
        rows.append((name, per_k))

    print("\n| preconditioner cycle | k | outcome | outer iters | ρ_outer |")
    print("|---|---|---|---|---|")
    for name, per_k in rows:
        for kk, ok, t, rho, iters in per_k:
            print(f"| {name} | {kk:.0f} | "
                  f"{'converged to 1e-7' if ok else 'cap/diverged'} | "
                  f"{min(iters, 99999):.0f} | {min(rho, 9.99):.4f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
