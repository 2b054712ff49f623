"""Select headline candidates from a results directory's hall-of-fame dump.

Each individual_N.txt carries a `# fitness: (rho, t_per_iter_ms)` comment
(multi-objective) or `# fitness: (time_ms,)`.  For the 1024² headline the
right scalarization is predicted device time-to-target,

    cycles(ρ) · t_cycle  with  cycles(ρ) = log(target) / log(ρ),

which is exactly what the staged solver pays per converged decade.
Prints the top-N paths (one per line) for xargs-style consumption:

    python scripts/headline_1024.py $(python scripts/select_champions.py \
        results_paper_protocol --top 4 --champion-args) --tune
"""

import argparse
import ast
import glob
import math
import os
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("results_dir")
    ap.add_argument("--top", type=int, default=4)
    ap.add_argument("--target", type=float, default=1e-10)
    ap.add_argument("--max-rho", type=float, default=0.5)
    ap.add_argument("--champion-args", action="store_true",
                    help="emit as repeated '--champion PATH' flags")
    args = ap.parse_args()

    scored = []
    for path in sorted(glob.glob(os.path.join(args.results_dir, "individual_*.txt"))):
        fitness = None
        with open(path) as fh:
            for line in fh:
                if line.startswith("# fitness:"):
                    try:
                        fitness = ast.literal_eval(line.split(":", 1)[1].strip())
                    except (ValueError, SyntaxError):
                        pass
        if not fitness:
            continue
        if isinstance(fitness, (int, float)):
            fitness = (fitness,)
        if len(fitness) == 1:
            # Single-objective runs store (time_ms,) — already the right
            # scalarization; rank by it directly (failures are huge).
            t_ms = fitness[0]
            if not (0.0 < t_ms < 1e8):
                continue
            scored.append((t_ms, float("nan"), path))
            continue
        rho = fitness[0]
        if not (0.0 < rho < args.max_rho):
            continue
        t_iter = fitness[1]
        cycles = math.log(args.target) / math.log(rho)
        scored.append((cycles * t_iter, rho, path))

    scored.sort()
    # De-duplicate identical tree strings (hof often holds ω-variants).
    seen = set()
    out = []
    for score, rho, path in scored:
        with open(path) as fh:
            tree = fh.readline().strip()
        if tree in seen:
            continue
        seen.add(tree)
        out.append((score, rho, path))
        if len(out) >= args.top:
            break
    for score, rho, path in out:
        if args.champion_args:
            print(f"--champion {path}", end=" ")
        else:
            rho_str = "n/a" if math.isnan(rho) else f"{rho:.4f}"
            print(f"{path}\t{score:.3f}\t{rho_str}", file=sys.stderr)
            print(path)
    if args.champion_args:
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
