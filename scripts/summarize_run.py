"""Summarize an optimization results directory into a markdown report.

Reads the durable artifacts `scripts/optimize.py` dumps (populations.p =
per-run lists of (grammar string, fitness tuple), logbooks.p = logbook
record dicts incl. per-generation wall seconds) and prints:

  * the final population's Pareto front (multi-objective runs) or the
    fitness-ranked champions (single-objective runs),
  * the per-generation wall-time curve with a flatness diagnostic — the
    evidence VERDICT round 2 item 3 asks for ("flat per-individual cost
    or an explanation"); the reference never recorded this
    (reference optimization/program.py:770 just runs the loop).

Usage: python scripts/summarize_run.py results_paper_protocol [--top N]
"""

import argparse
import os
import pickle
import sys


def pareto_front(entries):
    """Non-dominated subset of [(string, fitness tuple)] (minimization)."""
    front = []
    for s, f in entries:
        dominated = False
        for s2, f2 in entries:
            if f2 == f:
                continue
            if all(b <= a for a, b in zip(f, f2)) and any(
                b < a for a, b in zip(f, f2)
            ):
                dominated = True
                break
        if not dominated:
            front.append((s, f))
    return sorted(set(front), key=lambda e: e[1])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("results_dir")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    with open(os.path.join(args.results_dir, "populations.p"), "rb") as f:
        pops = pickle.load(f)
    try:
        with open(os.path.join(args.results_dir, "logbooks.p"), "rb") as f:
            logbooks = pickle.load(f)
    except FileNotFoundError:
        logbooks = []

    print(f"# Run summary: {args.results_dir}\n")

    final = [
        (s, tuple(fit) if isinstance(fit, (tuple, list)) else (fit,))
        for s, fit in pops[-1]
        if fit is not None
    ]
    n_obj = max((len(f) for _, f in final), default=0)
    if n_obj >= 2:
        front = pareto_front(final)
        print(f"## Pareto front ({len(front)} of {len(final)} final individuals)\n")
        print("| # | objectives | size |")
        print("|---|---|---|")
        for i, (s, fit) in enumerate(front[: args.top]):
            objs = ", ".join(f"{v:.4g}" for v in fit)
            print(f"| {i} | ({objs}) | {s.count('(')} nodes |")
    else:
        ranked = sorted(final, key=lambda e: e[1])
        print(f"## Champions (fitness-ranked, {len(final)} final individuals)\n")
        print("| # | fitness | size |")
        print("|---|---|---|")
        for i, (s, fit) in enumerate(ranked[: args.top]):
            print(f"| {i} | {fit[0]:.6g} | {s.count('(')} nodes |")

    # Per-generation wall time (gen_s recorded by the optimizer logbook).
    records = [r for lb in logbooks for r in lb]
    gen_s = [(r.get("gen"), r["gen_s"]) for r in records if "gen_s" in r]
    if gen_s:
        times = [t for _, t in gen_s if t > 1e-9]
        print(f"\n## Generation wall-time curve ({len(gen_s)} generations)\n")
        q = max(1, len(gen_s) // 12)
        print("| gen | wall s |")
        print("|---|---|")
        for g, t in gen_s[::q]:
            print(f"| {g} | {t:.1f} |")
        if times:
            first = times[: max(1, len(times) // 4)]
            last = times[-max(1, len(times) // 4):]
            a = sum(first) / len(first)
            b = sum(last) / len(last)
            print(
                f"\nmean wall s/gen: first quartile {a:.1f}, last quartile "
                f"{b:.1f} (ratio {b / a:.2f}; ≈1 ⇒ flat per-individual cost), "
                f"total {sum(t for _, t in gen_s) / 3600:.2f} h"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
