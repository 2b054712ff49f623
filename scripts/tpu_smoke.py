#!/usr/bin/env python
"""Real-TPU smoke test: pins the hot-kernel numerics on actual hardware.

CI runs CPU-only (tests/conftest.py forces the interpreter/jnp paths), so
this script is the on-device check: run it whenever the Pallas kernels,
intergrid transfers, or lowering change.  Exit code 0 = all checks pass.

    python scripts/tpu_smoke.py
"""

import sys


def run_smoke(verbose=True):
    """Run every on-device numerics check; returns the list of failed check
    names (empty = all pass).  Importable so bench.py can certify kernel
    numerics in the same run that reports throughput (a bf16 transfer
    perturbation was once caught only because this was run by hand)."""
    sys.setrecursionlimit(100000)
    import jax
    import jax.numpy as jnp
    import numpy as np

    failures = []

    def check(name, ok, detail=""):
        if verbose:
            print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
        if not ok:
            failures.append(name)

    backend = jax.default_backend()
    check("tpu backend", backend == "tpu", f"(got {backend})")

    rng = np.random.default_rng(3)
    entries = (((0, 0), 4.0), ((1, 0), -1.0), ((-1, 0), -1.0),
               ((0, 1), -1.0), ((0, -1), -1.0))

    def numpy_rb(u, f, omega, inv_diag):
        u = np.asarray(u, np.float64)
        f = np.asarray(f, np.float64)
        rows, cols = np.indices(u.shape)
        red = ((rows + cols) % 2) == 0
        for mask in (red, ~red):
            au = np.zeros_like(u)
            for (oi, oj), v in entries:
                sh = np.zeros_like(u)
                sh[max(-oi, 0): u.shape[0] + min(-oi, 0),
                   max(-oj, 0): u.shape[1] + min(-oj, 0)] = \
                    u[max(oi, 0): u.shape[0] + min(oi, 0),
                      max(oj, 0): u.shape[1] + min(oj, 0)]
                au += v * sh
            u = u + np.where(mask, omega * inv_diag * (f - au), 0.0)
        return u

    # 1. Whole-array fused RB sweep (≤512²)
    from evostencils_tpu.ops.pallas_kernels import (
        _rb_blocked_call, _rb_sweep_call,
    )

    u = jnp.asarray(rng.standard_normal((255, 255)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((255, 255)), jnp.float32)
    om = jnp.asarray([1.15], jnp.float32)
    out = np.asarray(_rb_sweep_call(u, f, om, entries, 0.25, False))
    err = np.max(np.abs(out - numpy_rb(u, f, 1.15, 0.25)))
    check("whole-array RB sweep @255²", err < 1e-4, f"max err {err:.2e}")

    # 2. Row-blocked fused RB sweep (1023²)
    u = jnp.asarray(rng.standard_normal((1023, 1023)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((1023, 1023)), jnp.float32)
    out = np.asarray(_rb_blocked_call(u, f, om, entries, 0.25, False))
    err = np.max(np.abs(out - numpy_rb(u, f, 1.15, 0.25)))
    check("row-blocked RB sweep @1023²", err < 1e-4, f"max err {err:.2e}")

    # 3. MXU matmul transfers vs numpy
    from evostencils_tpu.ops.intergrid import prolong, restrict
    from evostencils_tpu.stencils import constant

    fw = constant.Stencil(
        [((i, j), (2 - abs(i)) * (2 - abs(j)) / 16.0)
         for i in (-1, 0, 1) for j in (-1, 0, 1)]
    )
    bl = constant.Stencil(
        [((i, j), (2 - abs(i)) * (2 - abs(j)) / 4.0)
         for i in (-1, 0, 1) for j in (-1, 0, 1)]
    )
    fine = jnp.asarray(rng.standard_normal((1023, 1023)), jnp.float32)
    coarse = np.asarray(restrict(fine, fw, (511, 511), (2, 2)))
    fine_np = np.asarray(fine, np.float64)
    ref = np.zeros((511, 511))
    for (oi, oj), v in fw.entries:
        ref += v * fine_np[1 + oi::2, 1 + oj::2][:511, :511]
    err = np.max(np.abs(coarse - ref))
    check("matmul restrict @1023²→511²", err < 1e-3, f"max err {err:.2e}")

    back = np.asarray(
        prolong(jnp.asarray(coarse), bl, (1023, 1023), (2, 2))
    )
    check("matmul prolong shape/finite",
          back.shape == (1023, 1023) and np.isfinite(back).all())

    # 4. End-to-end: textbook V(2,1) ρ at 1023² through the full pipeline
    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.ir.reference_cycles import generate_v_cycle
    from evostencils_tpu.problems.poisson import poisson_2d

    problem = poisson_2d(min_level=6, max_level=10, dtype=jnp.float32)
    _, tl = generate_primitive_set(
        problem.approximation(), problem.rhs(), 2, problem.coarsening_factors,
        10, problem.equations, problem.operators, problem.fields, depth=4,
        maximum_local_system_size=8,
    )
    cyc = generate_v_cycle(tl, problem.rhs(), 2, 1)
    gen = JaxProgramGenerator(problem, dtype=jnp.float32)
    _, rho, iters = gen.generate_and_evaluate(cyc, evaluation_samples=1)
    check("V(2,1) ρ @1023²", 0.05 < rho < 0.12, f"(ρ={rho:.4f}, {iters} iters)")

    return failures


def main():
    failures = run_smoke(verbose=True)
    print(f"\n{len(failures)} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
