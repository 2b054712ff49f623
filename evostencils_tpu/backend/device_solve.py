"""Whole-solve-in-one-jit driver: time-to-deep-target on device.

The development TPU tunnel adds ~25 ms latency per dispatched executable,
which swamps per-cycle device compute (~25-70 µs at 1023²-2047²).  The
reference's generated C++ binaries have no such boundary — their solve
loop runs in-process (reference code_generation/exastencils.py:417-443).
This module is the fair analog: the ENTIRE staged solve — f32 multigrid
cycles, per-cycle residual norms, float64 restart residuals, and the
outer convergence test — compiles into ONE XLA executable driven by
`lax.while_loop`, so a measurement pays the dispatch boundary once.

Staging (same math as the host-side restarted measurement in
backend/evaluation.py): f32 cycles reduce the stage residual by
`stage_reduction`; the stage correction is accumulated into a float64
iterate; the exact float64 residual (XLA-emulated f64 on TPU — cheap at
once-per-stage) becomes the next stage's f32 right-hand side.  Stage
reductions compound, so f32 sweeps resolve relative residuals far below
the f32 floor — to the reference's 1e-10/1e-12 targets.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _l2(state) -> jnp.ndarray:
    total = None
    for x in state:
        s = jnp.sum(jnp.real(x) ** 2 + jnp.imag(x) ** 2) if jnp.iscomplexobj(x) \
            else jnp.sum(x * x)
        total = s if total is None else total + s
    return jnp.sqrt(total)


def build_staged_solver(
    step: Callable,
    apply_a32: Callable,
    apply_a64: Callable,
    shapes: Tuple[tuple, ...],
    target: float = 1e-10,
    stage_reduction: float = 1e-4,
    inner_cap: int = 60,
    max_stages: int = 8,
    max_cycles: int = 500,
):
    """Compile solve(f32_rhs, f64_rhs) -> (cycles, rel_residual, stages).

    `step(u, f) -> u` is one lowered f32 cycle on field tuples;
    `apply_a32/apply_a64` apply the finest-level operator at the
    respective precision.  The returned function is jitted; everything —
    inner per-cycle residual norms included, matching the reference
    solvers' per-iteration residual prints — runs on device.
    """

    @jax.jit
    def solve(f32_rhs, f64_rhs):
        r0 = _l2(f64_rhs)

        def outer_cond(carry):
            _, r64, cycles, stages = carry
            return jnp.logical_and(
                _l2(r64) > target * r0,
                jnp.logical_and(stages < max_stages, cycles < max_cycles),
            )

        def outer_body(carry):
            u64, r64, cycles, stages = carry
            fs = tuple(x.astype(jnp.float32) for x in r64)
            rs0 = _l2(fs)
            e0 = tuple(jnp.zeros(s, jnp.float32) for s in shapes)

            def inner_cond(c):
                _, k, rn = c
                return jnp.logical_and(
                    jnp.logical_and(rn > stage_reduction * rs0, k < inner_cap),
                    jnp.isfinite(rn),
                )

            def inner_body(c):
                e, k, _ = c
                e = step(e, fs)
                rn = _l2(tuple(
                    f - a for f, a in zip(fs, apply_a32(e))
                ))
                return e, k + 1, rn

            e, k, _ = jax.lax.while_loop(
                inner_cond, inner_body, (e0, jnp.int32(0), rs0)
            )
            u64 = tuple(u + x.astype(jnp.float64) for u, x in zip(u64, e))
            r64 = tuple(
                f - a for f, a in zip(f64_rhs, apply_a64(u64))
            )
            return u64, r64, cycles + k, stages + 1

        u64 = tuple(jnp.zeros(s, jnp.float64) for s in shapes)
        u64, r64, cycles, stages = jax.lax.while_loop(
            outer_cond, outer_body, (u64, tuple(f64_rhs), jnp.int32(0), jnp.int32(0))
        )
        return cycles, _l2(r64) / r0, stages

    return solve


def staged_solver_for_expression(
    lowering32,
    lowering64,
    expression,
    operator,
    problem,
    level=None,
    omegas=None,
    **kwargs,
):
    """Wire `build_staged_solver` from a lowered cycle expression.

    `operator` is the finest-level system operator (from the grammar
    terminals); `omegas` optionally overrides relaxation factors via the
    ω-parameterized lowering (for gradient-tuned champions)."""
    if omegas is not None:
        pstep, _ = lowering32.lower_parameterized(expression)
        om = jnp.asarray(omegas, dtype=jnp.float32)

        def step(u, f):
            return pstep(u, f, om)
    else:
        step = lowering32.lower(expression)

    def apply_a32(u):
        return lowering32.system_apply(operator, u)

    def apply_a64(u):
        return lowering64.system_apply(operator, u)

    u0, _ = problem.initial_state(jnp.float32, level=level)
    shapes = tuple(x.shape for x in u0)
    return build_staged_solver(step, apply_a32, apply_a64, shapes, **kwargs)
