"""Gradient-based relaxation-factor tuning of an evolved cycle.

The reference could only retune relaxation weights by patching the
generated C++'s global variables and recompiling (reference
code_generation/exastencils.py:241-293, optimization/intergrid_transfer.py).
Here the lowered cycle is *differentiable in its ω vector* (they are
traced arguments of `step(u, f, ω)` — backend/lowering.lower_parameterized),
so the asymptotic contraction can be minimized directly with Adam:

    loss(ω) = log ‖r_K(ω)‖ − log ‖r_J(ω)‖   (J < K)

i.e. the measured log-contraction over iterations J..K of the cycle
applied to the real problem — a smooth surrogate of log ρ.  One jitted
value-and-grad evaluation per step; typically converges in ~50 steps.

This is a post-evolution refinement pass: evolution finds the cycle
*structure*, gradients polish its continuous parameters on device.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from evostencils_tpu.ir.transformations import collect_cycles


def tune_relaxation_factors(
    expression,
    problem,
    lowering=None,
    iterations: int = 50,
    warmup_cycles: int = 2,
    measure_cycles: int = 6,
    learning_rate: float = 0.05,
    omega_bounds: Tuple[float, float] = (0.1, 1.9),
    verbose: bool = False,
):
    """Return (tuned_omegas, final_loss_history) and write the tuned
    factors back into the expression's Cycle nodes.

    The ω search interval matches the grammar's relaxation-factor
    terminals (np.linspace(0.1, 1.9, 37), reference multigrid.py:428) —
    but the tuned values are continuous, a strict superset of what
    evolution alone can reach.
    """
    from evostencils_tpu.backend.lowering import CycleLowering
    from evostencils_tpu.grammar import multigrid as mg
    from evostencils_tpu.ops import stencil_ops as sops

    if lowering is None:
        lowering = CycleLowering(problem.dtype)
    step, omega_values = lowering.lower_parameterized(expression)
    grids = expression.grid if isinstance(expression.grid, list) else [expression.grid]
    level = grids[0].level
    operator = mg.generate_system_operator(
        problem.equations, problem.operators, problem.fields, level, 0, grids
    )
    u0, f = problem.initial_state(problem.dtype, level=level)
    lo, hi = omega_bounds

    def residual_norm(u):
        return sops.l2_norm(sops.tree_sub(f, lowering.system_apply(operator, u)))

    def to_omegas(params):
        # smooth bounding: ω = lo + (hi-lo)·sigmoid(p)
        return lo + (hi - lo) * jax.nn.sigmoid(params)

    def from_omegas(omegas):
        t = (jnp.asarray(omegas, dtype=jnp.float32) - lo) / (hi - lo)
        t = jnp.clip(t, 1e-4, 1 - 1e-4)
        return jnp.log(t) - jnp.log1p(-t)

    @jax.jit
    def loss_fn(params):
        omegas = to_omegas(params)
        u = u0
        for _ in range(warmup_cycles):
            u = step(u, f, omegas)
        r_start = residual_norm(u)
        for _ in range(measure_cycles):
            u = step(u, f, omegas)
        r_end = residual_norm(u)
        eps = jnp.asarray(1e-30, dtype=jnp.real(r_end).dtype)
        return jnp.log(jnp.real(r_end) + eps) - jnp.log(jnp.real(r_start) + eps)

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    params = from_omegas(omega_values)
    # Adam
    m = jnp.zeros_like(params)
    v = jnp.zeros_like(params)
    beta1, beta2, adam_eps = 0.9, 0.999, 1e-8
    best = (math.inf, params)
    history: List[float] = []
    for t in range(1, iterations + 1):
        value, grad = value_and_grad(params)
        value = float(value)
        history.append(value)
        if value < best[0] and math.isfinite(value):
            best = (value, params)
        if not jnp.all(jnp.isfinite(grad)):
            break
        m = beta1 * m + (1 - beta1) * grad
        v = beta2 * v + (1 - beta2) * grad * grad
        m_hat = m / (1 - beta1**t)
        v_hat = v / (1 - beta2**t)
        params = params - learning_rate * m_hat / (jnp.sqrt(v_hat) + adam_eps)
        if verbose and t % 10 == 0:
            print(f"tune step {t}: per-cycle log-contraction "
                  f"{value / measure_cycles:.4f}", flush=True)

    tuned = [float(w) for w in to_omegas(best[1])]
    # Write the tuned factors back into the IR (canonical slot order).
    for cycle, omega in zip(collect_cycles(expression), tuned):
        cycle.relaxation_factor = omega
    return tuned, history
