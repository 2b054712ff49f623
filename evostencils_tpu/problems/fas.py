"""Nonlinear FAS model problem: -Δu + γ·u·eᵘ = f.

Mirrors example_problems/FAS_2D_Basic/FAS_2D_Basic_template.exa4:
  * operator A(u) = Laplace·u + gamSten(u)·u with gamSten = γ·exp(u), γ=20,
  * manufactured solution (x² − x³)·sin(3πy) with the matching RHS,
  * Newton–Jacobi smoothing with denominator diag(L) + γ(1+u)eᵘ
    (the analytic Jacobian the reference derives via sympy.diff,
    exastencils_FAS.py:52-55),
  * coarsest-grid solve = 200 damped smoother sweeps,
  * solve protocol: residual reduction 1e-10, iteration cap 300.

The grammar runs in FAS mode (τ-corrected restriction, Picard/Newton
smoother productions, solution-restriction coarse-grid correction).
"""

from __future__ import annotations

import math

import numpy as np

from evostencils_tpu.ir import base
from evostencils_tpu.problems.api import Problem
from evostencils_tpu.stencils import constant, gallery


class NonlinearLambdaExpGenerator:
    """Stencil generator for A(u) = L·u + γ·u·eᵘ (pointwise nonlinearity).

    Implements the nonlinear-operator protocol consumed by the lowering
    (backend/lowering.py): `apply`, `nonlinear_term`, `derivative_diag`,
    `linear_center`; plus `generate_stencil` returning the linearization
    at u=0 (L + γ·I) so stencil-algebra passes (diagonal splits, LFA at
    the linearized state) keep working.
    """

    is_nonlinear = True

    def __init__(self, gamma: float = 20.0):
        self.gamma = gamma
        self._laplace_cache = {}

    def is_variable(self):
        return False

    def _laplace(self, grid) -> constant.Stencil:
        if grid not in self._laplace_cache:
            self._laplace_cache[grid] = gallery.Poisson2D().generate_stencil(grid)
        return self._laplace_cache[grid]

    def generate_stencil(self, grid):
        return constant.add(
            self._laplace(grid), constant.Stencil([((0, 0), self.gamma)])
        )

    # ---- nonlinear protocol ----

    def apply(self, u, grid):
        from evostencils_tpu.ops.stencil_ops import apply_constant_stencil

        return apply_constant_stencil(u, self._laplace(grid)) + self.nonlinear_term(u)

    def nonlinear_term(self, u):
        import jax.numpy as jnp

        return self.gamma * u * jnp.exp(u)

    def derivative_diag(self, u):
        import jax.numpy as jnp

        return self.gamma * (1.0 + u) * jnp.exp(u)

    def linear_center(self, grid):
        return self._laplace(grid).center_value()


def _solution(x, y):
    return (x**2 - x**3) * np.sin(3 * math.pi * y)


def _rhs(x, y, gamma=20.0):
    """RHS of the 'enhanced test problem' (FAS_2D_Basic_template.exa4)."""
    return (
        (9.0 * math.pi**2 + gamma * np.exp(_solution(x, y))) * (x**2 - x**3)
        + 6.0 * x
        - 2.0
    ) * np.sin(3 * math.pi * y)


def fas_2d(min_level=6, max_level=10, gamma=20.0, dtype=None) -> Problem:
    import jax.numpy as jnp

    return Problem(
        name="FAS_2D_Basic",
        dimension=2,
        min_level=min_level,
        max_level=max_level,
        fields=["u"],
        equation_strings=[("eq_u", "A * u == f")],
        operator_factories={
            "A": (
                lambda level, params: NonlinearLambdaExpGenerator(
                    params.get("gamma", gamma)
                ),
                base.Operator,
            ),
            "R": (
                lambda level, params: gallery.FullWeightingRestrictionGenerator((2, 2)),
                base.Restriction,
            ),
            "P": (
                lambda level, params: gallery.MultilinearInterpolationGenerator((2, 2)),
                base.Prolongation,
            ),
        },
        rhs_functions=[lambda x, y: _rhs(x, y, gamma)],
        dtype=dtype if dtype is not None else jnp.float32,
        parameters={"gamma": gamma},
        uses_fas=True,
        residual_target=1e-10,
        iteration_limit=300,
    )
