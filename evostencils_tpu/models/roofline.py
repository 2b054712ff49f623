"""Roofline performance model, recalibrated to TPU.

Same estimation structure as the reference PerformanceEvaluator
(model_based_prediction/performance.py:6-271): walk the cycle IR counting
operations and transferred words per grid cell, convert to runtime via
min(peak_compute, AI · bandwidth), add per-node runtimes bottom-up with
memoization; red-black sweeps get an empirical penalty factor; the
coarse-grid-solver cost is injected (here: the cost of one dense matvec
of the assembled inverse on the MXU).

Defaults model one TPU v5e chip driving f32 stencil sweeps on the VPU:
  peak_performance ≈ 3.9e12 FLOP/s (8×128 f32 lanes × ~2 FMA-issue @ 0.94 GHz),
  peak_bandwidth   ≈ 8.1e11 B/s HBM,
  bytes_per_word   = 4 (float32).
Stencil sweeps are bandwidth-bound at these ratios, exactly as on the
reference's CPU — only the constants change.  The red-black penalty
(two half-sweeps touch the full residual twice but mask half the
updates) is ~1.6 on TPU where masked lanes still execute.
"""

from __future__ import annotations

from functools import reduce

from evostencils_tpu.ir import base, partitioning, system
from evostencils_tpu.stencils import periodic

TPU_V5E_PEAK_F32_FLOPS = 3.9e12
TPU_V5E_HBM_BANDWIDTH = 8.1e11
RED_BLACK_PENALTY_TPU = 1.6


class PerformanceEvaluator:
    def __init__(
        self,
        peak_performance: float = TPU_V5E_PEAK_F32_FLOPS,
        peak_bandwidth: float = TPU_V5E_HBM_BANDWIDTH,
        bytes_per_word: int = 4,
        runtime_coarse_grid_solver: float = 0.0,
        red_black_penalty: float = RED_BLACK_PENALTY_TPU,
        kernel_launch_overhead: float = 2e-6,
    ):
        self.peak_performance = peak_performance
        self.peak_bandwidth = peak_bandwidth
        self.bytes_per_word = bytes_per_word
        self.runtime_coarse_grid_solver = runtime_coarse_grid_solver
        self.red_black_penalty = red_black_penalty
        # Per-fused-kernel fixed cost: on TPU each fused stencil pass has a
        # dispatch/pipeline overhead that dominates for tiny coarse grids.
        self.kernel_launch_overhead = kernel_launch_overhead

    def set_runtime_of_coarse_grid_solver(self, runtime: float):
        self.runtime_coarse_grid_solver = runtime

    # -- roofline core -----------------------------------------------------

    def compute_performance(self, intensity: float) -> float:
        return min(self.peak_performance, intensity * self.peak_bandwidth)

    def compute_arithmetic_intensity(self, operations: float, words: float) -> float:
        return operations / (words * self.bytes_per_word)

    def compute_runtime(self, operations: float, words: float, total_operations: float) -> float:
        if operations <= 0.0:
            return 0.0
        intensity = self.compute_arithmetic_intensity(operations, words)
        if intensity <= 0.0:
            return 0.0
        return (
            total_operations / self.compute_performance(intensity)
            + self.kernel_launch_overhead
        )

    # -- per-node op/word counting ----------------------------------------

    @staticmethod
    def _cells(grid_list) -> int:
        grids = grid_list if isinstance(grid_list, list) else [grid_list]
        return min(reduce(lambda a, b: a * b, g.size) for g in grids)

    @staticmethod
    def _stencil_entry_count(entry) -> int:
        stencil = entry.generate_stencil()
        if stencil is None:
            return 0
        cells = periodic.get_list_of_entries(stencil)
        if not cells:
            return 0
        return max(c.number_of_entries for c in cells)

    def _residual_cost(self, residual: base.Residual):
        grid = residual.grid
        n_fields = len(grid) if isinstance(grid, list) else 1
        operator = residual.operator
        operations = 0
        loads = n_fields  # rhs
        offset_union = [set() for _ in range(n_fields)]
        for row in operator.entries:
            for i, entry in enumerate(row):
                stencil = entry.generate_stencil()
                if stencil is None:
                    continue
                cells = periodic.get_list_of_entries(stencil)
                if not cells:
                    continue
                n_entries = max(c.number_of_entries for c in cells)
                operations += 2 * n_entries  # mul + add per coefficient
                for c in cells:
                    for offset, _ in c.entries:
                        offset_union[i].add(offset)
        for s in offset_union:
            loads += len(s)
        words = loads + n_fields  # + store
        return operations, words

    def _smoother_cost(self, inverse_operand, residual: base.Residual):
        operations_r, words_r = self._residual_cost(residual)
        grid = residual.grid
        n_fields = len(grid) if isinstance(grid, list) else 1
        expression = inverse_operand
        if isinstance(expression, system.Diagonal):
            operations = n_fields + operations_r
            words = n_fields + words_r
        elif isinstance(expression, (system.ElementwiseDiagonal, system.Operator)):
            n = n_fields
            if isinstance(expression, system.Operator):
                for i in range(n_fields):
                    entry = expression.entries[i][i]
                    stencil = entry.generate_stencil()
                    n += len(periodic.count_number_of_entries(stencil)) - 1
            # Gaussian-elimination cost of the n×n local system
            multiplications = round(n**3 / 3 + n**2 - n / 3)
            additions = round(n**3 / 3 + n**2 / 2 - 5 * n / 6)
            operations = multiplications + additions + (n // n_fields) * operations_r
            words = n + (n // n_fields) * words_r
        elif isinstance(expression, base.Addition):
            # FAS Newton: D + J — treat as a collective point solve plus
            # one Jacobian evaluation per Newton step.
            steps = getattr(expression.operand2, "n_newton_steps", 1)
            operations = steps * (3 * n_fields + operations_r)
            words = n_fields + words_r
        else:
            raise NotImplementedError("Smoother not supported by roofline model")
        return operations, words

    def _intergrid_cost(self, operator):
        operations = 0
        words = 0
        for row in operator.entries:
            for entry in row:
                if isinstance(entry, (base.ZeroProlongation, base.ZeroRestriction)):
                    continue
                n = self._stencil_entry_count(entry)
                operations += 2 * n
                words += n + 1
        return operations, words

    # -- recursive runtime estimation (reference performance.py:50-148) ----

    def estimate_runtime(self, expression: base.Expression) -> float:
        cached = expression.analysis_cache.get("roofline_runtime")
        if cached is not None:
            return cached
        runtime = self._estimate(expression)
        expression.analysis_cache["roofline_runtime"] = runtime
        return runtime

    def _estimate(self, expression) -> float:
        if isinstance(expression, base.Cycle):
            correction = expression.correction
            if isinstance(correction, base.Residual):
                operations, words = 0, 0
                runtime = self.estimate_runtime(correction)
            elif isinstance(correction, base.Multiplication):
                if isinstance(correction.operand1, system.InterGridOperator):
                    runtime = self.estimate_runtime(correction.operand2)
                    operations, words = self._intergrid_cost(correction.operand1)
                elif isinstance(correction.operand1, base.Inverse):
                    residual = correction.operand2
                    runtime = self._dependency_runtime(residual)
                    operations, words = self._smoother_cost(
                        correction.operand1.operand, residual
                    )
                else:
                    runtime = self.estimate_runtime(correction)
                    operations, words = 0, 0
            else:
                runtime = self.estimate_runtime(correction)
                operations, words = 0, 0
            grid = expression.grid
            n_fields = len(grid) if isinstance(grid, list) else 1
            operations += 2 * n_fields  # scale + add of the update
            words += 2 * n_fields  # load + store of the iterate
            cells = self._cells(expression.grid)
            step = self.compute_runtime(operations, words, operations * cells)
            if expression.partitioning is partitioning.RedBlack or isinstance(
                expression.partitioning, partitioning.RedBlack
            ):
                step *= self.red_black_penalty
            return runtime + step

        if isinstance(expression, base.Residual):
            runtime = self._dependency_runtime(expression)
            operations, words = self._residual_cost(expression)
            cells = self._cells(expression.grid)
            return runtime + self.compute_runtime(operations, words, operations * cells)

        if isinstance(expression, base.Multiplication):
            op1 = expression.operand1
            if isinstance(op1, system.InterGridOperator):
                runtime = self.estimate_runtime(expression.operand2)
                operations, words = self._intergrid_cost(op1)
                cells = self._cells(expression.grid)
                return runtime + self.compute_runtime(operations, words, operations * cells)
            if isinstance(op1, base.CoarseGridSolver):
                runtime = self.estimate_runtime(expression.operand2)
                if op1.expression is not None and hasattr(op1.expression, "expression"):
                    runtime += self.estimate_runtime(op1.expression.expression)
                elif self.runtime_coarse_grid_solver:
                    runtime += self.runtime_coarse_grid_solver
                else:
                    # Dense inverse matvec on the MXU: 2·N² flops at matmul
                    # rates, N = coarse unknowns.
                    n = self._cells(op1.grid) * (
                        len(op1.grid) if isinstance(op1.grid, list) else 1
                    )
                    runtime += max(
                        2.0 * n * n / self.peak_performance,
                        n * n * self.bytes_per_word / self.peak_bandwidth,
                    ) + self.kernel_launch_overhead
                return runtime
            if isinstance(op1, base.Inverse):
                residual = expression.operand2
                runtime = self._dependency_runtime(residual)
                operations, words = self._smoother_cost(op1.operand, residual)
                cells = self._cells(expression.grid)
                return runtime + self.compute_runtime(operations, words, operations * cells)
            runtime = self.estimate_runtime(expression.operand2)
            return runtime

        if isinstance(expression, (base.Addition, base.Subtraction)):
            grid = expression.grid
            n_fields = len(grid) if isinstance(grid, list) else 1
            cells = self._cells(grid)
            ops = n_fields
            words = 3 * n_fields
            return (
                self.estimate_runtime(expression.operand1)
                + self.estimate_runtime(expression.operand2)
                + self.compute_runtime(ops, words, ops * cells)
            )
        if isinstance(expression, base.Scaling):
            return self.estimate_runtime(expression.operand)
        if isinstance(expression, (base.Entity, system.System)):
            return 0.0
        raise NotImplementedError(f"Roofline: {type(expression).__name__}")

    def _dependency_runtime(self, residual: base.Residual) -> float:
        runtime = 0.0
        if not isinstance(residual.rhs, system.RightHandSide):
            runtime += self.estimate_runtime(residual.rhs)
        if not isinstance(residual.approximation, system.Approximation) or isinstance(
            residual.approximation, base.Cycle
        ):
            if not type(residual.approximation) in (
                system.Approximation,
                system.ZeroApproximation,
            ):
                runtime += self.estimate_runtime(residual.approximation)
        return runtime
