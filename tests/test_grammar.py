"""Grammar + GP engine tests: typing discipline, tree ops, round-trips."""

import random

import jax.numpy as jnp
import pytest

from evostencils_tpu.backend.evaluation import JaxProgramGenerator
from evostencils_tpu.grammar import gp
from evostencils_tpu.grammar.multigrid import generate_primitive_set
from evostencils_tpu.ir import base
from evostencils_tpu.ir.transformations import canonical_string, obtain_coarsest_level
from evostencils_tpu.problems.poisson import poisson_2d


@pytest.fixture(scope="module")
def setup():
    problem = poisson_2d(min_level=3, max_level=5, dtype=jnp.float64)
    pset, terminals = generate_primitive_set(
        problem.approximation(),
        problem.rhs(),
        problem.dimension,
        problem.coarsening_factors,
        problem.max_level,
        problem.equations,
        problem.operators,
        problem.fields,
        depth=2,
        maximum_local_system_size=4,
    )
    return problem, pset, terminals


def grow(pset, rng, **kw):
    return gp.gen_grow(pset, 2, 12, rng=rng, **kw)


class TestGrammar:
    def test_every_tree_reaches_coarsest_solve(self, setup, rng):
        _, pset, _ = setup
        for _ in range(25):
            tree = grow(pset, rng)
            names = [n.name for n in tree]
            assert any(
                name.startswith("correct_with_coarse_grid_solver") for name in names
            ), "guard-type discipline violated"
            assert "u_and_f" in names

    def test_compile_produces_cycle(self, setup, rng):
        _, pset, _ = setup
        tree = grow(pset, rng)
        expr, rhs = gp.compile_tree(tree, pset)
        assert isinstance(expr, base.Cycle)
        assert obtain_coarsest_level(expr) >= 1

    def test_string_roundtrip(self, setup, rng):
        _, pset, _ = setup
        for _ in range(10):
            tree = grow(pset, rng)
            s = str(tree)
            again = gp.parse_tree(s, pset)
            assert str(again) == s
            e1, _ = gp.compile_tree(tree, pset)
            e2, _ = gp.compile_tree(again, pset)
            assert canonical_string(e1) == canonical_string(e2)

    def test_crossover_type_safety(self, setup, rng):
        _, pset, _ = setup
        for _ in range(20):
            t1, t2 = grow(pset, rng), grow(pset, rng)
            c1, c2 = gp.cx_one_point(t1.copy(), t2.copy(), rng=rng)
            for child in (c1, c2):
                expr, _ = gp.compile_tree(child, pset)  # must not raise
                assert isinstance(expr, base.Cycle)

    def test_mutation_type_safety(self, setup, rng):
        _, pset, _ = setup
        for _ in range(20):
            t = grow(pset, rng)
            (m,) = gp.mut_node_replacement(t.copy(), pset, rng=rng)
            gp.compile_tree(m, pset)
            (m2,) = gp.mutate_subtree(t.copy(), 0, 10, pset, rng=rng)
            gp.compile_tree(m2, pset)

    def test_relaxation_factor_terminals(self, setup):
        _, pset, _ = setup
        rf = [t for ts in pset.terminals.values() for t in ts if t.name.startswith("rf_")]
        assert len(rf) == 37

    def test_subtree_search(self, setup, rng):
        _, pset, _ = setup
        tree = grow(pset, rng)
        sl = tree.search_subtree(0)
        assert sl == slice(0, len(tree))

    def test_evaluated_random_trees(self, setup, rng):
        problem, pset, _ = setup
        gen = JaxProgramGenerator(problem, dtype=jnp.float64, iteration_limit=100)
        converged = 0
        for _ in range(6):
            tree = grow(pset, rng)
            expr, _ = gp.compile_tree(tree, pset)
            t, rho, iters = gen.generate_and_evaluate(expr, evaluation_samples=1)
            assert rho > 0
            # Convergence within budget is signaled by a finite time; the
            # iteration slot stays finite (measured count) even for
            # cap-breaching individuals.
            if t < 1e50:
                converged += 1
                assert rho < 1 and iters <= gen.iteration_limit
        assert converged >= 1  # statistically ~75% converge


class TestSelectUniqueBest:
    def test_dedup_and_order(self):
        t1 = gp.Tree([gp.Terminal("a", None, 1)])
        t1.fitness_values = (3.0,)
        t2 = gp.Tree([gp.Terminal("b", None, 1)])
        t2.fitness_values = (1.0,)
        t3 = gp.Tree([gp.Terminal("b", None, 1)])
        t3.fitness_values = (2.0,)
        best = gp.select_unique_best([t1, t2, t3], 2)
        assert [str(b) for b in best] == ["b", "a"]


class TestTextbookSeedString:
    def test_textbook_string_matches_reference_cycle(self):
        """textbook_cycle_string must parse under the grammar's pset and
        compile to the exact IR generate_v_cycle builds (numerically
        identical step at f64)."""
        import jax
        import numpy as np
        from evostencils_tpu.backend.lowering import CycleLowering
        from evostencils_tpu.grammar.multigrid import (
            generate_primitive_set, textbook_cycle_string,
        )
        from evostencils_tpu.ir.reference_cycles import generate_v_cycle
        from evostencils_tpu.problems.poisson import poisson_2d

        problem = poisson_2d(min_level=3, max_level=6, dtype=jnp.float64)
        pset, tl = generate_primitive_set(
            problem.approximation(), problem.rhs(), 2,
            problem.coarsening_factors, 6, problem.equations,
            problem.operators, problem.fields, depth=3,
            maximum_local_system_size=8,
        )
        s = textbook_cycle_string(tl, 2, 1, omega_index=16, cgc_omega_index=16)
        expr, _ = gp.compile_tree(gp.parse_tree(s, pset), pset)
        ref = generate_v_cycle(tl, problem.rhs(), 2, 1, omega=0.9)
        low = CycleLowering(jnp.float64)
        u0, f = problem.initial_state(jnp.float64)
        sa, ova = low.lower_parameterized(expr)
        sb, ovb = low.lower_parameterized(ref)
        ua = jax.jit(sa)(u0, f, jnp.asarray(ova, jnp.float32))
        ub = jax.jit(sb)(u0, f, jnp.asarray(ovb, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(ua[0]), np.asarray(ub[0]), rtol=1e-12, atol=1e-14
        )

    def test_textbook_string_fas(self):
        """FAS textbook strings parse under the nonlinear grammar (extra
        trailing R on update_with_coarse_grid_correction, Picard/Newton
        smoothers) and evaluate to a converging solver."""
        from evostencils_tpu.backend.evaluation import JaxProgramGenerator
        from evostencils_tpu.grammar.multigrid import (
            generate_primitive_set, textbook_cycle_string,
        )
        from evostencils_tpu.problems.fas import fas_2d

        problem = fas_2d(min_level=3, max_level=5, dtype=jnp.float64)
        pset, tl = generate_primitive_set(
            problem.approximation(), problem.rhs(), problem.dimension,
            problem.coarsening_factors, problem.max_level, problem.equations,
            problem.operators, problem.fields, depth=2,
            maximum_local_system_size=4, FAS=True,
        )
        gen = JaxProgramGenerator(problem, dtype=jnp.float64)
        for smoother in ("jacobi_picard", "jacobi_newton"):
            s = textbook_cycle_string(tl, 2, 2, omega_index=18, FAS=True,
                                      smoother_name=smoother)
            expr, _ = gp.compile_tree(gp.parse_tree(s, pset), pset)
            t, rho, iters = gen.generate_and_evaluate(expr, evaluation_samples=1)
            assert 0 < rho < 1.0, f"{smoother}: rho={rho}"
            assert t < 1e50
