"""Cycle-VM semantics: the structural interpreter (backend/vm.py) must be
an exact stand-in for the per-structure lowering on the whole linear
multigrid grammar — same math, zero per-structure compiles."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evostencils_tpu.backend.lowering import CycleLowering
from evostencils_tpu.backend.vm import CycleVM, PROGRAM_PAD
from evostencils_tpu.grammar import gp
from evostencils_tpu.grammar.multigrid import generate_primitive_set
from evostencils_tpu.ir import reference_cycles
from evostencils_tpu.problems.poisson import poisson_2d


@pytest.fixture(scope="module")
def setup():
    problem = poisson_2d(min_level=3, max_level=6, dtype=jnp.float64)
    pset, tl = generate_primitive_set(
        problem.approximation(), problem.rhs(), 2, problem.coarsening_factors,
        problem.max_level, problem.equations, problem.operators, problem.fields,
        depth=3, maximum_local_system_size=8,
    )
    lowering = CycleLowering(jnp.float64)
    vm = CycleVM(lowering, problem, 6)
    return problem, pset, tl, lowering, vm


def test_textbook_v_cycle_matches_lowering(setup):
    problem, _, tl, lowering, vm = setup
    cycle = reference_cycles.generate_v_cycle(
        tl, problem.rhs(), pre_smoothing=2, post_smoothing=1, omega=0.9
    )
    program = vm.translate(cycle)
    assert program is not None and 0 < program.length <= PROGRAM_PAD
    u0, f = problem.initial_state(jnp.float64)
    step_l, ov = lowering.lower_parameterized(cycle)
    expected = jax.jit(step_l)(u0, f, jnp.asarray(ov, dtype=jnp.float32))
    got = jax.jit(vm.make_step())(u0, f, program.as_arguments())
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expected[0]), rtol=1e-13, atol=1e-14
    )


def test_random_individuals_match_and_isa_is_stable(setup):
    """Property test over the grammar: every generated individual must be
    translatable, match the lowered step, and never grow the ISA (the
    standard surface is pre-registered, so the interpreter executable is
    stable from the first individual)."""
    problem, pset, _, lowering, vm = setup
    u0, f = problem.initial_state(jnp.float64)
    step = jax.jit(vm.make_step())
    version0 = vm.isa_version
    rng = random.Random(11)
    n_checked = 0
    for _ in range(25):
        tree = gp.gen_grow(pset, 0, 50, rng=rng)
        try:
            expr, _ = gp.compile_tree(tree, pset)
        except (RuntimeError, MemoryError):
            continue
        program = vm.translate(expr)
        assert program is not None, f"untranslatable grammar individual: {tree}"
        step_l, ov = lowering.lower_parameterized(expr)
        expected = jax.jit(step_l)(u0, f, jnp.asarray(ov, dtype=jnp.float32))
        got = step(u0, f, program.as_arguments())
        scale = max(1e-30, float(jnp.max(jnp.abs(expected[0]))))
        diff = float(jnp.max(jnp.abs(got[0] - expected[0])))
        assert diff / scale < 1e-12
        n_checked += 1
    assert n_checked >= 10
    assert vm.isa_version == version0


def test_long_program_pages_to_larger_pad(setup):
    """A >64-instruction structure (the grammar's deep/size-150 regime)
    must stay on the compile-free VM path via the next pad class, not fall
    off to a per-structure compile (round-2 weakness: silent pad overflow
    at backend/vm.py PROGRAM_PAD)."""
    problem, _, tl, lowering, vm = setup
    from evostencils_tpu.ir import base, partitioning as part, smoother

    t0 = tl[0]
    f = problem.rhs()
    u, A = t0.approximation, t0.operator
    for _ in range(70):  # 70 smoothing instructions > PROGRAM_PAD
        res = base.Residual(A, u, f)
        corr = base.Multiplication(
            base.Inverse(smoother.generate_collective_jacobi(A)), res
        )
        u = base.Cycle(u, f, corr, partitioning=part.RedBlack,
                       relaxation_factor=1.0)
    program = vm.translate(u)
    assert program is not None, f"pad overflow: {vm.last_failure}"
    assert program.length == 70
    assert program.opcodes.shape[0] == 160  # next pad class
    # Executes correctly through the same interpreter callable.
    u0, fv = problem.initial_state(jnp.float64)
    step_l, ov = lowering.lower_parameterized(u)
    expected = jax.jit(step_l)(u0, fv, jnp.asarray(ov, dtype=jnp.float32))
    got = jax.jit(vm.make_step())(u0, fv, program.as_arguments())
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expected[0]), rtol=1e-12, atol=1e-13
    )


def test_pad_overflow_counter_stays_zero_for_long_programs():
    """End-to-end through JaxProgramGenerator: the long structure takes the
    VM path (vm_hits) and vm_pad_overflows stays 0."""
    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.ir import base, partitioning as part, smoother

    problem = poisson_2d(min_level=4, max_level=5, dtype=jnp.float64)
    _, tl = generate_primitive_set(
        problem.approximation(), problem.rhs(), 2, problem.coarsening_factors,
        5, problem.equations, problem.operators, problem.fields, depth=1,
        maximum_local_system_size=4,
    )
    gen = JaxProgramGenerator(problem, dtype=jnp.float64)
    t0 = tl[0]
    f = problem.rhs()
    u, A = t0.approximation, t0.operator
    for _ in range(66):
        res = base.Residual(A, u, f)
        corr = base.Multiplication(
            base.Inverse(smoother.generate_collective_jacobi(A)), res
        )
        u = base.Cycle(u, f, corr, partitioning=part.RedBlack,
                       relaxation_factor=0.9)
    t, rho, iters = gen.generate_and_evaluate(u, evaluation_samples=1)
    assert rho < 1.0
    assert gen.vm_pad_overflows == 0
    assert gen.vm_hits >= 1 and gen.vm_misses == 0


def test_generate_and_evaluate_uses_vm(setup):
    """End-to-end: two different structures evaluate through one shared
    interpreter entry in the solver cache, with correct poisoning for a
    divergent individual."""
    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.ir import base, partitioning as part, smoother

    problem = poisson_2d(min_level=4, max_level=5, dtype=jnp.float64)
    _, tl = generate_primitive_set(
        problem.approximation(), problem.rhs(), 2, problem.coarsening_factors,
        5, problem.equations, problem.operators, problem.fields, depth=1,
        maximum_local_system_size=4,
    )
    gen = JaxProgramGenerator(problem, dtype=jnp.float64)
    t0 = tl[0]
    f = problem.rhs()

    def jacobi(omega, steps):
        u, A = t0.approximation, t0.operator
        for _ in range(steps):
            res = base.Residual(A, u, f)
            corr = base.Multiplication(
                base.Inverse(smoother.generate_collective_jacobi(A)), res
            )
            u = base.Cycle(
                u, f, corr, partitioning=part.Single, relaxation_factor=omega
            )
        return u

    t1, rho1, it1 = gen.generate_and_evaluate(jacobi(0.7, 2), evaluation_samples=1)
    t2, rho2, it2 = gen.generate_and_evaluate(jacobi(0.9, 3), evaluation_samples=1)
    assert rho1 < 1.0 and rho2 < 1.0
    vm_keys = [k for k in gen._solver_cache if isinstance(k, tuple) and k[0] == "__vm__"]
    assert len(vm_keys) == 1
    # omega=1.9 plain Jacobi diverges -> infinity poisoning through the VM
    t3, rho3, it3 = gen.generate_and_evaluate(jacobi(1.9, 1), evaluation_samples=1)
    # Time is poisoned; the iteration slot reports the finite measured/
    # extrapolated count for the EA's sqrt(rho*iters) fallback.
    assert t3 == 1e100
    assert it3 >= gen.iteration_limit
    assert len([k for k in gen._solver_cache if isinstance(k, tuple) and k[0] == "__vm__"]) == 1


def test_vm_omega_groups_batch_in_one_dispatch():
    """Same-structure, different-ω individuals must evaluate through the
    vmapped VM power iteration (batch rides the program's ω slice) and
    agree with per-individual evaluation."""
    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.ir import base, partitioning as part, smoother
    from evostencils_tpu.ir.reference_cycles import generate_v_cycle

    problem = poisson_2d(min_level=3, max_level=5, dtype=jnp.float32)
    _, tl = generate_primitive_set(
        problem.approximation(), problem.rhs(), 2, problem.coarsening_factors,
        5, problem.equations, problem.operators, problem.fields, depth=2,
        maximum_local_system_size=4,
    )
    exprs = [
        generate_v_cycle(tl, problem.rhs(), 2, 1, omega=w)
        for w in (0.8, 0.9, 1.0, 1.1)
    ]
    gen = JaxProgramGenerator(problem, dtype=jnp.float32)
    grouped = gen.generate_and_evaluate_group(exprs, evaluation_samples=1)
    gen2 = JaxProgramGenerator(problem, dtype=jnp.float32)
    singles = [
        gen2.generate_and_evaluate(e, evaluation_samples=1) for e in exprs
    ]
    assert len(grouped) == 4
    assert gen._vmapped_cache, "vmapped VM power path was not used"
    for (tg, rg, ig), (ts, rs, is_) in zip(grouped, singles):
        assert rg == pytest.approx(rs, rel=1e-4)
        assert ig == is_


def test_vm_group_batching_across_pad_classes():
    """Groups from DIFFERENT pad classes (64-instruction then 160) must
    each batch through their own compiled interpreter: the vmapped cache
    key carries the pad size, so a pad-64 executable is never invoked
    with pad-160 program shapes (round-3 crasher: TypeError mid-run)."""
    from evostencils_tpu.backend.evaluation import JaxProgramGenerator
    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.ir import base, partitioning as part, smoother
    from evostencils_tpu.ir.reference_cycles import generate_v_cycle

    problem = poisson_2d(min_level=3, max_level=5, dtype=jnp.float32)
    _, tl = generate_primitive_set(
        problem.approximation(), problem.rhs(), 2, problem.coarsening_factors,
        5, problem.equations, problem.operators, problem.fields, depth=2,
        maximum_local_system_size=4,
    )

    def deep_chain(omega):
        t0 = tl[0]
        f = problem.rhs()
        u, A = t0.approximation, t0.operator
        for _ in range(66):  # 66 instructions -> pad class 160
            res = base.Residual(A, u, f)
            corr = base.Multiplication(
                base.Inverse(smoother.generate_collective_jacobi(A)), res
            )
            u = base.Cycle(u, f, corr, partitioning=part.RedBlack,
                           relaxation_factor=omega)
        return u

    short_exprs = [
        generate_v_cycle(tl, problem.rhs(), 2, 1, omega=w)
        for w in (0.8, 0.9, 1.0, 1.1)
    ]
    long_exprs = [deep_chain(w) for w in (0.7, 0.8, 0.9, 1.0)]

    gen = JaxProgramGenerator(problem, dtype=jnp.float32)
    short_res = gen.generate_and_evaluate_group(short_exprs, evaluation_samples=1)
    long_res = gen.generate_and_evaluate_group(long_exprs, evaluation_samples=1)
    assert len(short_res) == 4 and len(long_res) == 4
    # Both pad classes took the batched path (distinct vmapped cache keys).
    pads = {k[0][-1] for k in gen._vmapped_cache}
    assert pads == {64, 160}, f"expected both pad classes batched, got {pads}"
    gen2 = JaxProgramGenerator(problem, dtype=jnp.float32)
    for (tg, rg, ig), e in zip(long_res, long_exprs):
        ts, rs, is_ = gen2.generate_and_evaluate(e, evaluation_samples=1)
        assert rg == pytest.approx(rs, rel=1e-4, abs=1e-6)
