"""Pallas fused red-black kernel: equivalence with the jnp lowering."""

import jax.numpy as jnp
import numpy as np
import pytest

from evostencils_tpu.backend.lowering import CycleLowering
from evostencils_tpu.grammar.multigrid import generate_primitive_set
from evostencils_tpu.ir.reference_cycles import generate_v_22_cycle_two_grid
from evostencils_tpu.problems.poisson import poisson_2d


def test_fused_rb_sweep_matches_jnp():
    problem = poisson_2d(min_level=3, max_level=4, dtype=jnp.float32)
    _, terminals = generate_primitive_set(
        problem.approximation(), problem.rhs(), 2, problem.coarsening_factors,
        4, problem.equations, problem.operators, problem.fields, depth=1,
        maximum_local_system_size=4,
    )
    cycle = generate_v_22_cycle_two_grid(terminals[0], problem.rhs())
    rng = np.random.default_rng(0)
    u0 = (jnp.asarray(rng.standard_normal((15, 15)), dtype=jnp.float32),)
    f = (jnp.asarray(rng.standard_normal((15, 15)), dtype=jnp.float32),)
    out_jnp = CycleLowering(jnp.float32, use_pallas=False).lower(cycle)(u0, f)[0]
    # On CPU the kernel runs in interpret mode automatically.
    out_pallas = CycleLowering(jnp.float32, use_pallas=True).lower(cycle)(u0, f)[0]
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_jnp), atol=5e-6
    )


def test_fallback_conditions():
    from evostencils_tpu.ops.pallas_kernels import supports_rb_sweep
    from evostencils_tpu.stencils import gallery
    from evostencils_tpu.ir.base import Grid

    stencil = gallery.Poisson2D().generate_stencil(Grid((16, 16), (1 / 16, 1 / 16), 4))
    assert supports_rb_sweep((15, 15), stencil, jnp.float32)
    assert not supports_rb_sweep((15, 15), stencil, jnp.float64)
    assert not supports_rb_sweep((2048, 2048), stencil, jnp.float32)
    helm = gallery.Helmholtz2D(10.0, complex(1, 0.5)).generate_stencil(
        Grid((16, 16), (1 / 16, 1 / 16), 4)
    )
    assert not supports_rb_sweep((15, 15), helm, jnp.complex64)
