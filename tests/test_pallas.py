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
    # ≥ 512² takes the row-blocked variant (bounded only by HBM).
    assert supports_rb_sweep((1023, 1023), stencil, jnp.float32)
    assert supports_rb_sweep((2048, 2048), stencil, jnp.float32)
    assert not supports_rb_sweep((32768, 32768), stencil, jnp.float32)
    helm = gallery.Helmholtz2D(10.0, complex(1, 0.5)).generate_stencil(
        Grid((16, 16), (1 / 16, 1 / 16), 4)
    )
    assert not supports_rb_sweep((15, 15), helm, jnp.complex64)


def _jnp_rb_reference(u, f, omega, entries, inv_diag):
    """Two masked half-sweeps, residual recomputed between colors — the
    masked-jnp semantics the kernels must reproduce."""
    rows, cols = np.indices(u.shape)
    red = ((rows + cols) % 2) == 0
    u = np.asarray(u, dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    for mask in (red, ~red):
        au = np.zeros_like(u)
        for (oi, oj), v in entries:
            shifted = np.zeros_like(u)
            src = u[
                max(oi, 0): u.shape[0] + min(oi, 0),
                max(oj, 0): u.shape[1] + min(oj, 0),
            ]
            shifted[
                max(-oi, 0): u.shape[0] + min(-oi, 0),
                max(-oj, 0): u.shape[1] + min(-oj, 0),
            ] = src
            au += v * shifted
        u = u + np.where(mask, omega * inv_diag * (f - au), 0.0)
    return u


@pytest.mark.parametrize(
    "entries",
    [
        # 5-point Poisson
        (((0, 0), 4.0), ((1, 0), -1.0), ((-1, 0), -1.0),
         ((0, 1), -1.0), ((0, -1), -1.0)),
        # 9-point (same-color diagonal coupling)
        (((0, 0), 8.0 / 3), ((1, 0), -1 / 3), ((-1, 0), -1 / 3),
         ((0, 1), -1 / 3), ((0, -1), -1 / 3), ((1, 1), -1 / 3),
         ((1, -1), -1 / 3), ((-1, 1), -1 / 3), ((-1, -1), -1 / 3)),
    ],
)
def test_row_blocked_matches_reference(entries):
    """The row-blocked kernel must reproduce the masked-jnp semantics
    exactly — including at block seams and domain edges, and for
    same-color-coupled stencils (Jacobi-within-color uses old values)."""
    from evostencils_tpu.ops.pallas_kernels import _rb_blocked_call

    rng = np.random.default_rng(3)
    shape = (161, 96)  # 2 row blocks, ragged last block, odd rows
    u = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    f = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    omega = 1.15
    inv_diag = 1.0 / entries[0][1]
    out = _rb_blocked_call(
        u, f, jnp.asarray([omega], jnp.float32), entries, inv_diag, True
    )
    ref = _jnp_rb_reference(u, f, omega, entries, inv_diag)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)
