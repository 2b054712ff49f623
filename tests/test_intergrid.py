"""Intergrid transfer paths: the MXU matmul, conv and slice formulations
must agree exactly (the matmul path is the TPU hot path — 3.9 µs vs 25 ms
per 1023² round trip; see ops/intergrid.py docstring)."""

import jax.numpy as jnp
import numpy as np
import pytest

import evostencils_tpu.ops.intergrid as ig
from evostencils_tpu.ops.stencil_ops import apply_constant_stencil, pad_zeros
from evostencils_tpu.stencils import constant


@pytest.fixture
def nprng():
    return np.random.default_rng(1234)


def slice_restrict(fine, stencil, coarse_shape, coarsening):
    reach = stencil.max_reach()
    padded = pad_zeros(fine, reach)
    out = None
    for offset, value in stencil.entries:
        index = tuple(
            slice(c - 1 + o + r, c - 1 + o + r + c * (m - 1) + 1, c)
            for c, o, r, m in zip(coarsening, offset, reach, coarse_shape)
        )
        term = value * padded[index]
        out = term if out is None else out + term
    return out


def slice_prolong(coarse, stencil, fine_shape, coarsening):
    injected = ig.inject_to_fine(coarse, fine_shape, coarsening)
    return apply_constant_stencil(injected, stencil)


FW2 = constant.Stencil(
    [((i, j), (2 - abs(i)) * (2 - abs(j)) / 16.0)
     for i in (-1, 0, 1) for j in (-1, 0, 1)]
)
BL2 = constant.Stencil(
    [((i, j), (2 - abs(i)) * (2 - abs(j)) / 4.0)
     for i in (-1, 0, 1) for j in (-1, 0, 1)]
)
# Plus-shaped restriction: rank 2, NOT separable -> conv path.
PLUS = constant.Stencil(
    [((0, 0), 0.5), ((1, 0), 0.125), ((-1, 0), 0.125),
     ((0, 1), 0.125), ((0, -1), 0.125)]
)


@pytest.mark.parametrize("level", [3, 4, 5])
def test_separable_matmul_matches_slices_2d(level, nprng):
    nf, nc = 2 ** level - 1, 2 ** (level - 1) - 1
    fine = jnp.asarray(nprng.standard_normal((nf, nf)))
    coarse = jnp.asarray(nprng.standard_normal((nc, nc)))
    assert ig._axis_matrices(FW2, (nf, nf), (nc, nc), (2, 2),
                             fine.dtype, "restrict") is not None
    np.testing.assert_allclose(
        np.asarray(ig.restrict(fine, FW2, (nc, nc), (2, 2))),
        np.asarray(slice_restrict(fine, FW2, (nc, nc), (2, 2))), atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ig.prolong(coarse, BL2, (nf, nf), (2, 2))),
        np.asarray(slice_prolong(coarse, BL2, (nf, nf), (2, 2))), atol=1e-12,
    )


def test_nonseparable_conv_matches_slices(nprng):
    fine = jnp.asarray(nprng.standard_normal((15, 15)))
    assert ig._axis_matrices(PLUS, (15, 15), (7, 7), (2, 2),
                             fine.dtype, "restrict") is None
    np.testing.assert_allclose(
        np.asarray(ig.restrict(fine, PLUS, (7, 7), (2, 2))),
        np.asarray(slice_restrict(fine, PLUS, (7, 7), (2, 2))), atol=1e-12,
    )


def test_3d_separable(nprng):
    fw3 = constant.Stencil(
        [((i, j, k), (2 - abs(i)) * (2 - abs(j)) * (2 - abs(k)) / 64.0)
         for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    )
    bl3 = constant.Stencil(
        [((i, j, k), (2 - abs(i)) * (2 - abs(j)) * (2 - abs(k)) / 8.0)
         for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    )
    nf, nc = 15, 7
    fine = jnp.asarray(nprng.standard_normal((nf,) * 3))
    coarse = jnp.asarray(nprng.standard_normal((nc,) * 3))
    np.testing.assert_allclose(
        np.asarray(ig.restrict(fine, fw3, (nc,) * 3, (2, 2, 2))),
        np.asarray(slice_restrict(fine, fw3, (nc,) * 3, (2, 2, 2))), atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ig.prolong(coarse, bl3, (nf,) * 3, (2, 2, 2))),
        np.asarray(slice_prolong(coarse, bl3, (nf,) * 3, (2, 2, 2))), atol=1e-12,
    )


def test_complex_separable(nprng):
    fine = jnp.asarray(
        nprng.standard_normal((15, 15)) + 1j * nprng.standard_normal((15, 15)),
        jnp.complex128,
    )
    np.testing.assert_allclose(
        np.asarray(ig.restrict(fine, FW2, (7, 7), (2, 2))),
        np.asarray(slice_restrict(fine, FW2, (7, 7), (2, 2))), atol=1e-12,
    )


def test_injection(nprng):
    inj = constant.Stencil([((0, 0), 1.0)])
    fine = jnp.asarray(nprng.standard_normal((15, 15)))
    np.testing.assert_allclose(
        np.asarray(ig.restrict(fine, inj, (7, 7), (2, 2))),
        np.asarray(slice_restrict(fine, inj, (7, 7), (2, 2))), atol=1e-12,
    )


def test_asymmetric_separable(nprng):
    """Evolved/CMA-ES transfers need not be symmetric — asymmetric
    separable weights must factor and agree too."""
    a = np.array([0.3, 0.5, 0.2])
    b = np.array([0.1, 0.7, 0.4])
    st = constant.Stencil(
        [((i, j), float(a[i + 1] * b[j + 1]))
         for i in (-1, 0, 1) for j in (-1, 0, 1)]
    )
    fine = jnp.asarray(nprng.standard_normal((15, 15)))
    assert ig._axis_matrices(st, (15, 15), (7, 7), (2, 2),
                             fine.dtype, "restrict") is not None
    np.testing.assert_allclose(
        np.asarray(ig.restrict(fine, st, (7, 7), (2, 2))),
        np.asarray(slice_restrict(fine, st, (7, 7), (2, 2))), atol=1e-12,
    )
