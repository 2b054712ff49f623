"""Unit tests for the stencil algebra (constant + periodic)."""

import numpy as np
import pytest

from evostencils_tpu.ir import base
from evostencils_tpu.stencils import constant, gallery, periodic


def fd_laplace_2d(h=0.5):
    return gallery.Poisson2D().generate_stencil(
        base.Grid((int(1 / h), int(1 / h)), (h, h), 1)
    )


def dense_from_stencil(stencil, shape):
    """Dense matrix of the stencil on a small Dirichlet grid (oracle)."""
    n = int(np.prod(shape))
    A = np.zeros((n, n))
    for idx in np.ndindex(*shape):
        row = np.ravel_multi_index(idx, shape)
        for offset, value in stencil.entries:
            target = tuple(i + o for i, o in zip(idx, offset))
            if all(0 <= t < s for t, s in zip(target, shape)):
                A[row, np.ravel_multi_index(target, shape)] += value
    return A


class TestConstant:
    def test_canonical_merge(self):
        s = constant.Stencil([((0, 0), 1.0), ((0, 0), 2.0), ((1, 0), -1.0)])
        assert s.number_of_entries == 2
        assert s.center_value() == 3.0

    def test_splits(self):
        s = fd_laplace_2d()
        d = constant.diagonal(s)
        lo = constant.lower(s)
        up = constant.upper(s)
        assert d.number_of_entries == 1
        assert lo.number_of_entries + up.number_of_entries + 1 == s.number_of_entries
        recombined = constant.add(constant.add(lo, d), up)
        assert recombined == s

    def test_transpose_involution(self):
        s = constant.Stencil([((1, 0), 2.0), ((0, -1), 3.0), ((0, 0), 1.0)])
        assert constant.transpose(constant.transpose(s)) == s

    def test_inverse_diagonal_only(self):
        d = constant.Stencil([((0, 0), 4.0)])
        assert constant.inverse(d).center_value() == 0.25
        with pytest.raises(RuntimeError):
            constant.inverse(fd_laplace_2d())

    def test_mul_matches_dense_composition(self):
        """Stencil composition == matrix product in the grid interior."""
        s1 = constant.Stencil([((0, 0), 2.0), ((1, 0), -1.0)])
        s2 = constant.Stencil([((0, 0), 1.0), ((0, 1), 0.5)])
        composed = constant.mul(s1, s2)
        shape = (6, 6)
        A1 = dense_from_stencil(s1, shape)
        A2 = dense_from_stencil(s2, shape)
        Ac = dense_from_stencil(composed, shape)
        # Interior rows (away from the boundary) must agree exactly.
        interior = [
            np.ravel_multi_index((i, j), shape)
            for i in range(1, 5)
            for j in range(1, 5)
        ]
        np.testing.assert_allclose((A1 @ A2)[interior], Ac[interior], atol=1e-14)

    def test_scale_add_sub(self):
        s = fd_laplace_2d()
        z = constant.sub(s, s)
        assert all(v == 0 for _, v in z.entries)
        doubled = constant.add(s, s)
        assert doubled == constant.scale(2.0, s)


class TestPeriodic:
    def test_lift_roundtrip(self):
        s = fd_laplace_2d()
        p = periodic.from_constant(s)
        assert p.is_uniform() and p.as_constant() == s

    def test_red_black_partitioning(self):
        s = fd_laplace_2d()
        grid = base.Grid((8, 8), (0.125, 0.125), 3)
        red, black = periodic.red_black_partitioning(s, grid)
        assert red.period == (2, 2)
        # red + black == identity filter everywhere
        total = periodic.add(red, black)
        for cell in total.cells.flat:
            assert cell.number_of_entries == 1 and cell.center_value() == 1.0
        # disjoint supports
        assert red[(0, 0)].number_of_entries == 1
        assert black[(0, 0)].number_of_entries == 0
        assert red[(0, 1)].number_of_entries == 0
        assert black[(0, 1)].number_of_entries == 1

    def test_block_diagonal_2x2(self):
        s = fd_laplace_2d()
        bd = periodic.block_diagonal(s, (2, 2))
        assert bd.period == (2, 2)
        # cell (0,0) keeps center, east, south neighbors only
        kept = bd[(0, 0)].offsets
        assert (0, 0) in kept and (1, 0) in kept and (0, 1) in kept
        assert (-1, 0) not in kept and (0, -1) not in kept
        # corner cell (1,1) keeps center, west, north
        kept = bd[(1, 1)].offsets
        assert (0, 0) in kept and (-1, 0) in kept and (0, -1) in kept

    def test_combine_period_broadcast(self):
        s = fd_laplace_2d()
        bd = periodic.block_diagonal(s, (2, 2))
        summed = periodic.add(bd, s)
        assert summed.period == (2, 2)


class TestGallery:
    def test_poisson_2d_row_sum(self):
        s = fd_laplace_2d(h=0.25)
        assert abs(sum(v for _, v in s.entries)) < 1e-12

    def test_interp_and_restriction_weights(self):
        p = gallery.multilinear_interpolation_stencil(2)
        assert p.center_value() == 1.0
        assert dict(p.entries)[(1, 1)] == 0.25
        r = gallery.full_weighting_restriction_stencil(2)
        assert abs(sum(v for _, v in r.entries) - 1.0) < 1e-12

    def test_variable_coefficient_planes(self):
        gen = gallery.Poisson2DVariableCoefficients()
        grid = base.Grid((8, 8), (0.125, 0.125), 3)
        offsets, planes = gen.generate_coefficient_arrays(grid)
        assert len(offsets) == 5
        assert planes[0].shape == (7, 7)
        # row sum of -div(a grad) is zero for interior rows
        total = sum(planes)
        np.testing.assert_allclose(total, 0.0, atol=1e-9)

    def test_variable_matches_constant_at_unit_coefficient(self):
        gen = gallery.Poisson2DVariableCoefficients(lambda x, y: np.ones_like(x))
        grid = base.Grid((8, 8), (0.125, 0.125), 3)
        offsets, planes = gen.generate_coefficient_arrays(grid)
        const = gallery.Poisson2D().generate_stencil(grid)
        lookup = dict(const.entries)
        for o, p in zip(offsets, planes):
            np.testing.assert_allclose(p, lookup[o], rtol=1e-12)
