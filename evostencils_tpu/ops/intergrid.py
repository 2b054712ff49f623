"""Intergrid transfer kernels: restriction and prolongation.

Conventions (vertex-centered hierarchy with Dirichlet boundaries):
  * fine grid of level l has interior nodes 1..2^l-1 per axis,
  * coarse node `ci` (local) coincides with fine local node `c*(ci+1)-1`
    for coarsening factor c (c=2: the odd fine indices).

Restriction applies the stencil *on the fine grid* and then injects to the
coarse lattice; prolongation injects coarse values onto the fine lattice
and then applies the (multilinear) stencil on the fine grid.  These are
exactly the `injection ∘ stencil` factorizations the reference's LFA layer
uses (reference model_based_prediction/convergence.py:160-163), so the
executable kernels and the Fourier analysis agree by construction.

Both directions lower to strided slices / scatter + fused shifted adds —
XLA turns them into single fused loops; there is no host round trip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from evostencils_tpu.stencils import constant
from evostencils_tpu.ops.stencil_ops import apply_constant_stencil, pad_zeros


def restrict(
    fine: jax.Array,
    stencil: constant.Stencil,
    coarse_shape: Tuple[int, ...],
    coarsening: Tuple[int, ...],
) -> jax.Array:
    """coarse[ci] = Σ_o w_o · fine[c·(ci+1)-1 + o] (zero outside interior)."""
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
    if out is None:
        return jnp.zeros(coarse_shape, dtype=fine.dtype)
    return out


def inject_to_fine(
    coarse: jax.Array, fine_shape: Tuple[int, ...], coarsening: Tuple[int, ...]
) -> jax.Array:
    zeros = jnp.zeros(fine_shape, dtype=coarse.dtype)
    index = tuple(slice(c - 1, None, c) for c in coarsening)
    return zeros.at[index].set(coarse)


def prolong(
    coarse: jax.Array,
    stencil: constant.Stencil,
    fine_shape: Tuple[int, ...],
    coarsening: Tuple[int, ...],
) -> jax.Array:
    """fine = stencil ∘ injection(coarse); multilinear weights interpolate."""
    injected = inject_to_fine(coarse, fine_shape, coarsening)
    return apply_constant_stencil(injected, stencil)
