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

On TPU both directions lower to XLA ConvGeneralDilated — restriction is a
stride-c correlation, prolongation a lhs-dilated (transposed) correlation
— which the TPU backend executes as dense vector ops.  The equivalent
strided-slice / scatter formulation is kept as the fallback for complex
dtypes (TPU convolutions are real-only): stride-2 access along the
128-lane minor dimension degenerates to lane-granular gathers there,
~1000× off the roofline (measured 25 ms for one restrict+prolong pair at
1023² vs ~25 µs via conv).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from evostencils_tpu.stencils import constant
from evostencils_tpu.ops.stencil_ops import apply_constant_stencil, pad_zeros


def _stencil_kernel(stencil: constant.Stencil, ndim: int, dtype):
    """Dense correlation kernel: weight w_o at index o + reach."""
    reach = stencil.max_reach()
    shape = tuple(2 * r + 1 for r in reach)
    kernel = jnp.zeros(shape, dtype=dtype)
    for offset, value in stencil.entries:
        index = tuple(o + r for o, r in zip(offset, reach))
        kernel = kernel.at[index].set(value)
    return kernel, reach


def _conv_dnums(ndim: int):
    spatial = "".join(chr(ord("0") + i) for i in range(ndim))
    return jax.lax.conv_dimension_numbers(
        (1, 1) + (1,) * ndim,
        (1, 1) + (1,) * ndim,
        ("NC" + spatial, "OI" + spatial, "NC" + spatial),
    )


def _supports_conv(x: jax.Array) -> bool:
    return not jnp.iscomplexobj(x)


def restrict(
    fine: jax.Array,
    stencil: constant.Stencil,
    coarse_shape: Tuple[int, ...],
    coarsening: Tuple[int, ...],
) -> jax.Array:
    """coarse[ci] = Σ_o w_o · fine[c·(ci+1)-1 + o] (zero outside interior)."""
    if _supports_conv(fine):
        ndim = fine.ndim
        kernel, reach = _stencil_kernel(stencil, ndim, fine.dtype)
        # out[i] = Σ_k K[k] · fine[c·i + k − p_lo] with k = o + r and the
        # target index c·(i+1) − 1 + o  ⇒  p_lo = r − (c − 1) per axis
        # (negative values crop); the high pad makes the strided window
        # count equal the coarse extent.
        padding = tuple(
            (r - (c - 1),
             (m - 1) * c + (2 * r + 1) - f - (r - (c - 1)))
            for r, c, m, f in zip(reach, coarsening, coarse_shape, fine.shape)
        )
        out = jax.lax.conv_general_dilated(
            fine[None, None],
            kernel[None, None],
            window_strides=coarsening,
            padding=padding,
            dimension_numbers=_conv_dnums(ndim),
            preferred_element_type=fine.dtype,
        )
        return out[0, 0]
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
    if _supports_conv(coarse):
        ndim = coarse.ndim
        kernel, reach = _stencil_kernel(stencil, ndim, coarse.dtype)
        # fine[j] = Σ_o w_o · dilated[j + o − (c−1)] where the lhs-dilated
        # input places coarse[ci] at index c·ci; with k = o + r the conv
        # needs low padding p = r + (c − 1), and the high padding tops the
        # output up to the fine extent.
        dil_len = tuple(
            (s - 1) * c + 1 for s, c in zip(coarse.shape, coarsening)
        )
        padding = tuple(
            (r + (c - 1), f - d + r - (c - 1))
            for r, c, f, d in zip(reach, coarsening, fine_shape, dil_len)
        )
        out = jax.lax.conv_general_dilated(
            coarse[None, None],
            kernel[None, None],
            window_strides=(1,) * ndim,
            padding=padding,
            lhs_dilation=coarsening,
            dimension_numbers=_conv_dnums(ndim),
            preferred_element_type=coarse.dtype,
        )
        return out[0, 0]
    injected = inject_to_fine(coarse, fine_shape, coarsening)
    return apply_constant_stencil(injected, stencil)
