"""Pallas TPU kernels for the hot smoothing path.

The dominant cost of a multigrid cycle is the fine-grid smoother sweep.
The jnp formulation of one red-black collective-Jacobi step issues, per
color, a residual (reads u, f), a masked update (writes u) — XLA fuses
each color's arithmetic but still round-trips u through HBM between
colors.  The fused kernel below keeps u in VMEM across *both* half-sweeps
of a red-black step: HBM traffic drops from ~4 array passes to the
minimum 3 (read u, read f, write u), which on a bandwidth-bound v5e is
the speed-of-light budget for this operation.

Scope: 2D scalar constant-coefficient stencils, whole-array-in-VMEM
operation (interior ≤ 1024² at f32 — the reference's default problem
sizes).  Larger grids and systems fall back to the fused-jnp path; a
row-blocked double-buffered variant is the natural extension.

Boundary semantics: homogeneous Dirichlet — shifted loads are realized as
`pltpu.roll` plus an edge mask that zeroes the wrapped lane, exactly
matching ops/stencil_ops.apply_constant_stencil's zero padding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evostencils_tpu.stencils import constant

# VMEM budget: u + f + out + headroom must fit in ~16 MB.
_MAX_VMEM_CELLS = 512 * 512


def _shifted(u, offset, shape):
    """u[x+offset] with zeros outside the interior, via roll + edge mask."""
    oi, oj = offset
    out = u
    if oi != 0:
        out = pltpu.roll(out, (-oi) % shape[0], 0)
    if oj != 0:
        out = pltpu.roll(out, (-oj) % shape[1], 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    mask = jnp.ones(shape, dtype=jnp.bool_)
    if oi > 0:
        mask = jnp.logical_and(mask, rows < shape[0] - oi)
    elif oi < 0:
        mask = jnp.logical_and(mask, rows >= -oi)
    if oj > 0:
        mask = jnp.logical_and(mask, cols < shape[1] - oj)
    elif oj < 0:
        mask = jnp.logical_and(mask, cols >= -oj)
    return jnp.where(mask, out, 0.0)


def _apply_stencil_in_vmem(u, entries, shape):
    out = None
    for offset, value in entries:
        term = value * _shifted(u, offset, shape)
        out = term if out is None else out + term
    return out


def _rb_sweep_kernel(entries, inv_diag, shape, omega_ref, u_ref, f_ref, out_ref):
    u = u_ref[:]
    f = f_ref[:]
    omega = omega_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    red = ((rows + cols) % 2) == 0
    for color_mask in (red, jnp.logical_not(red)):
        r = f - _apply_stencil_in_vmem(u, entries, shape)
        u = u + jnp.where(color_mask, omega * inv_diag * r, 0.0)
    out_ref[:] = u


def supports_rb_sweep(shape: Tuple[int, ...], stencil, dtype) -> bool:
    return (
        len(shape) == 2
        and isinstance(stencil, constant.Stencil)
        and stencil.dimension == 2
        and np.prod(shape) <= _MAX_VMEM_CELLS
        and jnp.dtype(dtype) == jnp.float32
        and all(not isinstance(v, complex) for v in stencil.values)
    )


@functools.partial(jax.jit, static_argnames=("entries", "inv_diag", "interpret"))
def _rb_sweep_call(u, f, omega, entries, inv_diag, interpret):
    shape = u.shape
    kernel = functools.partial(
        _rb_sweep_kernel, entries, inv_diag, shape
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, u.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(4 * len(entries) * np.prod(shape)),
            bytes_accessed=int(3 * 4 * np.prod(shape)),
            transcendentals=0,
        ),
    )(omega, u, f)


def red_black_collective_jacobi_sweep(u, f, omega, stencil: constant.Stencil):
    """One fused red-black point-Jacobi step: both colors in one kernel.

    Equivalent to two masked `u += ω·(f − A u)/diag(A)` half-sweeps with
    the residual recomputed between colors.
    """
    entries = tuple(
        (offset, float(value)) for offset, value in stencil.entries
    )
    inv_diag = float(1.0 / stencil.center_value())
    interpret = jax.default_backend() != "tpu"
    omega_arr = jnp.asarray([omega], dtype=u.dtype)
    return _rb_sweep_call(u, f, omega_arr, entries, inv_diag, interpret)
