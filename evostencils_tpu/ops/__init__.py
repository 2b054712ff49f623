from evostencils_tpu.ops import stencil_ops, smoothers, intergrid, coarse_solve, krylov  # noqa: F401
