from evostencils_tpu.ir import base, system, smoother, krylov, partitioning  # noqa: F401
