from evostencils_tpu.grammar import gp, multigrid, typing  # noqa: F401
