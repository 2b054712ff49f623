from evostencils_tpu.parallel import dispatch, mesh  # noqa: F401
