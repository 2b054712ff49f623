from evostencils_tpu.stencils import constant, periodic, gallery  # noqa: F401
