from evostencils_tpu.backend.lowering import CycleLowering  # noqa: F401
