from evostencils_tpu.optimization.optimizer import Optimizer  # noqa: F401
