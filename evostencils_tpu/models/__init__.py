from evostencils_tpu.models.lfa import ConvergenceEvaluator  # noqa: F401
from evostencils_tpu.models.roofline import PerformanceEvaluator  # noqa: F401
