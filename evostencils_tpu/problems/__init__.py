from evostencils_tpu.problems.api import Problem  # noqa: F401
from evostencils_tpu.problems import poisson  # noqa: F401
