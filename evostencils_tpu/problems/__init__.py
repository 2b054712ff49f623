from evostencils_tpu.problems.api import Problem  # noqa: F401
from evostencils_tpu.problems import poisson  # noqa: F401


def build_named_problem(name: str, min_level: int = 5, max_level: int = 9):
    """Problem registry for the CLI entry points (scripts/)."""
    from evostencils_tpu.problems import poisson as _poisson
    from evostencils_tpu.problems.elasticity import linear_elasticity_2d
    from evostencils_tpu.problems.fas import fas_2d
    from evostencils_tpu.problems.helmholtz import helmholtz_2d

    if name == "poisson2d":
        return _poisson.poisson_2d(min_level, max_level)
    if name == "poisson3d":
        return _poisson.poisson_3d(
            min_level=max(2, min_level - 2), max_level=min(max_level, 7)
        )
    if name == "poisson2d_var":
        return _poisson.poisson_2d_variable(min_level, max_level)
    if name == "elasticity":
        return linear_elasticity_2d(min_level, min(max_level, 8))
    if name == "helmholtz":
        return helmholtz_2d(min_level=3, max_level=7)
    if name == "fas":
        return fas_2d(min_level=5, max_level=9)
    raise ValueError(f"Unknown problem {name!r}")
