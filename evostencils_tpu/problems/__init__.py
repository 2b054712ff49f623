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


def load_problem_file(path: str, knowledge_path: str = None, dtype=None):
    """Load a reference problem spec by file extension: .exa2 (layer-2),
    .exa3 (layer-3 configs incl. hand-written outer solvers), .exa4
    (layer-4 FAS templates).  All four reference problem families load
    verbatim from /root/reference/example_problems with this entry point
    (reference parser surface: code_generation/parser.py:25-169)."""
    from evostencils_tpu.problems import parser as _parser

    if knowledge_path is None:
        for candidate in (
            path.rsplit(".", 1)[0] + ".knowledge",
            path.replace("_template", "").rsplit(".", 1)[0] + ".knowledge",
        ):
            import os

            if os.path.isfile(candidate):
                knowledge_path = candidate
                break
    ext = path.rsplit(".", 1)[-1]
    if ext == "exa2":
        return _parser.parse_exa2(path, knowledge_path, dtype=dtype)
    if ext == "exa3":
        return _parser.parse_exa3(path, knowledge_path, dtype=dtype)
    if ext == "exa4":
        return _parser.parse_exa4(path, knowledge_path, dtype=dtype)
    raise ValueError(f"Unknown problem file extension: {path}")
