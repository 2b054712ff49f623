"""Parser for ExaSlang-flavor problem specifications (.exa2 + .knowledge).

Functional replacement for the reference's DSL front end
(reference code_generation/parser.py:25-143, which scraped the
ExaStencils compiler's debug-L3 output): the same problem files the
reference ships under example_problems/ parse directly into a
problems.api.Problem — fields, stencil operators (with vf_gridWidth_*
resolved per level via sympy), equations, Globals constants, level range.

Supported syntax subset (everything the four reference problems use at
layer 2):
  * `<name> with <T> on Node of global [= expr]`   field declaration
  * `<name> on boundary = expr`                    (recorded, Dirichlet)
  * `RHS_<field> with ... = expr`                  right-hand side
  * `<name> from Stencil { [o, o] => expr ... }`   stencil operator
  * `<name> from default restriction|prolongation on Node with 'linear'`
  * `<eqname> { lhs == rhs }`                      equation
  * `Globals { Expr <name> = value }`              constants
  * .knowledge: dimensionality / minLevel / maxLevel
"""

from __future__ import annotations

import math
import re
from typing import Dict, List, Optional

import numpy as np
import sympy

from evostencils_tpu.ir import base
from evostencils_tpu.problems.api import Problem
from evostencils_tpu.stencils import constant, gallery

_COMMENT = re.compile(r"//[^\n]*|/\*.*?\*/", re.DOTALL)
_STENCIL_BLOCK = re.compile(
    r"(\w+)\s+from\s+Stencil\s*\{(.*?)\}", re.DOTALL
)
_STENCIL_ENTRY = re.compile(r"\[([^\]]+)\]\s*=>\s*([^\n]+)")
_DEFAULT_OP = re.compile(
    r"(\w+)\s+from\s+default\s+(restriction|prolongation)\s+on\s+Node"
)
_EQUATION_BLOCK = re.compile(r"(\w+)\s*\{([^{}]*?==[^{}]*?)\}", re.DOTALL)
_GLOBALS_BLOCK = re.compile(r"Globals\s*\{(.*?)\}", re.DOTALL)
_GLOBAL_ENTRY = re.compile(r"(?:Expr|Val)\s+(\w+)\s*(?::\s*\w+\s*)?=\s*([^\n]+)")
_FIELD_DECL = re.compile(r"(\w+)\s+with\s+(\w+(?:<\w+>)?)\s+on\s+Node\s+of\s+\w+(?:\s*=\s*([^\n]+))?")
_KNOWLEDGE_ENTRY = re.compile(r"(\w+)\s*=\s*([^\n/]+)")


class ParsedStencilGenerator(gallery.StencilGenerator):
    """Stencil whose coefficient expressions reference vf_gridWidth_*."""

    _WIDTH_SYMBOLS = [
        sympy.Symbol(f"vf_gridWidth_{axis}") for axis in ("x", "y", "z")
    ]

    def __init__(self, entries, constants: Dict[str, float]):
        # entries: list of (offset tuple, sympy expr string)
        self._raw_entries = entries
        self._constants = constants

    def generate_stencil(self, grid):
        subs = {sympy.Symbol(k): v for k, v in self._constants.items()}
        subs[sympy.Symbol("PI")] = math.pi
        for axis in range(grid.dimension):
            subs[self._WIDTH_SYMBOLS[axis]] = grid.spacing[axis]
        out = []
        for offset, expr in self._raw_entries:
            value = sympy.sympify(expr, locals={"PI": sympy.pi}).subs(subs)
            out.append((offset, complex(value) if value.has(sympy.I) else float(value)))
        return constant.Stencil(out)


def _strip_comments(text: str) -> str:
    return _COMMENT.sub("", text)


def _sympy_rhs_to_callable(expr_str: str):
    """Compile an RHS expression over vf_nodePos_* to a numpy callable."""
    expr_str = expr_str.strip()
    if expr_str in ("0.0", "0"):
        return None
    symbols = [sympy.Symbol(f"vf_nodePos_{a}") for a in ("x", "y", "z")]
    expr = sympy.sympify(expr_str, locals={"PI": sympy.pi})
    used = [s for s in symbols if s in expr.free_symbols]
    dims = max(
        (symbols.index(s) + 1 for s in used), default=2
    )
    fn = sympy.lambdify(symbols[:dims], expr, modules="numpy")

    def call(*coords):
        out = fn(*coords[: dims])
        return np.broadcast_to(out, coords[0].shape).astype(float)

    return call


def parse_knowledge(path: str) -> Dict[str, str]:
    values = {}
    with open(path) as f:
        text = _strip_comments(f.read())
    for line in text.splitlines():
        m = _KNOWLEDGE_ENTRY.match(line.strip())
        if m:
            values[m.group(1)] = m.group(2).strip().strip('"')
    return values


def parse_exa2(
    path: str,
    knowledge_path: Optional[str] = None,
    dtype=None,
    name: Optional[str] = None,
) -> Problem:
    with open(path) as f:
        text = _strip_comments(f.read())

    knowledge = parse_knowledge(knowledge_path) if knowledge_path else {}
    dimension = int(knowledge.get("dimensionality", 2))
    min_level = int(knowledge.get("minLevel", 5))
    max_level = int(knowledge.get("maxLevel", 9))

    # `lambda` is a Python keyword, which sympy's parser rejects —
    # rename the symbol throughout (the elasticity spec uses it).
    text = re.sub(r"\blambda\b", "lam_", text)

    # Globals -> constants
    constants: Dict[str, float] = {}
    for block in _GLOBALS_BLOCK.findall(text):
        for cname, cvalue in _GLOBAL_ENTRY.findall(block):
            constants[cname] = float(sympy.sympify(cvalue))

    # Stencil operators
    operator_factories = {}
    for op_name, body in _STENCIL_BLOCK.findall(text):
        entries = []
        for offsets_str, expr in _STENCIL_ENTRY.findall(body):
            offset = tuple(int(x) for x in offsets_str.split(","))
            entries.append((offset, expr.strip()))
        operator_factories[op_name] = (
            (lambda level, params, e=tuple(entries): ParsedStencilGenerator(e, constants)),
            base.Operator,
        )

    # Fields + RHS expressions (declaration order defines field order)
    fields: List[str] = []
    rhs_for: Dict[str, Optional[str]] = {}
    boundary_for: Dict[str, str] = {}
    for fname, ftype, init in _FIELD_DECL.findall(text):
        if fname.startswith("RHS"):
            continue
        if fname not in fields:
            fields.append(fname)
    for m in re.finditer(r"(RHS_?\w*)\s+with\s+\w+(?:<\w+>)?\s+on\s+Node\s+of\s+\w+\s*=\s*([^\n]+)", text):
        rhs_for[m.group(1)] = m.group(2).strip()

    # Equations (skip Globals / stencil blocks already matched)
    stencil_names = set(operator_factories)
    equation_strings = []
    rhs_order: List[Optional[str]] = []
    for eq_name, body in _EQUATION_BLOCK.findall(text):
        if eq_name in ("Globals",) or eq_name in stencil_names:
            continue
        body = " ".join(body.split())
        if "==" not in body:
            continue
        lhs, rhs_name = body.split("==")
        rhs_name = rhs_name.strip()
        equation_strings.append((eq_name, f"{lhs.strip()} == {rhs_name}"))
        rhs_order.append(rhs_name)

    # Default intergrid operators per field (parsed `default
    # restriction/prolongation` or synthesized when absent, as the
    # reference's generate-solver does).
    has_restriction = any(
        kind == "restriction" for _, kind in _DEFAULT_OP.findall(text)
    )
    cf = (2,) * dimension
    for i, field in enumerate(fields):
        operator_factories[f"gen_restriction_{field}"] = (
            (lambda level, params: gallery.FullWeightingRestrictionGenerator(cf)),
            base.Restriction,
        )
        operator_factories[f"gen_prolongation_{field}"] = (
            (lambda level, params: gallery.MultilinearInterpolationGenerator(cf)),
            base.Prolongation,
        )

    rhs_functions = []
    for rhs_name in rhs_order:
        rhs_functions.append(_sympy_rhs_to_callable(rhs_for.get(rhs_name, "0.0") or "0.0"))

    import jax.numpy as jnp

    return Problem(
        name=name or path.rsplit("/", 1)[-1].split(".")[0],
        dimension=dimension,
        min_level=min_level,
        max_level=max_level,
        fields=fields,
        equation_strings=equation_strings,
        operator_factories=operator_factories,
        rhs_functions=rhs_functions if any(r is not None for r in rhs_functions) else None,
        dtype=dtype if dtype is not None else jnp.float32,
        constants=constants,
    )
