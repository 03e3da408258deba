"""The ``${...}`` expression language — restricted resolver (F5).

Reference behavior (etl.py:40-96), reproduced exactly:
- strings scanned with the greedy/non-greedy pattern ``(.*)\\$\\{(.*?)\\}(.*)``;
- a string that is ENTIRELY one ``${expr}`` returns the evaluated *object*
  (not its str());
- otherwise each ``${expr}`` is str()-replaced inside the string;
- dicts/lists resolve recursively; other types pass through.

Deliberate divergences (SURVEY §7, security):

1. The reference calls raw ``eval`` with module globals (etl.py:71,77 —
   arbitrary code execution by design). We AST-validate the expression
   and evaluate against the per-pipeline namespace with a minimal builtin
   set. The validator DENY-lists by shape, not by enumeration: every
   attribute or name starting with ``_`` is rejected (closing the
   ``__reduce_ex__``/``__getattribute__`` gadget family), plus
   ``format``/``format_map`` (str.format's ``{0.__class__...}``
   mini-language reaches dunders at runtime). Power stays available via
   preFlight-defined functions, which land in the namespace.

2. The reference re-scans interpolated OUTPUT for ``${...}`` (etl.py's
   recursive resolve), so a ``${...}`` smuggled inside a variable VALUE
   (e.g. CLI overrideVariables) gets evaluated — an injection channel.
   We substitute evaluated results via inert placeholders: only ``${...}``
   present in the original TEMPLATE text is ever evaluated. Template-level
   nesting (``${ steps['${name}'].output }``) still composes; value-level
   injection is returned literally.
"""

from __future__ import annotations

import ast
import re
from typing import Any

_EXPR_RE = re.compile(r"(.*)\$\{(.*?)\}(.*)")

_ALLOWED_NODES = (
    ast.Expression,
    ast.Name,
    ast.Load,
    ast.Attribute,
    ast.Subscript,
    ast.Slice,
    ast.Constant,
    ast.Tuple,
    ast.List,
    ast.Dict,
    ast.Set,
    ast.BinOp,
    ast.UnaryOp,
    ast.BoolOp,
    ast.Compare,
    ast.Call,
    ast.keyword,
    ast.IfExp,
    ast.JoinedStr,
    ast.FormattedValue,
    # operators
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.Not, ast.And, ast.Or,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.In, ast.NotIn,
    ast.Is, ast.IsNot,
)

_SAFE_BUILTINS = {
    "str": str, "int": int, "float": float, "bool": bool, "len": len,
    "min": min, "max": max, "sum": sum, "abs": abs, "round": round,
    "sorted": sorted, "list": list, "dict": dict, "tuple": tuple,
    "set": set, "range": range, "enumerate": enumerate, "zip": zip,
    "True": True, "False": False, "None": None,
}

# str.format / str.format_map re-open attribute traversal at runtime via
# the "{0.__class__}" replacement-field mini-language — no AST to inspect.
_BLOCKED_ATTRS = {"format", "format_map"}

_PLACEHOLDER_RE = re.compile(r"\x00\d+\x00")


class ExpressionError(ValueError):
    pass


class ExpressionResolver:
    """Evaluates ``${...}`` expressions against a pipeline namespace."""

    def __init__(self, namespace: dict[str, Any]):
        self.namespace = namespace

    # -- expression evaluation -------------------------------------------------

    def evaluate(self, expression: str) -> Any:
        try:
            tree = ast.parse(expression.strip(), mode="eval")
        except SyntaxError as e:
            raise ExpressionError(f"Invalid expression '{expression}': {e}") from None
        for node in ast.walk(tree):
            if not isinstance(node, _ALLOWED_NODES):
                raise ExpressionError(
                    f"Disallowed syntax {type(node).__name__!r} in expression '{expression}'"
                )
            if isinstance(node, ast.Attribute) and (
                node.attr.startswith("_") or node.attr in _BLOCKED_ATTRS
            ):
                raise ExpressionError(
                    f"Disallowed attribute '{node.attr}' in expression '{expression}'"
                )
            if isinstance(node, ast.Name) and node.id.startswith("_"):
                raise ExpressionError(
                    f"Disallowed name '{node.id}' in expression '{expression}'"
                )
        code = compile(tree, "<pipeline-expression>", "eval")
        globals_ns = {"__builtins__": {}}
        locals_ns = dict(_SAFE_BUILTINS)
        locals_ns.update(self.namespace)
        return eval(code, globals_ns, locals_ns)  # noqa: S307 — AST-restricted

    # -- string / container interpolation -------------------------------------

    def resolve(self, value: Any) -> Any:
        if isinstance(value, str):
            return self._resolve_str(value)
        if isinstance(value, dict):
            return {k: self.resolve(v) for k, v in value.items()}
        if isinstance(value, list):
            return [self.resolve(v) for v in value]
        return value

    def _resolve_str(self, template: str) -> Any:
        m = _EXPR_RE.fullmatch(template)
        if m and not m.group(1) and not m.group(3):
            # whole-string expression → return the object itself
            return self.evaluate(m.group(2))
        # Evaluate template-level ${...} innermost-first, splicing results
        # in as inert \x00N\x00 placeholders so evaluated OUTPUT is never
        # re-scanned as template (injection via variable values). A nested
        # ${ outer ${inner} } composes by substituting the inner's str()
        # into the outer's expression TEXT before evaluation.
        values: dict[str, Any] = {}
        output = template
        while True:
            m = _EXPR_RE.search(output)
            if not m:
                break
            expr = _PLACEHOLDER_RE.sub(
                lambda p: str(values[p.group(0)]), m.group(2)
            )
            key = f"\x00{len(values)}\x00"
            values[key] = self.evaluate(expr)
            start, end = m.span(2)
            output = output[: start - 2] + key + output[end + 1 :]
        if output in values:
            # the whole template reduced to one nested expression → object
            return values[output]
        for key, val in values.items():
            output = output.replace(key, str(val))
        return output
