"""The ``${...}`` expression language — restricted resolver (F5).

Reference behavior (etl.py:40-96), reproduced exactly:
- strings scanned with the greedy/non-greedy pattern ``(.*)\\$\\{(.*?)\\}(.*)``;
- a string that is ENTIRELY one ``${expr}`` returns the evaluated *object*
  (not its str());
- otherwise each ``${expr}`` is str()-replaced inside the string, and the
  result is re-scanned (nested expressions);
- dicts/lists resolve recursively; other types pass through.

Deliberate divergence (SURVEY §7, security): the reference calls raw
``eval`` with module globals (etl.py:71,77 — arbitrary code execution by
design). We AST-validate the expression against an allow-list of node
types and evaluate against the per-pipeline namespace with a minimal
builtin set. Power stays available via preFlight-defined functions,
which land in the namespace and are callable from expressions.
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

_BLOCKED_ATTRS = {"__globals__", "__code__", "__closure__", "__subclasses__",
                  "__bases__", "__mro__", "__class__", "__dict__", "__init__",
                  "__builtins__", "__import__"}


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
            if isinstance(node, ast.Attribute) and node.attr in _BLOCKED_ATTRS:
                raise ExpressionError(
                    f"Disallowed attribute '{node.attr}' in expression '{expression}'"
                )
            if isinstance(node, ast.Name) and node.id.startswith("__"):
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
            matches = _EXPR_RE.findall(value)
            output = value
            for before, expression, after in matches:
                if len(matches) == 1 and not before and not after:
                    # whole-string expression → return the object itself
                    return self.evaluate(expression)
                # plain str.replace — expressions may contain regex
                # metacharacters (e.g. steps['pd.read_csv'])
                output = output.replace(
                    "${" + expression + "}", str(self.evaluate(expression))
                )
                if _EXPR_RE.findall(output):
                    output = self.resolve(output)
            return output
        if isinstance(value, dict):
            return {k: self.resolve(v) for k, v in value.items()}
        if isinstance(value, list):
            return [self.resolve(v) for v in value]
        return value
