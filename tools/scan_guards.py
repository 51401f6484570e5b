"""Source scanner for the banded-join scale-guard gate (VERDICT r10 item
4b) — shared by tools/driver_sim.py (sweep gate) and
tests/test_plan_properties.py (pytest mirror) so the two can't drift.

Scans every ``banded_explode`` call site in the package for a declared
``scale_guard=`` (the operator API also raises at runtime; the source
scan catches code paths the sweep doesn't execute), and every graded-plan
call of the cappable banded operators for ``max_bucket=``.

AST-based (r12, ADVICE r11): the original lexical scanner counted parens
inside string literals/comments and an ``import ... as`` alias could
dodge it entirely. Parsing with :mod:`ast` makes the guarantee exact —
every ``Call`` node whose callee resolves to the target name (directly,
via attribute access, or through an import alias recorded in the same
module) is checked for the required keyword argument.
"""

from __future__ import annotations

import ast
import pathlib

#: operators whose banded candidate join MUST be invoked with max_bucket
#: from any registered plan (plans/ directory)
CAPPABLE_BANDED_OPS = ("embedding_near_pairs_bucketed", "bucketed_topk_neighbors")


def _alias_map(tree: ast.AST, targets: set[str]) -> dict[str, str]:
    """Map local names to the target operator they alias via imports."""
    aliases: dict[str, str] = {t: t for t in targets}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name in targets and a.asname:
                    aliases[a.asname] = a.name
        elif isinstance(node, ast.Assign):
            # `be = banded_explode` style rebinding
            if isinstance(node.value, ast.Name) and node.value.id in targets:
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        aliases[t.id] = node.value.id
    return aliases


def calls_of(tree: ast.AST, targets: set[str]):
    """Yield (line, resolved_name, call_node) for every Call whose callee
    is one of ``targets`` — by bare name, attribute (``mod.fn``), or a
    module-local import/assignment alias."""
    aliases = _alias_map(tree, targets)
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        name = fn.id if isinstance(fn, ast.Name) else (
            fn.attr if isinstance(fn, ast.Attribute) else None
        )
        if name in aliases:
            yield node.lineno, aliases[name], node


def _kwarg_names(call: ast.Call) -> set[str]:
    return {k.arg for k in call.keywords if k.arg is not None}


def banded_guard_violations(pkg_root: str | pathlib.Path) -> list[str]:
    pkg = pathlib.Path(pkg_root)
    bad = []
    for f in pkg.rglob("*.py"):
        tree = ast.parse(f.read_text(), filename=str(f))
        for line, _, call in calls_of(tree, {"banded_explode"}):
            if "scale_guard" not in _kwarg_names(call):
                bad.append(f"{f.name}:{line} banded_explode without scale_guard=")
    for f in (pkg / "plans").rglob("*.py"):
        tree = ast.parse(f.read_text(), filename=str(f))
        for line, op, call in calls_of(tree, set(CAPPABLE_BANDED_OPS)):
            if "max_bucket" not in _kwarg_names(call):
                bad.append(
                    f"{f.name}:{line} {op} on a graded plan without max_bucket="
                )
    return bad
