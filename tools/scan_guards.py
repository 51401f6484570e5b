"""Source scanner for the banded-join scale-guard gate (VERDICT r10 item
4b) — shared by tools/driver_sim.py (sweep gate) and
tests/test_plan_properties.py (pytest mirror) so the two can't drift.

Scans every ``banded_explode`` call site in the package for a declared
``scale_guard=`` (the operator API also raises at runtime; the source
scan catches code paths the sweep doesn't execute), and every graded-plan
call of the cappable banded operators for ``max_bucket=``.
"""

from __future__ import annotations

import pathlib

#: operators whose banded candidate join MUST be invoked with max_bucket
#: from any registered plan (plans/ directory)
CAPPABLE_BANDED_OPS = ("embedding_near_pairs_bucketed", "bucketed_topk_neighbors")


def call_spans(src: str, fname: str):
    """Yield (line_number, call_text) for every call of ``fname`` in
    ``src`` (paren-balance argument span; definitions excluded)."""
    i = 0
    while True:
        i = src.find(fname + "(", i)
        if i < 0:
            return
        if not src[max(0, i - 4):i].endswith("def "):
            depth, j = 0, i + len(fname)
            for j in range(j, len(src)):
                if src[j] == "(":
                    depth += 1
                elif src[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
            yield src[:i].count("\n") + 1, src[i:j + 1]
        i += len(fname) + 1


def banded_guard_violations(pkg_root: str | pathlib.Path) -> list[str]:
    pkg = pathlib.Path(pkg_root)
    bad = []
    for f in pkg.rglob("*.py"):
        src = f.read_text()
        for line, call in call_spans(src, "banded_explode"):
            if "scale_guard=" not in call:
                bad.append(f"{f.name}:{line} banded_explode without scale_guard=")
    for f in (pkg / "plans").rglob("*.py"):
        src = f.read_text()
        for op in CAPPABLE_BANDED_OPS:
            for line, call in call_spans(src, op):
                if "max_bucket=" not in call:
                    bad.append(
                        f"{f.name}:{line} {op} on a graded plan without max_bucket="
                    )
    return bad
