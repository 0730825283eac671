"""Module hygiene: no top-level def/class in the package may shadow an
earlier one in the same module.

Guard added after a real bug (round 5 verdict): ``train_pq_codebooks``
was defined twice in ``operators/similarity.py`` — a newer decimal-exact
trainer sat DEAD above an older double-sum one that silently won by
being defined later. Nothing in pytest, the oracle gate, or the bench
can see that class of defect (the shadowed code simply never runs), so
this test ast-parses every module and asserts top-level definition
names are unique.
"""
from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "flink_commons_spark"


def _top_level_def_names(path: pathlib.Path) -> list[str]:
    tree = ast.parse(path.read_text(), filename=str(path))
    names = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(node.name)
    return names


def test_no_duplicate_top_level_defs():
    offenders = {}
    for path in sorted(PKG.rglob("*.py")):
        names = _top_level_def_names(path)
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            offenders[str(path.relative_to(PKG.parent))] = dupes
    assert not offenders, f"shadowed top-level definitions: {offenders}"
