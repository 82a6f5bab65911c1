"""docs/monitor_expr.md round-trip: every monitor expression the doc
exhibits must actually run through ``evaluate_expr`` with the documented
outcome, so the written compatibility surface (SURVEY.md §7 hard-part 5)
cannot drift from the implementation. The test is two-sided: each
expression here must still appear in the doc (stale test fails), and
each backtick expression in the doc's fixture table must be covered
here (undocumented-in-test drift fails)."""

from __future__ import annotations

import math
import re
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from rearview_spark.monitors.evaluate import evaluate_expr

DOC = Path(__file__).resolve().parents[1] / "docs" / "monitor_expr.md"

A = pd.Series([10.0, 20.0, 300.0], index=[1, 2, 3])
B = pd.Series([10.0, 18.0, 30.0], index=[1, 2, 3])
EMPTY = pd.Series([], dtype="float64")

#: expression -> (bindings, expected) where expected is one of:
#:   bool  — evaluate and bool() the result
#:   an exception class — evaluate must raise it
CASES = {
    # fixture-coverage table rows
    "a.mean() > 100": ({"a": A}, True),
    "(a - b).abs().max() > 3 * a.std()": ({"a": A, "b": B}, False),
    "a.mean() > 2": ({"a": EMPTY}, False),  # NaN compare -> falsy
    "a.mean() > 1000000": ({"a": A}, False),
    "(a - b).max() > 5": ({"a": A, "b": B}, True),
    "a.nope()": ({"a": A}, ValueError),
    "sum(x * x for x in range(10 ** 10))": ({}, TimeoutError),
    # the stock robust alert from "Allowed surface" §3
    "robust_z(a).abs().max() > 3.5": ({"a": A}, True),
    # the round-1 module-walk escape from §2 dies at its first hop
    "pd.io.common.os.system": ({}, ValueError),
}


@pytest.mark.parametrize("expr", sorted(CASES))
def test_doc_expression_behaves_as_documented(expr):
    text = DOC.read_text()
    assert f"`{expr}`" in text, f"expression no longer in docs: {expr}"
    bindings, expected = CASES[expr]
    if isinstance(expected, type) and issubclass(expected, BaseException):
        with pytest.raises(expected):
            # short deadline keeps the runaway-loop case fast while
            # still exercising the documented itimer kill path
            evaluate_expr(expr, bindings, timeout_s=0.2)
    else:
        assert bool(evaluate_expr(expr, bindings)) is expected


def test_every_fixture_table_expression_is_covered():
    """Parse the fixture-coverage table's monitor_expr column; every
    backtick expression there must have a case above."""
    rows = [
        line
        for line in DOC.read_text().splitlines()
        if line.startswith("|") and "|" in line[1:]
    ]
    exprs = set()
    for line in rows:
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) >= 2:
            m = re.fullmatch(r"`(.+)`", cells[1])
            if m:
                exprs.add(m.group(1))
    assert exprs, "fixture table not found in docs/monitor_expr.md"
    missing = exprs - set(CASES)
    assert not missing, f"doc expressions without a round-trip case: {missing}"
