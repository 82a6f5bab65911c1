"""Smoke: every declared query runs at sf0.001 and returns a stable,
non-degenerate schema; the full value-level oracle comparison lives in
tools/oracle_check.py (and the driver's own gate)."""

from __future__ import annotations

import pytest

from rearview_spark.plans import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name]["fn"](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50
