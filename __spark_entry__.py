"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are assembled from the plan modules in
``rearview_spark.plans`` — one entry per implemented operator family from
SURVEY.md §2 (G-layer timeseries, relational, LLM-pipeline extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-style pricing
    summary (scan → pushed filter → partial agg → final agg)."""
    from rearview_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from rearview_spark.plans import all_queries

    return {name: spec["fn"] for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without SQL-expressible
    semantics (approximate/stubbed ops) are omitted."""
    from rearview_spark.plans import all_queries

    return {
        name: spec["oracle"]
        for name, spec in all_queries().items()
        if spec.get("oracle")
    }
