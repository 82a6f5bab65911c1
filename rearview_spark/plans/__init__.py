"""Query plans: named (spark, sf_dir) -> DataFrame callables paired with
DuckDB oracle SQL. The union of all modules' QUERIES feeds
``__spark_entry__.queries()`` / ``oracle_sql()`` (the driver's correctness
gate) and ``bench.py``."""

from __future__ import annotations


def all_queries() -> dict:
    from rearview_spark.plans import (
        events_queries,
        streaming_queries,
        monitor_queries,
        pipeline_queries,
        relational,
        timeseries_queries,
    )

    out: dict = {}
    for mod in (relational, timeseries_queries, pipeline_queries, monitor_queries, events_queries, streaming_queries):
        for name, spec in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name}")
            out[name] = spec
    return out
