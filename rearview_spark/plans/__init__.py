"""Query plans: named (spark, sf_dir) -> DataFrame callables paired with
DuckDB oracle SQL. The union of all modules' QUERIES feeds
``__spark_entry__.queries()`` / ``oracle_sql()`` (the driver's correctness
gate) and ``bench.py``."""

from __future__ import annotations


# The driver's correctness gate hashes the FIRST 50 entries of this dict
# (insertion order).  Round 1 spent that window on the relational + early
# timeseries queries (all green, CORRECTNESS_r01.json); round 2 rotates the
# 55 never-driver-checked queries to the front so the window covers them.
# Timeseries entries that are near-identical siblings of queries already
# in the window (per_second ≈ derivative, moving_sum/min_max ≈
# moving_average, lowest_current ≈ highest_average, limit/current trivia)
# are deferred along with the proven round-1 set — freeing a slot for the
# new ts_hw_confidence_bands gate entry.
_DEFERRED = (
    "ts_per_second",
    "ts_moving_sum",
    "ts_moving_min_max",
    "ts_limit_series",
    "ts_current_values",
    "ts_lowest_current",
)

# Queries added mid-round-2, AFTER the 50-entry driver window was already
# allocated to round 1's never-checked set. They sit at positions 51+ so
# they don't displace the planned window (they're covered by the local
# hash-faithful sweep); the round-3 rotation moves them forward.
_NEW_R02 = (
    "doc_benchmark_contamination",
    "doc_stratified_sample",
    "doc_repetition_quality",
    "doc_pack_sequences",
    "ts_weighted_average",
    "ts_wildcard_rollup",
    "ts_most_deviant_band",
    "ts_pointwise_extras",
    "ts_smart_summarize",
    "sim_pq_topk",
    "sim_ivf_pq_topk",
    "stream_dedup_hourly_counts",
)


def all_queries() -> dict:
    from rearview_spark.plans import (
        events_queries,
        streaming_queries,
        monitor_queries,
        pipeline_queries,
        relational,
        timeseries_queries,
    )

    import json
    import os

    out: dict = {}
    for mod in (pipeline_queries, monitor_queries, events_queries, streaming_queries, timeseries_queries, relational):
        for name, spec in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name}")
            out[name] = spec

    r01 = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "CORRECTNESS_r01.json")
    checked_r01: set = set()
    if os.path.exists(r01):
        with open(r01) as f:
            checked_r01 = set(json.load(f))
    back = set(_DEFERRED) | set(_NEW_R02) | checked_r01
    ordered = [n for n in out if n not in back] + [n for n in out if n in back]
    return {n: out[n] for n in ordered}
