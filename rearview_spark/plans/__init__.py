"""Query plans: named (spark, sf_dir) -> DataFrame callables paired with
DuckDB oracle SQL. The union of all modules' QUERIES feeds
``__spark_entry__.queries()`` / ``oracle_sql()`` (the driver's correctness
gate) and ``bench.py``."""

from __future__ import annotations


# Kept for provenance/tests: the round-2 deferral sets (see git history for
# the r2 ordering logic they drove).
_DEFERRED = (
    "ts_per_second",
    "ts_moving_sum",
    "ts_moving_min_max",
    "ts_limit_series",
    "ts_current_values",
    "ts_lowest_current",
)

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

# The driver's correctness gate hashes the FIRST 50 entries of this dict
# (insertion order).  Round-3 window, in priority order (VERDICT_r02 "Next
# round" #1):
#   a) the 18 queries never driver-checked (12 _NEW_R02 + 6 _DEFERRED),
#   b) the 3 round-1 driver failures whose fixes were never driver-confirmed,
#   c) the 2 queries rewritten after their round-1 green row,
#   d) queries added or whose implementation was modified in round 3,
#   e) fill: round-2 greens (re-confirmation of the newest code).
# Names listed here but not (yet) registered are skipped, so the list may
# lead the implementation during the round.
_R03_FRONT = (
    # (a) never driver-checked
    "doc_benchmark_contamination",
    "doc_stratified_sample",
    "doc_repetition_quality",
    "doc_pack_sequences",
    "sim_pq_topk",
    "sim_ivf_pq_topk",
    "stream_dedup_hourly_counts",
    "ts_weighted_average",
    "ts_wildcard_rollup",
    "ts_most_deviant_band",
    "ts_pointwise_extras",
    "ts_smart_summarize",
    "ts_per_second",
    "ts_moving_sum",
    "ts_moving_min_max",
    "ts_limit_series",
    "ts_current_values",
    "ts_lowest_current",
    # (b) round-1 ex-failures, fixed but never driver re-confirmed
    "q12_shipmode_priority",
    "grouping_sets_revenue",
    "ts_hitcount",
    # (c) rewritten after their round-1 green row
    "ts_multiply_series",
    "ts_day_over_day",
    # (d) new/modified in round 3
    "customer_value_deciles",
    "media_resize",
    "sim_ivf_rpq_topk",
    "doc_bpe_vocab",
    "ts_rollup_router",
    "sim_pq_scan_topk",
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

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    r02 = os.path.join(root, "CORRECTNESS_r02.json")
    checked_r02: set = set()
    if os.path.exists(r02):
        with open(r02) as f:
            checked_r02 = set(json.load(f))

    front = [n for n in _R03_FRONT if n in out]
    front_set = set(front)
    fill_r2 = [n for n in out if n in checked_r02 and n not in front_set]
    rest = [n for n in out if n not in front_set and n not in checked_r02]
    ordered = front + fill_r2 + rest
    return {n: out[n] for n in ordered}
