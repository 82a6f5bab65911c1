"""Query plans: named (spark, sf_dir) -> DataFrame callables paired with
DuckDB oracle SQL. The union of all modules' QUERIES feeds
``__spark_entry__.queries()`` / ``oracle_sql()`` (the driver's correctness
gate) and ``bench.py``."""

from __future__ import annotations


# Names the driver should check FIRST this round, ahead of the generic
# ordering below. Round-4 priorities (VERDICT_r03 "Next round" #3):
# the new round-4 operators, so each gets a driver-green row the round it
# lands. Names listed here but not (yet) registered are skipped, so the
# list may lead the implementation during the round.
_R04_NEW = (
    "media_resize",
    "sim_pq_scan_topk",
    "sim_ivf_rpq_topk",
    "doc_bpe_vocab",
    "ts_rollup_router",
)


def _green(entry: dict) -> bool:
    """A driver correctness row counts as green only when every check
    passed (rows + schema + hash all true, no error)."""
    return bool(
        entry.get("rows_match")
        and entry.get("schema_match")
        and entry.get("hash_match")
        and not entry.get("err")
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

    # The driver's correctness gate hashes the FIRST 50 entries of this
    # dict (insertion order). Round-4 window, in priority order:
    #   a) round-3 red rows (the events-loader regression set) — confirm
    #      the repair under the driver, not just locally,
    #   b) operators new this round (_R04_NEW),
    #   c) queries never driver-checked in any round,
    #   d) round-2 greens never re-checked since (oldest confirmation
    #      first-in),
    #   e) fill: round-3 greens (freshest confirmations, least urgent).
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def _load(fname: str) -> dict:
        p = os.path.join(root, fname)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    r02, r03 = _load("CORRECTNESS_r02.json"), _load("CORRECTNESS_r03.json")
    r03_red = [n for n, e in r03.items() if not _green(e)]
    r03_green = {n for n, e in r03.items() if _green(e)}
    r02_green_stale = [n for n, e in r02.items() if _green(e) and n not in r03]
    checked_ever = set(r02) | set(r03)

    front: list[str] = []
    for group in (
        r03_red,
        _R04_NEW,
        [n for n in out if n not in checked_ever],
        r02_green_stale,
    ):
        for n in group:
            if n in out and n not in front:
                front.append(n)
    ordered = front + [n for n in out if n in r03_green and n not in front]
    ordered += [n for n in out if n not in ordered]
    return {n: out[n] for n in ordered}
