"""Streaming-summary sketches over unbounded key domains: Misra-Gries
heavy hitters as a TWO-PASS EXACT operator.

Not rearview parity; north-star pipeline extension (the reference's
dashboards answer "which job/metric dominates" by full GROUP BY — at
100 TB a full GROUP BY over a high-cardinality key shuffles one row per
distinct key per map task, and the long tail is all of them). The
classic fix is the frequent-items sketch: a bounded summary whose
candidate set provably contains every item with frequency > n/(k+1),
then an exact recount of just those candidates.

Why this shape survives 100 TB:

- Pass 1 (candidates) is a ``mapInPandas`` over the raw scan — NO
  shuffle of fact rows at all. Each task emits at most ``k`` summary
  rows (k ~ hundreds), so the candidate union is ≤ k × tasks rows —
  KB-scale — regardless of key cardinality.
- The Misra-Gries merge bound (Agarwal et al., "Mergeable Summaries",
  PODS'12) gives the guarantee: an item dropped by every partition
  summary has per-partition frequency ≤ n_p/(k+1), hence global
  frequency ≤ Σ n_p/(k+1) = n/(k+1). Contrapositive: every TRUE heavy
  hitter survives in at least one partition → the union is a superset.
  No false negatives, ever; false positives die in the recount.
- Pass 2 recounts ONLY candidate keys: the candidate set broadcasts
  into a semi-join at the scan, the surviving stream is
  candidate-sized, and its groupBy is map-side combined on ≤ k × tasks
  distinct keys. Total cost: two scans, zero corpus-scale shuffles.
- The final predicate ``count × (k+1) > n`` is integer arithmetic —
  float-free, so the output is bit-deterministic across engines and
  independent of partitioning (the sketch only shapes the CANDIDATE
  set; the answer is exact).

The driver gate (``ev_heavy_hitters``) oracle is the plain
``GROUP BY ... HAVING count(*) * (k+1) > n`` — the semantics this
operator computes without ever grouping the full key domain.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch_counts: dict, k: int) -> dict:
    """Merge exact batch counts into a Misra-Gries summary of at most
    ``k`` counters. Mergeable-summaries rule: add, then if more than k
    counters remain, subtract the (k+1)-th largest count from all and
    drop the non-positive — the cumulative undercount stays ≤ n/(k+1).
    """
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        spill = sorted(counters.values(), reverse=True)[k]
        counters = {i: c - spill for i, c in counters.items() if c > spill}
    return counters


def mg_partition_candidates(
    df: DataFrame, col: str, k: int, item_type: str = "bigint"
) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries — ``(item, weight)``
    with at most ``k`` rows per task, ``weight`` the (under)count lower
    bound. Arrow-batched; the per-batch exact ``value_counts`` feeds the
    k-counter merge, so Python touches pre-reduced (item, count) pairs,
    not raw rows. ``item_type`` is the Spark SQL type of ``col`` (the
    output schema must be declared up front). A NULL-item sentinel row
    carries the partition's total row count, so the caller's global n
    needs no extra scan."""

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        n_seen = 0
        for pdf in batches:
            n_seen += len(pdf)
            vc = pdf[col].value_counts()
            counters = _mg_merge(counters, vc.to_dict(), k)
        if n_seen:
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()) + [None],
                    "weight": list(counters.values()) + [n_seen],
                }
            )

    return df.select(col).mapInPandas(
        summarize, schema=f"item {item_type}, weight bigint"
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int, item_type: str = "bigint"
) -> DataFrame:
    """Exact frequent items: every value of ``col`` with frequency
    strictly greater than n/(k+1), with its EXACT count — computed
    without ever grouping the full key domain (see module docstring for
    the two-pass scale argument). Returns ``(item, n_rows)`` where
    ``item`` keeps the source column's name."""
    # one summary frame serves both the candidate set and the global n
    # (the NULL sentinel rows); it is <= (k+1) x tasks rows, eagerly
    # checkpointed so the two consumers don't each rescan the corpus
    summaries = mg_partition_candidates(df, col, k, item_type).localCheckpoint(
        eager=True
    )
    cands = summaries.filter(F.col("item").isNotNull()).select("item").distinct()
    total = summaries.filter(F.col("item").isNull()).agg(
        F.sum("weight").alias("_n")
    )
    recount = (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("n_rows"))
    )
    return (
        recount.crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * (k + 1) > F.col("_n"))
        .select(F.col("item").alias(col), "n_rows")
    )
