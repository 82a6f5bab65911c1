"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (on in session.py) handles most skewed
sort-merge joins at runtime, but two shapes still need explicit salting
at 100 TB:

- **Stream-static and broadcast-infeasible joins** where AQE cannot
  re-plan (streaming micro-batches pin the physical plan), or where a
  single hot key exceeds what one reducer can hold even after AQE splits
  (AQE splits by partition, not by key — a single key hashed to one
  partition cannot be split further without changing the join key).
- **Skewed aggregations**: AQE does not split a hot groupBy key. A
  two-phase salted aggregate (partial by (key, salt), final by key)
  spreads the hot key's partial reduction over ``salt`` reducers; works
  for any algebraic aggregate (sum/count/min/max — the same mergeable
  decomposition sources/rollup.py materializes).

Salts are derived with xxhash64 of caller-chosen high-cardinality columns
(deterministic — reruns and retries produce identical partitioning; no
``rand()``, which breaks task-retry idempotency under speculative
execution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(salt_src: list[str], n: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt_src: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has heavy-hitter join keys: the skewed
    side gets a deterministic salt from ``salt_src`` columns (pick ones
    that vary *within* a hot key, e.g. the fact table's line number), the
    other side is replicated ``n_salts`` ways (explode of a literal
    range — rows generated executor-side), and the join key becomes
    (key, salt). The hot key's rows now land on ``n_salts`` reducers.

    Replication multiplies the other side's shuffle volume by
    ``n_salts`` — use for dimension-sized right sides; for fact-fact
    skew prefer AQE splitting unless one key dominates a partition.
    Driver-gated both ways: ``skew_salted_join_dim`` (plans/relational)
    is the contract-matching fact x dim example; ``skew_salted_join``
    exercises the mechanism on a fact-sized right side."""
    sk = skewed.withColumn("_salt", _salt_col(salt_src, n_salts))
    rep = other.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return sk.join(rep, on + ["_salt"], how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_src: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys. ``aggs`` maps output
    column -> (input column, fn) with fn in sum/count/min/max. Phase 1
    groups by (keys..., salt) — the hot key's reduction spreads across
    ``n_salts`` reducers; phase 2 merges the tiny partial frame by key
    (count merges as sum, min/max as themselves)."""
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for name, (col, fn) in aggs.items():
        if fn not in partial_fns:
            raise ValueError(f"{fn!r} is not an algebraic aggregate (got for {name!r})")
    salted = df.withColumn("_salt", _salt_col(salt_src, n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[partial_fns[fn](col).alias(name) for name, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fns[fn](name).alias(name) for name, (col, fn) in aggs.items()]
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Skew diagnostics for a prospective join/aggregation key — the
    numbers an engineer reads BEFORE reaching for the salting operators
    above: key cardinality, total rows, the hottest key's count, exact
    median and p99 per-key counts, and the Gini coefficient of the
    count distribution (0 = perfectly uniform, -> 1 = one key owns
    everything).

    Exactness: per-key counts are one hash aggregate; ranks over the
    count distribution come from operators/_util.global_row_number
    (range-partitioned — the sweep-compliant distributed rank, never a
    single-task window); the Gini numerator
    ``sum((2*rank - n - 1) * count)`` is exact bigint (ascending sort
    makes it nonnegative), and the coefficient is ONE double division
    of exact integers. Percentile counts are rank-EXACT selections
    (count at rank ceil(q*n)), not interpolations.

    Scale shape: the expensive pass is the per-key count aggregate
    (map-side combined); everything after runs on the |keys|-row
    histogram. Returns a single summary row
    ``(n_keys, total_rows, max_count, p50_count, p99_count, gini)``.
    """
    from rearview_spark.operators._util import global_row_number

    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ranked, n = global_row_number(
        counts, [F.col("cnt").asc(), F.col("k").asc()], out_col="rn"
    )
    if n == 0:
        raise ValueError(f"key_skew_report: no rows under {key_col!r}")
    p50 = (n + 1) // 2
    p99 = (99 * n + 99) // 100
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_count"),
        F.max(F.when(F.col("rn") == p50, F.col("cnt"))).alias("p50_count"),
        F.max(F.when(F.col("rn") == p99, F.col("cnt"))).alias("p99_count"),
        F.sum(
            (F.lit(2) * F.col("rn") - F.lit(n) - F.lit(1)) * F.col("cnt")
        ).alias("_gn"),
    )
    return agg.select(
        "n_keys",
        "total_rows",
        "max_count",
        "p50_count",
        "p99_count",
        (
            F.col("_gn").cast("double")
            / (F.col("n_keys") * F.col("total_rows")).cast("double")
        ).alias("gini"),
    )
