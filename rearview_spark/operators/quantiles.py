"""Exact distributed order statistics — the EXACT complement of the
registered approx family (`ev_approx_quantiles` /
``approx_percentile``): when a reconciliation, SLA report, or billing
cut needs the true p50/p95/p99 of a 100 TB column (not an
epsilon-approximate one), the scale-safe plan is a distributed
selection, never ``Window.orderBy`` over the raw rows.

Built on operators/_util.global_row_number: one range shuffle spreads
the sort across the cluster, per-partition row numbers + broadcast
prefix offsets give every row its global rank, and the requested
order statistics are ONE semi-join ``rank IN (k_1..k_m)`` away — the
whole result is |percentiles| rows. Exactness costs exactly the range
shuffle; ``approx_percentile`` (one pass, mergeable sketches) remains
the production knob when epsilon-error is acceptable — the same
exact-vs-approx dial as the column profiler's NDV modes.

Not rearview parity; relational-pipeline scope.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: list[float],
    tiebreak_col: str,
) -> DataFrame:
    """Exact ``percentile_disc`` values of ``value_col``: for each p,
    the element at 1-based rank ``ceil(p * n)`` in value order (the
    SQL-standard discrete percentile — the first value whose
    cumulative distribution reaches p; p = 0 maps to rank 1, the
    minimum). ``tiebreak_col`` (any unique column, e.g. the row id)
    completes the strict total order global_row_number requires —
    equal values are interchangeable for the SELECTED value, so the
    tiebreak changes nothing observable, it only pins the physics.

    Scale shape: one ``repartitionByRange`` pass (the distributed
    sort), per-partition row_number, a P-row offset collect, then a
    broadcast IN-list filter on the target ranks (|percentiles|
    literals — no second shuffle, no window over raw data). NULL
    values are excluded first (percentiles of the non-null
    distribution, matching percentile_disc).

    Returns ``(p, rank, value)`` sorted by p — exact engine values,
    no rounding contract needed (element SELECTION, not arithmetic).
    """
    from rearview_spark.operators._util import global_row_number

    if not percentiles:
        raise ValueError("exact_percentiles: need at least one percentile")
    for p in percentiles:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"exact_percentiles: percentile {p} outside [0, 1]")

    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v"), F.col(tiebreak_col).alias("_t")
    )
    ranked, n = global_row_number(vals, ["_v", "_t"], "_rank")
    if n == 0:
        raise ValueError("exact_percentiles: no non-null values")
    targets = {p: max(1, math.ceil(p * n)) for p in percentiles}
    picked = ranked.filter(
        F.col("_rank").isin(*sorted(set(targets.values())))
    ).select(F.col("_rank"), F.col("_v"))
    spark = df.sparkSession
    want = spark.createDataFrame(
        [(float(p), int(k)) for p, k in sorted(targets.items())],
        "p double, rank long",
    )
    return (
        want.join(F.broadcast(picked), want["rank"] == picked["_rank"])
        .select("p", "rank", F.col("_v").alias("value"))
        .orderBy("p")
    )


def winsorize_summary(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    cents_scale: int = 100,
) -> DataFrame:
    """Winsorization audit: clamp a numeric column at its exact
    ``lower``/``upper`` discrete percentiles and report what the
    clipping does — clipped-row counts per tail, the exact bounds, and
    the mean before/after — the outlier-treatment decision read (how
    much does the tail actually move the mean?) before a cleaning pass
    rewrites data.

    Bounds come from :func:`exact_percentiles` (element PICKS over the
    strict (value, tiebreak) order — engine-exact, collected as a
    2-row bounded artifact); clipped counts are exact int64; means
    aggregate ``cents_scale``-quantized int64 units (the plans/_exact
    integer-cents discipline) with one terminal division each. The
    ceil(p*n) rank arithmetic is the same IEEE double expression in
    both engines.

    Scale shape: one ranked pass for the bounds (range shuffle), one
    full-scan hash collapse to a single row. Raises on an all-NULL /
    empty column (no distribution to winsorize).

    Returns one row ``(n, n_clipped_low, n_clipped_high, lo_bound,
    hi_bound, mean_before, mean_after)``.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(
            f"winsorize_summary: need 0 <= lower < upper <= 1 "
            f"(got {lower!r}, {upper!r})"
        )
    bounds = {
        row["p"]: row["value"]
        for row in exact_percentiles(
            df, value_col, [lower, upper], tiebreak_col
        ).collect()
    }
    lo, hi = float(bounds[lower]), float(bounds[upper])
    v = F.col(value_col)
    clamped = (
        F.when(v < F.lit(lo), F.lit(lo))
        .when(v > F.lit(hi), F.lit(hi))
        .otherwise(v)
    )
    scale = float(cents_scale)
    agg = df.filter(v.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((v < F.lit(lo)).cast("int")).cast("long").alias("n_clipped_low"),
        F.sum((v > F.lit(hi)).cast("int")).cast("long").alias("n_clipped_high"),
        F.sum(F.round(v * F.lit(scale)).cast("long")).alias("_sb"),
        F.sum(F.round(clamped * F.lit(scale)).cast("long")).alias("_sa"),
    )
    return agg.select(
        "n",
        "n_clipped_low",
        "n_clipped_high",
        F.lit(lo).alias("lo_bound"),
        F.lit(hi).alias("hi_bound"),
        (
            F.col("_sb").cast("double") / F.col("n").cast("double") / F.lit(scale)
        ).alias("mean_before"),
        (
            F.col("_sa").cast("double") / F.col("n").cast("double") / F.lit(scale)
        ).alias("mean_after"),
    )
