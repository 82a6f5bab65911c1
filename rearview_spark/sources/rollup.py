"""Hypertable-style continuous aggregates: multi-resolution rollups of the
metrics table plus a resolution router.

The reference recomputes every monitor window from raw points on each cron
firing (SURVEY.md §4.1 "Incremental computation: none"). At 100 TB that
makes a 30-day dashboard query a 30-day raw scan. The standard timeseries-
store answer (Timescale continuous aggregates, Graphite whisper retention
tiers) is materialized rollups at fixed resolutions, with queries routed
to the coarsest resolution that satisfies the requested step.

Design:

- Each rollup row keeps the **mergeable partial state** ``(sum, count,
  min, max)`` — not final aggregates — so (a) any coarser resolution is
  derivable from a finer one by re-aggregation (sums of sums), never by
  rescanning raw, and (b) avg is always exact: ``sum/count`` computed at
  read time. This is the algebraic-aggregate decomposition Spark itself
  uses for partial aggregation, applied across materializations.
- The cascade (raw -> 1h -> 1d -> ...) means the daily build reads the
  hourly table: build cost per tier drops by the fan-in factor, and a
  late-data rewrite touches one fine-grained partition plus its coarser
  ancestors, not the whole history.
- Rollup tables use the same dt-partitioned layout as the raw table
  (sources/layout.py), so window fetches on any tier partition-prune.
- Router: ``pick_resolution`` chooses the coarsest materialized step that
  divides the requested step; ``resolved_summarize`` then aggregates the
  (small) rollup instead of raw — a 30-day daily chart reads 720 rows per
  metric from the hourly tier instead of millions of raw points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rearview_spark.sources.layout import with_date_partition

#: tier name -> step seconds (ordered fine -> coarse)
DEFAULT_TIERS: dict[str, int] = {"1 hour": 3600, "1 day": 86400}

_STATE_COLS = ("sum_value", "n_points", "min_value", "max_value")


def rollup_from_raw(metrics: DataFrame, step: str) -> DataFrame:
    """Tumbling-window partial-aggregate rollup of the raw tall frame.
    One shuffle on (metric, window); map-side partial agg pre-reduces
    each scan partition to ~one row per (metric, bucket)."""
    return (
        metrics.groupBy("metric", F.window("ts", step).alias("w"))
        .agg(
            F.sum("value").alias("sum_value"),
            F.count("value").alias("n_points"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select("metric", F.col("w.start").alias("ts"), *_STATE_COLS)
    )


def rollup_cascade(rollup: DataFrame, step: str) -> DataFrame:
    """Coarsen an existing rollup by merging partial states (sum of sums,
    min of mins, ...). Never touches raw data — the input is already
    ~fan-in smaller, so each cascade tier costs a fraction of the last."""
    return (
        rollup.groupBy("metric", F.window("ts", step).alias("w"))
        .agg(
            F.sum("sum_value").alias("sum_value"),
            F.sum("n_points").alias("n_points"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select("metric", F.col("w.start").alias("ts"), *_STATE_COLS)
    )


def write_rollups(
    metrics: DataFrame,
    base_path: str,
    tiers: dict[str, int] | None = None,
) -> dict[str, str]:
    """Materialize the rollup cascade under ``base_path/<seconds>s/``
    (dt-partitioned like the raw layout). Returns tier -> path."""
    tiers = dict(sorted((tiers or DEFAULT_TIERS).items(), key=lambda kv: kv[1]))
    paths: dict[str, str] = {}
    current: DataFrame | None = None
    for step, secs in tiers.items():
        current = rollup_from_raw(metrics, step) if current is None else rollup_cascade(current, step)
        path = f"{base_path.rstrip('/')}/{secs}s"
        (
            with_date_partition(current)
            .repartition("dt")
            .sortWithinPartitions("metric", "ts")
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(path)
        )
        paths[step] = path
        current = current.sparkSession.read.parquet(path).select("metric", "ts", *_STATE_COLS)
    return paths


def pick_resolution(step_seconds: int, tiers: dict[str, int] | None = None) -> str | None:
    """Coarsest materialized tier whose step divides the requested step
    (None -> the query must read raw)."""
    tiers = tiers or DEFAULT_TIERS
    fitting = [(name, s) for name, s in tiers.items() if s <= step_seconds and step_seconds % s == 0]
    return max(fitting, key=lambda kv: kv[1])[0] if fitting else None


def read_rollup(spark: SparkSession, base_path: str, tier: str, tiers: dict[str, int] | None = None) -> DataFrame:
    tiers = tiers or DEFAULT_TIERS
    return spark.read.parquet(f"{base_path.rstrip('/')}/{tiers[tier]}s").select(
        "metric", "ts", *_STATE_COLS
    )


def resolved_summarize(
    rollup: DataFrame, step: str, fn: str = "avg"
) -> DataFrame:
    """summarize (G15) served from a rollup tier instead of raw: merge the
    partial states up to ``step`` and finalize ``fn``. avg = sum/count is
    exact (not an average of averages)."""
    merged = rollup_cascade(rollup, step)
    final = {
        "sum": F.col("sum_value"),
        "count": F.col("n_points").cast("double"),
        "min": F.col("min_value"),
        "max": F.col("max_value"),
        "avg": F.col("sum_value") / F.col("n_points"),
    }[fn]
    return merged.select("metric", "ts", final.alias("value"))


def refresh_rollups(
    spark: SparkSession,
    raw_metrics: DataFrame,
    base_path: str,
    dirty_dts: list,
    tiers: dict[str, int] | None = None,
) -> None:
    """Incremental continuous-aggregate refresh — the invalidation-based
    maintenance Timescale runs on hypertables, and the piece
    :func:`write_rollups` (full rebuild) leaves to the caller: given the
    set of DIRTY date partitions (the dts late/new raw rows landed in),
    recompute ONLY those partitions of every tier and dynamic-overwrite
    them in place.

    Why recompute-from-source instead of additive state merge: the
    partial states are mergeable, but an additive "read + add delta +
    overwrite" is not retry-safe without transactions (a replayed
    at-least-once batch double-adds into the partitions it already
    rewrote). Recomputing each dirty partition from the tier below is a
    DETERMINISTIC FUNCTION of the (already-landed) source data, so
    replays and crash-rerun land byte-identical — idempotence by
    construction, the same property every foreachBatch recurrence in
    this repo leans on. Cost stays partition-pruned: the finest tier
    re-aggregates only the dirty dts' raw rows; each coarser tier reads
    the dirty dts of the tier BELOW (fan-in smaller), never raw.

    Tier steps must divide one day (the dt partition grain) so no
    bucket spans a partition boundary — asserted, not assumed.
    """
    tiers = dict(sorted((tiers or DEFAULT_TIERS).items(), key=lambda kv: kv[1]))
    for step, secs in tiers.items():
        if 86400 % secs:
            raise ValueError(
                f"tier step {step!r} ({secs}s) does not divide one day — a "
                "bucket would span dt partitions and dirty-partition "
                "refresh could not be partition-local"
            )
    if not dirty_dts:
        return
    prev_overwrite = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        source: DataFrame | None = None
        for step, secs in tiers.items():
            if source is None:
                dirty = with_date_partition(raw_metrics).filter(
                    F.col("dt").isin(dirty_dts)
                )
                fresh = rollup_from_raw(dirty.drop("dt"), step)
            else:
                fresh = rollup_cascade(source, step)
            path = f"{base_path.rstrip('/')}/{secs}s"
            (
                with_date_partition(fresh)
                .repartition("dt")
                .sortWithinPartitions("metric", "ts")
                .write.mode("overwrite")
                .partitionBy("dt")
                .parquet(path)
            )
            source = (
                spark.read.parquet(path)
                .filter(F.col("dt").isin(dirty_dts))
                .select("metric", "ts", *_STATE_COLS)
            )
    finally:
        if prev_overwrite is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_overwrite)
