"""Storage layout for the 100 TB metrics table (SURVEY.md §4.1 row 3).

The reference delegated layout to Graphite's whisper-file-per-metric
(README.md:6). Our equivalent decisions, encoded as the write path:

- **Partition by ``dt = date(ts)``** — every monitor window is a trailing
  range of minutes/hours, so date partitions make G4 window fetches
  partition-pruned scans; late data rewrites at most one day.
- **Bucket by ``metric``** (saveAsTable path) — per-series window
  functions (G10-G13) and ts-equi combines co-locate without a shuffle
  when both sides are bucketed; glob selection (G2) reduces to bucket
  pruning once rewritten through the metric-name dimension.
- **Sort within partitions by (metric, ts)** — parquet row-group min/max
  stats then prune both series and time inside each file, and ordered
  runs compress well (delta-encoded ts).
- File sizing: target ``maxRecordsPerFile`` keeps row groups near the
  HDFS/object-store sweet spot instead of thousands of tiny files.

``write_metrics_table`` (bucketed, needs a warehouse/metastore) is the
cluster path; ``write_metrics_dir`` (plain directory, same partition +
sort layout) serves environments without a metastore — both produce
scans Catalyst prunes the same way except bucket-join co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64
DEFAULT_MAX_RECORDS_PER_FILE = 5_000_000


def with_date_partition(metrics: DataFrame) -> DataFrame:
    return metrics.withColumn("dt", F.to_date("ts"))


def write_metrics_dir(
    metrics: DataFrame,
    path: str,
    mode: str = "append",
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """Directory layout: dt-partitioned, (metric, ts)-sorted files."""
    (
        with_date_partition(metrics)
        .repartition("dt", "metric")
        .sortWithinPartitions("metric", "ts")
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("dt")
        .parquet(path)
    )


def write_metrics_table(
    metrics: DataFrame,
    table: str,
    buckets: int = DEFAULT_BUCKETS,
    mode: str = "append",
    path: str | None = None,
) -> None:
    """Metastore-backed layout adding metric bucketing (co-located
    series joins; bucket pruning for exact-metric scans). ``path`` makes
    it an external table (storage outside the warehouse dir)."""
    writer = (
        with_date_partition(metrics)
        .repartition(buckets, "metric")
        .write.mode(mode)
    )
    if path is not None:
        writer = writer.option("path", path)
    (
        writer.partitionBy("dt")
        .bucketBy(buckets, "metric")
        .sortBy("metric", "ts")
        .saveAsTable(table)
    )


def read_metrics_dir(spark, path: str) -> DataFrame:
    """Read back the canonical shape (dt is a pruning column, dropped)."""
    return spark.read.parquet(path).select("metric", "ts", "value")


def metric_names_dimension(metrics: DataFrame) -> DataFrame:
    """Distinct metric names — the dimension table that turns glob
    selection (G2) into a pushed IN-list filter (bucket pruning on the
    bucketed layout; see operators/timeseries.py select_glob). Maintain
    it incrementally at ingest (foreachBatch upsert of new names), not by
    re-scanning the fact table."""
    return metrics.select("metric").distinct()
