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


# ---------------------------------------------------------------------------
# Z-order clustering — multi-column data skipping
# ---------------------------------------------------------------------------
#
# Date-partition + (metric, ts) sort above gives 1-dimensional pruning.
# When scans filter on TWO dimensions at once (time range x user/entity
# slice — the events-table access pattern), a linear sort order makes the
# second column's per-file min/max spans useless. Z-ordering interleaves
# the bits of rank-quantized columns so rows close in ANY clustered
# dimension land in the same files, and every clustered column's
# row-group stats stay selective — the same technique Delta/Iceberg
# OPTIMIZE ZORDER applies, expressed here as plain DataFrame ops.
#
# The quantizer is the SQ8 floor-bucket scheme (floor, never round-half;
# collapsed range -> 0) so the key is bit-deterministic cross-engine,
# and the interleave is pure integer arithmetic — the gate query
# (ev_zorder_keys) value-checks keys against a DuckDB oracle generated
# from the SAME expression builder below.

ZORDER_BITS = 8


def quantize_col(x: "F.Column", mn: "F.Column", mx: "F.Column", bits: int = ZORDER_BITS) -> "F.Column":
    """Rank-quantize a numeric column to [0, 2^bits) against broadcast
    min/max bounds: floor((x-mn)/(mx-mn) * 2^bits) clamped, collapsed
    range -> 0."""
    levels = float(1 << bits)
    scaled = ((x.cast("double") - mn.cast("double"))
              / (mx.cast("double") - mn.cast("double"))) * F.lit(levels)
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(F.least(F.floor(scaled).cast("int"), F.lit((1 << bits) - 1)))
    )


def zorder_key(qcols: list["F.Column"], bits: int = ZORDER_BITS) -> "F.Column":
    """Interleave the bits of pre-quantized int columns into one long:
    bit b of column c lands at position b*ncols + (ncols-1-c), so column
    0 is the most significant within each level. Pure shifts/ands/adds —
    integer-exact, order-free."""
    n = len(qcols)
    total = None
    for b in range(bits):
        for c, q in enumerate(qcols):
            term = F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + (n - 1 - c)
            ).cast("long")
            total = term if total is None else total + term
    return total


def zorder_key_sql(qcols_sql: list[str], bits: int = ZORDER_BITS) -> str:
    """DuckDB expression mirroring ``zorder_key`` term-for-term (integer
    ops are exact, so only the term SET matters — but we emit the same
    order anyway)."""
    n = len(qcols_sql)
    terms = []
    for b in range(bits):
        for c, q in enumerate(qcols_sql):
            # each term fully parenthesized: DuckDB/Postgres give '+'
            # and '<<' the same precedence (left-assoc), so a bare
            # 'a << 1 + b << 0' chain re-shifts the running sum
            terms.append(
                f"(CAST((({q} >> {b}) & 1) AS BIGINT) << {b * n + (n - 1 - c)})"
            )
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    qcols: list["F.Column"],
    n_partitions: int,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Cluster a frame by its z-value: range-repartition + sort on the
    interleaved key, then drop it. Writing the result gives files whose
    per-column min/max spans are tight in EVERY clustered dimension
    (test_zorder_spans pins the span shrink vs a linear sort). The trade
    is explicit: measured on events sf0.01 / 16 partitions, avg
    per-partition user_id span drops 149 -> 60 while ts span widens
    ~4.7x — a linear sort is optimal for its ONE column, z-order buys
    balanced skipping on all clustered columns; use it exactly when
    scans filter on several at once. Range boundaries come from Spark's
    reservoir sampling — layout placement, not query semantics, so
    sampling nondeterminism is harmless."""
    keyed = df.withColumn("_z", zorder_key(qcols, bits))
    return (
        keyed.repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
