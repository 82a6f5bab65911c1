"""Bucketed table layout — Spark's storage-level answer to the
recurring fact-fact join: write both sides pre-hash-partitioned (and
optionally pre-sorted) on the join key ONCE, and every subsequent join
on that key runs with ZERO shuffle on either side (no Exchange below
the SortMergeJoin; with ``sortBy`` the per-bucket Sort disappears too).

At the 100 TB target this is the difference between re-shuffling a
~1.5 B-row lineitem on every orders join and paying that shuffle once
at ingest: bucket joins are the batch sibling of the rollup tiers
(pre-pay at write time what every read would otherwise pay). The
bucket count is a layout decision like shuffle partitions — both
sides MUST agree on (key, count) for the co-located plan, which is why
it lives here next to layout.py's partition/Z-order decisions rather
than inline in query code.

Spark-native mechanics (no reference parity — the reference delegates
storage entirely): ``DataFrameWriter.bucketBy`` + ``saveAsTable``
registers the bucket spec in the catalog; readers via
``spark.table(...)`` report ``outputPartitioning`` =
HashPartitioning(key, n) and Catalyst elides the Exchange
(plan-pinned in tests/test_plan_shapes.py). Plain
``spark.read.parquet`` on the same files does NOT see the spec —
bucketed data must be read through the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed parquet table: hash-partitioned
    into ``n_buckets`` files per write task on ``bucket_col``,
    per-bucket sorted on it when ``sort`` (lets the join skip its Sort
    as well as its Exchange). ``path`` makes it an external table
    (the caller owns the directory's lifetime — the temp-scoped gate
    pattern); default is the session warehouse.

    One full write of the data — the amortized cost: every future join
    or aggregation keyed on ``bucket_col`` starts co-located. Choose
    ``n_buckets`` like shuffle partitions at the target scale (enough
    that one bucket of the BIG side fits an executor's memory; both
    join sides must use the same count).
    """
    if n_buckets < 1:
        raise ValueError(f"write_bucketed: n_buckets must be >= 1, got {n_buckets}")
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a bucketed table — the ONLY read path that
    carries the bucket spec into planning (a direct parquet-path read
    plans a plain scan and re-shuffles on join)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external table data stays on disk —
    the caller's tempdir teardown owns it)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
