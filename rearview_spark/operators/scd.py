"""Slowly-changing-dimension (SCD Type 2) history maintenance.

The reference's relational layer versions monitor configs implicitly
(soft-delete + updated_at — /root/reference/db/schema.rb); a warehouse
generalizes that to full Type-2 history: every attribute change closes
the current row (``valid_to``) and opens a new one. This module builds
that history from a change stream and merges update batches into an
existing history, expressed as pure DataFrame ops. Persistence goes
through the transactional-table seam (sources/table_format.py — the
single place the Delta/Iceberg deployment mapping is documented).

Scale shape: everything is one window pass over (key, eff-ts) plus a
union with the closed rows — no joins, no iteration; the window key is
the dimension key, so the shuffle is dimension-sized, never fact-sized.
Determinism: ordering ties break on the attribute struct, and
consecutive duplicates collapse via null-safe struct comparison, so
replaying the same batch is a no-op (retry idempotency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Assemble a Type-2 history from a raw change stream: per key,
    order observations by (ts, attrs), collapse CONSECUTIVE rows with
    identical attributes (an observation that changes nothing is not a
    version), and close each version at the next version's start.
    Output: ``(key, attrs..., valid_from, valid_to)`` with
    ``valid_to`` null on the current row."""
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(key_col).orderBy(ts_col, *attr_cols)
    marked = changes.select(key_col, *attr_cols, ts_col).withColumn(
        "_prev", F.lag(attrs).over(w)
    )
    versions = marked.filter(
        F.col("_prev").isNull() | ~F.col("_prev").eqNullSafe(attrs)
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, *attr_cols)
    return versions.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    eff_col: str,
) -> DataFrame:
    """Merge an update batch into an existing Type-2 history: closed
    rows pass through untouched; the OPEN row of each key is re-derived
    together with the batch's updates through the same
    consecutive-dedup + close-at-next window as
    :func:`scd2_from_changes`. New keys insert; an update identical to
    the current attributes is a no-op; replaying a batch is a no-op
    (retry idempotency). Updates effective BEFORE the current version's
    start are LATE ARRIVALS and are dropped — the current-row contract
    of a warehouse MERGE; without it a replayed batch would re-open
    versions that already-closed history covers. To incorporate late
    data, rewrite from the full stream with :func:`scd2_from_changes`.
    ``updates`` carries ``(key, attrs..., eff_col)``."""
    cols = [key_col, *attr_cols, "valid_from"]
    closed = history.filter(F.col("valid_to").isNotNull())
    open_rows = history.filter(F.col("valid_to").isNull()).select(*cols)
    cur_from = open_rows.select(
        F.col(key_col), F.col("valid_from").alias("_cur_from")
    )
    ups = (
        updates.select(key_col, *attr_cols, F.col(eff_col).alias("valid_from"))
        .join(cur_from, key_col, "left")
        .filter(F.col("_cur_from").isNull() | (F.col("valid_from") >= F.col("_cur_from")))
        .select(*cols)
    )
    rebuilt = scd2_from_changes(
        open_rows.unionByName(ups), key_col, attr_cols, "valid_from"
    )
    return closed.select(*cols, "valid_to").unionByName(rebuilt)


def scd2_foreach_batch(
    spark,
    history_dir: str,
    key_col: str,
    attr_cols: list[str],
    eff_col: str,
    table_format=None,
):
    """Package :func:`scd2_merge` as a Structured Streaming
    ``foreachBatch`` callback: each micro-batch of dimension updates
    merges into the persistent Type-2 history at ``history_dir``.

    Persistence goes through the transactional-table seam
    (``sources/table_format.py`` — where the Delta deployment mapping
    lives): ``merge_snapshot`` commits ``merge_fn(history, batch)`` as
    batch N's version, with ``history`` excluding any previous attempt
    of the same batch — so a retried batch (foreachBatch is
    at-least-once) never reads its own half-committed output, and
    because :func:`scd2_merge` is idempotent under replay the commit
    lands identical. Pass ``table_format`` to deploy on a different
    format; the default is the in-sandbox versioned-parquet
    implementation rooted next to ``history_dir``.
    """
    import os

    if table_format is None:
        from rearview_spark.sources.table_format import ParquetTableFormat

        table_format = ParquetTableFormat(
            spark, os.path.dirname(history_dir.rstrip("/")) or "."
        )
    table = os.path.basename(history_dir.rstrip("/"))
    cols = [key_col, *attr_cols, "valid_from", "valid_to"]

    def _merge(history, batch_df: DataFrame) -> DataFrame:
        if history is None:
            # scd2_from_changes already emits valid_from/valid_to names
            return scd2_from_changes(
                batch_df.select(key_col, *attr_cols, F.col(eff_col)),
                key_col,
                attr_cols,
                eff_col,
            ).select(*cols)
        return scd2_merge(history, batch_df, key_col, attr_cols, eff_col).select(
            *cols
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        table_format.merge_snapshot(table, batch_id, batch_df, _merge)

    return _process
