"""Change-data-capture apply — collapsing a changelog (insert / update
/ delete operations, as a CDC feed or event-sourced mutation log emits
them) onto a keyed snapshot to produce the next snapshot. The missing
third member of the repo's mutation family: store.py's idempotent
upsert has no delete semantics, scd.py keeps full history — CDC apply
produces the CURRENT state under at-least-once, out-of-order delivery.

Spark-native shape: the changelog collapses to one winning operation
per key with a single key-partitioned window (never global), then ONE
full-outer join against the snapshot applies it. Both steps shuffle on
the same key, so at 100 TB the join is co-partitioned with the
collapse; a small delta against a bucketed snapshot
(sources/bucketed.py) makes the snapshot side shuffle-free too.

Not rearview parity (the reference's Rails app mutates row-by-row
through ActiveRecord — rearview/app/models/job.rb); this is that
write path re-expressed as a set-based batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CDC_OPS = ("I", "U", "D")


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a changelog to a snapshot. ``changes`` carries the
    snapshot's payload columns plus ``op_col`` in {'I','U','D'} and
    ``order_cols`` (a STRICT total order per key — e.g. (ts, seq);
    ties would make the winner nondeterministic, same contract as
    every ranked operator here). Last writer wins per key:

    * winning I/U  -> the key takes the change row's payload
      (upsert semantics — an I on an existing key and a U on a missing
      key both land the payload; CDC feeds deliver both shapes),
    * winning D    -> the key is absent from the result,
    * no change    -> the snapshot row passes through.

    Replays are idempotent: applying the same changelog twice yields
    the same snapshot (the collapse picks the same winner), and
    out-of-order delivery within the log is immaterial because the
    winner is chosen by ``order_cols``, not arrival order. A winning
    op outside {'I','U','D'} (or NULL) fails AT EXECUTION via an
    inline raise_error — no extra validation job (the
    allocate_proportional guard pattern).

    Scale shape: one key-partitioned row_number window collapses the
    changelog to |touched keys| rows, then one full-outer join on the
    key; ``order_cols`` ride along only through the collapse. Returns
    the snapshot schema exactly (op/order columns dropped).
    """
    if not key_cols:
        raise ValueError("apply_cdc: need at least one key column")
    if not order_cols:
        raise ValueError(
            "apply_cdc: need at least one order column (the winner per "
            "key is undefined without a total order)"
        )
    payload = [c for c in snapshot.columns if c not in key_cols]
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    checked_op = F.when(F.col(op_col).isin(*CDC_OPS), F.col(op_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("apply_cdc: op must be one of I/U/D, got "),
                F.coalesce(F.col(op_col), F.lit("NULL")),
            )
        ).cast("string")
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *key_cols,
            checked_op.alias("_op"),
            *[F.col(c).alias(f"_c_{c}") for c in payload],
        )
    )
    joined = snapshot.join(latest, key_cols, "full_outer")
    kept = joined.filter(F.col("_op").isNull() | (F.col("_op") != "D"))
    return kept.select(
        *key_cols,
        *[
            F.when(F.col("_op").isNotNull(), F.col(f"_c_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )


def cdc_foreach_batch(
    spark: SparkSession,
    state_dir: str,
    snapshot: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
):
    """CDC apply as a ``foreachBatch`` recurrence — the streaming form
    :func:`apply_cdc` alone CANNOT be: last-writer-wins is only
    associative across micro-batches if the state remembers each key's
    winning ORDER and keeps DELETE TOMBSTONES. A seq-5 update in batch
    0 followed by a straggling seq-3 update in batch 2 must not
    regress the row, and a seq-7 delete must keep blocking a late
    seq-5 update — so the persisted state is ``key -> (_ord struct,
    _op, payload)`` including deleted keys, and each batch merges by
    "greater ``_ord`` wins" (associative + commutative + idempotent,
    which is exactly what makes the streamed result equal to one
    :func:`apply_cdc` pass over the union — the merge-by-max sibling
    of the sketch family's merge-by-addition).

    Batch-dir replay contract (operators/sketch.py): state generations
    land under ``batch=<id>``; a retried batch re-merges from its
    PREDECESSOR, so at-least-once delivery never double-applies.
    ``snapshot`` seeds generation -1 as op 'I' rows with a NULL
    ``_ord`` (orders below every real change — struct comparison puts
    NULL first, so any change beats the seed). Batch frames carry the
    snapshot's payload columns plus ``op_col`` and ``order_cols``.

    Read the result back with :func:`cdc_state_snapshot`. Tombstone
    retention is deliberate and unbounded here; production compaction
    of tombstones older than the source's max delivery lag is a
    retention policy, not a semantics change (same boundary note as
    the rollup tiers).

    Scale shape per batch: one key-window collapse of the batch (sized
    by the batch, not history) + one key-join against the persisted
    state — co-partitioned on the key; state size is |live keys +
    tombstones|. Each generation REWRITES the full state (what makes
    the retry contract trivially correct); at a 100 TB state the knob
    is hash-bucketing the state dir on the key and rewriting only the
    buckets a batch touches (dynamic partition overwrite — the
    refresh_rollups mechanism), or handing the merge to a
    transactional table format via the sources/table_format.py seam.
    Either changes WHERE rows land, not which rows win.
    """
    if not key_cols or not order_cols:
        raise ValueError(
            "cdc_foreach_batch: need at least one key column and one "
            "order column (same contract as apply_cdc)"
        )
    payload = [c for c in snapshot.columns if c not in key_cols]
    from rearview_spark.operators.sketch import _latest_batch_dir

    def _seed() -> DataFrame:
        return snapshot.select(
            *key_cols,
            F.lit(None).cast(
                "struct<" + ",".join(f"_o{i}:long" for i in range(len(order_cols))) + ">"
            ).alias("_ord"),
            F.lit("I").alias("_op"),
            *payload,
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        cur = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                *key_cols,
                F.struct(
                    *[
                        F.col(c).cast("long").alias(f"_o{i}")
                        for i, c in enumerate(order_cols)
                    ]
                ).alias("_ord"),
                F.col(op_col).alias("_op"),
                *payload,
            )
        )
        prev_dir = _latest_batch_dir(spark, state_dir, below=batch_id)
        prev = spark.read.parquet(prev_dir) if prev_dir is not None else _seed()
        merged = (
            prev.unionByName(cur)
            .withColumn(
                "_win",
                F.row_number().over(
                    Window.partitionBy(*key_cols).orderBy(
                        F.col("_ord").desc_nulls_last()
                    )
                ),
            )
            .filter(F.col("_win") == 1)
            .drop("_win")
        )
        merged.write.mode("overwrite").parquet(
            f"{state_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def cdc_state_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current snapshot from a :func:`cdc_foreach_batch` state dir:
    latest generation, tombstones dropped, meta columns stripped."""
    from rearview_spark.operators.sketch import _latest_batch_dir

    latest = _latest_batch_dir(spark, state_dir)
    if latest is None:
        raise ValueError(f"cdc_state_snapshot: no state under {state_dir}")
    st = spark.read.parquet(latest)
    return st.filter(F.col("_op") != "D").drop("_ord", "_op")
