"""Incremental embedding dedup: a new micro-batch of vectors against a
persistent vector store (operators/similarity.py:
incremental_embedding_dedup) — the embedding-space analog of the
incremental minhash suite, including the streaming foreachBatch
packaging and a flat-dir store compaction between batches."""

from __future__ import annotations

import glob

import numpy as np
import pytest
from pyspark.sql import functions as F

from rearview_spark.operators.similarity import (
    embedding_store_rows,
    incremental_embedding_dedup,
    incremental_embedding_foreach_batch,
)

DIM = 16


def _base(i: int) -> list[float]:
    rng = np.random.default_rng(100 + i)
    return [float(x) for x in rng.normal(size=DIM)]


def _twin(i: int) -> list[float]:
    # multiplicative 1% jitter: cosine ~0.9999 to the base, far above
    # the 0.99 threshold; distinct bases sit near orthogonal
    return [x * (1.0 + 0.01 * ((d % 7) - 3) / 3.0) for d, x in enumerate(_base(i))]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_first_batch_dedups_within_itself(spark):
    batch = _vecs(spark, [(1, _base(0)), (2, _twin(0)), (3, _base(1))])
    out = incremental_embedding_dedup(batch, None, threshold=0.99, dim=DIM)
    by = {r["vec_id"]: r for r in out.collect()}
    assert set(by) == {1, 2, 3}
    assert by[1]["dup_of"] is None  # smallest id is canonical
    assert by[2]["dup_of"] == 1 and by[2]["cosine_sim"] >= 0.99
    assert by[3]["dup_of"] is None
    # the rows ARE store rows: band keys + vector + norm present
    assert len(by[1]["bands"]) == 2 and len(by[1]["emb"]) == DIM
    assert by[1]["nrm"] > 0


def test_second_batch_dedups_against_store_and_itself(spark):
    store = embedding_store_rows(
        _vecs(spark, [(1, _base(0)), (3, _base(1))]), dim=DIM
    )
    second = _vecs(
        spark,
        [
            (10, _twin(0)),   # dup of store vec 1
            (11, _base(2)),   # unique
            (12, _twin(2)),   # dup of batch-mate 11
        ],
    )
    out = incremental_embedding_dedup(second, store, threshold=0.99, dim=DIM)
    by = {r["vec_id"]: r for r in out.collect()}
    assert by[10]["dup_of"] == 1
    assert by[11]["dup_of"] is None
    assert by[12]["dup_of"] == 11


def test_retry_of_committed_batch_never_self_matches(spark):
    """foreachBatch is at-least-once: a retried batch sees its OWN rows
    already in the store. The same id must never decide dup_of=self."""
    batch = _vecs(spark, [(1, _base(0)), (2, _base(1))])
    store = embedding_store_rows(batch, dim=DIM)  # half-committed state
    out = {
        r["vec_id"]: r
        for r in incremental_embedding_dedup(
            batch, store, threshold=0.99, dim=DIM
        ).collect()
    }
    assert out[1]["dup_of"] is None and out[2]["dup_of"] is None


def test_bucket_cap_applies_to_union_occupancy(spark):
    # 30 store + 30 new copies of ONE direction: each side alone is
    # under the cap of 50, the union is over it -> bucket dropped whole
    store = embedding_store_rows(
        _vecs(spark, [(i, _base(0)) for i in range(30)]), dim=DIM
    )
    new = _vecs(spark, [(100 + i, _base(0)) for i in range(30)])
    out = incremental_embedding_dedup(
        new, store, threshold=0.99, dim=DIM, max_bucket_size=50
    )
    assert out.filter(F.col("dup_of").isNotNull()).count() == 0


def test_foreach_batch_streaming_cycle_with_compaction(spark, tmp_path):
    """Two-micro-batch golden cycle through real Structured Streaming,
    then a flat-dir store compaction (sources/compaction.py) between
    batches — the maintenance cadence the store needs at scale — and a
    third batch that reads the compacted store."""
    from rearview_spark.sources.compaction import optimize_metrics_dir

    store_dir = str(tmp_path / "vec_store")
    dec_dir = str(tmp_path / "decisions")
    src = str(tmp_path / "src")
    _vecs(spark, [(1, _base(0)), (2, _base(1))]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    process = incremental_embedding_foreach_batch(
        spark, store_dir, threshold=0.99, dim=DIM, decisions_dir=dec_dir
    )

    def run_stream():
        q = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    assert spark.read.parquet(store_dir).count() == 2  # both unique

    _vecs(spark, [(10, _twin(0)), (11, _base(2))]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_stream()

    store_ids = {r["vec_id"] for r in spark.read.parquet(store_dir).collect()}
    assert store_ids == {1, 2, 11}  # 10 dropped as a dup of store vec 1
    decisions = {
        r["vec_id"]: r["dup_of"] for r in spark.read.parquet(dec_dir).collect()
    }
    assert decisions[10] == 1 and decisions[11] is None
    assert len(glob.glob(store_dir + "/*.parquet")) >= 2  # appended per batch

    # flat-dir compaction: fewer files, same rows, next batch still dedups
    report = optimize_metrics_dir(
        spark, store_dir, min_files=2, sort_cols=("vec_id",)
    )
    assert report["."]["files_after"] < report["."]["files_before"]
    assert {r["vec_id"] for r in spark.read.parquet(store_dir).collect()} == store_ids

    process(_vecs(spark, [(20, _twin(2))]), 99)
    decisions = {
        r["vec_id"]: r["dup_of"] for r in spark.read.parquet(dec_dir).collect()
    }
    assert decisions[20] == 11  # matched through the compacted store
    assert {r["vec_id"] for r in spark.read.parquet(store_dir).collect()} == store_ids


def test_retry_with_tight_cap_reproduces_first_run(spark):
    """Regression (r09 review finding #1): the retried batch's rows
    sitting in the store must not inflate bucket occupancy — with a cap
    of 3 and three identical vectors, the duplicate store copy used to
    push the bucket to 4, drop it whole, and flip every decision to
    'unique'."""
    batch = _vecs(spark, [(1, _base(0)), (2, _base(0)), (3, _base(0))])

    def decisions(store):
        out = incremental_embedding_dedup(
            batch, store, threshold=0.99, dim=DIM, max_bucket_size=3
        )
        return {r["vec_id"]: r["dup_of"] for r in out.collect()}

    first = decisions(None)
    assert first == {1: None, 2: 1, 3: 1}
    half_committed = embedding_store_rows(_vecs(spark, [(1, _base(0))]), dim=DIM)
    assert decisions(half_committed) == first
