"""Incremental minhash dedup: a new batch against the accumulated
signature store (operators/dedup.py: incremental_minhash_dedup) — the
continuously-ingesting pipeline's shape, including the streaming
foreachBatch packaging where batch 2 dedups against batch 1's store."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from rearview_spark.operators.dedup import (
    incremental_dedup_foreach_batch,
    incremental_minhash_dedup,
    minhash_near_duplicates,
    minhash_store_rows,
)

BASE = "the quick brown fox jumps over the lazy dog and then naps all afternoon"
OTHER = "completely different content about spark engines and columnar data formats"
THIRD = "yet another unrelated document mentioning streams watermarks and state stores"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_batch_dedups_within_itself(spark):
    batch = _docs(spark, [(1, BASE), (2, BASE + " today"), (3, OTHER)])
    out = incremental_minhash_dedup(batch, None, threshold=0.5)
    by = {r["doc_id"]: r for r in out.collect()}
    assert set(by) == {1, 2, 3}
    assert by[1]["dup_of"] is None  # smallest id is canonical
    assert by[2]["dup_of"] == 1 and by[2]["jaccard"] >= 0.5
    assert by[3]["dup_of"] is None
    # the rows ARE store rows: sig + shs present
    assert len(by[1]["sig"]) == 16 and len(by[1]["shs"]) > 0


def test_second_batch_dedups_against_store_and_itself(spark):
    first = _docs(spark, [(1, BASE), (3, OTHER)])
    store = minhash_store_rows(first)
    second = _docs(
        spark,
        [
            (10, BASE + " again"),   # dup of store doc 1
            (11, THIRD),             # unique
            (12, THIRD + " redux"),  # dup of batch-mate 11
        ],
    )
    out = incremental_minhash_dedup(second, store, threshold=0.5)
    by = {r["doc_id"]: r for r in out.collect()}
    assert by[10]["dup_of"] == 1
    assert by[11]["dup_of"] is None
    assert by[12]["dup_of"] == 11
    # history matched through signatures only — no text column anywhere
    assert "text" not in out.columns


def test_incremental_matches_batch_operator_decisions(spark, sf_dir):
    """Feeding the corpus in two halves must drop the same docs the
    batch operator would identify as duplicate-of-a-smaller-id (modulo
    bucket-cap interactions, absent at this scale): the incremental
    form is a refactoring of WHEN pairs are discovered, not WHAT
    matches."""
    from rearview_spark.sources.loader import Tables

    docs = Tables(spark, sf_dir).documents
    batch_rows = minhash_near_duplicates(docs, threshold=0.05).collect()
    batch_paired = {r["id_a"] for r in batch_rows} | {r["id_b"] for r in batch_rows}
    batch_dropped = {r["id_b"] for r in batch_rows}

    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    d1 = incremental_minhash_dedup(half1, None, threshold=0.05)
    store = d1.filter(F.col("dup_of").isNull()).select("doc_id", "sig", "shs")
    d2 = incremental_minhash_dedup(half2, store, threshold=0.05)
    dropped_with_mate = {
        (r["doc_id"], r["dup_of"])
        for d in (d1, d2)
        for r in d.filter(F.col("dup_of").isNotNull()).collect()
    }
    inc_dropped = {d for d, _ in dropped_with_mate}
    # every incremental drop is justified by a batch-discovered pair
    # (either side: incremental canonicalizes by ARRIVAL order — the
    # store doc wins even when its id is larger — while the batch view
    # canonicalizes by id; both legs of each drop must appear paired)
    assert inc_dropped <= batch_paired
    assert {m for _, m in dropped_with_mate} <= batch_paired | set()
    # and the incremental pass finds the bulk of the batch drops
    if batch_dropped:
        assert len(inc_dropped) >= len(batch_dropped) * 0.5


def test_foreach_batch_streaming_cycle(spark, tmp_path):
    store_dir = str(tmp_path / "sig_store")
    dec_dir = str(tmp_path / "decisions")
    src = str(tmp_path / "src")
    # two source files -> two micro-batches (maxFilesPerTrigger=1)
    _docs(spark, [(1, BASE), (2, OTHER)]).coalesce(1).write.mode("append").parquet(src)
    process = incremental_dedup_foreach_batch(
        spark, store_dir, threshold=0.5, decisions_dir=dec_dir
    )

    def run_stream():
        q = (
            spark.readStream.schema("doc_id long, text string")
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

    _docs(spark, [(10, BASE + " encore"), (11, THIRD)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_stream()

    store = {r["doc_id"] for r in spark.read.parquet(store_dir).collect()}
    assert store == {1, 2, 11}  # 10 was dropped as a dup of store doc 1
    decisions = {
        r["doc_id"]: r["dup_of"] for r in spark.read.parquet(dec_dir).collect()
    }
    assert decisions[10] == 1 and decisions[11] is None
    assert len(glob.glob(store_dir + "/*.parquet")) >= 2  # appended per batch


def test_bucket_cap_applies_to_union_occupancy(spark):
    # 600 store docs + 600 new docs share one text: each side alone is
    # under the 1000 cap, the UNION is over it -> bucket dropped, no
    # matches (exact-dedup is the right tool for such docs)
    store_docs = _docs(spark, [(i, BASE) for i in range(600)])
    new_docs = _docs(spark, [(1000 + i, BASE) for i in range(600)])
    store = minhash_store_rows(store_docs)
    out = incremental_minhash_dedup(new_docs, store, threshold=0.9)
    assert out.filter(F.col("dup_of").isNotNull()).count() == 0


def test_retry_of_committed_batch_never_self_matches(spark):
    """foreachBatch is at-least-once: a retried batch sees its OWN rows
    already in the store. The same id must never decide dup_of=self —
    the retry must reproduce the first run's decisions exactly."""
    batch = _docs(spark, [(1, BASE), (2, OTHER)])
    store = minhash_store_rows(batch)  # the half-committed state
    out = {r["doc_id"]: r for r in incremental_minhash_dedup(batch, store, threshold=0.5).collect()}
    assert out[1]["dup_of"] is None and out[2]["dup_of"] is None


def test_foreach_batch_plumbs_minhash_knobs(spark, tmp_path):
    """A store built through the callback with non-default num_hashes
    must band consistently on the next batch (the knobs are part of the
    store's schema contract)."""
    store_dir = str(tmp_path / "sigs8")
    process = incremental_dedup_foreach_batch(
        spark, store_dir, threshold=0.5, num_hashes=8, bands=2
    )
    process(_docs(spark, [(1, BASE)]), 0)
    assert len(spark.read.parquet(store_dir).first()["sig"]) == 8
    process(_docs(spark, [(2, BASE + " encore")]), 1)
    store = {r["doc_id"] for r in spark.read.parquet(store_dir).collect()}
    assert store == {1}  # doc 2 matched through the 8-hash banding


def test_retry_with_tight_cap_reproduces_first_run(spark):
    """Regression (r09 review finding #1, minhash side): a retried
    batch's own store rows must not inflate (band, bh) occupancy past
    the cap and flip the first run's decisions."""
    batch = _docs(spark, [(1, BASE), (2, BASE), (3, BASE)])

    def decisions(store):
        out = incremental_minhash_dedup(
            batch, store, threshold=0.5, max_bucket_size=3
        )
        return {r["doc_id"]: r["dup_of"] for r in out.collect()}

    first = decisions(None)
    assert first == {1: None, 2: 1, 3: 1}
    assert decisions(minhash_store_rows(_docs(spark, [(1, BASE)]))) == first


def test_pruned_layout_matches_rows_layout_decisions(spark, sf_dir, tmp_path):
    """The partition-pruned store (minhash_store_pruned_rows +
    incremental_minhash_dedup_pruned) must make IDENTICAL decisions to
    the rows-layout operator on the same data — pruning by band-hash
    prefix keeps every member of every HIT bucket, so candidates,
    occupancy caps, and verified jaccards all agree."""
    from rearview_spark.operators.dedup import (
        incremental_minhash_dedup_pruned,
        minhash_store_pruned_rows,
    )
    from rearview_spark.sources.loader import Tables

    docs = Tables(spark, sf_dir).documents
    store_docs = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    rows_out = incremental_minhash_dedup(
        batch, minhash_store_rows(store_docs), threshold=0.05
    )
    want = {
        r["doc_id"]: (r["dup_of"], r["jaccard"]) for r in rows_out.collect()
    }

    d = str(tmp_path / "pruned_store")
    minhash_store_pruned_rows(minhash_store_rows(store_docs)).write.partitionBy(
        "pfx"
    ).parquet(d)
    got_df = incremental_minhash_dedup_pruned(batch, spark, d, threshold=0.05)
    got = {r["doc_id"]: (r["dup_of"], r["jaccard"]) for r in got_df.collect()}
    assert got == want
    assert set(got_df.columns) == set(rows_out.columns)


def test_pruned_probe_reads_only_hit_dirs(spark, tmp_path):
    """The scale contract: the probe must touch ONLY the partition dirs
    the batch's band hashes hit — by explicit path (basePath read), so
    neither the scan NOR the listing is O(all dirs); Spark's recursive
    partition discovery runs a distributed listing job over every dir
    per read, which the measurement (PLANS.md r10) showed costing more
    than the scan it pruned. With a one-doc batch at most bands(=4)
    prefixes exist to hit."""
    import glob as _glob

    from rearview_spark.operators.dedup import (
        _pruned_store_prefixes,
        incremental_minhash_dedup_pruned,
        minhash_store_pruned_rows,
    )

    store_docs = _docs(
        spark, [(i, f"{OTHER} variant {i} tokens {i * 7} {i * 13}") for i in range(200)]
    )
    d = str(tmp_path / "pstore")
    minhash_store_pruned_rows(minhash_store_rows(store_docs)).write.partitionBy(
        "pfx"
    ).parquet(d)
    n_dirs = len(_glob.glob(d + "/pfx=*"))
    assert n_dirs > 8  # enough prefixes that pruning is observable
    assert len(_pruned_store_prefixes(spark, d)) == n_dirs

    batch = _docs(spark, [(9999, BASE)])
    pfxs = {
        r[0]
        for r in minhash_store_pruned_rows(minhash_store_rows(batch))
        .select("pfx")
        .distinct()
        .collect()
    }
    assert 0 < len(pfxs) <= 4
    # reproduce the operator's read shape and pin its input files
    hit = sorted(pfxs & set(_pruned_store_prefixes(spark, d)))
    if hit:  # BASE may hash clear of the store's prefixes
        reader = (
            spark.read.option("basePath", d)
            .schema("band int, bh string, doc_id long, shs array<long>, pfx string")
            .parquet(*[f"{d}/pfx={p}" for p in hit])
        )
        touched = {f.split("/pfx=")[1].split("/")[0] for f in reader.inputFiles()}
        assert touched == set(hit) and len(touched) < n_dirs
        # leading-zero-style prefixes survive (explicit schema, no
        # partition type inference)
        assert reader.schema["pfx"].dataType.simpleString() == "string"
    # and the decisions still come out right end-to-end
    out = incremental_minhash_dedup_pruned(
        _docs(spark, [(9999, BASE), (10000, BASE + " encore")]), spark, d, threshold=0.5
    )
    by = {r["doc_id"]: r["dup_of"] for r in out.collect()}
    assert by == {9999: None, 10000: 9999}


def test_foreach_batch_pruned_layout_cycle(spark, tmp_path):
    """The streaming packaging with layout='pruned': batch 2 dedups
    against batch 1's banded store through the partition-pruned probe;
    the store accumulates exploded (pfx, band, bh, id, shs) rows."""
    store_dir = str(tmp_path / "pruned_sig_store")
    dec_dir = str(tmp_path / "pruned_decisions")
    process = incremental_dedup_foreach_batch(
        spark, store_dir, threshold=0.5, decisions_dir=dec_dir, layout="pruned"
    )
    process(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
    store = spark.read.parquet(store_dir)
    assert set(store.columns) == {"pfx", "band", "bh", "doc_id", "shs"}
    assert store.select("doc_id").distinct().count() == 2
    assert store.count() == 2 * 4  # one row per (doc, band)

    process(_docs(spark, [(10, BASE + " encore"), (11, THIRD)]), 1)
    ids = {r["doc_id"] for r in store.select("doc_id").distinct().collect()}
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(store_dir).select("doc_id").distinct().collect()
    }
    assert ids == {1, 2, 11}  # 10 dropped as dup of store doc 1
    decisions = {
        r["doc_id"]: r["dup_of"] for r in spark.read.parquet(dec_dir).collect()
    }
    assert decisions[10] == 1 and decisions[11] is None

    # retry of the half-committed batch: same decisions, no self-match
    process(_docs(spark, [(10, BASE + " encore"), (11, THIRD)]), 1)
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(store_dir).select("doc_id").distinct().collect()
    }
    assert ids == {1, 2, 11}


def test_presigned_batch_matches_default_path(spark):
    """new_sigs override (r17): passing the batch's precomputed
    minhash_store_rows frame — the one-shared-signature-pass shape the
    dedup_incremental_minhash gate uses — must be BIT-identical to the
    default path that signs new_docs internally."""
    store_docs = _docs(spark, [(2, BASE), (4, OTHER)])
    batch = _docs(spark, [(5, BASE + " today"), (7, THIRD), (9, BASE)])
    store = minhash_store_rows(store_docs)
    default = incremental_minhash_dedup(batch, store, threshold=0.3)
    presigned = incremental_minhash_dedup(
        batch, store, threshold=0.3, new_sigs=minhash_store_rows(batch)
    )
    d = sorted(map(tuple, default.collect()))
    p = sorted(map(tuple, presigned.collect()))
    assert d == p
