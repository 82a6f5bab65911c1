"""Continuous-ingest dedup — the shape a production corpus pipeline
runs: documents arrive in micro-batches and each batch is deduplicated
against EVERYTHING already accepted, without ever re-reading history's
text or re-pairing the whole corpus:

  micro-batch ──► incremental MinHash dedup ──► signature store (append)
              ──► incremental embedding dedup ─► vector store (append)
  (maintenance) ─ flat-dir store compaction between batches

History participates through its compact signature rows with
materialized band keys (text side) and its precomputed sign-LSH band
keys + vector (embedding side); both stores are plain parquet dirs
compacted by the same sink-log-aware maintenance operator as the
metrics table. For trickle ingest against a huge store, pass
``layout="pruned"`` to keep the partition-pruned banded layout instead
(see minhash_store_pruned_rows' sizing rule).

Usage:  python examples/incremental_ingest_demo.py [sf_dir]   (default sf0.01)

Deterministic end to end: md5 minhash permutations, md5-derived
hyperplanes, no RNG — a re-run (or a foreachBatch RETRY of a
half-committed batch) reproduces every decision.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators.dedup import incremental_dedup_foreach_batch
from rearview_spark.operators.similarity import incremental_embedding_foreach_batch
from rearview_spark.session import get_spark
from rearview_spark.sources.compaction import optimize_metrics_dir
from rearview_spark.sources.loader import Tables


def main(sf_dir: str) -> None:
    spark = get_spark("incremental_ingest_demo")
    work = tempfile.mkdtemp(prefix="incr_ingest_")
    sig_store = f"{work}/sig_store"
    vec_store = f"{work}/vec_store"
    doc_src = f"{work}/doc_src"
    emb_src = f"{work}/emb_src"

    # stage the corpus as TWO arrival waves (even ids land first)
    docs = Tables(spark, sf_dir).documents
    emb = Tables(spark, sf_dir).embeddings
    for wave, pred in ((1, "doc_id % 2 = 0"), (2, "doc_id % 2 = 1")):
        docs.filter(pred).coalesce(1).write.mode("append").parquet(doc_src)
        run_docs = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(doc_src)
            .writeStream.foreachBatch(
                incremental_dedup_foreach_batch(
                    spark, sig_store, threshold=0.5,
                    decisions_dir=f"{work}/doc_decisions",
                )
            )
            .option("checkpointLocation", f"{work}/doc_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        run_docs.awaitTermination(300)
        print(f"wave {wave}: signature store rows =",
              spark.read.parquet(sig_store).count())

    for wave, pred in ((1, "vec_id % 2 = 0"), (2, "vec_id % 2 = 1")):
        emb.filter(pred).coalesce(1).write.mode("append").parquet(emb_src)
        run_vecs = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(emb_src)
            .writeStream.foreachBatch(
                incremental_embedding_foreach_batch(
                    spark, vec_store, threshold=0.99,
                    decisions_dir=f"{work}/vec_decisions",
                )
            )
            .option("checkpointLocation", f"{work}/vec_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        run_vecs.awaitTermination(300)
        print(f"wave {wave}: vector store rows =",
              spark.read.parquet(vec_store).count())

    # maintenance between waves: both stores are flat parquet dirs;
    # the next micro-batch reads the compacted layout transparently
    for store, key in ((sig_store, "doc_id"), (vec_store, "vec_id")):
        report = optimize_metrics_dir(spark, store, min_files=2, sort_cols=(key,))
        if report:
            r = report["."]
            print(f"compacted {store.rsplit('/', 1)[-1]}: "
                  f"{r['files_before']} -> {r['files_after']} files")

    dropped = (
        spark.read.parquet(f"{work}/doc_decisions")
        .filter(F.col("dup_of").isNotNull())
        .count()
    )
    print("near-duplicate docs dropped across waves:", dropped)
    dropped_v = (
        spark.read.parquet(f"{work}/vec_decisions")
        .filter(F.col("dup_of").isNotNull())
        .count()
    )
    print("near-duplicate vectors dropped across waves:", dropped_v)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
