"""End-to-end training-data curation pipeline over the driver's tables —
the composition a data team actually runs, each stage an operator this
repo gates individually:

  documents ─ quality classifier ─ Gopher repetition filter ─ PII scrub
            ─ exact dedup ─ MinHash near-dedup ─ benchmark decontamination
            ─ DSIR importance ─ token-budget mix ─ context-window chunks
            ─ packed training sequences

Usage:  python examples/pipeline_demo.py [sf_dir]       (default sf0.01)

Every stage is deterministic (md5 thresholds, no RNG), so reruns —
including resumed 100 TB backfills — produce byte-identical output.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators import curation as CUR
from rearview_spark.operators import dedup as D
from rearview_spark.operators import selection as SEL
from rearview_spark.operators.chunking import chunk_token_windows
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables


def _stage(df, label: str):
    """Cache + count each stage so downstream stages (and their counts)
    reuse the materialized frame instead of re-deriving the whole
    upstream lineage — at backfill scale the difference between one pass
    per stage and O(stages^2) recompute."""
    df = df.cache()
    print(f"{label}: {df.count()}")
    return df


def main(sf_dir: str) -> None:
    spark = get_spark("pipeline_demo")
    docs = _stage(Tables(spark, sf_dir).documents, "corpus docs")

    # 1. quality classifier — BOOTSTRAPPED: weak labels from the rule
    # filters (Gopher repetition pass + recognized language) train the
    # logistic weights, which then score every doc through the shared
    # feature definitions (train_quality_weights docstring)
    from rearview_spark.operators.text import with_text_features

    weak = (
        CUR.gopher_quality_filter(
            docs, min_tokens=10, max_top_token_ratio=0.5,
            max_top_bigram_ratio=0.5, min_distinct_ratio=0.2,
        )
        .select("doc_id", "gopher_pass")
        .join(with_text_features(docs).select("doc_id", "lang_pred"), "doc_id")
        .join(docs.select("doc_id", "text"), "doc_id")
        .withColumn(
            "label", (F.col("gopher_pass") & (F.col("lang_pred") != "unk")).cast("int")
        )
    )
    # the weak boundary (stop_ratio threshold) is sharp, so the logistic
    # needs many steps / a hot lr to grow the separating weight — each
    # step is one 5-sum aggregate, so 400 steps is still seconds
    weights = SEL.train_quality_weights(weak, "label", iters=400, lr=8.0)
    print("trained quality weights:", [round(w, 3) for w in weights])
    kept_ids = (
        SEL.classifier_quality(docs, weights=weights).filter("keep").select("doc_id")
    )
    docs = _stage(docs.join(kept_ids, "doc_id"), "after quality classifier")

    # 2. Gopher repetition rules (thresholds loosened for the short
    # synthetic docs; production uses the published values)
    ok = (
        CUR.gopher_quality_filter(
            docs,
            min_tokens=10,
            max_top_token_ratio=0.5,
            max_top_bigram_ratio=0.5,
            min_distinct_ratio=0.2,
        )
        .filter("gopher_pass")
        .select("doc_id")
    )
    docs = _stage(docs.join(ok, "doc_id"), "after repetition filter")

    # 2b. LM-perplexity filter (CCNet shape): train the bigram LM on the
    # surviving corpus (production trains on a clean reference corpus
    # and broadcasts the counts), drop the highest-perplexity tail
    from rearview_spark.operators.text import bigram_lm_counts, doc_perplexity

    cb, cl, v = bigram_lm_counts(docs)
    ppl = doc_perplexity(docs, cb, cl, v)
    qs = ppl.filter("ppl IS NOT NULL").approxQuantile("ppl", [0.9], 0.01)
    if qs:  # all-short corpora have only NULL ppl: nothing to cut
        cutoff = qs[0]
        keep_ppl = ppl.filter(
            (F.col("ppl").isNull()) | (F.col("ppl") <= cutoff)
        ).select("doc_id")
        docs = _stage(docs.join(keep_ppl, "doc_id"), f"after perplexity filter (<= {cutoff:.1f})")

    # 3. PII scrub (text rewritten in place, counts audited)
    scrubbed = CUR.pii_scrub(docs)
    audit = scrubbed.agg(
        F.sum("n_email").alias("emails"),
        F.sum("n_ipv4").alias("ips"),
        F.sum("n_phone").alias("phones"),
    ).collect()[0]
    docs = scrubbed.drop("text").withColumnRenamed("scrubbed", "text").cache()
    print(f"PII redacted: {audit['emails']} emails, {audit['ips']} ips, {audit['phones']} phones")

    # 4. exact dedup: canonical (min-id) row per fingerprint, one window pass
    docs = _stage(D.drop_exact_duplicates(docs), "after exact dedup")

    # 5. MinHash near-dedup: drop the higher id of each near-dup pair
    pairs = D.minhash_near_duplicates(docs, threshold=0.8)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = _stage(docs.join(losers, "doc_id", "left_anti"), "after near-dedup")

    # 5b. substring-level dedup: excise verbatim cross-doc spans
    # (licenses/boilerplate), keeping each span's first occurrence
    spans = D.duplicated_spans(docs, window=8, min_tokens=8)
    excised = D.excise_duplicated_spans(docs, spans)
    removed = excised.agg(F.sum("n_tokens_removed")).collect()[0][0] or 0
    docs = _stage(
        excised.drop("n_tokens_removed").filter(F.length("text") > 0),
        "after span excision",
    )
    print(f"duplicated-span tokens excised: {removed}")

    # 6. decontamination against a toy benchmark (3 corpus docs stand in
    # for an eval set; they flag themselves and are removed)
    bench = docs.orderBy("doc_id").limit(3).select("doc_id", "text")
    hits = CUR.benchmark_contamination(docs, bench)
    docs = _stage(
        docs.join(hits.select("doc_id"), "doc_id", "left_anti"),
        "after decontamination",
    )

    # 7. DSIR importance against the English slice + token-budget mix
    weights = SEL.dsir_importance(docs, target=F.col("lang") == "en")
    top = weights.orderBy(F.desc("importance")).limit(3).collect()
    print("most in-domain docs:", [(r["doc_id"], round(r["importance"], 3)) for r in top])
    mixed = _stage(
        CUR.token_budget_mix(docs, {"en": 5000, "zh": 2000}, stratum_col="lang"),
        "after token-budget mix",
    )

    # 8. leakage-safe train/val split: the near-dup pair graph from
    # stage 5 decides per COMPONENT, so surviving twins stay together
    comps = D.connected_components(pairs)
    split = CUR.leakage_safe_split(mixed, comps, val_bp=1000)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"split: {counts.get('train', 0)} train / {counts.get('val', 0)} val (component-safe)")

    # 9. chunk + pack into training sequences
    train = split.filter("split = 'train'")
    chunks = chunk_token_windows(train, size=64, stride=48)
    packed = CUR.pack_sequences(
        train.select("doc_id", "text"), budget=256, n_shards=8
    )
    seqs = packed.agg(F.countDistinct("shard", "pack_seq")).collect()[0][0]
    print(f"chunks: {chunks.count()}  packed sequences: {seqs}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
