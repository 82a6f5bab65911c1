"""Unit tests for the round-10 additions: Misra-Gries exact heavy
hitters (operators/sketch.py), per-source cap sampling
(curation.source_cap_sample), and retrieval metrics
(retrieval.retrieval_eval)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rearview_spark.operators.curation import source_cap_sample
from rearview_spark.operators.retrieval import retrieval_eval
from rearview_spark.operators.sketch import _mg_merge, heavy_hitters


def _exact_hh(rows: list, k: int) -> dict:
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    return {item: cnt for item, cnt in c.items() if cnt * (k + 1) > n}


def _skewed_rows() -> list:
    # zipf-ish: item i appears 1000//(i+1) times — a few heavies, long tail
    rows = []
    for i in range(200):
        rows.extend([i] * (1000 // (i + 1)))
    return rows


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_heavy_hitters_exact_under_any_partitioning(spark, parts):
    """The MG candidate union is a guaranteed superset, the recount is
    exact — so the output must equal the brute-force answer regardless
    of how the data is partitioned (including partitions that see only
    tail items)."""
    rows = _skewed_rows()
    k = 25
    df = spark.createDataFrame([(v,) for v in rows], "user_id bigint").repartition(
        parts
    )
    got = {r["user_id"]: r["n_rows"] for r in heavy_hitters(df, "user_id", k).collect()}
    assert got == _exact_hh(rows, k)
    assert got  # the construction has real heavies


def test_heavy_hitters_string_items_and_no_heavies(spark):
    rows = [f"u{i}" for i in range(400)]  # uniform: nobody exceeds n/(k+1)
    df = spark.createDataFrame([(v,) for v in rows], "item string")
    out = heavy_hitters(df, "item", k=10, item_type="string").collect()
    assert out == []


def test_mg_merge_bound():
    """After merging any stream in any batching, an item with true count
    > n/(k+1) must survive with positive weight."""
    rows = _skewed_rows()
    k = 25
    for chunk in (17, 256):
        counters: dict = {}
        for i in range(0, len(rows), chunk):
            batch = rows[i : i + chunk]
            counts: dict = {}
            for v in batch:
                counts[v] = counts.get(v, 0) + 1
            counters = _mg_merge(counters, counts, k)
        assert len(counters) <= k
        for item in _exact_hh(rows, k):
            assert counters.get(item, 0) > 0


@pytest.mark.parametrize("cap", [0, 3, 18, 999])
def test_source_cap_exact_and_deterministic(spark, sf_dir, cap):
    """Exactly min(cap, |source|) docs survive per source; the survivor
    SET is identical under different partitionings (deterministic hash
    order, no RNG)."""
    from rearview_spark.sources.loader import Tables

    docs = Tables(spark, sf_dir).documents.select("doc_id", "source")
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    out = source_cap_sample(docs, cap=cap)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    want = {s: min(cap, n) for s, n in sizes.items() if min(cap, n) > 0}
    assert got == want
    ids = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in source_cap_sample(docs.repartition(13), cap=cap).collect()}
    assert ids == ids2


def test_source_cap_matches_naive_rank(spark, sf_dir):
    """The two-phase bucket selection equals the naive per-source
    row_number over (hash mod buckets, hash, id) — same order the gate
    oracle uses."""
    from pyspark.sql import Window

    from rearview_spark.operators.dedup import md5_bucket
    from rearview_spark.sources.loader import Tables

    docs = Tables(spark, sf_dir).documents.select("doc_id", "source")
    h = md5_bucket(F.col("doc_id"), "srccap", mod=10 ** 15)
    w = Window.partitionBy("source").orderBy(
        F.pmod(h, F.lit(1024)), h, F.col("doc_id")
    )
    naive = (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 7)
        .drop("_rk")
    )
    want = {r["doc_id"] for r in naive.collect()}
    got = {r["doc_id"] for r in source_cap_sample(docs, cap=7).collect()}
    assert got == want


def test_source_cap_rejects_negative():
    with pytest.raises(ValueError):
        source_cap_sample(None, cap=-1)


def test_retrieval_eval_hand_computed(spark):
    """3-doc run, hand-checkable metrics: query 0 has rel docs {1, 2, 9}
    with hits at ranks 1 and 3; query 1 has rel {5} never retrieved;
    query 2 judged but has no run rows at all."""
    run = spark.createDataFrame(
        [(0, 1, 1), (0, 7, 2), (0, 2, 3), (1, 1, 1), (1, 2, 2)],
        "query_id bigint, doc_id bigint, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 9), (1, 5), (2, 3)],
        "query_id bigint, doc_id bigint",
    )
    rows = {r["query_id"]: r.asDict() for r in retrieval_eval(run, qrels, k=10).collect()}
    assert set(rows) == {0, 1, 2}

    q0 = rows[0]
    assert q0["n_rel"] == 3 and q0["hits_at_k"] == 2
    assert q0["recall_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert q0["mrr"] == 1.0
    t = lambda r: round(1.0 / math.log2(r + 1) + 5e-10, 6)
    dcg = round(t(1) + t(3) + 5e-10, 6)
    idcg = round(t(1) + t(2) + t(3) + 5e-10, 6)
    assert q0["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)

    assert rows[1] == {
        "query_id": 1, "n_rel": 1, "hits_at_k": 0,
        "recall_at_k": 0.0, "mrr": 0.0, "ndcg_at_k": 0.0,
    }
    assert rows[2]["hits_at_k"] == 0 and rows[2]["ndcg_at_k"] == 0.0


def test_retrieval_eval_respects_k(spark):
    """Ranks beyond k are ignored: a hit at rank 6 with k=5 counts for
    nothing."""
    run = spark.createDataFrame(
        [(0, 1, 6)], "query_id bigint, doc_id bigint, rank int"
    )
    qrels = spark.createDataFrame([(0, 1)], "query_id bigint, doc_id bigint")
    row = retrieval_eval(run, qrels, k=5).collect()[0]
    assert row["hits_at_k"] == 0 and row["mrr"] == 0.0


def test_bpe_encode_hand_case(spark):
    """Encode with the merges from the bpe_train hand case: after
    (a,a), (a,b), (aa,ab), 'aaab' is one token and 'ab' is one token;
    an unseen-shape word ('ba') stays characters."""
    from rearview_spark.operators import text as X

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab ab")], "doc_id long, text string"
    )
    merges = X.bpe_train(docs, n_merges=3)
    out = {r["doc_id"]: r.asDict() for r in X.bpe_encode(docs, merges).collect()}
    assert out[1]["n_words"] == 2 and out[1]["n_tokens"] == 2  # [aaab] [aaab]
    assert out[2]["n_words"] == 2 and out[2]["n_tokens"] == 2  # [aaab] [ab]
    assert out[1]["toks_md5"] != out[2]["toks_md5"]

    other = spark.createDataFrame([(9, "ba aaab")], "doc_id long, text string")
    enc = {r["doc_id"]: r.asDict() for r in X.bpe_encode(other, merges).collect()}
    # 'ba' has no applicable merge -> 2 symbols; 'aaab' collapses to 1
    assert enc[9]["n_words"] == 2 and enc[9]["n_tokens"] == 3


def test_bpe_encode_word_order_in_hash(spark):
    """The token-stream hash respects word order (positions survive the
    regroup): same bag of words, different order, different md5."""
    from rearview_spark.operators import text as X

    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "dog cat")], "doc_id long, text string"
    )
    merges = X.bpe_train(docs, n_merges=2)
    out = {r["doc_id"]: r["toks_md5"] for r in X.bpe_encode(docs, merges).collect()}
    assert out[1] != out[2]


def test_indexed_bm25_equals_scan_bm25(spark, sf_dir):
    """Index-served BM25 returns bit-identical (doc, score) rows to the
    corpus-scan ranker for the same query — the index is a plan choice,
    not a semantics change."""
    from rearview_spark.operators import retrieval as R
    from rearview_spark.sources.loader import Tables

    docs = Tables(spark, sf_dir).documents
    postings, stats = R.build_inverted_index(docs)
    terms = ["spark", "join", "window"]
    scan = [(r["doc_id"], r["score"]) for r in R.bm25_topk(docs, terms, k=15).collect()]
    idx = [
        (r["doc_id"], r["score"])
        for r in R.bm25_topk_indexed(postings, stats, terms, k=15).collect()
    ]
    assert idx == scan  # exact doubles, exact order


def test_inverted_index_postings_shape(spark):
    """Postings are doc-id-sorted, carry dl per entry, df matches list
    length; a term absent from the corpus scores idf with df=0 and
    returns nothing."""
    from rearview_spark.operators import retrieval as R

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    postings, stats = R.build_inverted_index(docs)
    by_term = {r["term"]: r for r in postings.collect()}
    assert by_term["a"]["df"] == 1 and by_term["b"]["df"] == 2
    b_posts = [(p["doc_id"], p["tf"], p["dl"]) for p in by_term["b"]["postings"]]
    assert b_posts == [(1, 1, 3), (2, 1, 2)]
    s = stats.collect()[0]
    assert (s["n_docs"], s["sum_dl"]) == (2, 5)
    assert R.bm25_topk_indexed(postings, stats, ["zzz"], k=5).collect() == []


def test_streaming_mg_cycle_and_retry(spark, tmp_path):
    """foreachBatch MG: candidates accumulate across batches with valid
    lower bounds; a retried batch re-merges from its predecessor's
    state (batch-versioned subdirs), reproducing identical output."""
    from rearview_spark.operators.sketch import (
        heavy_hitters_foreach_batch,
        latest_stream_summary,
    )

    d = str(tmp_path / "mg_state")
    process = heavy_hitters_foreach_batch(spark, d, "user_id", k=5)
    assert latest_stream_summary(spark, d) is None

    b0 = spark.createDataFrame(
        [(v,) for v in [1] * 50 + [2] * 30 + list(range(100, 120))], "user_id bigint"
    )
    b1 = spark.createDataFrame(
        [(v,) for v in [1] * 40 + [3] * 35 + list(range(200, 215))], "user_id bigint"
    )
    process(b0, 0)
    process(b1, 1)
    state = {
        r["item"]: r["weight"] for r in latest_stream_summary(spark, d).collect()
    }
    n = state.pop(None)
    assert n == 100 + 90
    # true counts: 1->90, 2->30, 3->35; n/(k+1)=31.7 -> 1 and 3 are true
    # heavies and MUST be candidates with positive lower bounds <= truth
    assert 0 < state[1] <= 90 and 0 < state[3] <= 35
    assert len(state) <= 5

    retried = dict(state)
    process(b1, 1)  # retry: re-merges from batch 0, overwrites batch 1
    again = {
        r["item"]: r["weight"] for r in latest_stream_summary(spark, d).collect()
    }
    again.pop(None)
    assert again == retried


# ---- Count-Min / HyperLogLog (round-10 sketch family) ----------------

from rearview_spark.operators.sketch import (  # noqa: E402
    HLL_M,
    cm_estimate,
    cm_sketch,
    hll_estimate_expr,
    hll_estimate_py,
    hll_registers,
)


def test_cm_overestimates_and_partitioning_invariant(spark):
    rows = [(i % 37,) for i in range(2000)] + [(999,)] * 150
    df = spark.createDataFrame(rows, "k bigint")
    truth = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    keys = df.select("k").distinct()
    base = None
    for parts in (1, 8):
        counters = cm_sketch(df.repartition(parts), "k", d=4, w=64)
        est = {
            r["k"]: r["cm_est"]
            for r in cm_estimate(keys, counters, "k", d=4, w=64).collect()
        }
        assert set(est) == set(truth)
        for k, t in truth.items():
            assert est[k] >= t
        if base is None:
            base = est
        else:
            assert est == base  # counters are sums: partitioning-proof


def test_cm_sketches_merge_by_addition(spark):
    a = spark.createDataFrame([(i % 11,) for i in range(300)], "k bigint")
    b = spark.createDataFrame([(i % 7,) for i in range(200)], "k bigint")
    both = a.unionAll(b)
    merged = (
        cm_sketch(a, "k", d=2, w=32)
        .unionAll(cm_sketch(b, "k", d=2, w=32))
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))
    )
    direct = cm_sketch(both, "k", d=2, w=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cm_absent_key_estimates_zero_or_collision(spark):
    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    counters = cm_sketch(df, "k", d=4, w=512)
    keys = spark.createDataFrame([(777777,)], "k bigint")
    [row] = cm_estimate(keys, counters, "k", d=4, w=512).collect()
    # with 2 occupied buckets of 512 the absent key a.s. misses them all
    assert row["cm_est"] in (0, 1, 2)


def test_hll_registers_merge_by_max_and_estimate_matches_py(spark):
    df = spark.createDataFrame([(i,) for i in range(3000)], "k bigint")
    regs = {r["bucket"]: r["register"] for r in hll_registers(df, "k").collect()}
    assert set(regs) == set(range(HLL_M))
    # partition split merges by max to the same registers
    half1 = hll_registers(df.filter(F.col("k") < 1500), "k")
    half2 = hll_registers(df.filter(F.col("k") >= 1500), "k")
    merged = {
        r["bucket"]: r["register"]
        for r in half1.unionAll(half2)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .collect()
    }
    assert merged == regs
    [est] = (
        hll_registers(df, "k").agg(hll_estimate_expr().alias("e")).collect()
    )
    py = hll_estimate_py(regs)
    assert abs(est["e"] - py) / py < 1e-12  # raw branch: same formula
    assert abs(est["e"] - 3000) / 3000 < 0.4  # ~1.04/sqrt(64) expected


def test_hll_small_range_uses_linear_counting():
    # 3 occupied buckets out of 64 -> raw <= 2.5m and zeros exist
    regs = {0: 1, 1: 2, 2: 1}
    import math

    est = hll_estimate_py(regs)
    zeros = HLL_M - 3
    assert est == HLL_M * math.log(HLL_M / zeros)


def test_streaming_cm_equals_batch_build_and_retry(spark, tmp_path):
    """CM counters are sums, so the streamed sketch must EQUAL the
    batch sketch over the union of batches — and a retried batch
    re-merges from its predecessor, reproducing identical state."""
    from rearview_spark.operators.sketch import (
        cm_foreach_batch,
        cm_sketch,
        latest_stream_summary,
    )

    d = str(tmp_path / "cm_state")
    process = cm_foreach_batch(spark, d, "k", d=3, w=64)
    b0 = spark.createDataFrame([(i % 13,) for i in range(400)], "k bigint")
    b1 = spark.createDataFrame([(i % 29,) for i in range(300)], "k bigint")
    process(b0, 0)
    process(b1, 1)
    streamed = sorted(map(tuple, latest_stream_summary(spark, d).collect()))
    batch = sorted(map(tuple, cm_sketch(b0.unionAll(b1), "k", d=3, w=64).collect()))
    assert streamed == batch
    process(b1, 1)  # retry
    assert sorted(map(tuple, latest_stream_summary(spark, d).collect())) == batch


def test_streaming_hll_equals_batch_build(spark, tmp_path):
    from rearview_spark.operators.sketch import (
        hll_foreach_batch,
        hll_registers,
        latest_stream_summary,
    )

    d = str(tmp_path / "hll_state")
    process = hll_foreach_batch(spark, d, "k")
    b0 = spark.createDataFrame([(i,) for i in range(500)], "k bigint")
    b1 = spark.createDataFrame([(i,) for i in range(300, 900)], "k bigint")
    process(b0, 0)
    process(b1, 1)
    streamed = sorted(map(tuple, latest_stream_summary(spark, d).collect()))
    batch = sorted(map(tuple, hll_registers(b0.unionAll(b1), "k").collect()))
    assert streamed == batch


def test_hll_grouped_registers_merge_equals_union_build(spark):
    """Mergeability: per-group register tables max-merged across groups
    equal the registers built over the union — and the sparse estimator
    (absent bucket = register 0) equals the dense reference estimate."""
    from pyspark.sql import functions as F

    from rearview_spark.operators.sketch import (
        HLL_M,
        hll_estimate_py,
        hll_estimate_sparse_expr,
        hll_registers,
        hll_registers_by,
    )

    df = spark.range(500).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 13 % 311).alias("v")
    )
    grouped = hll_registers_by(df, "v", ["g"], m=HLL_M)
    merged = {
        r.bucket: r.register
        for r in grouped.groupBy("bucket").agg(F.max("register").alias("register")).collect()
    }
    union_regs = {
        r.bucket: r.register
        for r in hll_registers(df, "v", m=HLL_M).collect()
        if r.register > 0
    }
    assert merged == union_regs

    sparse_est = (
        grouped.groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .agg(hll_estimate_sparse_expr(HLL_M).alias("e"))
        .collect()[0]["e"]
    )
    # raw-branch reference (no linear-counting correction kicks in at
    # 311 distinct >> 2.5 * 64)
    assert abs(sparse_est - hll_estimate_py(union_regs, HLL_M)) < 1e-9


def test_hll_overlap_inclusion_exclusion_consistency(spark):
    """The pairwise-overlap estimate from merged sketches must equal
    est(A) + est(B) - est(union) computed from scratch, and track the
    true intersection on disjoint-ish audiences."""
    from pyspark.sql import functions as F

    from rearview_spark.operators.sketch import (
        HLL_M,
        hll_estimate_sparse_expr,
        hll_registers_by,
    )

    # A = users 0..99, B = users 50..149 -> true overlap 50
    rows = [("A", u) for u in range(100)] + [("B", u) for u in range(50, 150)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    regs = hll_registers_by(df, "user_id", ["event_type"], m=HLL_M)
    est = {
        r["event_type"]: r["e"]
        for r in regs.groupBy("event_type")
        .agg(hll_estimate_sparse_expr(HLL_M).alias("e"))
        .collect()
    }
    est_union = (
        regs.groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .agg(hll_estimate_sparse_expr(HLL_M).alias("e"))
        .collect()[0]["e"]
    )
    overlap = est["A"] + est["B"] - est_union
    # HLL at m=64 has ~13% typical error; overlap of 50 out of 150
    assert 10 < overlap < 100
    # sketch of the union == union of sketches (merge property): build
    # the union sketch from raw rows and compare registers exactly
    raw_union = (
        hll_registers_by(
            df.select(F.lit("U").alias("event_type"), "user_id"),
            "user_id",
            ["event_type"],
            m=HLL_M,
        )
        .select("bucket", "register")
        .collect()
    )
    merged = (
        regs.groupBy("bucket").agg(F.max("register").alias("register")).collect()
    )
    assert {(r["bucket"], r["register"]) for r in raw_union} == {
        (r["bucket"], r["register"]) for r in merged
    }


def test_psi_foreach_batch_merges_by_addition_and_retries_safely(spark, tmp_path):
    """Streamed occupancy == one-pass occupancy, and a RETRIED batch
    (rewrite of the same batch id) leaves the state unchanged — the
    CM/HLL batch-dir contract carried over to PSI."""
    from rearview_spark.operators.anomaly import (
        psi_foreach_batch,
        psi_occupancy,
    )
    from rearview_spark.operators.sketch import _latest_batch_dir

    edge_vals = [2.0, 5.0]
    rows = [(float(i % 8),) for i in range(60)]
    df = spark.createDataFrame(rows, "v double")
    state = str(tmp_path / "psi_state")
    proc = psi_foreach_batch(spark, state, edge_vals)
    slices = [df.filter(F.col("v") % 3 == i) for i in range(3)]
    for i, sl in enumerate(slices):
        proc(sl, i)
    proc(slices[2], 2)  # retry of the last batch
    merged = {
        r["bin"]: r["c_cur"]
        for r in spark.read.parquet(_latest_batch_dir(spark, state)).collect()
    }
    want = {
        r["bin"]: r["c_cur"]
        for r in psi_occupancy(df, edge_vals, "c_cur").collect()
    }
    assert merged == want
