"""Corpus-curation operators: decontamination, stratified sampling,
repetition metrics, sequence packing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rearview_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_benchmark_contamination_planted_overlap(spark):
    train = _docs(spark, [
        (1, "alpha beta gamma delta", "en"),          # shares 'alpha beta gamma'
        (2, "zeta eta theta iota", "en"),              # clean
        (3, "x alpha beta gamma y beta gamma delta", "en"),  # shares two grams
    ])
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon", "en")])
    out = {
        r["doc_id"]: (r["n_shared_grams"], r["n_bench_docs"])
        for r in C.benchmark_contamination(train, bench, n=3).collect()
    }
    assert out == {1: (2, 1), 3: (2, 1)}  # doc 2 clean; doc 1 shares both grams


def test_benchmark_contamination_short_doc_full_text_fallback(spark):
    train = _docs(spark, [(1, "tiny doc", "en")])
    bench = _docs(spark, [(9, "tiny doc", "en")])
    rows = C.benchmark_contamination(train, bench, n=8).collect()
    assert [(r["doc_id"], r["n_shared_grams"]) for r in rows] == [(1, 1)]


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    df = _docs(spark, [(i, "w", "en" if i % 2 else "de") for i in range(2000)])
    kept1 = sorted(r["doc_id"] for r in C.stratified_sample(df, {"en": 0.5, "de": 0.1}).collect())
    kept2 = sorted(r["doc_id"] for r in C.stratified_sample(df, {"en": 0.5, "de": 0.1}).collect())
    assert kept1 == kept2  # rerun-stable
    en = sum(1 for i in kept1 if i % 2)
    de = len(kept1) - en
    assert 400 <= en <= 600 and 50 <= de <= 150  # ~50% of 1000 / ~10% of 1000

    # exact replica of the decision rule for one row
    def keep(doc_id, rate):
        h = int(hashlib.md5(f"{doc_id}:strat".encode()).hexdigest()[:15], 16)
        return h % 10000 < rate * 10000
    expect_en = sorted(i for i in range(2000) if i % 2 and keep(i, 0.5))
    assert [i for i in kept1 if i % 2] == expect_en


def test_stratified_sample_default_rate_for_unlisted_stratum(spark):
    df = _docs(spark, [(i, "w", "xx") for i in range(1000)])
    kept = C.stratified_sample(df, {"en": 0.9}, default_rate=0.2).count()
    assert 120 <= kept <= 280


def test_repetition_metrics_hand_computed(spark):
    # tokens: a a a b  -> top_tok 3/4; bigrams: 'a a' x2, 'a b' -> 2/3
    df = _docs(spark, [(1, "a a a b", "en")])
    r = C.repetition_metrics(df).collect()[0]
    assert r["n_tokens"] == 4
    assert r["top_token_ratio"] == 0.75
    assert r["top_bigram_ratio"] == round(2 / 3 + 5e-10, 6)
    assert r["distinct_token_ratio"] == 0.5


def test_gopher_filter_flags_repetitive_doc(spark):
    repetitive = " ".join(["spam spam"] * 20)
    natural = " ".join(f"w{i}" for i in range(40))
    df = _docs(spark, [(1, repetitive, "en"), (2, natural, "en")])
    out = {r["doc_id"]: r["gopher_pass"] for r in C.gopher_quality_filter(df).collect()}
    assert out == {1: False, 2: True}


def test_pack_sequences_greedy_hand_case(spark):
    # one shard (n_shards=1); budgets force breaks: 100+100 fits 256,
    # +100 would exceed -> new pack; a 300-token doc overflows alone.
    rows = [
        (0, " ".join(["w"] * 100), "en"),
        (1, " ".join(["w"] * 100), "en"),
        (2, " ".join(["w"] * 100), "en"),
        (3, " ".join(["w"] * 300), "en"),
        (4, " ".join(["w"] * 10), "en"),
    ]
    out = {
        r["doc_id"]: (r["pack_seq"], r["pack_pos"], r["pack_fill"])
        for r in C.pack_sequences(_docs(spark, rows), budget=256, n_shards=1).collect()
    }
    assert out == {
        0: (0, 1, 100),
        1: (0, 2, 200),
        2: (1, 1, 100),   # 300 would not fit after doc 2? no: doc3 breaks
        3: (2, 1, 300),   # oversized doc gets its own pack
        4: (3, 1, 10),    # 300-fill pack is over budget, next doc starts fresh
    }


def test_pack_sequences_invariants_and_shards(spark):
    rows = [(i, " ".join(["w"] * (7 + i % 90)), "en") for i in range(400)]
    out = C.pack_sequences(_docs(spark, rows), budget=128, n_shards=4)
    bad = out.filter((F.col("pack_fill") > 128) & (F.col("pack_pos") > 1)).count()
    assert bad == 0  # only a pack's FIRST doc may overflow the budget
    assert out.count() == 400
    assert out.select("shard").distinct().count() == 4
    # within a shard, pack_seq is nondecreasing in doc order
    w_bad = (
        out.withColumn(
            "prev",
            F.lag("pack_seq").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("shard").orderBy("doc_id")
            ),
        )
        .filter(F.col("prev").isNotNull() & (F.col("pack_seq") < F.col("prev")))
        .count()
    )
    assert w_bad == 0


def test_pii_scrub_typed_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now", "en"),
            (2, "call 555-867-5309 or 555.867.5309", "en"),
            (3, "from 192.168.1.200 to 10.0.0.1", "en"),
            (4, "a@b.io at 8.8.8.8 tel 111-222-3333", "en"),
            (5, "nothing to see here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in C.pii_scrub(df).collect()}
    assert out[1]["scrubbed"] == "mail <EMAIL> now"
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 0 and out[1]["n_ipv4"] == 0
    assert out[2]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert out[2]["n_phone"] == 2
    assert out[3]["scrubbed"] == "from <IPV4> to <IPV4>"
    assert out[3]["n_ipv4"] == 2
    # mixed row: each type redacted by its own rule, counts independent
    assert out[4]["scrubbed"] == "<EMAIL> at <IPV4> tel <PHONE>"
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (1, 1, 1)
    # clean text passes through byte-identical
    assert out[5]["scrubbed"] == "nothing to see here"
    # original column is preserved (scrub is additive, audit-friendly)
    assert out[4]["text"].startswith("a@b.io")


def test_upsample_mix_deterministic_fractional_epochs(spark):
    rows = [(i, "t", "en", f"src{i % 2}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    mixed = C.upsample_mix(df, {"src0": 2.5, "src1": 0.0}, default_weight=1.0)
    got = [(r["doc_id"], r["copy"]) for r in mixed.collect()]
    # src1 dropped entirely
    assert all(d % 2 == 0 for d, _ in got)
    # every src0 doc appears 2 or 3 times, copies numbered 1..n
    from collections import Counter

    per_doc = Counter(d for d, _ in got)
    assert set(per_doc) == {i for i in range(200) if i % 2 == 0}
    assert all(n in (2, 3) for n in per_doc.values())
    assert sorted(c for d, c in got if d == 0) == list(range(1, per_doc[0] + 1))
    # the fractional third copy lands on the md5-chosen HALF (within noise)
    n3 = sum(1 for n in per_doc.values() if n == 3)
    assert 30 <= n3 <= 70  # 100 candidate docs, p=0.5
    # deterministic: rerun reproduces the identical mix
    again = [(r["doc_id"], r["copy"]) for r in
             C.upsample_mix(df, {"src0": 2.5, "src1": 0.0}).collect()]
    assert sorted(got) == sorted(again)
    # w < 1 downsamples exactly like stratified_sample's threshold
    half = C.upsample_mix(df, {"src0": 0.5, "src1": 0.5})
    kept = C.stratified_sample(
        df, {"src0": 0.5, "src1": 0.5}, stratum_col="source", salt="mix"
    )
    assert sorted(r["doc_id"] for r in half.collect()) == sorted(
        r["doc_id"] for r in kept.collect()
    )
    import pytest

    with pytest.raises(ValueError, match="negative weight"):
        C.upsample_mix(df, {"src0": -1.0})


def test_token_budget_mix_binding_and_free_strata(spark):
    from rearview_spark.operators.curation import token_budget_mix

    rows = [(i, "tok " * 10, "big") for i in range(200)] + [
        (1000 + i, "tok " * 10, "small") for i in range(5)
    ]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, lang string"
    )
    # big: 2000 tokens total, budget 500 -> threshold 2500bp (~25%);
    # small: no budget -> keep all 5.
    out = token_budget_mix(df, {"big": 500}, stratum_col="lang")
    rowsb = out.filter("lang = 'big'").collect()
    rowss = out.filter("lang = 'small'").collect()
    assert len(rowss) == 5 and all(r["keep_threshold_bp"] == 10000 for r in rowss)
    assert 0 < len(rowsb) < 200
    assert all(r["keep_threshold_bp"] == 2500 for r in rowsb)
    # deterministic: identical rerun keeps identical ids
    again = token_budget_mix(df, {"big": 500}, stratum_col="lang")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_token_budget_mix_cap_and_validation(spark):
    import pytest

    from rearview_spark.operators.curation import token_budget_mix

    df = spark.createDataFrame(
        [(1, "a b c", "x")], "doc_id long, text string, lang string"
    )
    # budget above the stratum total caps at keep-all
    out = token_budget_mix(df, {"x": 10_000_000}).collect()
    assert len(out) == 1 and out[0]["keep_threshold_bp"] == 10000
    with pytest.raises(ValueError):
        token_budget_mix(df, {"x": -1})


def test_token_budget_mix_keeps_null_stratum(spark):
    from rearview_spark.operators.curation import token_budget_mix

    df = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "d e f", None)],
        "doc_id long, text string, lang string",
    )
    out = token_budget_mix(df, {"x": 10_000_000}).collect()
    # NULL-stratum row is an unbudgeted group: kept, threshold 10000
    by = {r["doc_id"]: r for r in out}
    assert set(by) == {1, 2}
    assert by[2]["keep_threshold_bp"] == 10000


def test_token_budget_mix_null_text_counts_zero_tokens(spark):
    # size(split(NULL)) is -1 in Spark; without the greatest-guard a
    # null-text doc would SUBTRACT from its stratum's token total.
    from rearview_spark.operators.curation import token_budget_mix

    df = spark.createDataFrame(
        [(1, "a b c", "x"), (2, None, "x")],
        "doc_id long, text string, lang string",
    )
    out = token_budget_mix(df, {"x": 10_000_000}).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[2]["n_tokens"] == 0
    # stratum total is 3 (not 3 - 1), so keep-all cap still applies
    assert all(r["keep_threshold_bp"] == 10000 for r in out)


def test_leakage_safe_split_keeps_twins_together(spark):
    """Near-dup cluster members must land in the SAME split (the whole
    point); singletons fall back to component = own id; the val
    fraction tracks val_bp over components; determinism across reruns."""
    import pytest as _pytest

    from rearview_spark.operators.curation import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    # two clusters: {1,2,3} and {50,51}; everything else singleton
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (50, 50), (51, 50)], "id long, component long"
    )
    out = leakage_safe_split(docs, comps, val_bp=3000).collect()
    by = {r["doc_id"]: r for r in out}
    assert {by[i]["split"] for i in (1, 2, 3)} == {by[1]["split"]}
    assert by[50]["split"] == by[51]["split"]
    assert by[7]["component"] == 7  # singleton fallback
    n_val = sum(1 for r in out if r["split"] == "val")
    assert 10 <= n_val <= 55  # ~30% of ~97 components, binomial slack

    again = {(r["doc_id"], r["split"]) for r in leakage_safe_split(docs, comps, val_bp=3000).collect()}
    assert again == {(r["doc_id"], r["split"]) for r in out}

    with _pytest.raises(ValueError):
        leakage_safe_split(docs, comps, val_bp=10001)


def test_bigram_lm_perplexity_hand_corpus(spark):
    """Hand-derivable LM: counts, smoothing denominator, vocab size,
    unseen-bigram and unseen-left fallbacks, and the no-bigram NULL."""
    import math

    from rearview_spark.operators.text import bigram_lm_counts, doc_perplexity

    corpus = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "z z")], "doc_id long, text string"
    )
    cb, cl, v = bigram_lm_counts(corpus)
    assert {r["g"]: r["c_bi"] for r in cb.collect()} == {"a b": 3, "b a": 1, "z z": 1}
    assert {r["w1"]: r["c_left"] for r in cl.collect()} == {"a": 3, "b": 1, "z": 1}
    assert v.first()["v"] == 3

    # score a held-out batch against the trained counts (k=0.5, V=3)
    held = spark.createDataFrame(
        [(10, "a q"), (11, "q"), (12, "q q"), (13, "a b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in doc_perplexity(held, cb, cl, v).collect()}
    #   P(q|a) = (0+.5)/(3+1.5) = 1/9  -> ppl 9.0     (unseen bigram)
    #   P(q|q) = (0+.5)/(0+1.5) = 1/3  -> ppl 3.0     (unseen left too)
    #   P(b|a) = (3+.5)/(3+1.5) = 7/9  -> ppl 9/7
    assert out[10]["ppl"] == 9.0 and out[10]["n_bigrams"] == 1
    assert out[11]["ppl"] is None and out[11]["n_bigrams"] == 0
    assert out[12]["ppl"] == 3.0
    assert out[13]["ppl"] == round(9 / 7 + 5e-8, 4)

    # multi-bigram doc: geometric mean of inverse probabilities
    scored = doc_perplexity(corpus, cb, cl, v)
    got = {r["doc_id"]: r["ppl"] for r in scored.collect()}
    expect1 = math.exp(
        -(math.log(3.5 / 4.5) + math.log(1.5 / 2.5) + math.log(3.5 / 4.5)) / 3
    )
    assert got[1] == round(expect1 + 5e-8, 4)
    assert got[2] == round(4.5 / 3.5 + 5e-8, 4)
    assert got[3] == round(1 / 0.6 + 5e-8, 4)


def test_weighted_sample_deterministic_proportional_and_guards(spark):
    from rearview_spark.operators import curation as C

    rows = [(i, 1.0) for i in range(50)] + [(99, 50.0), (100, 0.0), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    # deterministic: same salt -> identical sample; different salt differs
    a = sorted(r["doc_id"] for r in C.weighted_sample(df, "w", 5, "s1").collect())
    b = sorted(r["doc_id"] for r in C.weighted_sample(df, "w", 5, "s1").collect())
    assert a == b and len(a) == 5
    c = sorted(r["doc_id"] for r in C.weighted_sample(df, "w", 5, "s2").collect())
    assert a != c
    # zero/null weights can never be sampled
    assert 100 not in a + c and 101 not in a + c
    # A-ES proportionality: the item holding half the total weight wins
    # top-1 in roughly half the races (30 salts; binomial 3-sigma floor)
    wins = sum(
        1
        for i in range(30)
        if C.weighted_sample(df, "w", 1, f"p{i}").collect()[0]["doc_id"] == 99
    )
    assert 7 <= wins <= 23
