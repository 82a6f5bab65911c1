"""Substring-level exact dedup (operators/dedup.py: duplicated_spans /
excise_duplicated_spans): the Lee et al. (arXiv:2107.06499) duplicated-
substring removal, reformulated as positional w-gram fingerprints +
island merging so it distributes (docstring)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rearview_spark.operators.dedup import (
    duplicated_spans,
    excise_duplicated_spans,
    positional_ngrams,
)

BOILER = "this license text is repeated verbatim across many documents here"  # 10 tokens
UNIQ_A = "alpha beta gamma delta epsilon zeta eta theta"
UNIQ_B = "one two three four five six seven eight nine ten"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positional_ngrams_positions_and_short_docs(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b")])
    rows = positional_ngrams(df, window=3).collect()
    assert {r["doc_id"] for r in rows} == {1}  # doc 2 shorter than window
    assert sorted(r["pos"] for r in rows) == [0, 1, 2]
    # equal windows hash equal across docs
    df2 = _docs(spark, [(1, "x a b c"), (2, "a b c y")])
    h = {(r["doc_id"], r["pos"]): r["h"] for r in positional_ngrams(df2, window=3).collect()}
    assert h[(1, 1)] == h[(2, 0)]  # "a b c" at different offsets


def test_duplicated_spans_finds_planted_boilerplate(spark):
    df = _docs(
        spark,
        [
            (1, f"{UNIQ_A} {BOILER}"),            # boiler at tokens 8..18
            (2, f"{BOILER} {UNIQ_B}"),            # boiler at tokens 0..10
            (3, "fully unique words nothing shared with any other document"),
        ],
    )
    spans = duplicated_spans(df, window=5, min_tokens=10)
    by = {r["doc_id"]: r for r in spans.collect()}
    assert set(by) == {1, 2}
    assert (by[1]["span_start"], by[1]["span_end"]) == (8, 18)
    assert (by[2]["span_start"], by[2]["span_end"]) == (0, 10)
    # identical span text -> identical fingerprint despite offsets
    assert by[1]["span_md5"] == by[2]["span_md5"]
    assert by[1]["span_tokens"] == 10


def test_islands_merge_overlap_and_respect_gaps(spark):
    # doc 1 and 2 share TWO separated runs; the gap token differs so the
    # runs must come out as two spans, not one merged blob
    run1 = "r1a r1b r1c r1d r1e r1f"
    run2 = "r2a r2b r2c r2d r2e r2f"
    df = _docs(
        spark,
        [
            (1, f"{run1} gapONE {run2}"),
            (2, f"{run1} gapTWO {run2}"),
        ],
    )
    spans = duplicated_spans(df, window=3, min_tokens=3)
    got = sorted(
        (r["span_start"], r["span_end"]) for r in spans.filter("doc_id = 1").collect()
    )
    assert got == [(0, 6), (7, 13)]


def test_min_tokens_filters_short_runs(spark):
    df = _docs(spark, [(1, f"{BOILER} {UNIQ_A}"), (2, f"{BOILER} {UNIQ_B}")])
    assert duplicated_spans(df, window=5, min_tokens=11).count() == 0
    assert duplicated_spans(df, window=5, min_tokens=10).count() == 2


def test_excise_keep_first_preserves_one_occurrence(spark):
    df = _docs(
        spark,
        [
            (1, f"{UNIQ_A} {BOILER}"),
            (2, f"{BOILER} {UNIQ_B}"),
            (3, "fully unique words nothing shared with any other document"),
        ],
    )
    spans = duplicated_spans(df, window=5, min_tokens=10)
    out = {r["doc_id"]: r for r in excise_duplicated_spans(df, spans).collect()}
    # doc 1 holds the (smallest doc_id) first occurrence: untouched
    assert out[1]["text"] == f"{UNIQ_A} {BOILER}"
    assert out[1]["n_tokens_removed"] == 0
    assert out[2]["text"] == UNIQ_B
    assert out[2]["n_tokens_removed"] == 10
    assert out[3]["n_tokens_removed"] == 0

    # keep_first=False excises every occurrence
    all_gone = {
        r["doc_id"]: r
        for r in excise_duplicated_spans(df, spans, keep_first=False).collect()
    }
    assert all_gone[1]["text"] == UNIQ_A
    assert all_gone[1]["n_tokens_removed"] == 10


def test_corpus_scale_smoke_linear_in_sharers(spark):
    # 200 docs all share one boilerplate run: the pairwise operators
    # must cap here; the span operator is linear in duplicated positions
    df = _docs(
        spark,
        [(i, f"unique{i}a unique{i}b {BOILER} unique{i}c") for i in range(200)],
    )
    spans = duplicated_spans(df, window=5, min_tokens=10)
    assert spans.count() == 200
    assert spans.select("span_md5").distinct().count() == 1
    out = excise_duplicated_spans(df, spans)
    assert out.filter("n_tokens_removed = 0").count() == 1  # first occurrence only
    assert out.filter("n_tokens_removed = 10").count() == 199
