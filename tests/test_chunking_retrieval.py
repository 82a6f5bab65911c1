"""Unit tests for operators/chunking.py and operators/retrieval.py —
window-boundary edges, hot-segment removal semantics, and BM25 ranking
properties the oracle gate can't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from rearview_spark.operators.chunking import chunk_token_windows, segment_dedup
from rearview_spark.operators.retrieval import bm25_scores, bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_short_doc_single_window(spark):
    docs = _docs(spark, [(1, "a b c")])
    out = chunk_token_windows(docs, size=8, stride=4).collect()
    assert len(out) == 1
    assert out[0].chunk_idx == 0 and out[0].n_chunk_tokens == 3


def test_chunk_overlap_grid(spark):
    # 11 tokens, size 4, stride 3 -> ceil((11-4)/3)+1 = 4 windows at
    # starts 0,3,6,9; the last clamps to 2 tokens. (With 10 tokens the
    # grid stops at start 6 — window [6,10) already reaches the end.)
    text = " ".join(f"t{i}" for i in range(11))
    out = (
        chunk_token_windows(_docs(spark, [(1, text)]), size=4, stride=3)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in out] == [4, 4, 4, 2]


def test_chunk_exact_fit_no_empty_tail(spark):
    # 8 tokens, size 4, stride 4 -> exactly 2 windows, no empty third
    text = " ".join(f"t{i}" for i in range(8))
    out = chunk_token_windows(_docs(spark, [(1, text)]), size=4, stride=4).collect()
    assert sorted(r.n_chunk_tokens for r in out) == [4, 4]


def test_segment_dedup_drops_hot_segment(spark):
    seg = " ".join(f"x{i}" for i in range(4))
    rows = [(i, seg + f" unique{i}") for i in range(3)]  # seg occurs 3x > max 2
    out = {
        r.doc_id: r
        for r in segment_dedup(
            _docs(spark, rows), seg_len=4, max_count=2
        ).collect()
    }
    # each doc had 2 segments (4 shared + 1 unique token); shared one dropped
    assert all(out[i].n_segments == 2 and out[i].n_kept == 1 for i in range(3))


def test_segment_dedup_fully_hot_doc_disappears(spark):
    seg = "a b c d"
    rows = [(1, seg), (2, seg), (3, seg), (4, seg + " tail")]
    out = segment_dedup(_docs(spark, rows), seg_len=4, max_count=2)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {4}  # docs 1-3 were a single hot segment each


def test_segment_dedup_shuffle_join_matches_broadcast(spark):
    rows = [(i, f"w{i % 3} common common2 u{i}") for i in range(6)]
    a = segment_dedup(_docs(spark, rows), seg_len=2, max_count=1, broadcast_hot=True)
    b = segment_dedup(_docs(spark, rows), seg_len=2, max_count=1, broadcast_hot=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bm25_rarer_term_scores_higher(spark):
    rows = [(1, "rare word pad pad"), (2, "common word pad pad")] + [
        (10 + i, f"common filler{i} pad pad") for i in range(8)
    ]
    scores = {
        r.doc_id: r.score
        for r in bm25_scores(_docs(spark, rows), ["rare", "common"]).collect()
    }
    # 'rare' appears in 1 doc, 'common' in 9 -> idf(rare) >> idf(common);
    # doc 1 and doc 2 have identical tf/dl otherwise.
    assert scores[1] > scores[2]


def test_bm25_topk_bound_and_order(spark):
    rows = [(i, "hit " * (i + 1) + "pad") for i in range(10)]
    out = bm25_topk(_docs(spark, rows), ["hit"], k=3).collect()
    assert len(out) == 3
    assert out[0].score >= out[1].score >= out[2].score


def test_bm25_requires_terms(spark):
    import pytest

    with pytest.raises(ValueError):
        bm25_scores(_docs(spark, [(1, "a")]), [])


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_both_lists_beats_one(spark):
    from rearview_spark.operators.retrieval import rrf_fuse

    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(1, 2), (3, 1)])
    out = rrf_fuse([a, b], k=10).collect()
    scores = {r.doc_id: r.rrf_score for r in out}
    # doc 1 appears in both lists; docs 2/3 in one each
    assert scores[1] > scores[2] and scores[1] > scores[3]
    assert abs(scores[1] - (1 / 61 + 1 / 62)) < 1e-12
    assert abs(scores[3] - 1 / 61) < 1e-12


def test_rrf_k_bound_and_order(spark):
    from rearview_spark.operators.retrieval import rrf_fuse

    a = _ranked(spark, [(i, i) for i in range(1, 8)])
    out = rrf_fuse([a], k=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]


def _mmr_cands(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, cosine_sim double, embedding array<double>"
    )


def test_mmr_prefers_diverse_over_near_twin(spark):
    from rearview_spark.operators.retrieval import mmr_rerank

    # 1 and 2 are near-identical vectors; 3 is orthogonal-ish with lower
    # relevance. Plain top-3 orders (1, 2, 3); MMR must demote the twin.
    rows = [
        (0, 1, 0.99, [1.0, 0.0, 0.0]),
        (0, 2, 0.98, [0.999, 0.01, 0.0]),
        (0, 3, 0.80, [0.0, 1.0, 0.0]),
    ]
    out = mmr_rerank(_mmr_cands(spark, rows), k=3, lam=0.7).orderBy("mmr_rank").collect()
    assert [r.vec_id for r in out] == [1, 3, 2]
    assert out[0].mmr_score == 0.7 * 0.99
    # the twin's penalized score carries the ~1.0 similarity to pick #1
    assert out[2].mmr_score < out[1].mmr_score


def test_mmr_k_bound_rank_order_and_determinism(spark):
    from rearview_spark.operators.retrieval import mmr_rerank

    rows = [
        (7, i, 1.0 - i / 100.0, [float(i), 1.0, float(i % 3)]) for i in range(1, 9)
    ]
    df = _mmr_cands(spark, rows)
    a = mmr_rerank(df, k=4, lam=0.5).orderBy("mmr_rank").collect()
    b = mmr_rerank(df, k=4, lam=0.5).orderBy("mmr_rank").collect()
    assert [r.vec_id for r in a] == [r.vec_id for r in b]
    assert [r.mmr_rank for r in a] == [1, 2, 3, 4]
    assert all(r.query_id == 7 for r in a)
    # rank 1 is the max-relevance candidate
    assert a[0].vec_id == 1


def test_mmr_drops_null_relevance_and_k_zero(spark):
    from pyspark.sql import functions as F

    from rearview_spark.operators.retrieval import mmr_rerank

    rows = [
        (0, 1, 0.9, [1.0, 0.0]),
        (0, 2, None, [0.0, 0.0]),  # zero-norm vector -> NULL cosine
        (0, 3, 0.5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, cosine_sim double, embedding array<double>"
    )
    out = mmr_rerank(df, k=5, lam=0.7).orderBy("mmr_rank").collect()
    assert [r.vec_id for r in out] == [1, 3]  # NULL-rel candidate dropped
    assert mmr_rerank(df, k=0).count() == 0


def test_mmr_schema_follows_input_types(spark):
    from rearview_spark.operators.retrieval import mmr_rerank

    rows = [("q1", "a", 0.9, [1.0, 0.0]), ("q1", "b", 0.5, [0.0, 1.0])]
    df = spark.createDataFrame(
        rows, "query_id string, vec_id string, cosine_sim double, embedding array<double>"
    )
    out = mmr_rerank(df, k=2).orderBy("mmr_rank").collect()
    assert [r.vec_id for r in out] == ["a", "b"]
    assert out[0].query_id == "q1"


def test_maxsim_late_interaction_hand_case(spark):
    """Each query part independently finds its best part ANYWHERE in
    the doc (that's the late-interaction point); per-part winners sum."""
    from rearview_spark.operators.retrieval import maxsim_topk, split_subvectors

    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),   # query: parts [1,0] and [0,1]
        (1, [1.0, 0.0, 0.0, 1.0]),   # doc A: perfect on both parts -> 2.0
        (2, [0.6, 0.8, 1.0, 0.0]),   # doc B: best for qpart0 is B part1
                                     # (cos 1.0), qpart1 best is 0.8 -> 1.8
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    corpus = split_subvectors(df, m=2, dim=4)
    queries = split_subvectors(df.filter("vec_id = 0"), m=2, dim=4)
    got = maxsim_topk(corpus, queries, topk=10).orderBy("rank").collect()
    assert [(r["vec_id"], r["score"], r["rank"]) for r in got] == [
        (1, 2.0, 1),
        (2, 1.8, 2),
    ]


# ---- Pseudo-relevance feedback expansion (round 10) ------------------

from rearview_spark.operators.retrieval import (  # noqa: E402
    PRF_SCALE,
    prf_expanded_search,
    prf_expansion_terms,
)

_PRF_CORPUS = [
    (1, "spark shuffle partition tuning spark shuffle"),
    (2, "spark broadcast shuffle skew handling"),
    (3, "gardening tomato seeds watering"),
    (4, "spark catalyst optimizer shuffle plans"),
    (5, "tomato gardening compost"),
]


def test_prf_terms_exclude_seeds_and_short_tokens(spark):
    docs = _docs(spark, _PRF_CORPUS)
    rows = prf_expansion_terms(
        docs, ["spark"], n_feedback=3, n_expand=5, min_len=3
    ).collect()
    terms = [r["term"] for r in rows]
    assert "spark" not in terms
    assert all(len(t) >= 3 for t in terms)
    # feedback docs are the spark docs; gardening vocabulary never leaks
    assert not set(terms) & {"tomato", "gardening", "compost", "watering"}
    # shuffle appears in all three feedback docs -> top-weighted
    assert terms[0] == "shuffle"
    ranks = [r["prf_rank"] for r in rows]
    assert ranks == sorted(ranks) and ranks[0] == 1


def test_prf_term_weights_are_rank_weighted_tf_sums(spark):
    docs = _docs(spark, _PRF_CORPUS)
    rows = prf_expansion_terms(
        docs, ["spark"], n_feedback=3, n_expand=10, min_len=3
    ).collect()
    got = {r["term"]: r["weight"] for r in rows}
    # feedback ranking: doc 1 (tf=2) then docs 2,4 (tie -> id order);
    # weights 3,2,1. "shuffle": 2*3 + 1*2 + 1*1 = 9.
    assert got["shuffle"] == 9
    assert got["broadcast"] == 2 and got["catalyst"] == 1


def test_prf_expanded_search_deterministic_and_expansion_helps(spark):
    docs = _docs(spark, _PRF_CORPUS)
    out = {
        parts: [
            (r["doc_id"], r["score_fp"])
            for r in prf_expanded_search(
                docs.repartition(parts), ["spark"], n_feedback=3, n_expand=4, k=5
            ).collect()
        ]
        for parts in (1, 4)
    }
    assert out[1] == out[4]  # integer micro-unit sums: partition-proof
    ranked_ids = [d for d, _ in out[1]]
    # docs 3 and 5 match neither seed nor expansion terms -> absent
    assert 3 not in ranked_ids and 5 not in ranked_ids
    [row] = [
        r
        for r in prf_expanded_search(
            docs, ["spark"], n_feedback=3, n_expand=4, k=5
        ).collect()
        if r["doc_id"] == ranked_ids[0]
    ]
    assert row["score"] == row["score_fp"] / PRF_SCALE
