"""Gate queries for the chunking / segment-dedup / lexical-retrieval
operators (operators/chunking.py, operators/retrieval.py) over the
documents table, each with a value-level DuckDB oracle.

The oracles re-derive the exact same arithmetic (md5 fingerprints,
int-derived doubles, fixed-order float chains) rather than "the same
idea", so hash-level agreement is meaningful — see _exact.py and the
operator docstrings for the determinism contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rearview_spark.operators import chunking as CH
from rearview_spark.operators import retrieval as R
from rearview_spark.plans._exact import r6
from rearview_spark.plans.pipeline_queries import TOKS
from rearview_spark.sources.loader import Tables

QUERIES: dict[str, dict] = {}

CHUNK_SIZE, CHUNK_STRIDE = 64, 48
SEG_LEN, SEG_MAX_COUNT = 16, 2
BM25_TERMS = ["spark", "join", "window"]
BM25_K = 20


def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token windows (size 64, stride 48) over every document —
    the pretraining context-window grid. Zero-shuffle narrow plan; the
    gate pins the window boundaries (chunk count, last-window clamp)
    and the chunk fingerprints."""
    docs = Tables(spark, sf_dir).documents
    return CH.chunk_token_windows(
        docs, size=CHUNK_SIZE, stride=CHUNK_STRIDE
    ).orderBy("doc_id", "chunk_idx")


DOC_CHUNK_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
g AS (SELECT doc_id, t,
             greatest(CAST(ceil((len(t) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS INT) + 1, 1) AS nc
      FROM toks),
e AS (SELECT doc_id, unnest(generate_series(0, nc - 1)) AS ci, t FROM g)
SELECT doc_id,
       CAST(ci AS INT) AS chunk_idx,
       CAST(len(list_slice(t, ci * {CHUNK_STRIDE} + 1, ci * {CHUNK_STRIDE} + {CHUNK_SIZE})) AS INT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(t, ci * {CHUNK_STRIDE} + 1, ci * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' ')) AS chunk_md5
FROM e ORDER BY doc_id, chunk_idx
"""

QUERIES["doc_chunk_windows"] = {"fn": doc_chunk_windows, "oracle": DOC_CHUNK_SQL}


def doc_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style repeated-segment removal: 16-token segments occurring
    more than twice corpus-wide are dropped from every document; the
    gate pins per-document survivor counts and the md5 of the
    recomposed text. Hot-set discovery is a map-side-combined count +
    broadcast anti-join (operators/chunking.py docstring)."""
    docs = Tables(spark, sf_dir).documents
    return CH.segment_dedup(
        docs, seg_len=SEG_LEN, max_count=SEG_MAX_COUNT
    ).orderBy("doc_id")


DOC_SEGDEDUP_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
g AS (SELECT doc_id, t,
             greatest(CAST(ceil(len(t) / {SEG_LEN}.0) AS INT), 1) AS ns
      FROM toks),
segs AS (
  SELECT doc_id, ns AS n_segments,
         unnest(generate_series(0, ns - 1)) AS seg_idx, t
  FROM g),
seg2 AS (
  SELECT doc_id, n_segments, seg_idx,
         array_to_string(list_slice(t, seg_idx * {SEG_LEN} + 1, seg_idx * {SEG_LEN} + {SEG_LEN}), ' ') AS seg_text
  FROM segs),
counts AS (SELECT md5(seg_text) AS h, count(*) AS cnt FROM seg2 GROUP BY 1),
kept AS (SELECT * FROM seg2
         WHERE md5(seg_text) NOT IN (SELECT h FROM counts WHERE cnt > {SEG_MAX_COUNT}))
SELECT doc_id, n_segments, count(*) AS n_kept,
       md5(string_agg(seg_text, ' ' ORDER BY seg_idx)) AS kept_md5
FROM kept GROUP BY doc_id, n_segments ORDER BY doc_id
"""

QUERIES["doc_segment_dedup"] = {"fn": doc_segment_dedup, "oracle": DOC_SEGDEDUP_SQL}


def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed query bag (rational-idf deterministic
    variant — operators/retrieval.py docstring). Ranked on the
    full-precision double (both engines order the identical bits);
    rounding happens only in the output projection."""
    docs = Tables(spark, sf_dir).documents
    return R.bm25_topk(docs, BM25_TERMS, k=BM25_K).select(
        "doc_id", r6(F.col("score")).alias("score")
    )


DOC_BM25_SQL = R.bm25_oracle_sql(BM25_TERMS, TOKS, k=BM25_K)

QUERIES["doc_bm25_topk"] = {"fn": doc_bm25_topk, "oracle": DOC_BM25_SQL}


RRF_CAND_K = 50


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical candidates fused with exact-cosine
    vector candidates (query = embedding 0, the driver tables' doc_id ↔
    vec_id correspondence) by reciprocal-rank fusion. Each side takes
    its top-50 via orderBy+limit — Spark plans that as a distributed
    TakeOrderedAndProject, so the only global sort runs over 50 rows
    (the row_number that assigns ranks); the fusion join is
    candidate-scale. Ranks are ints, so the fused score is a fixed-order
    chain of exact IEEE divisions — bit-deterministic cross-engine."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    lex50 = (
        R.bm25_scores(t.documents, BM25_TERMS)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(RRF_CAND_K)
    )
    lex_ranked = lex50.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("score").desc(), "doc_id")),
    )
    from rearview_spark.operators import similarity as S

    emb = t.embeddings
    vec_ranked = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=RRF_CAND_K
    ).select(F.col("vec_id").alias("doc_id"), "rank")
    fused = R.rrf_fuse(
        [lex_ranked.select("doc_id", "rank"), vec_ranked], k=BM25_K
    )
    return fused.select("doc_id", r6(F.col("rrf_score")).alias("rrf_score"))


HYBRID_RRF_SQL = f"""
WITH {R.bm25_scored_cte(BM25_TERMS, TOKS)},
lex AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
    FROM scored)
  WHERE rank <= {RRF_CAND_K}
),
vq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vs AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv) + 0.0000000005, 6) AS cs
  FROM embeddings e, vq WHERE e.vec_id <> 0
),
vec AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, CAST(row_number() OVER (ORDER BY cs DESC, doc_id) AS INT) AS rank
    FROM vs)
  WHERE rank <= {RRF_CAND_K}
),
fused AS (
  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         coalesce(1.0 / (60.0 + CAST(lex.rank AS DOUBLE)), 0.0)
         + coalesce(1.0 / (60.0 + CAST(vec.rank AS DOUBLE)), 0.0) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT doc_id, round(rrf + 0.0000000005, 6) AS rrf_score
FROM (SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT {BM25_K})
"""

QUERIES["hybrid_rrf_topk"] = {"fn": hybrid_rrf_topk, "oracle": HYBRID_RRF_SQL}


MMR_CAND_K, MMR_K, MMR_LAM = 16, 6, 0.7


def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification of the exact-cosine top-16 for query vector 0:
    greedy k=6, lambda=0.7 (operators/retrieval.py: mmr_rerank). The
    oracle replays the greedy recurrence as a recursive CTE with a
    LATERAL argmax step, on identically-rounded relevance and pairwise
    cosines — so the gate pins the entire selection sequence, scores
    included, not just the output set."""
    from rearview_spark.operators import retrieval as R2
    from rearview_spark.operators import similarity as S

    emb = Tables(spark, sf_dir).embeddings
    cand = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=MMR_CAND_K
    ).join(emb.select("vec_id", "embedding"), "vec_id")
    out = R2.mmr_rerank(cand, k=MMR_K, lam=MMR_LAM)
    return out.select(
        "query_id", "vec_id", "mmr_rank", r6(F.col("mmr_score")).alias("mmr_score")
    ).orderBy("mmr_rank")


SIM_MMR_SQL = f"""
WITH RECURSIVE
vq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id AS id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv)
               + 0.0000000005, 6) AS rel
  FROM embeddings e, vq WHERE e.vec_id <> 0
),
cand AS (
  SELECT id, rel FROM (
    SELECT id, rel, row_number() OVER (ORDER BY rel DESC, id) AS rk FROM scored)
  WHERE rk <= {MMR_CAND_K}
),
cv AS (
  SELECT c.id, CAST(e.embedding AS DOUBLE[]) AS v
  FROM cand c JOIN embeddings e ON e.vec_id = c.id
),
pairs AS (
  SELECT a.id AS a, b.id AS b,
         round(list_cosine_similarity(a.v, b.v) + 0.0000000005, 6) AS sim
  FROM cv a JOIN cv b ON a.id <> b.id
),
sel AS (
  SELECT 1 AS step,
         (SELECT id FROM cand ORDER BY rel DESC, id LIMIT 1) AS id,
         {MMR_LAM!r} * (SELECT rel FROM cand ORDER BY rel DESC, id LIMIT 1) AS sc,
         [(SELECT id FROM cand ORDER BY rel DESC, id LIMIT 1)] AS picked
  UNION ALL
  SELECT s.step + 1, nxt.id, nxt.sc, list_append(s.picked, nxt.id)
  FROM sel s, LATERAL (
    SELECT c.id,
           {MMR_LAM!r} * c.rel - {1.0 - MMR_LAM!r} * (
             SELECT max(p.sim) FROM pairs p
             WHERE p.a = c.id AND list_contains(s.picked, p.b)) AS sc
    FROM cand c WHERE NOT list_contains(s.picked, c.id)
    ORDER BY sc DESC, c.id LIMIT 1
  ) nxt
  WHERE s.step < {MMR_K}
)
SELECT CAST(0 AS BIGINT) AS query_id, id AS vec_id, CAST(step AS INT) AS mmr_rank,
       round(sc + 0.0000000005, 6) AS mmr_score
FROM sel ORDER BY mmr_rank
"""

QUERIES["sim_mmr_rerank"] = {"fn": sim_mmr_rerank, "oracle": SIM_MMR_SQL}


def ret_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim top-10 (retrieval.maxsim_topk): each
    embedding splits into 4 contiguous 16-dim sub-vectors standing in
    for per-token vectors; queries are vec_id < 5. The oracle replays
    the sub-vector slicing, the per-part 6dp-rounded cosine, the
    per-(query, doc, part) max, the rounded sum, and the
    (score desc, id asc) ranking."""
    emb = Tables(spark, sf_dir).embeddings
    corpus = R.split_subvectors(emb, m=4, dim=64)
    queries = R.split_subvectors(emb.filter(F.col("vec_id") < 5), m=4, dim=64)
    return R.maxsim_topk(corpus, queries, topk=10).orderBy("query_id", "rank")


RET_MAXSIM_SQL = """
WITH parts AS (
  SELECT vec_id, p.part,
         list_transform(embedding[p.part * 16 + 1 : p.part * 16 + 16],
                        x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings, (SELECT unnest(range(4)) AS part) p
), q AS (
  SELECT vec_id AS query_id, part, vec FROM parts WHERE vec_id < 5
), pair AS (
  SELECT q.query_id, c.vec_id, q.part, c.part AS dpart,
         round(list_cosine_similarity(q.vec, c.vec) + 0.0000000005, 6) AS cs
  FROM q JOIN parts c ON c.vec_id <> q.query_id
), best AS (
  SELECT query_id, vec_id, part, max(cs) AS mx
  FROM pair GROUP BY query_id, vec_id, part
), scored AS (
  SELECT query_id, vec_id, round(sum(mx) + 0.0000000005, 6) AS score
  FROM best GROUP BY query_id, vec_id
)
SELECT query_id, vec_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id) AS INT) AS rank
FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank
"""

QUERIES["ret_maxsim_topk"] = {"fn": ret_maxsim_topk, "oracle": RET_MAXSIM_SQL}


EVAL_QUERY_TERMS = (("spark", "join"), ("window", "sort"), ("hash", "merge"))
EVAL_K = 10


def ret_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metrics (retrieval.retrieval_eval): three fixed
    two-term queries run through BM25 top-10; binary qrels are the docs
    containing ALL the query's terms (conjunctive containment — an
    independent relevance definition the ranker doesn't see). The
    oracle recomputes runs, qrels, and the quantized-term nDCG/MRR/
    recall arithmetic end to end."""
    from pyspark.sql import Window

    from rearview_spark.operators.text import tokens

    docs = Tables(spark, sf_dir).documents
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    # one corpus pass scores ALL queries (bm25_scores_multi — arithmetic
    # bit-identical to per-query bm25_scores, so the oracle's per-query
    # formulation still matches); per-query top-k via WindowGroupLimit
    scored = R.bm25_scores_multi(
        docs, [(qid, list(terms)) for qid, terms in enumerate(EVAL_QUERY_TERMS)]
    )
    run = (
        scored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("score").desc(), "doc_id"
                )
            ),
        )
        .filter(F.col("rank") <= EVAL_K)
        .select(F.col("query_id").cast("bigint").alias("query_id"), "doc_id", "rank")
    )
    # qrels likewise in one pass: per-query containment flags stacked
    # through a single explode instead of one corpus filter per query
    flags = []
    for qid, terms in enumerate(EVAL_QUERY_TERMS):
        cond = None
        for t in terms:
            c = F.array_contains("t", t)
            cond = c if cond is None else cond & c
        flags.append(
            F.struct(F.lit(qid).cast("bigint").alias("query_id"), cond.alias("_rel"))
        )
    qrels = (
        toks.select("doc_id", F.explode(F.array(*flags)).alias("q"))
        .filter(F.col("q._rel"))
        .select(F.col("q.query_id").alias("query_id"), "doc_id")
    )
    return R.retrieval_eval(run, qrels, k=EVAL_K).orderBy("query_id")


def _ret_eval_sql() -> str:
    term = "round(1.0 / log2(rank + 1) + 0.0000000005, 6)"
    run_blocks, rel_blocks = [], []
    for qid, terms in enumerate(EVAL_QUERY_TERMS):
        run_blocks.append(
            f"""SELECT CAST({qid} AS BIGINT) AS query_id, doc_id, rank FROM (
  WITH {R.bm25_scored_cte(list(terms), TOKS)}
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored QUALIFY rank <= {EVAL_K})"""
        )
        cond = " AND ".join(f"list_contains(t, '{t}')" for t in terms)
        rel_blocks.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, doc_id FROM toks WHERE {cond}"
        )
    runs = "\n  UNION ALL\n".join(run_blocks)
    rels = "\n  UNION ALL\n".join(rel_blocks)
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
runs AS (
{runs}
),
qrels AS (
{rels}
),
nrel AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY 1),
hits AS (
  SELECT r.query_id, r.rank
  FROM runs r JOIN qrels q ON r.query_id = q.query_id AND r.doc_id = q.doc_id
),
agg AS (
  SELECT query_id, count(*) AS hits_at_k, min(rank) AS first_rank,
         round(sum({term}) + 0.0000000005, 6) AS dcg
  FROM hits GROUP BY 1
),
im AS (
  SELECT query_id, n_rel,
         round(list_sum(list_transform(generate_series(1, least({EVAL_K}, CAST(n_rel AS INT))),
               rank -> {term})) + 0.0000000005, 6) AS idcg
  FROM nrel
)
SELECT im.query_id, im.n_rel,
       coalesce(a.hits_at_k, 0) AS hits_at_k,
       round(CAST(coalesce(a.hits_at_k, 0) AS DOUBLE) / CAST(im.n_rel AS DOUBLE)
             + 0.0000000005, 6) AS recall_at_k,
       round(coalesce(1.0 / CAST(a.first_rank AS DOUBLE), 0.0) + 0.0000000005, 6) AS mrr,
       round(coalesce(a.dcg / im.idcg, 0.0) + 0.0000000005, 6) AS ndcg_at_k
FROM im LEFT JOIN agg a ON im.query_id = a.query_id
ORDER BY im.query_id
"""


QUERIES["ret_eval_metrics"] = {"fn": ret_eval_metrics, "oracle": _ret_eval_sql()}


def doc_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 served from the inverted index
    (retrieval.build_inverted_index + bm25_topk_indexed) instead of the
    corpus scan — same terms, same k as doc_bm25_topk, and the SAME
    oracle SQL: the index is an execution strategy, not a semantics
    change, so the gate pins that index-served scores are bit-identical
    to the scan-derived ones."""
    docs = Tables(spark, sf_dir).documents
    postings, stats = R.build_inverted_index(docs)
    # (r16 note: eagerly materializing the posting artifact was tried
    # and measured ~1.8x SLOWER — the lazy plan pushes the serving
    # path's term filter through the groupBy("term") aggregate, so only
    # the query terms' posting lists are ever built; a checkpoint
    # forces the FULL index. Kept lazy: in deployment the persisted
    # index plays the materialized role across many queries.)
    return R.bm25_topk_indexed(postings, stats, BM25_TERMS, k=BM25_K).select(
        "doc_id", r6(F.col("score")).alias("score")
    )


QUERIES["doc_bm25_indexed"] = {
    "fn": doc_bm25_indexed,
    "oracle": R.bm25_oracle_sql(BM25_TERMS, TOKS, k=BM25_K),
}


# ---- Pseudo-relevance feedback (RM3-shaped) expansion ----------------

PRF_FEEDBACK, PRF_EXPAND, PRF_MIN_LEN, PRF_K = 10, 8, 3, 20


def ret_prf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3-style expansion terms mined from the top-10 BM25 feedback
    docs of the seed query, rank-weighted with integers (see
    operators/retrieval.py prf_expansion_terms for the determinism
    trade)."""
    docs = Tables(spark, sf_dir).documents
    return R.prf_expansion_terms(
        docs,
        BM25_TERMS,
        n_feedback=PRF_FEEDBACK,
        n_expand=PRF_EXPAND,
        min_len=PRF_MIN_LEN,
    ).orderBy("prf_rank")


def _prf_cte() -> str:
    """The shared feedback->expansion CTE chain appended to the BM25
    scored CTE (exposes ``exp`` = the expansion term list)."""
    seeds_sql = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""fb AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT {PRF_FEEDBACK}),
wts AS (
  SELECT doc_id,
         {PRF_FEEDBACK} - row_number() OVER (ORDER BY score DESC, doc_id) + 1 AS w
  FROM fb),
fbtok AS (
  SELECT t.term, wts.w FROM toked t JOIN wts USING (doc_id)
  WHERE length(t.term) >= {PRF_MIN_LEN} AND t.term NOT IN ({seeds_sql})),
cand AS (SELECT term, CAST(SUM(w) AS BIGINT) AS weight FROM fbtok GROUP BY term),
exp AS (
  SELECT term, weight,
         row_number() OVER (ORDER BY weight DESC, term) AS prf_rank
  FROM cand QUALIFY prf_rank <= {PRF_EXPAND})"""


RET_PRF_TERMS_SQL = f"""
WITH {R.bm25_scored_cte(BM25_TERMS, TOKS)},
{_prf_cte()}
SELECT term, weight, prf_rank FROM exp ORDER BY prf_rank
"""

QUERIES["ret_prf_terms"] = {"fn": ret_prf_terms, "oracle": RET_PRF_TERMS_SQL}


def ret_prf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full RM3 loop: seed BM25 -> expansion terms -> second-pass
    retrieval over seed+expansion with fixed-point per-(doc,term)
    scores (integer micro-units sum deterministically under any
    partial-aggregation order — the reason a variable-width term set
    can still carry a value oracle)."""
    docs = Tables(spark, sf_dir).documents
    return R.prf_expanded_search(
        docs,
        BM25_TERMS,
        n_feedback=PRF_FEEDBACK,
        n_expand=PRF_EXPAND,
        k=PRF_K,
        min_len=PRF_MIN_LEN,
    )


def _prf_search_sql() -> str:
    k1, b = 1.2, 0.75
    seeds_sql = ", ".join(f"'{t}'" for t in BM25_TERMS)
    idf = (
        "((CAST(n_docs2 AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
        " / (CAST(df AS DOUBLE) + 0.5))"
    )
    norm = (
        f"({1.0 - b!r} + ({b!r} * (CAST(dl AS DOUBLE)"
        " / (CAST(sum_dl2 AS DOUBLE) / CAST(n_docs2 AS DOUBLE)))))"
    )
    fp = (
        f"CAST(floor({float(R.PRF_SCALE)!r} * ({idf} * ((CAST(tf AS DOUBLE)"
        f" * {k1 + 1.0!r}) / (CAST(tf AS DOUBLE) + ({k1!r} * {norm}))))) AS BIGINT)"
    )
    return f"""
WITH {R.bm25_scored_cte(BM25_TERMS, TOKS)},
{_prf_cte()},
allt AS (
  SELECT DISTINCT term FROM (
    SELECT unnest([{seeds_sql}]) AS term
    UNION ALL SELECT term FROM exp)),
dl2 AS (SELECT doc_id, count(*) AS dl FROM toked GROUP BY doc_id),
st2 AS (SELECT sum(dl) AS sum_dl2, count(*) AS n_docs2 FROM dl2),
tf2 AS (SELECT doc_id, term, count(*) AS tf
        FROM toked JOIN allt USING (term) GROUP BY doc_id, term),
dfc AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
sc AS (
  SELECT tf2.doc_id, {fp} AS fp
  FROM tf2 JOIN dl2 USING (doc_id) JOIN dfc USING (term), st2),
agg AS (SELECT doc_id, CAST(SUM(fp) AS BIGINT) AS score_fp FROM sc GROUP BY doc_id)
SELECT doc_id, score_fp, score_fp / {float(R.PRF_SCALE)!r} AS score
FROM agg ORDER BY score_fp DESC, doc_id LIMIT {PRF_K}
"""


QUERIES["ret_prf_search"] = {"fn": ret_prf_search, "oracle": _prf_search_sql()}
