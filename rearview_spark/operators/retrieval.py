"""Lexical retrieval over the documents table: BM25 scoring and top-k —
the lexical half of a RAG / training-data curation stack (the vector
half lives in operators/similarity.py).

Not rearview parity; north-star pipeline extension. The whole plan is
JVM-side DataFrame ops: explode -> filtered hash aggregates for tf/df
-> broadcast 1-row corpus stats -> conditional-aggregation pivot. The
token stream is filtered to the query terms BEFORE the tf aggregate, so
the shuffled volume is per-(doc, query-term), never per-token; df and
avgdl are map-side combined aggregates. At 100 TB this is one scan plus
key-space-bounded shuffles.

Cross-engine determinism (the oracle gate hashes doubles): the classic
BM25 idf is ``ln((N - df + .5)/(df + .5) + 1)``, but ``ln`` is the one
operation IEEE-754 does NOT require correctly rounded, and JVM
StrictMath/libm may differ in the last ulp. So ``bm25_scores`` uses the
log-free rational idf ``(N - df + .5)/(df + .5)`` — strictly monotone
in df exactly like the classic form (so rankings agree), but computed
with only +,-,*,/ on doubles derived from identical integers, which ARE
correctly rounded and therefore bit-identical across engines. Same
reason the per-document score sums its per-term contributions in FIXED
term order (coalesce chain, not an unordered SUM): float addition is
not associative, and the gate compares bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rearview_spark.operators.text import tokens


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 (rational-idf variant, see module docstring)
    against a bag of query terms. Returns (id, score) for documents
    matching at least one term; score is the full-precision double
    (round only at the presentation edge).

    Score = sum over matched terms t of
      idf_t * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl/avgdl))
    with idf_t = (N - df_t + 0.5) / (df_t + 0.5).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toked = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    dl = toked.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count("*").alias("n_docs")
    )
    tf = (
        toked.filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "avgdl", F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
        )
        .withColumn(
            "idf",
            (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5)),
        )
        .withColumn(
            "norm",
            F.lit(one_minus_b)
            + (F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (
                (F.col("tf").cast("double") * F.lit(k1p1))
                / (F.col("tf").cast("double") + (F.lit(k1) * F.col("norm")))
            ),
        )
    )
    # Fixed-order reduction: one conditional aggregate per query term,
    # added in the caller's term order — never an unordered float SUM.
    per_term = scored.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("term_score"))).alias(f"_s{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = None
    for i in range(len(terms)):
        c = F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
        total = c if total is None else total + c
    return per_term.select(F.col(id_col), total.alias("score"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    **kwargs,
) -> DataFrame:
    """Top-k by BM25 score, ties broken by id — a total order, so the
    LIMIT boundary is deterministic."""
    id_col = kwargs.get("id_col", "doc_id")
    return (
        bm25_scores(docs, terms, **kwargs)
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def bm25_oracle_sql(
    terms: list[str],
    toks_sql: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB SQL mirroring ``bm25_topk`` EXACTLY — same expression tree,
    same literal constants (repr round-trips the Python doubles), same
    fixed-order coalesce chain — so the gate compares bit-identical
    arithmetic, not merely the same formula."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    cases = ",\n       ".join(
        f"sum(CASE WHEN term = '{t}' THEN term_score END) AS _s{i}"
        for i, t in enumerate(terms)
    )
    chain = " + ".join(f"coalesce(_s{i}, 0.0)" for i in range(len(terms)))
    return f"""
WITH toked AS (SELECT doc_id, unnest({toks_sql}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toked GROUP BY 1),
stats AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
                 CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toked
       WHERE term IN ({tlist}) GROUP BY 1, 2),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term,
         ((n_docs - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         * ((CAST(tf AS DOUBLE) * {k1 + 1.0!r}) /
            (CAST(tf AS DOUBLE) + ({k1!r} * ({1.0 - b!r} + ({b!r} * (CAST(dl AS DOUBLE) / avgdl))))))
         AS term_score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
),
pivoted AS (
  SELECT doc_id,
       {cases}
  FROM scored GROUP BY doc_id
)
SELECT doc_id, round(({chain}) + 0.0000000005, 6) AS score
FROM pivoted
ORDER BY ({chain}) DESC, doc_id
LIMIT {k}
"""
