"""Gate queries for the data-selection operators
(operators/selection.py): linear quality-classifier scoring and DSIR
importance weighting, each with a value-level DuckDB oracle.

Both oracles replay the operator's exact arithmetic — same feature
expressions, same left-associated weight chain, same integer-product
bucket-weight divisions — so the hash gate checks bits, not intent
(operator module docstring for the determinism contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rearview_spark.operators import selection as SEL
from rearview_spark.plans._exact import r4, r6
from rearview_spark.plans.pipeline_queries import STOPLIST, TOKS
from rearview_spark.sources.loader import Tables

QUERIES: dict[str, dict] = {}

DSIR_BUCKETS = 64


def doc_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering: linear logit over the
    deterministic text features + the keep decision (logit > 0). One
    codegen'd projection, zero shuffle; the keep flag is computed on the
    UNROUNDED logit on both engines, so the boolean is part of the
    hash check too."""
    docs = Tables(spark, sf_dir).documents
    out = SEL.classifier_quality(docs)
    return out.select(
        "doc_id", r6(F.col("quality_logit")).alias("quality_logit"), "keep"
    ).orderBy("doc_id")


# weight chain mirrored with the operator's exact parenthesization:
# ((((b + w1*lf) + w2*sr) + w3*pr) + w4*mf)
_B, _WL, _WS, _WP, _WM = SEL.QUALITY_WEIGHTS
_LOGIT = (
    f"(((({_B!r} + {_WL!r} * lf) + {_WS!r} * sr)"
    f" + {_WP!r} * pr) + {_WM!r} * mf)"
)

DOC_QUALITY_LOGIT_SQL = f"""
WITH base AS (
  SELECT doc_id, text, {TOKS} AS toks FROM documents
), f AS (
  SELECT doc_id,
         least(len(toks) / 200.0, 1.0) AS lf,
         len(list_filter(toks, x -> list_contains({STOPLIST}, x))) * 1.0 / len(toks) AS sr,
         CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / length(text)
              ELSE 0.0 END AS pr,
         least((list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks)) / 8.0, 1.0) AS mf
  FROM base
)
SELECT doc_id,
       round({_LOGIT} + 0.0000000005, 6) AS quality_logit,
       {_LOGIT} > 0 AS keep
FROM f ORDER BY doc_id
"""

QUERIES["doc_quality_logistic"] = {
    "fn": doc_quality_logistic,
    "oracle": DOC_QUALITY_LOGIT_SQL,
}


def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights against the lang='en' target slice:
    hashed unigram+bigram buckets, smoothed target/raw likelihood
    ratios, per-doc mean. The weight table is B=64 rows broadcast; the
    corpus shuffles only on doc_id (operator docstring)."""
    docs = Tables(spark, sf_dir).documents
    out = SEL.dsir_importance(
        docs, target=F.col("lang") == "en", n_buckets=DSIR_BUCKETS
    )
    return out.select(
        "doc_id", "n_features", r4(F.col("importance")).alias("importance")
    ).orderBy("doc_id")


DOC_DSIR_SQL = f"""
WITH toks AS (SELECT doc_id, lang, {TOKS} AS t FROM documents),
feats AS (
  SELECT doc_id, lang,
         unnest(t || CASE WHEN len(t) >= 2
             THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
             ELSE CAST([] AS VARCHAR[]) END) AS f
  FROM toks
),
b AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT) % {DSIR_BUCKETS} AS bkt
  FROM feats
),
pdb AS (
  SELECT doc_id, bkt, count(*) AS c,
         max(CASE WHEN is_t THEN 1 ELSE 0 END) AS is_t
  FROM b GROUP BY 1, 2
),
counts AS (
  SELECT bkt, sum(c) AS r, sum(c * is_t) AS t FROM pdb GROUP BY 1
),
tot AS (SELECT sum(r) AS rr, sum(t) AS tt FROM counts),
w AS (
  SELECT bkt,
         (CAST(t + 1 AS DOUBLE) * CAST(rr + {DSIR_BUCKETS} AS DOUBLE))
         / (CAST(r + 1 AS DOUBLE) * CAST(tt + {DSIR_BUCKETS} AS DOUBLE)) AS wt
  FROM counts, tot
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_features,
       round(sum(c * wt) / CAST(sum(c) AS DOUBLE) + 0.00000005, 4) AS importance
FROM pdb JOIN w USING (bkt) GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["doc_dsir_importance"] = {"fn": doc_dsir_importance, "oracle": DOC_DSIR_SQL}


#: en/zh bind at every SF; de's budget only binds at sf0.1+ (so the
#: min(10000, ...) keep-all cap branch is exercised under the gate too);
#: fr/es have no budget at all (default keep-everything path).
MIX_BUDGETS = {"en": 5000, "zh": 2000, "de": 50000}


def doc_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mix balancing: per-language sampling thresholds
    derived from the data (budget_tokens / stratum_tokens in pure
    integer arithmetic), applied as the deterministic md5 keep rule.
    The gate hashes the per-stratum outcome — threshold, docs kept,
    tokens kept — so both the rate derivation and the keep decisions
    are value-checked (operators/curation.py: token_budget_mix)."""
    from rearview_spark.operators import curation as CUR

    docs = Tables(spark, sf_dir).documents
    kept = CUR.token_budget_mix(docs, budgets=MIX_BUDGETS, stratum_col="lang")
    return (
        kept.groupBy("lang", "keep_threshold_bp")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
        )
        .orderBy("lang")
    )


_MIX_CASE = " ".join(
    f"WHEN lang = '{k}' THEN least(10000, ({v} * 10000) // st)"
    for k, v in sorted(MIX_BUDGETS.items())
)

DOC_MIX_SQL = f"""
WITH t AS (SELECT doc_id, lang, greatest(0, coalesce(len({TOKS}), 0)) AS n_tokens FROM documents),
tot AS (SELECT lang, sum(n_tokens) AS st FROM t GROUP BY 1),
thr AS (
  SELECT lang, CAST(CASE {_MIX_CASE} ELSE 10000 END AS INT) AS keep_threshold_bp
  FROM tot
),
k AS (
  SELECT t.lang, t.n_tokens, thr.keep_threshold_bp
  FROM t JOIN thr USING (lang)
  WHERE (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':budget')), 1, 15)) AS BIGINT) % 10000)
        < keep_threshold_bp
)
SELECT lang, keep_threshold_bp, count(*) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
FROM k GROUP BY 1, 2 ORDER BY lang
"""

QUERIES["doc_token_budget_mix"] = {"fn": doc_token_budget_mix, "oracle": DOC_MIX_SQL}
