"""Distributed text classification — the quality/domain classifier
stage every large-scale training-data pipeline runs between heuristic
filters and expensive model scoring (the fastText-classifier slot in
the published CCNet / RefinedWeb / DCLM recipes): train a Multinomial
Naive Bayes model with ONE counting pass, score every document with
one broadcastable model join, route by predicted label.

Naive Bayes is the Spark-native choice for this slot because training
is pure counting (exact integers, mergeable partials, no gradient
iterations) and scoring is an integer sum of quantized log-likelihoods
— the PSI/doc_perplexity cross-engine discipline: each per-token log
probability is computed ONCE (model-side, vocab-sized frame), rounded
to 1e-9 units in int64, and per-document scores are order-free integer
sums, so the DuckDB oracle hash-matches bit-for-bit.

Not rearview parity (the reference has no ML surface); north-star
pipeline scope like the rest of the curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rearview_spark.operators.text import tokens

# Quantization scale for log-likelihoods. Chosen ONE decade below the
# PSI family's 1e9 on purpose: NB log terms have magnitude ~10 (double
# ulp ~2e-15), so at 1e9 units a 1-ulp ln() divergence between the JVM
# and libm lands within ~2e-6 of a rounding boundary — across a
# vocab x labels model that is a real cross-engine flake rate. At 1e6
# units the boundary half-width is ~2e-9 per value (negligible), while
# per-token quantization error (0.5e-6 log units) stays orders of
# magnitude below any argmax margin.
NB_SCALE = 10**6


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    alpha: int = 1,
    scale: int = NB_SCALE,
) -> tuple[DataFrame, DataFrame]:
    """Train Multinomial Naive Bayes: P(label) from document counts,
    P(token | label) with add-``alpha`` smoothing over the corpus-wide
    vocabulary V —

        P(w | l) = (c(l, w) + alpha) / (T_l + alpha * V)

    Returns ``(likelihoods, priors)``:

    * ``likelihoods`` — ``(label, w, qlp)`` for every token OBSERVED in
      a label, ``qlp = round(ln P(w|l) * scale)`` as bigint (the
      quantize-once contract: scoring never recomputes a log);
    * ``priors`` — ``(label, q_prior, q_default)`` — the quantized log
      prior and the quantized log-likelihood an UNSEEN token gets for
      that label (``c = 0`` in the formula above), so scoring is total
      over any input vocabulary via one coalesce.

    Scale shape: one corpus pass for the (label, token) hash aggregate
    (map-side partials; output is label-vocab-sized, not corpus-sized),
    one for the distinct-vocab count, one label-sized document count.
    Per-label token totals derive from the materialized count table.
    The model frames are vocab x |labels| rows — broadcastable at any
    corpus scale where the vocabulary itself fits an executor (the same
    assumption the bigram-LM filter makes); both are eagerly
    materialized so downstream scoring never replays the corpus pass.

    Tokenization is the repo-canonical whitespace :func:`tokens`, so
    oracles replay it exactly. ``alpha`` is an integer so the smoothed
    probability is a ratio of exact integers (one double ln at the
    quantization edge, PSI discipline).
    """
    if not isinstance(alpha, int) or alpha < 1:
        raise ValueError(
            f"nb_train: alpha must be an integer >= 1 (got {alpha!r}) — "
            "the smoothed probability must stay a ratio of exact "
            "integers, and alpha=0 puts ln(0) on the unseen-token path"
        )
    toks = tokens(F.col(text_col))
    # No parallelism spread here (r17 A/B, guard on/off min-of-5
    # interleaved at sf0.1): whitespace tokenize+explode is light enough
    # that the repartition exchange costs more than the spread saves —
    # doc_nb_language read 0.88x WITHOUT the guard (1.43 -> 1.25 s).
    # At real scale the scan arrives parallel and the guard was a no-op
    # anyway, so removal is scale-neutral. Heavy-CPU explodes (md5
    # shingling, bigram feature hashing) KEEP their guards — dsir
    # measured 2.2x slower without it in the same session.
    lw = docs.select(F.col(label_col).alias("label"), F.explode(toks).alias("w"))
    counts = (
        lw.groupBy("label", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    vocab = counts.select("w").distinct().count()
    totals = counts.groupBy("label").agg(F.sum("c").alias("t"))
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError("nb_train: empty corpus — priors are undefined")
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )

    def qln(num, den):
        return F.round(F.log(num.cast("double") / den.cast("double")) * scale).cast(
            "long"
        )

    likelihoods = (
        counts.join(totals, "label")
        .select(
            "label",
            "w",
            qln(F.col("c") + F.lit(alpha), F.col("t") + F.lit(alpha * vocab)).alias(
                "qlp"
            ),
        )
        .localCheckpoint(eager=True)
    )
    priors = (
        doc_counts.join(totals, "label")
        .select(
            "label",
            qln(F.col("n"), F.lit(n_docs)).alias("q_prior"),
            qln(F.lit(alpha), F.col("t") + F.lit(alpha * vocab)).alias("q_default"),
        )
        .localCheckpoint(eager=True)
    )
    return likelihoods, priors


def nb_classify(
    docs: DataFrame,
    likelihoods: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score and label documents under a :func:`nb_train` model:
    ``score(d, l) = q_prior(l) + sum over tokens of qlp(l, w)`` (unseen
    tokens take the label's ``q_default``), predicted label = argmax
    with ties toward the lexicographically smallest label — the whole
    decision is integer arithmetic, deterministic under any
    partitioning.

    Scale shape: explode doc tokens once, cross the |labels|-row prior
    frame (broadcast — multiplies rows by the constant label count),
    LEFT-join the broadcast vocab-sized likelihood table on
    (label, w), then two hash aggregates: per-(doc, label) integer sum,
    per-doc ``min_by`` argmax. No window functions, no corpus-sized
    shuffle beyond the token explode itself. The |labels|x token-row
    multiplication is inherent to multiclass scoring and stays
    map-side (broadcast join into a partial aggregate — nothing
    |labels|-sized ever shuffles); with many labels the alternative is
    pivoting the model to one map<label, qlp> row per token, trading
    the row multiplication for map-typed aggregation state — same
    total volume, kept as the simpler long-typed form here.

    Returns ``(id_col, predicted, q_score)`` — q_score is the winning
    label's integer score (1/scale log units, NB_SCALE by default),
    one row per input document
    (empty docs score on priors alone: whitespace tokenization yields
    one '' token, which rides the same default/likelihood path).
    """
    toks = tokens(F.col(text_col))
    # No parallelism spread: light tokenize/explode — see nb_train's
    # r17 A/B note (0.88x without the guard; scale-neutral removal).
    dw = docs.select(F.col(id_col), F.explode(toks).alias("w"))
    per_label = (
        dw.crossJoin(F.broadcast(priors.select("label", "q_default")))
        .join(F.broadcast(likelihoods), ["label", "w"], "left")
        .select(
            id_col,
            "label",
            F.coalesce(F.col("qlp"), F.col("q_default")).alias("q"),
        )
        .groupBy(id_col, "label")
        .agg(F.sum("q").alias("q_tokens"))
        .join(F.broadcast(priors.select("label", "q_prior")), "label")
        .select(
            id_col, "label", (F.col("q_tokens") + F.col("q_prior")).alias("score")
        )
    )
    return per_label.groupBy(id_col).agg(
        F.expr("min_by(label, struct(-score, label))").alias("predicted"),
        F.max("score").alias("q_score"),
    )


def chi2_tokens(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Chi-squared token-label feature selection — the companion read
    to :func:`nb_train`: which tokens are most ASSOCIATED with each
    label (the vocabulary a domain/quality classifier actually keys
    on, and the pruning list that shrinks a model before broadcasting
    it). Per (token, label), the 2x2 presence contingency table

        a = docs in label containing token    b = df_token - a
        c = n_label - a                       d = N - n_label - b

    scores ``chi2 = N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d))``.

    Determinism: a/b/c/d are exact int64 presence counts;
    ``adbc = a*d - b*c`` is computed in bigint (exact while counts
    stay below ~3e9 docs — beyond that the products need decimal);
    the statistic is then a FIXED double expression — one numerator
    product, one denominator product, one division, mirrored
    token-for-token in the oracle — so both engines produce the same
    bits and rank identically. Ties break on the token ascending.

    Scale shape: one corpus explode -> (id, label, token) DISTINCT
    (presence, not frequency — the shuffle is corpus-token-sized, the
    ONLY corpus-scale stage), then every aggregate runs on the
    vocab x labels collapse; label totals broadcast. The final top-k
    window partitions BY LABEL over the min_df-pruned vocab frame —
    per-partition size is the pruned vocabulary, the nb_train
    broadcastability assumption, stated here because the partition
    count is the label count.

    Returns ``(label, token, df_in_label, df_token, chi2, rank)`` with
    ``rank`` 1..k per label, ordered by (label, rank). Tokens whose
    table has a zero margin (present in every doc, or a single-label
    corpus) are excluded — their association is undefined.
    """
    from pyspark.sql import Window

    if not isinstance(k, int) or k < 1:
        raise ValueError(f"chi2_tokens: k must be >= 1 (got {k!r})")
    if not isinstance(min_df, int) or min_df < 1:
        raise ValueError(f"chi2_tokens: min_df must be >= 1 (got {min_df!r})")
    n_docs = docs.count()
    # No parallelism spread before the explode (r17 A/B, min-of-5
    # interleaved at sf0.1): doc_chi2_tokens read 0.79x WITHOUT the
    # guard (1.30 -> 1.02 s, sample ranges barely overlapping) — the
    # added Exchange costs more than spreading the light tokenize saves
    # (the driver flagged the same: 0.87 s at r15 -> 1.72 s at r16).
    # Scale-neutral: a 100 TB scan arrives parallel either way.
    presence = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).alias("label"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .distinct()
    )
    a = presence.groupBy("label", "token").agg(
        F.count(F.lit(1)).alias("df_in_label")
    )
    df_tok = a.groupBy("token").agg(F.sum("df_in_label").alias("df_token"))
    n_label = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_label")
    )
    # Full label x vocab cross, NOT just observed (label, token) pairs:
    # a token absent from a label (a = 0) is a strong ANTI-feature and
    # the textbook statistic scores that cell too. The cross is
    # |labels| x pruned-vocab — the nb_train model-size assumption.
    t = (
        df_tok.filter(F.col("df_token") >= min_df)
        .crossJoin(F.broadcast(n_label))
        .join(a, ["label", "token"], "left")
        .withColumn("df_in_label", F.coalesce("df_in_label", F.lit(0)))
    )
    aa = F.col("df_in_label")
    bb = F.col("df_token") - aa
    cc = F.col("n_label") - aa
    dd = F.lit(n_docs) - F.col("n_label") - bb
    adbc = (aa * dd - bb * cc).cast("long")
    den = (
        (aa + bb).cast("double")
        * (cc + dd).cast("double")
        * (aa + cc).cast("double")
        * (bb + dd).cast("double")
    )
    num = (
        F.lit(n_docs).cast("double")
        * adbc.cast("double")
        * adbc.cast("double")
    )
    scored = t.select(
        "label",
        "token",
        "df_in_label",
        "df_token",
        F.when(den > 0, num / den).alias("chi2"),
    ).filter(F.col("chi2").isNotNull())
    w = Window.partitionBy("label").orderBy(
        F.col("chi2").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("label", "rank")
    )
