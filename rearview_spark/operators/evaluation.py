"""Classifier/ranker evaluation — the measurement half of the quality-
classifier stage (operators/classify.py): once a filter scores every
document, the pipeline needs to know how well the score separates good
from bad BEFORE committing a threshold to a 100 TB filtering run.

Exact ROC-AUC by rank statistics: AUC = P(score_pos > score_neg)
+ 0.5 * P(score_pos = score_neg), the Mann-Whitney U form — computed
from per-distinct-score positive/negative counts and one ordered
prefix sum, all exact integers until a single final division. No
sampling, no trapezoid approximation over binned thresholds.

Not rearview parity; north-star pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def roc_auc(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """Exact area under the ROC curve for a binary ``label_col``
    (boolean or 0/1) ranked by ``score_col``:

        AUC * 2 * n_pos * n_neg
            = sum over distinct scores s of
                  n_pos(s) * (2 * n_neg_below(s) + n_neg(s))

    — each positive beats every negative strictly below its score and
    half-beats every negative tied with it (the exact tie treatment;
    midrank AUC). Everything stays int64 until the one final division
    of exact integers (the OLS/Cramer discipline — bit-deterministic
    cross-engine, no rounding contract needed).

    Scale shape: ONE hash aggregate collapses the data to its
    |distinct scores| rows (map-side partials — corpus-sized input,
    score-cardinality output), then the ordered prefix sum runs on
    that collapsed frame through operators/_util.global_running_sum
    (range-partitioned cumsums + broadcast prefix totals — never a
    single-task window), and a one-row summary aggregate ends it.
    ``score_col`` should be integral or otherwise exactly reproducible
    (quantized model scores, counts) — grouping on raw floats is legal
    but ties then depend on float identity.

    Returns one row ``(n_pos, n_neg, auc_num2, auc)`` — ``auc_num2``
    is the exact integer numerator above (the value an oracle can
    assert without touching floats); ``auc`` is NULL when either class
    is empty (undefined rather than divide-by-zero).
    """
    from rearview_spark.operators._util import global_running_sum

    lab = F.col(label_col).cast("int")
    per_score = df.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(lab).alias("np"),
        F.sum(F.lit(1) - lab).alias("nn"),
    )
    with_cum = global_running_sum(per_score, ["s"], "nn", out_col="cum_nn")
    contrib = with_cum.select(
        "np",
        "nn",
        (
            F.col("np")
            * (2 * (F.col("cum_nn") - F.col("nn")) + F.col("nn"))
        ).alias("c2"),
    )
    agg = contrib.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum("c2").cast("long").alias("auc_num2"),
    )
    denom = 2 * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        "n_pos",
        "n_neg",
        "auc_num2",
        F.when(
            denom > 0, F.col("auc_num2").cast("double") / denom.cast("double")
        ).alias("auc"),
    )
