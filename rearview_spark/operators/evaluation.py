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


def _binary_label(label_col: str):
    """0/1-validated label column: anything outside {0, 1} (or NULL)
    fails AT EXECUTION via an inline raise_error — a label of 2 would
    silently corrupt every count, and the guard rides the same scan
    (the allocate_proportional pattern; ADVICE-r12 class of bug,
    pre-empted). Single-sourced with the stats/drift families in
    operators/_util.binary_flag_guard."""
    from rearview_spark.operators._util import binary_flag_guard

    return binary_flag_guard(label_col, "evaluation")


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

    lab = _binary_label(label_col)
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


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision/recall/F1 for a multi-class classifier (the
    confusion-matrix summary read after every nb_classify run): for
    each class c over rows where either side names it,

        tp = |label=c & pred=c|   fp = |pred=c & label!=c|
        fn = |label=c & pred!=c|  support = |label=c|

    ONE hash aggregate collapses the data to the |classes|^2-row
    confusion matrix (map-side partials; corpus-sized input, class-
    domain output); per-class sums are then two tiny re-aggregations
    over that matrix, unioned by role. Ratios are each ONE division of
    exact int64 (the roc_auc discipline). Per-class rows only — a
    macro average would sum k doubles and its last-ulp value would
    depend on engine accumulation order, so it is left to the caller's
    presentation layer (micro-F1 over exact integer totals is the
    scale-safe summary if one number is needed).

    Returns ``(class, support, tp, fp, fn, precision, recall, f1)``,
    one row per class appearing in labels or predictions.
    """
    def _non_null(col_name: str):
        # NULL classes would split across the full-outer join (NULL
        # never equals NULL in a join key) and silently produce two
        # half-counted rows — fail at execution instead.
        c = F.col(col_name)
        return F.when(c.isNotNull(), c).otherwise(
            F.raise_error(
                F.lit(
                    f"classification_report: NULL in {col_name} — "
                    "classes must be non-null"
                )
            ).cast("string")
        )

    cm = df.groupBy(
        _non_null(label_col).alias("_l"), _non_null(pred_col).alias("_p")
    ).agg(F.count(F.lit(1)).alias("n"))
    by_label = cm.groupBy(F.col("_l").alias("class")).agg(
        F.sum("n").alias("support"),
        F.sum(F.when(F.col("_p") == F.col("_l"), F.col("n")).otherwise(0)).alias(
            "tp"
        ),
        F.sum(F.when(F.col("_p") != F.col("_l"), F.col("n")).otherwise(0)).alias(
            "fn"
        ),
    )
    by_pred = cm.groupBy(F.col("_p").alias("class")).agg(
        F.sum(F.when(F.col("_l") != F.col("_p"), F.col("n")).otherwise(0)).alias(
            "fp"
        )
    )
    j = by_label.join(by_pred, "class", "full_outer").select(
        "class",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        F.coalesce("fp", F.lit(0)).cast("long").alias("fp"),
        F.coalesce("fn", F.lit(0)).cast("long").alias("fn"),
    )
    return j.select(
        "class",
        "support",
        "tp",
        "fp",
        "fn",
        F.when(
            (F.col("tp") + F.col("fp")) > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            (F.col("tp") + F.col("fn")) > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
        F.when(
            (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
        ).alias("f1"),
    )


def precision_recall_curve(
    df: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """The full operating-characteristic table for a score-thresholded
    filter: one row per DISTINCT score value ``t``, evaluating the rule
    "keep documents with score >= t" —

        tp(t) = positives at score >= t     fp(t) = negatives at >= t
        precision = tp / (tp + fp)          recall = tp / n_pos
        f1 = 2*tp / (2*tp + fp + fn)

    This is how the threshold for a 100 TB filtering pass is actually
    chosen (pick the row, not a parametric guess); :func:`roc_auc`
    summarizes the same table into one number. tp/fp counts are exact
    int64; precision/recall/f1 are each ONE division of exact integers
    (bit-deterministic cross-engine — the roc_auc/OLS discipline).

    Scale shape: identical to roc_auc — one corpus-collapsing hash
    aggregate to |distinct scores| rows, one ascending prefix sum via
    global_running_sum (the ">= t" cumulatives are totals minus the
    strictly-below prefix, so the SAME ascending pass serves both), a
    broadcast one-row totals join. No window over the raw data.

    Returns ``(threshold, tp, fp, fn, precision, recall, f1)`` sorted
    ascending by threshold; precision is NULL when nothing is kept
    (threshold above every score can't occur here since every row's
    own score keeps it, so tp+fp >= 1 on every emitted row).
    """
    from rearview_spark.operators._util import global_running_sum

    lab = _binary_label(label_col)
    per_score = df.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(lab).alias("np"),
        F.sum(F.lit(1) - lab).alias("nn"),
    )
    from rearview_spark.operators._util import global_running_sums

    cum = global_running_sums(
        per_score, ["threshold"], ["np", "nn"], ["cum_np", "cum_nn"]
    )
    totals = per_score.agg(
        F.sum("np").cast("long").alias("tot_p"),
        F.sum("nn").cast("long").alias("tot_n"),
    )
    scored = cum.crossJoin(F.broadcast(totals)).select(
        "threshold",
        # >= t cumulatives: total minus the strictly-below prefix
        (F.col("tot_p") - (F.col("cum_np") - F.col("np"))).alias("tp"),
        (F.col("tot_n") - (F.col("cum_nn") - F.col("nn"))).alias("fp"),
        (F.col("cum_np") - F.col("np")).alias("fn"),
    )
    return scored.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.when(
            (F.col("tp") + F.col("fp")) > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            (F.col("tp") + F.col("fn")) > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
        F.when(
            (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
        ).alias("f1"),
    )


def calibration_bins(
    df: DataFrame, label_col: str, score_col: str, bins: int = 10
) -> DataFrame:
    """Reliability table for a score used as a probability proxy: cut
    the INTEGRAL score range into ``bins`` equal-width bins and report,
    per bin, the average score next to the OBSERVED positive rate — the
    calibration read (does a higher score actually mean a higher
    empirical rate, and by how much?) taken before trusting a score as
    a sampling weight or filter knob at scale.

    Bin assignment is pure integer arithmetic —

        bin = ((s - min) * bins) div (max - min + 1)

    — truncating division over a non-negative numerator, so Spark's
    ``div`` and the oracle's floor ``//`` agree exactly; avg_score and
    pos_rate are each ONE division of exact int64 sums (the roc_auc
    discipline). ``score_col`` must be integral (cast to long); labels
    are 0/1-validated at execution.

    Scale shape: one min/max aggregate (one-row broadcast), one
    corpus-collapsing hash aggregate to <= ``bins`` rows. No windows,
    no sort, nothing bin-count-sized ever shuffles wide.

    Returns ``(bin, n, n_pos, lo, hi, avg_score, pos_rate)`` ascending
    by bin; bins no score lands in are absent (zero-count rows carry
    no calibration signal). Empty input returns zero rows.
    """
    if not isinstance(bins, int) or bins < 1:
        raise ValueError(f"calibration_bins: bins must be >= 1 (got {bins!r})")
    lab = _binary_label(label_col)
    s = F.col(score_col).cast("long")
    # NULL scores have no bin (and Spark/DuckDB order NULL groups on
    # opposite ends) — exclude them, the equi_depth_histogram rule
    df = df.filter(F.col(score_col).isNotNull())
    rng = df.agg(F.min(s).alias("_smin"), F.max(s).alias("_smax"))
    binned = df.select(lab.alias("_y"), s.alias("_s")).crossJoin(
        F.broadcast(rng)
    )
    bin_expr = F.expr(f"((_s - _smin) * {bins}) div (_smax - _smin + 1)")
    return (
        binned.groupBy(bin_expr.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.min("_s").alias("lo"),
            F.max("_s").alias("hi"),
            F.sum("_s").alias("_sum_s"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "lo",
            "hi",
            (F.col("_sum_s").cast("double") / F.col("n").cast("double")).alias(
                "avg_score"
            ),
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "pos_rate"
            ),
        )
        .orderBy("bin")
    )


def cumulative_gains(
    df: DataFrame,
    label_col: str,
    score_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table: rank the population by score
    descending, cut it into ``n_bins`` equal-population buckets, and
    report how many positives the top-k buckets capture versus random
    targeting — the decile report that decides "score the top 20% only"
    budget cuts for an expensive downstream stage (model scoring,
    human review) before running it over the full corpus.

    Rank is a STRICT total order — ``(score desc, id asc)`` — through
    :func:`~rearview_spark.operators._util.global_row_number` (range-
    partitioned sorts + broadcast prefix offsets, never a single-task
    window); bucket = ``((rn - 1) * n_bins) div N`` is exact integer
    arithmetic, so equal-population splitting is deterministic even
    across tied scores. gain = cum_pos / tot_pos and
    lift = (cum_pos * N) / (cum_n * tot_pos) are each ONE division
    with bigint-premultiplied operands (exact while
    ``cum_pos * N < 2^63`` — fine to ~3e9 rows).

    Scale shape: one ranked pass (the global_row_number range shuffle),
    one hash collapse to <= ``n_bins`` rows, two prefix sums over that
    collapsed frame via global_running_sum, a broadcast totals join.

    Returns ``(bucket, n, n_pos, cum_n, cum_pos, gain, lift)``
    ascending; ``gain``/``lift`` NULL when there are no positives.
    """
    from rearview_spark.operators._util import (
        global_row_number,
        global_running_sums,
    )

    if not isinstance(n_bins, int) or n_bins < 1:
        raise ValueError(
            f"cumulative_gains: n_bins must be >= 1 (got {n_bins!r})"
        )
    lab = _binary_label(label_col)
    base = df.select(
        lab.alias("_y"), F.col(score_col).alias("_s"), F.col(id_col).alias("_id")
    )
    ranked, total = global_row_number(
        base, [F.col("_s").desc(), F.col("_id").asc()], out_col="_rn"
    )
    if total == 0:
        return ranked.sparkSession.createDataFrame(
            [],
            "bucket long, n long, n_pos long, cum_n long, cum_pos long, "
            "gain double, lift double",
        )
    per_bucket = ranked.groupBy(
        F.expr(f"((_rn - 1) * {n_bins}) div {total}").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
    )
    cum = global_running_sums(
        per_bucket, ["bucket"], ["n", "n_pos"], ["cum_n", "cum_pos"]
    )
    # totals from the (checkpointed inside global_running_sum,
    # <= n_bins-row) cum frame — re-aggregating per_bucket would replay
    # the bucket collapse over the ranked checkpoint a second time
    totals = cum.agg(F.sum("n_pos").cast("long").alias("_tot_pos"))
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n",
            "n_pos",
            "cum_n",
            "cum_pos",
            F.when(
                F.col("_tot_pos") > 0,
                F.col("cum_pos").cast("double") / F.col("_tot_pos").cast("double"),
            ).alias("gain"),
            F.when(
                (F.col("cum_n") * F.col("_tot_pos")) > 0,
                (F.col("cum_pos") * F.lit(total)).cast("double")
                / (F.col("cum_n") * F.col("_tot_pos")).cast("double"),
            ).alias("lift"),
        )
        .orderBy("bucket")
    )
