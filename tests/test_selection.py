"""Unit tests for the data-selection operators (quality classifier +
DSIR importance weighting)."""

from pyspark.sql import functions as F

from rearview_spark.operators import selection as SEL


PROSE = (
    "the quick brown fox and the lazy dog are in the yard and it is a "
    "fine day for this kind of walk in the sun with a friend " * 8
)
MARKUP = "<div>{{x}}</div>;;;###[1](2)!!!***" * 10


def test_classifier_quality_separates_prose_from_markup(spark):
    df = spark.createDataFrame(
        [(1, PROSE), (2, MARKUP)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in SEL.classifier_quality(df).collect()}
    assert rows[1]["keep"] and rows[1]["quality_logit"] > 0
    assert not rows[2]["keep"] and rows[2]["quality_logit"] < 0


def test_quality_logit_weight_override(spark):
    df = spark.createDataFrame([(1, PROSE)], "doc_id long, text string")
    # bias-only model: logit == bias regardless of text
    out = SEL.classifier_quality(df, weights=(0.5, 0.0, 0.0, 0.0, 0.0)).collect()
    assert out[0]["quality_logit"] == 0.5 and out[0]["keep"]


def test_dsir_importance_prefers_target_like_docs(spark):
    # target slice speaks "alpha"; raw background speaks "omega".
    rows = (
        [(i, "alpha beta alpha beta alpha", "en") for i in range(8)]
        + [(10 + i, "omega psi omega psi omega", "xx") for i in range(8)]
        + [(100, "alpha beta alpha beta alpha", "xx"),  # target-like, not in slice
           (101, "omega psi omega psi omega", "xx")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r["importance"]
        for r in SEL.dsir_importance(df, target=F.col("lang") == "en").collect()
    }
    # the doc that looks like the target outweighs the one that doesn't,
    # and exact duplicates score identically up to accumulation-order
    # float noise (~1e-16; the gate's r4 rounding sits far above it)
    assert out[100] > 1.0 > out[101]
    assert round(out[100], 9) == round(out[0], 9)
    assert round(out[101], 9) == round(out[10], 9)


def test_dsir_feature_bag_counts_unigrams_and_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n_features"]
        for r in SEL.dsir_importance(df, target=F.lit(True)).collect()
    }
    assert out[1] == 5  # 3 unigrams + 2 bigrams
    assert out[2] == 1  # bigram list empty below 2 tokens


def test_classifier_quality_empty_text_is_classified_not_null(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = SEL.classifier_quality(df).collect()[0]
    assert row["quality_logit"] is not None
    assert row["keep"] is False


def test_dsir_importance_is_exactly_one_when_target_is_corpus(spark):
    """With target == the whole corpus, every bucket weight is the ratio
    of identical integers -> exactly 1.0, and every doc's importance is
    exactly 1.0 (integer-product determinism contract)."""
    df = spark.createDataFrame(
        [(i, f"w{i} common text here {i % 5}") for i in range(30)],
        "doc_id long, text string",
    )
    out = SEL.dsir_importance(df, target=F.lit(True)).collect()
    assert len(out) == 30
    assert all(r["importance"] == 1.0 for r in out)


def test_cluster_balanced_sample_caps_dominant_mode(spark):
    """Three well-separated embedding modes, one dominant (120 of 140
    vectors): the dominant cluster is thresholded below 10000 bp and
    shrinks toward per_cluster; sparse clusters keep everything. Rerun
    gives identical rows (md5 rule, deterministic k-means)."""
    from rearview_spark.operators.selection import cluster_balanced_sample

    rows = []
    for i in range(120):  # dominant mode along +x
        rows.append((i, [10.0, float(i % 7) * 0.01, 0.0]))
    for i in range(10):   # mode along +y
        rows.append((200 + i, [0.0, 10.0, float(i) * 0.01]))
    for i in range(10):   # mode along +z
        rows.append((300 + i, [0.0, float(i) * 0.01, 10.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = cluster_balanced_sample(emb, n_clusters=3, iters=3).collect()
    by_thr = {}
    for r in out:
        by_thr.setdefault(r["bucket"], set()).add(r["keep_threshold_bp"])
    assert all(len(v) == 1 for v in by_thr.values())  # one threshold per cluster

    kept_ids = {r["vec_id"] for r in out}
    # sparse modes: threshold 10000, kept whole
    sparse_kept = {r["vec_id"] for r in out if r["keep_threshold_bp"] == 10000}
    assert set(range(200, 210)) | set(range(300, 310)) <= sparse_kept
    # dominant mode capped: per_cluster = ceil(140/3) = 47 -> thr 3916 bp
    dom = [r for r in out if r["keep_threshold_bp"] < 10000]
    assert dom and all(r["vec_id"] < 120 for r in dom)
    assert len(dom) < 120  # genuinely downsampled
    # deterministic rerun
    again = {(r["vec_id"], r["bucket"]) for r in cluster_balanced_sample(emb, n_clusters=3, iters=3).collect()}
    assert again == {(r["vec_id"], r["bucket"]) for r in out}


def test_cluster_balanced_sample_explicit_budget(spark):
    from rearview_spark.operators.selection import cluster_balanced_sample

    rows = [(i, [1.0, float(i % 5)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_balanced_sample(emb, n_clusters=2, iters=2, per_cluster=1000)
    # budget above every cluster size: keep-all, threshold 10000
    assert out.count() == 50
    assert out.filter("keep_threshold_bp != 10000").count() == 0


def test_cluster_balanced_threshold_floors_at_one_bp(spark):
    """A cluster bigger than per_cluster*10000 rows must be CAPPED, not
    deleted: integer flooring to 0 bp would drop the dominant mode
    entirely (review finding r07). per_cluster=0 legitimately keeps 0."""
    from rearview_spark.operators.selection import cluster_balanced_sample

    rows = [(i, [1.0, 0.001 * (i % 3)]) for i in range(12000)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_balanced_sample(emb, n_clusters=1, iters=1, per_cluster=1)
    # (1 * 10000) div 12000 == 0 -> floored to 1 bp, never 0
    thr = {r["keep_threshold_bp"] for r in out.select("keep_threshold_bp").distinct().collect()}
    assert thr <= {1} and thr != {0}
    assert cluster_balanced_sample(emb, n_clusters=1, iters=1, per_cluster=0).count() == 0


def test_train_quality_weights_learns_separable_labels(spark):
    """Logistic GD over the shared feature definitions: on weak labels
    that follow the features (prose-like vs punctuation-heavy), the
    trained weights must separate the classes at serving time through
    classifier_quality — and training must be deterministic."""
    from rearview_spark.operators.selection import (
        classifier_quality,
        train_quality_weights,
    )

    prose = "the quick brown fox jumps over the lazy dog and then it naps for a while in the warm sun"
    markup = "<<<>>> ### !!! ;;; ((())) %%% &&& *** $$$ @@@"
    rows = [(i, prose + f" w{i}", 1) for i in range(40)]
    rows += [(100 + i, markup * (1 + i % 3), 0) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")

    w = train_quality_weights(df, "label", iters=80, lr=2.0)
    assert len(w) == 5
    scored = classifier_quality(df, weights=w).join(
        df.select("doc_id", "label"), "doc_id"
    )
    acc = scored.filter(
        (F.col("keep") & (F.col("label") == 1))
        | (~F.col("keep") & (F.col("label") == 0))
    ).count() / 80
    assert acc >= 0.95, acc
    # learned signs match the documented priors: stopwords help (w2),
    # punctuation hurts (w3)
    assert w[2] > 0 and w[3] < 0
    # deterministic retrain
    assert train_quality_weights(df, "label", iters=80, lr=2.0) == w


def test_train_quality_weights_validates_input(spark):
    import pytest as _pytest

    from rearview_spark.operators.selection import train_quality_weights

    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with _pytest.raises(ValueError):
        train_quality_weights(empty, "label")
