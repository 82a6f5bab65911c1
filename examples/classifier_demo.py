"""Quality-classifier tour — the score/measure/threshold/apply loop a
training-data pipeline runs before committing a filtering pass, each
stage from this repo's operators:

  train       Multinomial Naive Bayes on the documents table's labels
              (one counting pass; vocab x labels broadcastable model)
  classify    integer-argmax predictions for every document
  confusion   label x prediction counts (plain groupBy — no operator
              needed once predictions are a column)
  auc         exact ROC-AUC of a candidate filter score (rank form)
  pr          the full precision/recall/F1 table the threshold is
              actually picked from
  cdc         applying a correction changelog to the classified
              snapshot (delete mislabeled docs, upsert fixed ones)

Usage:  python examples/classifier_demo.py [sf_dir]   (default sf0.01)

Every number is integer-exact or a single division of exact integers —
reruns print bit-identical output.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators.cdc import apply_cdc
from rearview_spark.operators.classify import nb_classify, nb_train
from rearview_spark.operators.evaluation import precision_recall_curve, roc_auc
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables


def main(sf_dir: str) -> None:
    spark = get_spark("classifier_demo")
    docs = Tables(spark, sf_dir).documents

    print("\n== Train: Naive Bayes language model (labels = lang)")
    lik, pri = nb_train(docs, "lang")
    print(f"model: {lik.count()} (label, token) likelihoods, "
          f"{pri.count()} labels")

    print("\n== Classify every document")
    pred = nb_classify(docs, lik, pri)
    labeled = docs.select("doc_id", "lang").join(pred, "doc_id")

    print("\n== Confusion matrix (true lang x predicted)")
    labeled.groupBy("lang").pivot("predicted").count().na.fill(0).orderBy(
        "lang"
    ).show()

    print("\n== Exact ROC-AUC: does doc length separate English?")
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.col("n_chars").alias("s"),
    )
    roc_auc(scored, "y", "s").show()

    print("\n== Precision/recall per threshold (head of the table)")
    precision_recall_curve(scored, "y", "s").orderBy("threshold").show(10)

    print("\n== CDC: delete every 50th doc, re-source every 70th")
    snap = docs.select("doc_id", "source")
    changes = (
        snap.filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", F.lit(None).cast("string").alias("source"),
                F.lit("D").alias("op"), F.lit(1).alias("seq"))
        .unionByName(
            snap.filter(F.col("doc_id") % 70 == 0).select(
                "doc_id", F.lit("src_fixed").alias("source"),
                F.lit("U").alias("op"), F.lit(2).alias("seq"),
            )
        )
    )
    after = apply_cdc(snap, changes, ["doc_id"], ["seq"])
    print(f"snapshot {snap.count()} rows -> {after.count()} after deletes; "
          f"{after.filter(F.col('source') == 'src_fixed').count()} re-sourced")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
