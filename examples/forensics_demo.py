"""Corpus & data forensics tour — the pre-ingest health reads this
repo's r13 wave added, each from its operator:

  vocab      Heaps-law growth: is more data still buying vocabulary?
  zipf       rank-frequency slope (healthy text reads near -1)
  overlap    pairwise source-vocabulary Jaccard (redundant acquisitions)
  entropy    per-column Shannon entropy (dictionary-encoding signal)
  benford    first-digit law on order totals (fabrication screen)
  degree     co-order graph degree histogram (the skew a per-node
             iteration will face)

Usage:  python examples/forensics_demo.py [sf_dir]   (default sf0.01)

Every number is exact-integer or a quantized-summand sum — reruns print
bit-identical output.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators.graph import degree_histogram
from rearview_spark.operators.profiling import (
    benford_first_digit,
    column_entropy,
)
from rearview_spark.operators.text import (
    source_vocab_overlap,
    vocab_growth,
    zipf_fit,
)
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables


def main(sf_dir: str) -> None:
    spark = get_spark("forensics_demo", shuffle_partitions=8)
    t = Tables(spark, sf_dir)
    docs = t.documents

    growth = vocab_growth(docs).collect()
    tail = growth[-1]
    n_docs = docs.count()
    # deciles with no new tokens are absent: a last emitted row early in
    # the corpus means the vocabulary saturated right there
    saturated = tail["docs_processed"] < n_docs or (
        len(growth) > 1 and tail["new_tokens"] / tail["vocab_size"] <= 0.02
    )
    print(
        f"vocab        {tail['vocab_size']} tokens; nothing new after "
        f"doc {tail['docs_processed']} of {n_docs} "
        f"({'SATURATED — more of this corpus buys no vocabulary' if saturated else 'still growing'})"
    )

    z = zipf_fit(docs).collect()[0]
    print(
        f"zipf         slope={z['slope']:.3f} over {z['n_ranks']} ranks "
        f"({'natural-language-like' if -1.4 < z['slope'] < -0.6 else 'ANOMALOUS'})"
    )

    ov = source_vocab_overlap(docs).collect()
    top = max(ov, key=lambda r: r["jaccard"])
    print(
        f"overlap      {len(ov)} source pairs; most redundant: "
        f"{top['source_a']} ~ {top['source_b']} "
        f"(jaccard {top['jaccard']:.3f})"
    )

    orders_num = t.orders.select(
        F.col("o_orderkey").cast("double").alias("o_orderkey"),
        F.col("o_custkey").cast("double").alias("o_custkey"),
        F.col("o_totalprice").alias("o_totalprice"),
    )
    print("entropy      column        n_distinct  norm_entropy")
    for r in column_entropy(
        orders_num, ["o_orderkey", "o_custkey", "o_totalprice"]
    ).collect():
        norm = "NULL" if r["norm_entropy"] is None else f"{r['norm_entropy']:.4f}"
        print(f"             {r['col_name']:<13s} {r['n_distinct']:<11d} {norm}")

    ben = benford_first_digit(t.orders, "o_totalprice").collect()
    chi2 = sum(r["contrib"] for r in ben)
    print(
        f"benford      chi2={chi2:.1f} over digits 1-9 "
        f"(synthetic uniform prices SHOULD flunk the law; "
        f"digit 1 share {ben[0]['n_obs'] / sum(r['n_obs'] for r in ben):.3f} "
        f"vs expected {ben[0]['p_expected']:.3f})"
    )

    pairs = (
        t.lineitem.select("l_orderkey", "l_partkey")
        .join(
            t.lineitem.select(
                F.col("l_orderkey").alias("l_orderkey"),
                F.col("l_partkey").alias("p2"),
            ),
            "l_orderkey",
        )
        .filter(F.col("l_partkey") < F.col("p2"))
        .select(
            F.col("l_partkey").alias("src"), F.col("p2").alias("dst")
        )
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = degree_histogram(sym).collect()
    print(
        f"degree       {len(deg)} distinct degrees; "
        f"max degree {deg[-1]['degree']} "
        f"({deg[-1]['n_nodes']} node(s)) — the hot keys a per-node "
        f"iteration must plan for"
    )

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
